"""Plot benchmark CSVs to PNGs (the plots.sh gnuplot analog).

Usage: python benchmarks/plots.py fft-sweep.csv [-o outdir]
Produces <name>-gflops.png and <name>-sol.png per input CSV.
"""

import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("-o", "--outdir", default=".")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path in args.csvs:
        with open(path) as f:
            rows = list(csv.DictReader(f))
        if not rows or "n" not in rows[0]:
            print(f"skip {path}: no n column")
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        kinds = sorted({r.get("kind", "all") for r in rows})
        for metric, ylabel in (("gflops", "GFLOP/s (fftw convention)"),
                               ("sol", "fraction of speed-of-light")):
            if metric not in rows[0]:
                continue
            fig, ax = plt.subplots(figsize=(8, 5))
            for kind in kinds:
                pts = [(int(r["n"]), float(r[metric])) for r in rows
                       if r.get("kind", "all") == kind and r.get(metric)]
                pts.sort()
                if pts:
                    ax.plot([p[0] for p in pts], [p[1] for p in pts],
                            marker="o", label=kind)
            ax.set_xscale("log", base=2)
            ax.set_xlabel("transform size N")
            ax.set_ylabel(ylabel)
            ax.set_title(f"{name} — {metric}")
            ax.grid(True, alpha=0.3)
            ax.legend()
            out = os.path.join(args.outdir, f"{name}-{metric}.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            print(out)


if __name__ == "__main__":
    main()
