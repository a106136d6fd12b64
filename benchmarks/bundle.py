"""Benchmark bundle orchestrator (bench/CMakeLists.txt + unix_info.sh analog).

Runs the benchmark suite, collects JSON/CSV/markdown outputs plus
device/host metadata, and tars everything into ``bench_<ID>.tgz`` — the
same reproducibility bundle the reference builds for its external results
repo (SURVEY.md §5.5).

Usage: python benchmarks/bundle.py [--id MYRUN] [--quick] [--cpu] [--out DIR]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_BENCH_DIR)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--id", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=".")
    args = ap.parse_args()

    run_id = args.id or datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    flags = (["--quick"] if args.quick else []) + (["--cpu"] if args.cpu else [])

    with tempfile.TemporaryDirectory() as tmp:
        # device/host info (info.txt + unix_info.txt analog)
        from pffft_tpu.utils import device_info

        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        with open(os.path.join(tmp, "info.json"), "w") as f:
            json.dump(device_info(), f, indent=2)

        def run(script, extra, log):
            with open(os.path.join(tmp, log), "w") as out:
                subprocess.run(
                    [sys.executable, "-u", os.path.join(_BENCH_DIR, script), *extra, *flags],
                    cwd=_ROOT, stdout=out, stderr=subprocess.STDOUT, check=False,
                    timeout=7200,
                )

        run("sweep_fft.py", ["--csv", os.path.join(tmp, "fft-sweep.csv"),
                             "--table", os.path.join(tmp, "bench-fft-table.txt"),
                             "--max-len", "65536" if args.quick else "1048576"],
            "fft-sweep.log")
        run("sweep_fft.py", ["--non-pow2", "--csv", os.path.join(tmp, "fft-non2.csv")],
            "fft-non2.log")
        run("bench_pipeline.py", ["--csv", os.path.join(tmp, "pipeline.csv")],
            "pipeline.log")

        out_path = os.path.join(args.out, f"bench_{run_id}.tgz")
        with tarfile.open(out_path, "w:gz") as tar:
            for name in sorted(os.listdir(tmp)):
                tar.add(os.path.join(tmp, name), arcname=f"bench_{run_id}/{name}")
        print(out_path)


if __name__ == "__main__":
    main()
