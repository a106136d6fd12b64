"""Multi-process (multi-host analog) smoke run on one machine.

The reference has no cluster concept; for the TPU framework the multi-host
story is jax.distributed over DCN.  This script validates that story
without a cluster (SURVEY.md §4's "test multi-node without a cluster"):
it spawns N processes, each owning 2 virtual CPU devices, forms one global
mesh over all N*2 devices, and runs the sharded paths (batch-sharded FFT,
four-step large FFT, halo-exchange conv) with cross-process collectives.

Run directly:      python scripts/multihost_smoke.py
Run as a worker:   python scripts/multihost_smoke.py --worker I N PORT
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 2


def worker(idx: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=idx
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import pffft_tpu as pf
    from pffft_tpu import parallel as pfp

    ndev = nproc * LOCAL_DEVICES
    mesh = pfp.make_mesh(ndev)
    rng = np.random.default_rng(0)  # same seed everywhere -> same global data

    def global_array(arr, spec):
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
        )

    # --- batch-sharded FFT (DP over DCN+ICI analog) ----------------------
    plan = pf.new_setup(512, pf.REAL)
    x = rng.standard_normal((ndev * 2, 512)).astype(np.float32)
    xs = global_array(x, P(mesh.axis_names[0], None))
    sr, _si = jax.jit(lambda v: pf.fft.transform_ordered_split(plan, v, pf.FORWARD))(xs)
    ref_r, _ = pf.fft.transform_ordered_split(plan, jnp.asarray(x), pf.FORWARD)
    for sh in sr.addressable_shards:
        assert np.allclose(np.asarray(sh.data), np.asarray(ref_r)[sh.index], atol=1e-4)

    # --- four-step large FFT with cross-process all_to_all ---------------
    n = (4 * ndev) ** 2
    fp = pfp.FourStepPlan(n, mesh)
    xx = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    xd = global_array(xx, P(mesh.axis_names[0]))
    spec = fp.forward(xd)
    ref = np.fft.fft(xx.astype(np.complex128))
    for sh in spec.addressable_shards:
        err = np.abs(np.asarray(sh.data) - ref[sh.index]).max()
        assert err < 1e-3 * np.abs(ref).max(), f"four-step mismatch {err}"

    # --- halo-exchange conv over processes -------------------------------
    h = rng.standard_normal(17).astype(np.float32)
    setup = pf.conv.FastConv(h)
    stream = rng.standard_normal(ndev * 512).astype(np.float32)
    sd = global_array(stream, P(mesh.axis_names[0]))
    y = pfp.sharded_fastconv_valid(setup, sd, mesh)
    refc = np.convolve(stream.astype(np.float64), h.astype(np.float64), "valid")
    for sh in y.addressable_shards:
        sl = sh.index[0]
        seg = refc[sl.start or 0 : (sl.start or 0) + np.asarray(sh.data).size]
        assert np.abs(np.asarray(sh.data) - seg).max() < 1e-3, "halo conv mismatch"

    print(f"[proc {idx}] ok ({ndev}-device global mesh)", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    port = 12765
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    fail = False
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        txt = out.decode()
        if p.returncode != 0:
            fail = True
            print(f"--- proc {i} FAILED ---\n{txt}")
        else:
            print(txt.strip().splitlines()[-1] if txt.strip() else f"[proc {i}] (no output)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
