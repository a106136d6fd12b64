"""Distribution-layer tests on a virtual 8-device CPU mesh.

The reference has no distributed tests (nothing distributed exists there);
these validate the TPU-native scaling axes of SURVEY.md §2.8 against the
same oracles the local engine uses (numpy.fft, np.convolve), on the
"multi-node without a cluster" pattern of SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu import parallel as pfp


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return pfp.make_mesh(8)


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# four-step FFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1024, 4096, 9216])
def test_fourstep_cfft_matches_numpy(mesh, n):
    fp = pfp.FourStepPlan(n, mesh)
    r = _rng(n)
    x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(np.complex64)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    got = np.asarray(fp.forward(xd))
    ref = np.fft.fft(x.astype(np.complex128))
    tol = 1e-3 * np.abs(ref).max()
    assert np.abs(got - ref).max() < tol


def test_fourstep_batched_leading_axis(mesh):
    n = 1024
    fp = pfp.FourStepPlan(n, mesh)
    r = _rng(1)
    x = (r.standard_normal((3, n)) + 1j * r.standard_normal((3, n))).astype(np.complex64)
    got = np.asarray(fp.forward(jnp.asarray(x)))
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()


def test_fourstep_internal_order_and_reorder(mesh):
    n = 4096
    fp = pfp.FourStepPlan(n, mesh)
    r = _rng(2)
    x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(np.complex64)
    xd = jnp.asarray(x)
    internal = fp.forward(xd, ordered=False)
    ordered = fp.forward(xd, ordered=True)
    # reorder(internal) == ordered, both directions (tolerance: the two
    # layouts compile to different fusions, so fp32 rounding may differ)
    scale = np.abs(np.asarray(ordered)).max()
    np.testing.assert_allclose(
        np.asarray(fp.reorder(internal, to_canonical=True)), np.asarray(ordered),
        atol=1e-5 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(fp.reorder(ordered, to_canonical=False)), np.asarray(internal),
        atol=1e-5 * scale,
    )


@pytest.mark.parametrize("kind", [pf.COMPLEX, pf.REAL])
def test_fourstep_roundtrip_unscaled(mesh, kind):
    n = 4096
    fp = pfp.FourStepPlan(n, mesh, kind=kind)
    r = _rng(3)
    if kind == pf.REAL:
        x = r.standard_normal(n).astype(np.float32)
    else:
        x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(np.complex64)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    back = np.asarray(fp.backward(fp.forward(xd)))
    # pffft.h:134 contract: backward(forward(x)) == N * x
    np.testing.assert_allclose(back / n, x, atol=5e-4 * np.abs(x).max() * np.log2(n))


def test_fourstep_rfft_matches_numpy_packed(mesh):
    n = 8192
    fp = pfp.FourStepPlan(n, mesh, kind=pf.REAL)
    r = _rng(4)
    x = r.standard_normal(n).astype(np.float32)
    got = np.asarray(fp.forward(jnp.asarray(x)))
    ref = np.fft.rfft(x.astype(np.float64))
    packed = ref[:-1].copy()
    packed[0] = ref[0].real + 1j * ref[-1].real  # pffft bin0 packing
    assert np.abs(got - packed).max() < 1e-3 * np.abs(ref).max()


def test_fourstep_uses_collectives(mesh):
    """The compiled forward must contain an all-to-all (the ICI transpose)."""

    n = 4096
    fp = pfp.FourStepPlan(n, mesh)
    x = jnp.zeros(n, dtype=jnp.complex64)
    xd = pfp.shard_batch(x, mesh, axis=0)
    fn = jax.jit(lambda v: fp.forward(v))
    txt = fn.lower(xd).compile().as_text()
    assert ("all-to-all" in txt) or ("all-permute" in txt) or ("collective-permute" in txt), (
        "expected an ICI transpose collective in the compiled four-step FFT"
    )


def test_fourstep_real_path_gather_free(mesh):
    """The sharded REAL path must compile without gather/scatter ops (they
    serialize on TPU — the repo's de-gather rule, CLAUDE.md; the reference
    is also shuffle-free here: reversed_copy, pffft_priv_impl.h:1125)."""

    n = 8192
    fp = pfp.FourStepPlan(n, mesh, kind=pf.REAL)
    x = jnp.zeros(n, dtype=jnp.float32)
    for backward in (False, True):
        if backward:
            s = jnp.zeros(n // 2, dtype=jnp.complex64)
            fn = jax.jit(lambda v: fp.backward(v))
            txt = fn.lower(s).compile().as_text()
        else:
            fn = jax.jit(lambda v: fp.forward(v))
            txt = fn.lower(x).compile().as_text()
        for op in (" gather(", " scatter(", "all-gather-start"):
            assert op not in txt, f"{op.strip()} in compiled real fourstep (backward={backward})"


# ---------------------------------------------------------------------------
# sharded overlap-save (halo exchange)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("flen", [17, 64, 333])
def test_sharded_fastconv_real(mesh, flen):
    r = _rng(flen)
    n = 8 * 1024
    x = r.standard_normal(n).astype(np.float32)
    h = r.standard_normal(flen).astype(np.float32)
    setup = pf.conv.FastConv(h)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    got = np.asarray(pfp.sharded_fastconv_valid(setup, xd, mesh))
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-4 * max(1.0, np.abs(ref).max())


def test_sharded_fastconv_matches_local_pipeline(mesh):
    """Sharded output == the single-device batched pipeline bit-for-role."""

    r = _rng(7)
    n = 4096
    x = r.standard_normal(n).astype(np.float32)
    h = r.standard_normal(33).astype(np.float32)
    setup = pf.conv.FastConv(h)
    local = np.asarray(setup.apply_batched(jnp.asarray(x)[None, :])[0])
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    sharded = np.asarray(pfp.sharded_fastconv_valid(setup, xd, mesh))
    np.testing.assert_allclose(sharded, local, atol=1e-5 * max(1.0, np.abs(local).max()))


def test_sharded_fastconv_complex_stream(mesh):
    r = _rng(9)
    n = 4096
    x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(np.complex64)
    h = r.standard_normal(49).astype(np.float32)
    setup = pf.conv.FastConv(h, flags=pf.conv.ConvFlags.CPLX_INP_OUT)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    got = np.asarray(pfp.sharded_fastconv_valid(setup, xd, mesh))
    ref = np.convolve(x.astype(np.complex128), h.astype(np.float64), "valid")
    assert np.abs(got - ref).max() < 3e-4 * max(1.0, np.abs(ref).max())


def test_sharded_fastconv_channels_batch(mesh):
    """Leading channel axis with the stream axis sharded (DP x CP)."""

    r = _rng(11)
    c, n = 3, 2048
    x = r.standard_normal((c, n)).astype(np.float32)
    h = r.standard_normal(21).astype(np.float32)
    setup = pf.conv.FastConv(h)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=1)
    got = np.asarray(pfp.sharded_fastconv_valid(setup, xd, mesh))
    for i in range(c):
        ref = np.convolve(x[i].astype(np.float64), h.astype(np.float64), "valid")
        assert np.abs(got[i] - ref).max() < 2e-4 * max(1.0, np.abs(ref).max())


def test_batch_sharding_dp(mesh):
    """Plain DP: batch axis sharded, per-row results match the local engine."""

    plan = pf.new_setup(1024, pf.REAL)
    r = _rng(13)
    x = r.standard_normal((16, 1024)).astype(np.float32)
    xd = pfp.shard_batch(jnp.asarray(x), mesh, axis=0)
    got = np.asarray(pf.transform_ordered(plan, xd, pf.FORWARD))
    ref = np.asarray(pf.transform_ordered(plan, jnp.asarray(x), pf.FORWARD))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


# --------------------------------------------------------------------------
# Pencil-decomposed distributed 2-D FFT
# --------------------------------------------------------------------------

def _pencil_input(mesh, shape, seed=11):
    rng = _rng(seed)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    ax = mesh.axis_names[0]
    spec = jax.sharding.PartitionSpec(
        *([None] * (len(shape) - 2)), ax, None)
    xd = jax.device_put(jnp.asarray(x),
                        jax.sharding.NamedSharding(mesh, spec))
    return x, xd


@pytest.mark.parametrize("shape", [(64, 96), (32, 32)])
def test_pencil2d_matches_numpy(mesh, shape):
    p = pfp.Pencil2D(shape, mesh)
    x, xd = _pencil_input(mesh, (2,) + shape)
    got = np.asarray(p.forward(xd))
    ref = np.fft.fft2(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-6


def test_pencil2d_roundtrip_unscaled(mesh):
    p = pfp.Pencil2D((48, 64), mesh)
    x, xd = _pencil_input(mesh, (48, 64))
    back = np.asarray(p.backward(p.forward(xd))) / (48 * 64)
    assert np.abs(back - x).max() < 3e-6 * max(1.0, np.abs(x).max())


def test_pencil2d_transposed_layout(mesh):
    """transposed=True skips the final collective; backward accepts it."""

    p = pfp.Pencil2D((64, 96), mesh)
    x, xd = _pencil_input(mesh, (64, 96))
    st = p.forward(xd, transposed=True)
    assert st.shape == (96, 64)
    ref = np.fft.fft2(x).swapaxes(-1, -2)
    assert np.abs(np.asarray(st) - ref).max() / np.abs(ref).max() < 3e-6
    back = np.asarray(p.backward(st, transposed=True)) / (64 * 96)
    assert np.abs(back - x).max() < 3e-6 * max(1.0, np.abs(x).max())


def test_pencil2d_collective_count(mesh):
    """Full-layout forward uses all-to-all transposes and no gathers."""

    p = pfp.Pencil2D((64, 64), mesh)
    _, xd = _pencil_input(mesh, (64, 64))
    txt = p._map(False, False, 2).lower(xd).compile().as_text()
    assert "all-to-all" in txt
    for op in (" gather(", " scatter("):
        assert op not in txt


def test_pencil2d_matches_local_nd(mesh):
    """Sharded result == the local nd module's fft2 on the gathered data."""

    p = pfp.Pencil2D((32, 48), mesh)
    x, xd = _pencil_input(mesh, (32, 48))
    got = np.asarray(p.forward(xd))
    local = np.asarray(pf.fft2(x))
    assert np.abs(got - local).max() / max(1.0, np.abs(local).max()) < 3e-6


def test_pencil2d_errors(mesh):
    with pytest.raises(ValueError, match="divisible"):
        pfp.Pencil2D((60, 64), mesh)  # 60 % 8 != 0
    p = pfp.Pencil2D((32, 32), mesh)
    with pytest.raises(ValueError, match="trailing axes"):
        p.forward(jnp.zeros((16, 32), jnp.complex64))


def test_pencil2d_jit_cache_keys_on_dispatch_state(mesh):
    """Trace-time-globals rule: flipping the cmul mode must produce a new
    executable, not reuse one traced under the old mode."""

    from pffft_tpu.ops import split as osplit

    p = pfp.Pencil2D((32, 32), mesh)
    _, xd = _pencil_input(mesh, (32, 32))
    p.forward(xd)
    n1 = len(p._map_cache)
    try:
        osplit.set_cmul_mode("gauss")  # non-default on CPU (default: 4mul)
        p.forward(xd)
    finally:
        osplit.set_cmul_mode(None)
    assert len(p._map_cache) == n1 + 1
