"""Native host-runtime tests: C++ planner parity + streaming framer.

The planner must agree exactly with the Python contract helpers (the
config-matrix discipline of SURVEY.md §4.7: same suite over both engines);
the framer must reproduce the overlap-save block cutting of
pffastconv_apply (pffastconv.c:162-199)."""

import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu import runtime


needs_native = pytest.mark.skipif(
    not runtime.HAVE_NATIVE, reason="native runtime library unavailable"
)


@needs_native
def test_native_planner_parity_with_python():
    nat = runtime.native_planner()
    for n in list(range(1, 200)) + [512, 1000, 1024, 2400, 9216, 1 << 26, (1 << 26) + 32]:
        assert nat.is_valid_size(n, True) == pf.is_valid_size(n, pf.COMPLEX), n
        assert nat.is_valid_size(n, False) == pf.is_valid_size(n, pf.REAL), n
    for n in [5, 100, 1000, 40000]:
        for kind_c, kind in ((True, pf.COMPLEX), (False, pf.REAL)):
            for higher in (True, False):
                assert nat.nearest_transform_size(n, kind_c, higher) == \
                    pf.nearest_transform_size(n, kind, higher), (n, kind, higher)
    assert nat.decompose(360) == (2, 2, 2, 3, 3, 5)
    assert nat.decompose(7) is None


@needs_native
def test_native_twiddles_match_numpy():
    nat = runtime.native_planner()
    for l, r in [(1, 4), (16, 5), (64, 3)]:
        period = l * r
        k = np.arange(l)[:, None] * np.arange(r)[None, :]
        ref = np.exp(-2j * np.pi * (k % period) / period)
        np.testing.assert_allclose(nat.stage_twiddle(l, r, period), ref, atol=1e-15)
    ref = np.exp(-2j * np.pi * np.arange(128) / 256)
    np.testing.assert_allclose(nat.real_split_twiddle(256), ref, atol=1e-15)


@pytest.mark.parametrize("native", [True, False])
def test_stream_framer_overlap_save(native):
    if native and not runtime.HAVE_NATIVE:
        pytest.skip("no native lib")
    frame, hop = 64, 48  # overlap 16 (filterLen-1 analog)
    fr = runtime.StreamFramer(frame, hop)
    if not native:
        fr._lib = None  # force the Python fallback path
        fr._buf = np.zeros(0, dtype=np.float32)
    assert fr.native == (fr._lib is not None)
    rng = np.random.default_rng(0)
    stream = rng.standard_normal(1000).astype(np.float32)
    got = []
    pos = 0
    for chunk in np.array_split(stream, 13):
        fr.push(chunk)
        f = fr.frames()
        got.append(f)
    frames = np.concatenate([g for g in got if g.size], axis=0)
    # reference framing: frame k covers stream[k*hop : k*hop + frame]
    k = frames.shape[0]
    for i in range(k):
        np.testing.assert_array_equal(frames[i], stream[i * hop : i * hop + frame])
    # flush drains the tail zero-padded
    tail = fr.flush()
    consumed = k * hop
    rest = stream[consumed:]
    if rest.size:
        assert tail.shape == (1, frame)
        np.testing.assert_array_equal(tail[0, : min(rest.size, frame)], rest[:frame])
    assert fr.pending() == max(0, rest.size - frame)


@needs_native
def test_stream_framer_wraparound():
    """Exercise ring wrap: many pushes/pops past the capacity boundary."""

    fr = runtime.StreamFramer(128, 128, capacity=1024)
    rng = np.random.default_rng(1)
    expected = []
    carry = np.zeros(0, dtype=np.float32)
    for it in range(50):
        chunk = rng.standard_normal(300).astype(np.float32)
        fr.push(chunk)
        carry = np.concatenate([carry, chunk])
        f = fr.frames()
        k = f.shape[0]
        for i in range(k):
            np.testing.assert_array_equal(f[i], carry[i * 128 : (i + 1) * 128])
        carry = carry[k * 128 :]
    assert fr.pending() == carry.size


@needs_native
def test_plan_uses_native_twiddles():
    """Plans must build (and match the oracle) with the native planner active."""

    import jax.numpy as jnp
    from pffft_tpu import oracle

    plan = pf.new_setup(2400, pf.REAL)
    x = np.random.default_rng(2).standard_normal(2400).astype(np.float32)
    got = np.asarray(pf.transform_ordered(plan, jnp.asarray(x), pf.FORWARD))
    ref = oracle.packed_spectrum(x)
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()


def test_format_converters_native_vs_numpy():
    """Native single-pass converters == numpy reference, all four formats;
    runs on both the native and fallback paths (PFFFT_TPU_NO_NATIVE axis)."""

    from pffft_tpu import runtime as rt

    rng = np.random.default_rng(0)
    s16 = rng.integers(-32768, 32768, 4096, dtype=np.int16)
    np.testing.assert_allclose(
        rt.convert_s16_f32(s16), s16.astype(np.float32) / 32768.0, rtol=0, atol=0
    )

    cs16 = rng.integers(-32768, 32768, 8192, dtype=np.int16)
    re, im = rt.convert_cs16_planar_f32(cs16)
    np.testing.assert_array_equal(re, cs16.astype(np.float32)[0::2] / 32768.0)
    np.testing.assert_array_equal(im, cs16.astype(np.float32)[1::2] / 32768.0)

    cu8 = rng.integers(0, 256, 8192, dtype=np.uint8)
    re, im = rt.convert_cu8_planar_f32(cu8)
    ref = (cu8.astype(np.float32) - np.float32(127.4)) / np.float32(128.0)
    np.testing.assert_allclose(re, ref[0::2], rtol=0, atol=1e-6)
    np.testing.assert_allclose(im, ref[1::2], rtol=0, atol=1e-6)

    # roundtrip through the saturating packer
    fr = rng.standard_normal(2048).astype(np.float32) * 0.5
    fi = rng.standard_normal(2048).astype(np.float32) * 0.5
    packed = rt.convert_planar_f32_cs16(fr, fi)
    assert packed.dtype == np.int16 and packed.size == 4096
    np.testing.assert_allclose(
        packed[0::2].astype(np.float32) / 32767.0,
        np.clip(fr, -32768.0 / 32767.0, 1.0),  # saturated samples clamp
        atol=1.0 / 32767,
    )
    # saturation clamps instead of wrapping
    big = rt.convert_planar_f32_cs16(np.array([2.0], np.float32), np.array([-2.0], np.float32))
    assert big[0] == 32767 and big[1] == -32768
