"""Fast-convolution tests (port of /root/reference/tests/test_pffastconv.c).

The oracle is valid-mode convolution, matching the reference's slow_conv_R
semantics (test_pffastconv.c:175-213): y[i] = sum_j x[i+j] * h[F-1-j], i.e.
np.convolve(x, h, 'valid'); complex streams filter I and Q independently
with a real filter.  Covers filter-length sweeps, flags, the streaming
consumed-samples contract, and the block-length negotiation formula.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import pffft_tpu as pf
from pffft_tpu import conv as pfc

RNG = np.random.default_rng(1234)


def ramp(n):
    """The reference's ramp input: i mod 4093 scaled (test_pffastconv.c)."""

    return ((np.arange(n) % 4093) / 4093.0 - 0.5).astype(np.float32)


# pffastconv block negotiation (pffastconv.c:62-80)
@pytest.mark.parametrize(
    "filter_len,block_len,expect_nfft",
    [
        (16, 0, 32),     # 2*next_pow2(15)=32
        (17, 0, 32),     # 2*next_pow2(16)=32
        (33, 0, 64),     # 2*next_pow2(32)=64
        (128, 0, 256),
        (4, 0, 32),      # min fft len
        (32, 1024, 1024),
        (32, 1000, 1024),  # next pow2 of blockLen
    ],
)
def test_block_negotiation(filter_len, block_len, expect_nfft):
    s = pfc.FastConv(np.ones(filter_len, np.float32), block_len=block_len)
    assert s.block_len == expect_nfft
    assert s.nfft == expect_nfft


@pytest.mark.parametrize("filter_len", [4, 16, 32, 53, 124, 128, 256])
def test_real_conv_matches_oracle(filter_len):
    n = 4096
    x = ramp(n)
    h = RNG.standard_normal(filter_len).astype(np.float32)
    s = pfc.FastConv(h)
    y, consumed = s.apply(jnp.asarray(x), flush=True)
    assert consumed == n - filter_len + 1
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")
    tol = 1e-5 * max(1.0, np.max(np.abs(ref))) * filter_len ** 0.5
    np.testing.assert_allclose(np.asarray(y), ref[:consumed], atol=tol)


@pytest.mark.parametrize("filter_len", [16, 61, 128])
def test_correlation_flag(filter_len):
    n = 2048
    x = ramp(n)
    h = RNG.standard_normal(filter_len).astype(np.float32)
    s = pfc.FastConv(h, flags=pfc.ConvFlags.CORRELATION)
    y, consumed = s.apply(jnp.asarray(x), flush=True)
    ref = np.correlate(x.astype(np.float64), h.astype(np.float64), "valid")
    tol = 1e-5 * max(1.0, np.max(np.abs(ref))) * filter_len ** 0.5
    np.testing.assert_allclose(np.asarray(y)[: len(ref)], ref[:consumed], atol=tol)


@pytest.mark.parametrize("single_fft", [False, True], ids=["twofft", "singlefft"])
@pytest.mark.parametrize("filter_len", [16, 64, 123])
def test_complex_stream_real_filter(filter_len, single_fft):
    n = 3000
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    h = RNG.standard_normal(filter_len).astype(np.float32)
    flags = pfc.ConvFlags.CPLX_INP_OUT
    if single_fft:
        flags |= pfc.ConvFlags.CPLX_SINGLE_FFT
    s = pfc.FastConv(h, flags=flags)
    y, consumed = s.apply(jnp.asarray(x), flush=True)
    assert consumed <= n - filter_len + 1
    ref = (
        np.convolve(x.real.astype(np.float64), h.astype(np.float64), "valid")
        + 1j * np.convolve(x.imag.astype(np.float64), h.astype(np.float64), "valid")
    )
    tol = 2e-5 * max(1.0, np.max(np.abs(ref))) * filter_len ** 0.5
    np.testing.assert_allclose(np.asarray(y), ref[:consumed], atol=tol)


def test_complex_filter_extension():
    """CPLX_FILTER is rejected by the reference (pffastconv.c:71-72) but
    implemented here via the complex-FFT path."""

    n, filter_len = 2048, 33
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    h = (RNG.standard_normal(filter_len) + 1j * RNG.standard_normal(filter_len)).astype(np.complex64)
    s = pfc.FastConv(h, flags=pfc.ConvFlags.CPLX_INP_OUT | pfc.ConvFlags.CPLX_FILTER)
    y, consumed = s.apply(jnp.asarray(x), flush=True)
    ref = np.convolve(x.astype(np.complex128), h.astype(np.complex128), "valid")
    tol = 2e-5 * max(1.0, np.max(np.abs(ref))) * filter_len ** 0.5
    np.testing.assert_allclose(np.asarray(y), ref[:consumed], atol=tol)


@pytest.mark.parametrize("filter_len", [32, 128])
def test_streaming_contract(filter_len):
    """Chunked apply with remainder carry == one-shot result
    (the pffastconv.h:149-174 streaming protocol)."""

    n = 10000
    x = ramp(n)
    h = RNG.standard_normal(filter_len).astype(np.float32)
    s = pfc.FastConv(h)

    # one-shot
    full, full_consumed = s.apply(jnp.asarray(x), flush=True)
    full = np.asarray(full)

    # streaming in chunks of 1500 with carry
    out = []
    buf = np.zeros(0, np.float32)
    pos = 0
    chunk = 1500
    while pos < n:
        buf = np.concatenate([buf, x[pos : pos + chunk]])
        pos += chunk
        flush = pos >= n
        y, consumed = s.apply(jnp.asarray(buf), flush=flush)
        if consumed:
            out.append(np.asarray(y))
        buf = buf[consumed:]
    stream = np.concatenate(out)
    assert stream.shape[0] == full_consumed
    np.testing.assert_allclose(stream, full, atol=1e-4)


def test_no_flush_consumes_only_full_blocks():
    filter_len = 32
    h = np.ones(filter_len, np.float32)
    s = pfc.FastConv(h)
    u = s.num_out_per_block
    # shorter than one block: nothing consumed
    y, consumed = s.apply(jnp.asarray(ramp(s.nfft - 1)), flush=False)
    assert consumed == 0 and y.shape[0] == 0
    # exactly one block
    y, consumed = s.apply(jnp.asarray(ramp(s.nfft)), flush=False)
    assert consumed == u
    # with flush the whole valid range is produced
    y, consumed = s.apply(jnp.asarray(ramp(s.nfft)), flush=True)
    assert consumed == s.nfft - filter_len + 1


def test_batched_and_one_shot_helpers():
    x = RNG.standard_normal((3, 2, 1000)).astype(np.float32)
    h = RNG.standard_normal(17).astype(np.float32)
    y = pfc.fastconv_valid(jnp.asarray(x), h)
    assert y.shape == (3, 2, 1000 - 17 + 1)
    ref = np.convolve(x[1, 0].astype(np.float64), h.astype(np.float64), "valid")
    np.testing.assert_allclose(np.asarray(y[1, 0]), ref, atol=1e-4 * np.max(np.abs(ref)) * 5)


def test_real_mode_rejects_complex():
    s = pfc.FastConv(np.ones(8, np.float32))
    with pytest.raises(ValueError):
        s.apply(jnp.asarray(np.zeros(64, np.complex64)))


def test_new_setup_apply_parity_names():
    h = RNG.standard_normal(31).astype(np.float32)
    s = pfc.new_setup(h, block_len=512)
    x = ramp(4000)
    y, consumed = pfc.apply(s, jnp.asarray(x), flush=True)
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")
    np.testing.assert_allclose(np.asarray(y), ref[:consumed], atol=2e-4)


def test_streaming_conv_class():
    """StreamingConv (framer + device pipeline) == np.convolve valid."""

    import numpy as np
    from pffft_tpu.conv import StreamingConv

    rng = np.random.default_rng(0)
    h = rng.standard_normal(65).astype(np.float32)
    x = rng.standard_normal(10_000).astype(np.float32)
    sc = StreamingConv(h)
    outs = []
    pos = 0
    while pos < x.size:
        step = int(rng.integers(100, 900))
        outs.append(sc.push(x[pos : pos + step]))
        pos += step
    outs.append(sc.flush())
    got = np.concatenate(outs)
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


# ---------------------------------------------------------------------------
# Large-filter / large-stream coverage (reference sweeps filterLen 32..32768
# over 2^24-sample streams with output-length contracts and buffer canaries,
# /root/reference/tests/test_pffastconv.c:27,475,925-940,52-62)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("filter_len", [1024, 8192, 32768])
def test_large_filter_matches_fft_oracle(filter_len):
    """Correctness at reference-scale filter lengths over a long stream,
    vs scipy's independent fftconvolve (np.convolve is O(L*M), too slow)."""

    scipy_signal = pytest.importorskip("scipy.signal")
    import jax.numpy as jnp

    rng = np.random.default_rng(filter_len)
    n = 1 << 21
    h = rng.standard_normal(filter_len).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    s = pfc.FastConv(h)
    y, consumed = s.apply(jnp.asarray(x), flush=True)
    # output-length contract (pffastconv flush semantics, mirrored from the
    # small-filter tests): valid-mode output, one sample per fully-covered
    # position
    assert consumed == n - filter_len + 1
    got = np.asarray(y)
    assert got.shape[0] == consumed
    ref = scipy_signal.fftconvolve(
        x.astype(np.float64), h.astype(np.float64), mode="valid"
    )
    scale = np.abs(ref).max()
    assert np.abs(got - ref[:consumed]).max() < 5e-4 * scale


@pytest.mark.slow
def test_large_stream_output_length_contract():
    """2^24-sample stream: consumed/output lengths obey the pffastconv
    contract and the result stays finite (the canary analog at scale)."""

    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 1 << 24
    flen = 333
    h = rng.standard_normal(flen).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    s = pfc.FastConv(h)
    y, consumed = s.apply(jnp.asarray(x), flush=False)
    num_out = s.num_out_per_block
    assert consumed == (n // num_out) * num_out
    assert np.asarray(y).shape[0] == consumed
    assert np.all(np.isfinite(np.asarray(y)))


def test_canary_padding_untouched():
    """Guard values planted beyond the live data must come back unchanged
    (test_pffastconv.c:52-62 canary discipline): the framing/conv pipeline
    must not read or write outside its advertised extents.  In a functional
    engine the probe is: planting canaries in the PADDING region of a
    batched input must not leak into any live output value."""

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    h = rng.standard_normal(63).astype(np.float32)
    x = rng.standard_normal(4096).astype(np.float32)
    s = pfc.FastConv(h)
    y_clean, _ = s.apply(jnp.asarray(x), flush=True)
    # same stream with trailing canaries PAST the consumed region: the
    # canary samples are extra input the engine must not consume eagerly
    canary = np.full(17, np.float32(np.finfo(np.float32).max))
    y_canary, consumed = s.apply(jnp.asarray(np.concatenate([x, canary])), flush=False)
    yc = np.asarray(y_canary)[: np.asarray(y_clean).shape[0]]
    live = min(consumed - h.size + 1, yc.shape[0])
    assert np.all(np.isfinite(yc[:live]))


def test_pallas_kernel_batch_canary():
    """Rows beyond the caller's live batch (tile padding) must not corrupt
    live rows in the fused kernels (canary-padding discipline applied to
    the TPU tiling)."""

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import fused_stage as fs

    plan = pf.new_setup(1024, pf.COMPLEX, max_factor=32)
    rng = np.random.default_rng(5)
    live = 5
    tb = 8
    re = rng.standard_normal((tb, 1024)).astype(np.float32)
    im = rng.standard_normal((tb, 1024)).astype(np.float32)
    re[live:] = np.float32(1e30)  # canary rows
    im[live:] = np.float32(1e30)
    kr, ki = fs.cfft_fused2(plan, jnp.asarray(re), jnp.asarray(im), tb=tb, interpret=True)
    ref_r, ref_i = fs.cfft_fused2(
        plan, jnp.asarray(re[:live]), jnp.asarray(im[:live]),
        tb=live, interpret=True,
    )
    scale = float(np.abs(np.asarray(ref_r)).max())
    assert np.abs(np.asarray(kr)[:live] - np.asarray(ref_r)).max() < 1e-5 * scale
    assert np.all(np.isfinite(np.asarray(kr)[:live]))
