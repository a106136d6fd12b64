"""PFDSP tests: mixers vs exact math, carrier patterns vs reference values,
CIC vs a direct emulation of the reference's integrator/comb loop
(/root/reference/src/pf_cic.cpp:87-135).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pffft_tpu import dsp

RNG = np.random.default_rng(99)


# ---------------------------------------------------------------------------
# Mixers
# ---------------------------------------------------------------------------

def _exact_shift(x, rate, phase0, n0=0):
    n = np.arange(n0, n0 + len(x), dtype=np.float64)
    return x * np.exp(1j * (2 * np.pi * rate * n + phase0))


@pytest.mark.parametrize("rate", [0.0, 0.125, 0.1234567, -0.3, 0.49])
def test_mixer_vs_exact(rate):
    n = 4096
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    out, phase = dsp.shift_math_cc(jnp.asarray(x), rate, starting_phase=0.7)
    ref = _exact_shift(x.astype(np.complex128), rate, 0.7)
    err = np.max(np.abs(np.asarray(out) - ref))
    # 32-bit NCO quantizes rate to 2^-32 cycles/sample; over 4096 samples
    # the phase error stays < 2*pi*(4096*2^-32 + angle ulp) ~ 1e-5 rad.
    assert err < 5e-5 * np.max(np.abs(x)), f"mixer err {err}"
    # returned phase continues the stream
    out2, _ = dsp.shift_math_cc(jnp.asarray(x), rate, starting_phase=phase)
    ref2 = _exact_shift(x.astype(np.complex128), rate, 0.7, n0=n)
    assert np.max(np.abs(np.asarray(out2) - ref2)) < 1e-4 * np.max(np.abs(x))


def test_mixer_streaming_continuity():
    """Chunked shifting == one-shot shifting (state carries exact phase)."""

    rate = 0.01717
    n = 8192
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    m = dsp.Mixer(rate, 0.3)
    chunks = [np.asarray(m.shift(jnp.asarray(x[i : i + 1000]))) for i in range(0, n, 1000)]
    stream = np.concatenate(chunks)
    m2 = dsp.Mixer(rate, 0.3)
    full = np.asarray(m2.shift(jnp.asarray(x)))
    np.testing.assert_allclose(stream, full, atol=1e-6)


def test_mixer_snr():
    """Shifting a pure tone must land all energy in the shifted bin;
    mixer SNR >= 100 dB (the reference's mixer quality class --
    bench_mixers.cpp measures its table algos at ~90-110 dB)."""

    n = 4096
    k0, dk = 256, 512
    x = np.exp(2j * np.pi * k0 * np.arange(n) / n).astype(np.complex64)
    m = dsp.Mixer(dk / n)
    y = np.asarray(m.shift(jnp.asarray(x)))
    spec = np.fft.fft(y)
    p = np.abs(spec) ** 2
    sig = p[k0 + dk]
    p[k0 + dk] = 0
    snr = 10 * np.log10(sig / p.sum())
    assert snr > 100, f"mixer SNR {snr:.1f} dB"


def test_mixer_parity_wrappers():
    """Each ALGO reproduces its own reference numerics (pf_mixer.cpp):
    A is the exact NCO at phase k*D; C/D carry the family's one-sample
    offset ((k+1)*D); B is table-quantized; E renormalizes per 128 block;
    I runs the magic-circle recursion.  See dsp/mixer.py module notes."""

    n = 256
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    rate = 0.05
    d_ = 2 * np.pi * rate
    k = np.arange(n)

    ref_a = np.asarray(x) * np.exp(1j * d_ * k)           # phase k*D
    ref_c = np.asarray(x) * np.exp(1j * d_ * (k + 1))     # phase (k+1)*D

    out, nxt = dsp.shift_math_cc(jnp.asarray(x), rate, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref_a, atol=1e-5)
    assert abs((nxt - (d_ * n) % (2 * np.pi))) < 1e-3

    td = dsp.shift_table_init(65536)
    out, _ = dsp.shift_table_cc(jnp.asarray(x), rate, td, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref_a, atol=3e-4)  # table quantization

    d = dsp.shift_addfast_init(rate)
    out, nxt = dsp.shift_addfast_cc(jnp.asarray(x), d, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref_c, atol=2e-4)

    du = dsp.shift_unroll_init(rate, 256)
    out, _ = dsp.shift_unroll_cc(jnp.asarray(x), du, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref_c, atol=2e-5)
    with pytest.raises(ValueError):
        dsp.shift_unroll_cc(jnp.asarray(np.zeros(512, np.complex64)), du)

    dl = dsp.shift_limited_unroll_init(rate)
    out = dsp.shift_limited_unroll_cc(jnp.asarray(x), dl)
    np.testing.assert_allclose(np.asarray(out), ref_a, atol=2e-4)
    # streaming continuity: two chunks == one call
    dl2 = dsp.shift_limited_unroll_init(rate)
    o1 = dsp.shift_limited_unroll_cc(jnp.asarray(x[:128]), dl2)
    o2 = dsp.shift_limited_unroll_cc(jnp.asarray(x[128:]), dl2)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(o1), np.asarray(o2)]), np.asarray(out), atol=2e-5
    )

    ro = dsp.shift_recursive_osc_init(rate, 0.0)
    out = dsp.shift_recursive_osc_cc(jnp.asarray(x), ro)
    np.testing.assert_allclose(np.asarray(out), ref_a, atol=5e-4)  # recursion drift

    ro2 = dsp.shift_recursive_osc_init(rate, 0.25)
    car = np.asarray(dsp.gen_recursive_osc_c(128, ro2))
    np.testing.assert_allclose(
        car, np.exp(1j * (0.25 + d_ * np.arange(128))), atol=5e-4
    )

    assert dsp.have_sse_shift_mixer_impl()


# ---------------------------------------------------------------------------
# Carriers
# ---------------------------------------------------------------------------

def test_carrier_float_patterns():
    a = 127.0 / 128.0
    dc = np.asarray(dsp.generate_dc_f(8))
    np.testing.assert_array_equal(dc, np.full(8, a, np.complex64))
    pos = np.asarray(dsp.generate_pos_fs4_f(8))
    np.testing.assert_allclose(pos[:4], [a, 1j * a, -a, -1j * a])
    neg = np.asarray(dsp.generate_neg_fs4_f(8))
    np.testing.assert_allclose(neg[:4], [a, -1j * a, -a, 1j * a])
    # +fs/4 carrier spectrum: all energy at bin N/4
    spec = np.abs(np.fft.fft(pos))
    assert np.argmax(spec) == 2  # N=8 -> bin 2 == fs/4


def test_carrier_s16_patterns():
    sm, m = 32767, 16383
    assert np.asarray(dsp.generate_dc_s16(4)).tolist() == [[sm, 0]] * 4
    assert np.asarray(dsp.generate_pos_fs4_s16(4)).tolist() == [[sm, 0], [0, sm], [-sm, 0], [0, -sm]]
    assert np.asarray(dsp.generate_neg_fs4_s16(4)).tolist() == [[sm, 0], [0, -sm], [-sm, 0], [0, sm]]
    # combined variants: exact reference values (pf_carrier.cpp:150-298)
    assert np.asarray(dsp.generate_dc_pos_fs4_s16(4)).tolist() == [[2 * m, 0], [m, m], [0, 0], [m, -m]]
    assert np.asarray(dsp.generate_dc_neg_fs4_s16(4)).tolist() == [[2 * m, 0], [m, -m], [0, 0], [m, m]]
    assert np.asarray(dsp.generate_pos_neg_fs4_s16(4)).tolist() == [[m, -m], [-m, m], [-m, m], [m, -m]]
    assert np.asarray(dsp.generate_dc_pos_neg_fs4_s16(4)).tolist() == [[2 * m, -m], [0, m], [0, m], [2 * m, -m]]
    assert np.asarray(dsp.generate_pos_neg_fs2_s16(4)).tolist() == [[m, 0], [-m, 0], [m, 0], [-m, 0]]
    assert np.asarray(dsp.generate_dc_pos_neg_fs2_s16(4)).tolist() == [[m, m], [-m, m], [m, m], [-m, m]]
    # interleaved C-buffer layout
    flat = np.asarray(dsp.generate_pos_fs4_s16(4, interleaved=True))
    assert flat.tolist() == [sm, 0, 0, sm, -sm, 0, 0, -sm]


def test_carrier_size_contract():
    with pytest.raises(ValueError):
        dsp.generate_pos_fs4_f(6)  # must be multiple of 4


# ---------------------------------------------------------------------------
# CIC DDC vs direct emulation of the reference loop
# ---------------------------------------------------------------------------

def _cic_reference(x_c, outsize, factor, rate, sineshift=12, state=None):
    """Float64 emulation of cicddc_cs16_c (pf_cic.cpp:138-191) with an
    ideal carrier (the int16 table replaced by exact trig, amplitude 1;
    gain adjusted accordingly).  Returns (out, state)."""

    if state is None:
        state = dict(phase=0.0, ig0=0j, ig1=0j, comb0=0j, comb1=0j)
    ig0, ig1 = state["ig0"], state["ig1"]
    comb0, comb1 = state["comb0"], state["comb1"]
    phase = state["phase"]
    gain = 1.0 / 32767.0 / factor**3
    out = np.zeros(outsize, np.complex128)
    inp = 0
    for k in range(outsize):
        ig2 = 0j
        for i in range(factor):
            theta = 2 * np.pi * phase
            carrier = -np.sin(theta) + 1j * np.cos(theta)  # m_c + i*m_d
            inv = x_c[inp + i] * carrier
            phase = (phase + rate) % 1.0
            ig2 += ig1
            ig1 += ig0
            ig0 += inv
        inp += factor
        out0 = ig2 - comb0
        comb0 = ig2
        out1 = out0 - comb1
        comb1 = out0
        out[k] = out1 * gain
    return out, dict(phase=phase, ig0=ig0, ig1=ig1, comb0=comb0, comb1=comb1)


@pytest.mark.parametrize("factor", [1, 2, 4, 8, 16])
def test_cic_matches_reference_loop(factor):
    """The strided-FIR formulation must match the C integrator/comb loop."""

    outsize = 64
    n = outsize * factor
    x = RNG.integers(-32000, 32000, size=(n, 2)).astype(np.int16)
    x_c = x[:, 0].astype(np.float64) + 1j * x[:, 1].astype(np.float64)
    rate = 0.1239013671875  # representable-ish in 2^-32 steps

    ref, _ = _cic_reference(x_c, outsize, factor, rate)

    ddc, st = dsp.cicddc_init(factor)
    out, _ = dsp.cicddc_apply(ddc, st, jnp.asarray(x.reshape(-1)), rate, fmt="cs16")
    out = np.asarray(out)

    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(out - ref)) < 2e-4 * scale, (
        f"factor={factor}: max err {np.max(np.abs(out - ref))} scale {scale}"
    )


def test_cic_streaming_state():
    """Two chunked calls == one long call (integrator state carried)."""

    factor, outsize = 8, 40
    n = outsize * factor
    x = RNG.integers(-32000, 32000, size=n).astype(np.int16)
    ddc, st = dsp.cicddc_init(factor)
    full, _ = dsp.cicddc_apply(ddc, st, jnp.asarray(x), 0.05, fmt="s16")
    st2 = ddc.init_state()
    h = n // 2
    a, st2 = dsp.cicddc_apply(ddc, st2, jnp.asarray(x[:h]), 0.05, fmt="s16")
    b, _ = dsp.cicddc_apply(ddc, st2, jnp.asarray(x[h:]), 0.05, fmt="s16")
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a), np.asarray(b)]), np.asarray(full), atol=1e-5
    )


def test_cic_s16_real_matches_complex_with_zero_imag():
    factor = 4
    n = 32 * factor
    xr = RNG.integers(-32000, 32000, size=n).astype(np.int16)
    ddc, st = dsp.cicddc_init(factor)
    out_r, _ = dsp.cicddc_apply(ddc, st, jnp.asarray(xr), 0.2, fmt="s16")
    xc = np.zeros((n, 2), np.int16)
    xc[:, 0] = xr
    out_c, _ = dsp.cicddc_apply(ddc, ddc.init_state(), jnp.asarray(xc.reshape(-1)), 0.2, fmt="cs16")
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_c), atol=1e-6)


def test_cic_u8_offset():
    factor = 4
    n = 16 * factor
    # constant 127-ish input maps to near zero after the offset
    x = np.full((n, 2), 127, np.uint8)
    ddc, st = dsp.cicddc_init(factor)
    out, _ = dsp.cicddc_apply(ddc, st, jnp.asarray(x.reshape(-1)), 0.0, fmt="cu8")
    # (127<<8) - 32614 = -102: small residual, scaled by 1/32767
    assert np.max(np.abs(np.asarray(out))) < 0.02


def test_cic_decimation_lowpass():
    """A high-frequency tone must be strongly attenuated vs DC gain."""

    factor = 16
    n = 256 * factor
    t = np.arange(n)
    dc = np.ones(n, np.complex64)
    tone = np.exp(2j * np.pi * 0.45 * t).astype(np.complex64)
    ddc, _ = dsp.cicddc_init(factor)
    out_dc, _ = ddc.apply(ddc.init_state(), jnp.asarray(dc), 0.0, fmt="f")
    out_tone, _ = ddc.apply(ddc.init_state(), jnp.asarray(tone), 0.0, fmt="f")
    a_dc = np.mean(np.abs(np.asarray(out_dc)[8:]))
    a_tone = np.mean(np.abs(np.asarray(out_tone)[8:]))
    assert a_dc / max(a_tone, 1e-12) > 1000  # > 60 dB CIC rejection


def test_mixer_apply_split_matches_complex():
    """Planar mixer (the TPU path) must match the complex-dtype mixer."""

    import jax.numpy as jnp
    from pffft_tpu.dsp import mixer_apply, mixer_apply_split, mixer_init

    r = np.random.default_rng(0)
    x = (r.standard_normal(500) + 1j * r.standard_normal(500)).astype(np.complex64)
    st = mixer_init(0.217, 1.1)
    ref, st_a = mixer_apply(st, jnp.asarray(x))
    (gr, gi), st_b = mixer_apply_split(st, jnp.real(jnp.asarray(x)), jnp.imag(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(gr), np.real(np.asarray(ref)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gi), np.imag(np.asarray(ref)), atol=1e-6)
    assert int(st_a.phase_fp) == int(st_b.phase_fp)
