"""FIR / fft_convolve chain vs torch reference semantics."""

import numpy as np
import torch
import jax.numpy as jnp

from sot_tpu.ops.fir import (
    frequency_impulse_response,
    apply_window_to_impulse_response,
    fft_convolve,
    frequency_filter,
    slope_frequency_response,
    get_fft_size,
    crop_and_compensate_delay,
)


def test_get_fft_size():
    assert get_fft_size(4096, 128) == 8192
    assert get_fft_size(100, 29) == 128


def test_slope_frequency_response():
    out = np.asarray(slope_frequency_response(jnp.asarray(6.0), n_freqs=65, f_ref=500.0))
    assert out.shape == (1, 1, 65)
    freqs = np.linspace(0, 8000, 65)
    # unity below f_ref
    assert np.allclose(out[0, 0][freqs <= 500], 1.0)
    # one octave above f_ref: -6 dB => factor 0.5
    idx = np.argmin(np.abs(freqs - 1000.0))
    np.testing.assert_allclose(out[0, 0, idx], 10 ** (-6 / 20) ** np.log2(freqs[idx] / 500),
                               rtol=1e-4)


def _torch_apply_window_to_ir(ir, window_size=0, causal=False):
    ir = torch.as_tensor(np.asarray(ir))
    restore = ir.ndim == 2
    if restore:
        ir = ir[:, None, :]
    if causal:
        ir = torch.roll(ir, shifts=(ir.shape[-1]) // 2, dims=-1)
    ir_size = int(ir.shape[-1])
    if (window_size <= 0) or (window_size > ir_size):
        window_size = ir_size
    window = torch.hann_window(window_size)
    padding = ir_size - window_size
    if padding > 0:
        half_idx = (window_size + 1) // 2
        window = torch.cat([window[half_idx:], torch.zeros([padding]), window[:half_idx]], 0)
    else:
        window = torch.roll(window, shifts=(len(window)) // 2, dims=-1)
    out = window[None, None, :] * ir
    if padding > 0:
        first_half_start = (ir_size - (half_idx - 1)) + 1
        second_half_end = half_idx + 1
        out = torch.cat([out[..., first_half_start:], out[..., :second_half_end]], -1)
    else:
        out = torch.roll(out, shifts=(out.shape[-1]) // 2, dims=-1)
    if restore:
        out = out[:, 0, :]
    return out.numpy()


def test_apply_window_to_ir_matches_torch():
    rng = np.random.default_rng(0)
    for shape, ws in (((2, 128), 0), ((2, 3, 128), 0), ((2, 128), 64), ((1, 2, 64), 33)):
        ir = rng.standard_normal(shape).astype(np.float32)
        mine = apply_window_to_impulse_response(jnp.asarray(ir), window_size=ws)
        ref = _torch_apply_window_to_ir(ir, window_size=ws)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_frequency_impulse_response_matches_torch():
    rng = np.random.default_rng(1)
    mags = rng.uniform(0, 1, (2, 65)).astype(np.float32)
    mine = frequency_impulse_response(jnp.asarray(mags))
    t_ir = torch.fft.irfft(torch.as_tensor(mags), dim=-1).numpy()
    ref = _torch_apply_window_to_ir(t_ir, 0)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_fft_convolve_identity_filter():
    """An impulse IR (delta) should return the audio unchanged (same pad)."""
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((2, 1024)).astype(np.float32)
    ir = np.zeros((2, 128), np.float32)
    # group delay start = (128-1)//2 - 1 = 62; delta placed there passes through
    ir[:, 62] = 1.0
    out = fft_convolve(jnp.asarray(audio), jnp.asarray(ir), padding="same")
    assert out.shape == (2, 1024)
    np.testing.assert_allclose(out, audio, atol=1e-4)


def test_fft_convolve_matches_direct_convolution():
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((1, 512)).astype(np.float32)
    ir = rng.standard_normal((1, 32)).astype(np.float32)
    out = fft_convolve(jnp.asarray(audio), jnp.asarray(ir), padding="valid",
                       delay_compensation=0)
    full = np.convolve(audio[0], ir[0], mode="full")
    assert out.shape[-1] == 512 + 32 - 1
    np.testing.assert_allclose(out[0], full, atol=1e-4)


def test_fft_convolve_time_varying_shapes():
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((2, 1024)).astype(np.float32)
    irs = rng.standard_normal((2, 4, 64)).astype(np.float32)
    out = fft_convolve(jnp.asarray(audio), jnp.asarray(irs), padding="same")
    assert out.shape == (2, 1024)
    out_cf = fft_convolve(jnp.asarray(audio), jnp.asarray(irs), padding="same",
                          cross_fade=True)
    assert out_cf.shape == (2, 1024)
    assert np.isfinite(np.asarray(out_cf)).all()


def test_frequency_filter_rolloff_attenuates_highs():
    """-6 dB/oct filtered white noise must lose high-frequency energy."""
    rng = np.random.default_rng(5)
    audio = rng.standard_normal((1, 4096)).astype(np.float32)
    mag = slope_frequency_response(jnp.asarray(6.0), n_freqs=65, f_ref=500.0)[0]
    mag = jnp.broadcast_to(mag, (1, 65))
    out = frequency_filter(jnp.asarray(audio), mag)
    assert out.shape == (1, 4096)
    spec_in = np.abs(np.fft.rfft(audio[0]))
    spec_out = np.abs(np.fft.rfft(np.asarray(out)[0]))
    n = len(spec_in)
    hi_ratio = spec_out[3 * n // 4:].sum() / spec_in[3 * n // 4:].sum()
    lo_ratio = spec_out[: n // 8].sum() / spec_in[: n // 8].sum()
    assert hi_ratio < 0.25 * lo_ratio


def test_batch_mismatch_raises():
    import pytest

    with pytest.raises(ValueError):
        fft_convolve(jnp.ones((2, 100)), jnp.ones((3, 10)))


def test_rolloff_synth_works_under_jit():
    """Regression: the MSS-LogLin roll-off FIR chain must compile under jit
    (windows built as jnp constants became tracers and crashed the
    np-side FIR window assembly)."""
    import jax
    import jax.numpy as jnp

    from sot_tpu.models.synths import Sinusoidal

    dec = Sinusoidal(n_samples=512, sample_rate=16000, amp_scale_fn=None,
                     freq_scale_fn=None, harmonic=True, apply_roll_off=True)
    w = jnp.ones((2, 4, 3)) * 0.3
    f0 = jnp.ones((2, 4, 1)) * 220.0
    out = jax.jit(lambda w, f: dec(w, f))(w, f0)
    assert out.shape == (2, 512)
    g = jax.grad(lambda w: jnp.sum(dec(w, f0) ** 2))(w)
    assert bool(jnp.all(jnp.isfinite(g)))
