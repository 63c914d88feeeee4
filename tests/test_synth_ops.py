"""Oscillator bank + control resampling vs analytic signals and torch parity."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from sot_tpu.ops.oscillator import (
    oscillator_bank,
    angular_cumsum,
    get_harmonic_frequencies,
    remove_above_nyquist,
)
from sot_tpu.ops.resample import resample, upsample_with_windows


def test_harmonic_frequencies():
    f0 = jnp.full((2, 3, 1), 100.0)
    h = get_harmonic_frequencies(f0, 4)
    assert h.shape == (2, 3, 4)
    np.testing.assert_allclose(h[0, 0], [100.0, 200.0, 300.0, 400.0], rtol=1e-6)


def test_remove_above_nyquist():
    freqs = jnp.array([[[100.0, 7999.0, 8000.0, 9000.0]]])
    amps = jnp.ones_like(freqs)
    out = remove_above_nyquist(freqs, amps, 16000)
    np.testing.assert_allclose(out[0, 0], [1.0, 1.0, 0.0, 0.0])


def test_oscillator_bank_pure_tone():
    """Constant f -> sin(2 pi f n / sr) with phase starting at the FIRST step.

    cumsum is inclusive: phase[0] = omega (not 0), matching the reference.
    """
    sr, n, f = 16000, 1024, 440.0
    freqs = jnp.full((1, n, 1), f)
    amps = jnp.ones((1, n, 1))
    audio = oscillator_bank(freqs, amps, sample_rate=sr)
    t = (np.arange(n) + 1) * 2 * np.pi * f / sr
    np.testing.assert_allclose(audio[0], np.sin(t), atol=1e-3)


def test_oscillator_bank_sums_sinusoids():
    sr, n = 16000, 512
    freqs = jnp.concatenate(
        [jnp.full((1, n, 1), 440.0), jnp.full((1, n, 1), 880.0)], axis=-1
    )
    amps = jnp.concatenate([jnp.full((1, n, 1), 0.5), jnp.full((1, n, 1), 0.25)], axis=-1)
    audio = oscillator_bank(freqs, amps, sample_rate=sr)
    t1 = (np.arange(n) + 1) * 2 * np.pi * 440.0 / sr
    t2 = (np.arange(n) + 1) * 2 * np.pi * 880.0 / sr
    np.testing.assert_allclose(audio[0], 0.5 * np.sin(t1) + 0.25 * np.sin(t2), atol=1e-3)


def test_angular_cumsum_matches_plain_mod_2pi():
    rng = np.random.default_rng(0)
    omega = rng.uniform(0, 0.5, (2, 4096, 3)).astype(np.float32)
    plain = np.cumsum(omega.astype(np.float64), axis=1) % (2 * np.pi)
    chunked = angular_cumsum(jnp.asarray(omega), chunk_size=1000)
    # sin() of both should agree (phase equal mod 2pi)
    np.testing.assert_allclose(np.sin(chunked), np.sin(plain), atol=1e-3)
    assert (np.asarray(chunked) >= 0).all() and (np.asarray(chunked) < 2 * np.pi + 1e-5).all()


def test_oscillator_bank_angular_cumsum_agrees():
    rng = np.random.default_rng(1)
    freqs = jnp.asarray(rng.uniform(40, 2000, (2, 2048, 4)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0, 1, (2, 2048, 4)).astype(np.float32))
    a = oscillator_bank(freqs, amps, use_angular_cumsum=False)
    b = oscillator_bank(freqs, amps, use_angular_cumsum=True)
    np.testing.assert_allclose(a, b, atol=2e-2)


def _torch_upsample_with_windows(inputs, n_timesteps, add_endpoint=True):
    """Reference OLA semantics via torch.nn.functional.fold (ddsp.py:121-205)."""
    x = torch.as_tensor(np.asarray(inputs), dtype=torch.float32)
    if add_endpoint:
        x = torch.cat([x, x[:, -1:, :]], dim=1)
    n_frames = x.shape[1]
    n_intervals = n_frames - 1
    hop_size = n_timesteps // n_intervals
    window_length = 2 * hop_size
    window = torch.hann_window(window_length)
    xt = x.permute(0, 2, 1)[:, :, None, :]
    xw = xt * window[None, None, :, None]
    n_channels = xt.shape[1]
    xw = xw.reshape((-1, n_channels * window_length, n_frames))
    out = torch.nn.functional.fold(
        xw, output_size=(1, n_timesteps + window_length),
        kernel_size=(1, window_length), stride=(1, hop_size),
    )
    out = out.squeeze(2).permute(0, 2, 1)
    return out[:, hop_size:-hop_size, :].numpy()


def test_upsample_with_windows_matches_torch_fold():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 16, 5)).astype(np.float32)
    mine = upsample_with_windows(jnp.asarray(x), 4096)
    ref = _torch_upsample_with_windows(x, 4096)
    assert mine.shape == (3, 4096, 5)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_upsample_with_windows_constant_is_constant():
    x = jnp.full((1, 16, 2), 0.7)
    out = upsample_with_windows(x, 4096)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_resample_bilinear_matches_torch_interpolate():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 4)).astype(np.float32)
    mine = resample(jnp.asarray(x), 4096, method="bilinear", add_endpoint=True)
    xt = torch.as_tensor(x).permute(0, 2, 1)[:, :, :, None]
    ref = torch.nn.functional.interpolate(
        xt, size=[4096, 1], mode="bilinear", align_corners=False
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resample_bilinear_align_corners():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 2)).astype(np.float32)
    mine = resample(jnp.asarray(x), 64, method="bilinear", add_endpoint=False)
    xt = torch.as_tensor(x).permute(0, 2, 1)[:, :, :, None]
    ref = torch.nn.functional.interpolate(
        xt, size=[64, 1], mode="bilinear", align_corners=True
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resample_bicubic_matches_torch_interpolate():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 4)).astype(np.float32)
    mine = resample(jnp.asarray(x), 4096, method="bicubic", add_endpoint=True)
    xt = torch.as_tensor(x).permute(0, 2, 1)[:, :, :, None]
    ref = torch.nn.functional.interpolate(
        xt, size=[4096, 1], mode="bicubic", align_corners=False
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resample_bicubic_align_corners():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 2)).astype(np.float32)
    mine = resample(jnp.asarray(x), 64, method="bicubic", add_endpoint=False)
    xt = torch.as_tensor(x).permute(0, 2, 1)[:, :, :, None]
    ref = torch.nn.functional.interpolate(
        xt, size=[64, 1], mode="bicubic", align_corners=True
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resample_bicubic_downsample_matches_torch():
    # downsampling exercises negative/out-of-range tap coords (border clamp)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    mine = resample(jnp.asarray(x), 24, method="bicubic", add_endpoint=True)
    xt = torch.as_tensor(x).permute(0, 2, 1)[:, :, :, None]
    ref = torch.nn.functional.interpolate(
        xt, size=[24, 1], mode="bicubic", align_corners=False
    )[:, :, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resample_rank_handling():
    x = jnp.linspace(0.0, 1.0, 16)
    assert resample(x, 64).shape == (64,)
    assert resample(x[None], 64).shape == (1, 64)


def test_upsample_errors():
    with pytest.raises(ValueError):
        upsample_with_windows(jnp.ones((1, 16, 1)), 10)  # downsampling
    with pytest.raises(ValueError):
        upsample_with_windows(jnp.ones((1, 16, 1)), 4097)  # not divisible


def test_oscillator_grad_finite():
    rng = np.random.default_rng(5)
    freqs = jnp.asarray(rng.uniform(40, 2000, (1, 512, 3)).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0.1, 1, (1, 512, 3)).astype(np.float32))

    def loss(f, a):
        return jnp.sum(oscillator_bank(f, a) ** 2)

    gf, ga = jax.grad(loss, argnums=(0, 1))(freqs, amps)
    assert np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(ga)).all()
