"""STFT magnitude parity vs torch.stft (the reference's backend) on CPU."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sot_tpu.ops.stft import stft_magnitude, frame_signal, rfft_frequencies
from sot_tpu.ops.windows import hann_window, flattop_window, get_window


def _torch_compute_mag(audio, size, overlap=0.75, window=None):
    """Reference-semantics magnitude via torch.stft (features.py:191-237)."""
    audio = torch.as_tensor(np.asarray(audio), dtype=torch.float32)
    hop = int(size * (1.0 - overlap))
    # tf-style pad_end
    signal_len = audio.shape[1]
    num_frames = -(-signal_len // hop)
    pad = max(0, size + hop * (num_frames - 1) - signal_len)
    if pad:
        audio = torch.nn.functional.pad(audio, (0, pad))
    if window is None:
        win = torch.hann_window(size)
    else:
        win = torch.as_tensor(np.asarray(window), dtype=torch.float32)
    s = torch.stft(audio, n_fft=size, hop_length=hop, win_length=size, window=win,
                   center=False, normalized=True, return_complex=True)
    return s.abs().numpy()  # (batch, freq, frames)


def test_windows_match_scipy_torch():
    from scipy.signal import get_window as scipy_get_window

    for n in (64, 512, 2048):
        np.testing.assert_allclose(
            hann_window(n), torch.hann_window(n).numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            flattop_window(n), scipy_get_window("flattop", n, fftbins=True), atol=1e-6
        )
        np.testing.assert_allclose(
            get_window("hann", n), scipy_get_window("hann", n, fftbins=True), atol=1e-6
        )


def test_frame_signal_geometry():
    x = jnp.arange(4096, dtype=jnp.float32)[None]
    frames = frame_signal(x, 2048, 256, pad_end=True)
    assert frames.shape == (1, 16, 2048)
    np.testing.assert_allclose(frames[0, 3, :4], np.arange(768, 772), atol=0)
    # last frame is zero-padded past the end
    assert frames[0, 15, -1] == 0.0


def test_stft_magnitude_matches_torch_hann():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((3, 4096)).astype(np.float32)
    for size in (2048, 512, 64):
        mine = stft_magnitude(jnp.asarray(audio), size=size, overlap=0.75)
        ref = _torch_compute_mag(audio, size)  # (batch, freq, frames)
        np.testing.assert_allclose(
            np.moveaxis(ref, 1, 2), np.asarray(mine), atol=2e-5,
            err_msg=f"size={size}",
        )


def test_stft_magnitude_matches_torch_flattop():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 4096)).astype(np.float32)
    size, hop = 2048, 256
    win = np.asarray(flattop_window(size))
    mine = stft_magnitude(jnp.asarray(audio), size=size, overlap=1 - hop / size,
                          window="flattop")
    ref = _torch_compute_mag(audio, size, overlap=1 - hop / size, window=win)
    assert mine.shape == (2, 16, 1025)
    np.testing.assert_allclose(np.moveaxis(ref, 1, 2), np.asarray(mine), atol=2e-5)


def test_rfft_frequencies():
    freqs = rfft_frequencies(2048, 16000)
    tref = torch.fft.rfftfreq(2048, d=1 / 16000).numpy()
    np.testing.assert_allclose(freqs, tref, atol=1e-6)
    assert freqs[-1] == 8000.0


def test_magnitude_gradient_no_nan_at_zero():
    # silence -> zero spectrum; gradient must be finite (reference's add_in_sqrt concern)
    audio = jnp.zeros((1, 512))
    grad = jax.grad(lambda a: jnp.sum(stft_magnitude(a, size=64)))(audio)
    assert np.isfinite(np.asarray(grad)).all()


def test_stft_jit_and_grad():
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    fn = jax.jit(lambda a: jnp.sum(stft_magnitude(a, size=256) ** 2))
    g = jax.grad(fn)(audio)
    assert g.shape == audio.shape
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on a random direction
    v = rng.standard_normal(audio.shape).astype(np.float32)
    eps = 1e-3
    fd = (fn(audio + eps * v) - fn(audio - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.sum(np.asarray(g) * v), fd, rtol=2e-2)


@pytest.mark.parametrize("size", [64, 256, 2048])
def test_dft_matmul_matches_rfft(size, monkeypatch):
    """SOT_TPU_DFT_MATMUL=1 swaps the rfft for one MXU DFT matmul with
    identical values and gradients (MSS hot-path alternative)."""
    rng = np.random.default_rng(size)
    audio = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))

    def loss(a):
        return jnp.sum(stft_magnitude(a, size=size, overlap=0.75) ** 2)

    monkeypatch.delenv("SOT_TPU_DFT_MATMUL", raising=False)
    base, gbase = jax.value_and_grad(loss)(audio)
    monkeypatch.setenv("SOT_TPU_DFT_MATMUL", "1")
    got, ggot = jax.value_and_grad(loss)(audio)
    np.testing.assert_allclose(float(got), float(base), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gbase),
                               rtol=1e-4, atol=1e-4)
