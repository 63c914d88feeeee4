"""CQT kernel bank + feature transform factory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sot_tpu.ops.cqt import build_cqt_kernels, cqt_magnitude, cqt_frequencies
from sot_tpu.features import get_transform, STFT, CQT, Identity


def test_kernel_bank_geometry():
    k_real, k_imag, freqs, width, _lengths = build_cqt_kernels(16000, 32.7, 285, 36)
    assert k_real.shape == (width, 285)
    # power-of-2 width covering the longest (lowest-frequency) kernel
    q = 1.0 / (2 ** (1 / 36) - 1)
    max_len = int(np.ceil(q * 16000 / 32.7))
    assert width >= max_len and (width & (width - 1)) == 0
    # geometric frequency spacing, 3 bins/semitone
    np.testing.assert_allclose(freqs[1:] / freqs[:-1], 2 ** (1 / 36), rtol=1e-6)
    assert freqs[-1] < 8000.0


def test_cqt_n_frames_and_shape():
    audio = jnp.zeros((2, 4095))
    out = cqt_magnitude(audio, hop_length=256)
    # center=True conv arithmetic: floor(4095/256)+1 = 16 frames
    assert out.shape == (2, 16, 285)


def test_cqt_peak_at_tone_frequency():
    sr = 16000
    freqs = cqt_frequencies(sr, 32.7, 285, 36)
    rng = np.random.default_rng(0)
    for f0 in (110.0, 440.0, 1760.0):
        t = np.arange(4095) / sr
        audio = jnp.asarray(np.sin(2 * np.pi * f0 * t, dtype=np.float32))[None]
        out = np.asarray(cqt_magnitude(audio, hop_length=256))
        peak_bin = out[0, 8].argmax()  # middle frame
        peak_freq = freqs[peak_bin]
        # peak within half a semitone of the tone
        assert abs(np.log2(peak_freq / f0)) < 1 / 24, (f0, peak_freq)


def test_cqt_log_frequency_equivariance():
    """An octave shift of the input moves the response by 36 bins."""
    sr = 16000
    t = np.arange(4095) / sr
    a1 = jnp.asarray(np.sin(2 * np.pi * 220.0 * t, dtype=np.float32))[None]
    a2 = jnp.asarray(np.sin(2 * np.pi * 440.0 * t, dtype=np.float32))[None]
    o1 = np.asarray(cqt_magnitude(a1))[0, 8]
    o2 = np.asarray(cqt_magnitude(a2))[0, 8]
    assert abs(int(o2.argmax()) - int(o1.argmax()) - 36) <= 1


def test_cqt_grad_finite():
    audio = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4095)),
                        dtype=jnp.float32)
    g = jax.grad(lambda a: jnp.sum(cqt_magnitude(a)))(audio)
    assert np.isfinite(np.asarray(g)).all()


def test_transform_factory_stft():
    tr = get_transform({"type": "stft", "n_fft": 2048, "hop_length": 256,
                        "window": "flattop", "log": False, "center": True,
                        "output_format": "Magnitude"}, 16000)
    assert isinstance(tr, STFT)
    audio = jnp.zeros((2, 4096))
    out = tr(audio)
    assert out.shape == (2, 16, 1025)
    freqs = tr.get_frequencies()
    assert freqs[0] == 0.0 and freqs[-1] == 8000.0


def test_transform_factory_cqt_auto_bins():
    tr = get_transform({"type": "cqt", "fmin": 32.7, "bins_per_semitone": 3,
                        "n_bins": "auto", "hop_length": 256, "log": False,
                        "center": True, "pad_mode": "constant",
                        "output_format": "Complex"}, 16000)
    assert isinstance(tr, CQT)
    assert tr.n_bins == 285
    out = tr(jnp.zeros((1, 4095)))
    assert out.shape == (1, 16, 285)
    f = tr.get_frequencies()
    assert len(f) == 285 and abs(f[0] - 32.7) < 1e-4


def test_transform_factory_identity():
    tr = get_transform("identity", 16000)
    assert isinstance(tr, Identity)
    x = jnp.ones((2, 16))
    assert (tr(x) == x).all()
    assert tr.get_frequencies() is None


def test_stft_transform_reduce_and_log():
    tr = get_transform({"type": "stft", "n_fft": 512, "hop_length": 128}, 16000)
    audio = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4096)),
                        dtype=jnp.float32)
    full = tr(audio)
    red = tr(audio, reduce=True)
    np.testing.assert_allclose(red, np.mean(np.asarray(full), axis=1), atol=1e-6)
    lg = tr(audio, log=True)
    assert (np.asarray(lg) <= np.log(np.asarray(full) + 1e-5) + 1e-4).all()


def test_loudness_matches_torch_reference_semantics():
    """a_weighting/get_loudness vs torch.stft-based reference computation
    (reference features.py:240-288; librosa's A-curve replaced with the
    closed-form IEC 61672 expression it implements)."""
    import torch

    from sot_tpu.features import a_weighting_db, a_weighting_from_audio, get_loudness

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((3, 4096)).astype(np.float32) * 0.3
    num_fft, hop = 1024, 256

    # torch reference path (rectangular window, center=True, unnormalised)
    S = torch.stft(torch.as_tensor(audio.copy()), n_fft=num_fft,
                   hop_length=hop, win_length=num_fft, center=True,
                   return_complex=True)
    power = S.abs().numpy() ** 2  # [batch, freq, frames]
    freqs = np.fft.rfftfreq(num_fft, 1 / 16000)
    aw = 10.0 ** (a_weighting_db(freqs) / 10.0)
    avg_power = (power * aw[None, :, None]).mean(axis=1)  # over freq
    pmin = 10.0 ** -8.0
    ref_db = 10.0 * np.log10(np.maximum(avg_power, pmin))
    ref_db = np.maximum(ref_db, -80.0)

    ours = np.asarray(a_weighting_from_audio(audio, num_fft, hop))
    assert ours.shape == ref_db.shape
    np.testing.assert_allclose(ours, ref_db, rtol=1e-4, atol=1e-3)

    loud = np.asarray(get_loudness(audio[0], hop, num_fft))
    np.testing.assert_allclose(loud, (ref_db[0] + 50.0) / 80.0,
                               rtol=1e-4, atol=1e-3)


def test_a_weighting_known_values():
    # A-weighting is 0 dB at 1 kHz by construction; ~ -19.1 dB at 100 Hz
    from sot_tpu.features import a_weighting_db

    w = a_weighting_db(np.array([1000.0, 100.0, 20.0]))
    assert abs(w[0]) < 0.02
    assert abs(w[1] - (-19.1)) < 0.2
    assert abs(w[2] - (-50.5)) < 0.5
