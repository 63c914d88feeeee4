"""Constant-Q transform as a precomputed kernel-bank matmul.

The reference wraps nnAudio's CQT1992v2 (features.py:116-188) — a conv1d with
log-spaced, hann-windowed complex Morlet kernels. Here the kernel bank is
built host-side with numpy at trace time and the transform is framing (static
gather) + one big real matmul — the natural MXU mapping — instead of a
translated conv.

Semantics (librosa/nnAudio-parity, derived from the CQT1992v2 definition):
  * Q = filter_scale / (2^(1/bins_per_octave) - 1)
  * bin frequencies f_k = fmin * 2^(k / bins_per_octave)
  * kernel k: hann(l_k) * exp(2*pi*i*f_k*t/fs) / l_k with l_k = ceil(Q*fs/f_k),
    centred in a power-of-2 width, L1-normalised, scaled by sqrt(l_k)
    ('librosa' normalisation)
  * center=True pads kernel_width//2 of zeros each side (pad_mode='constant');
    frames advance by hop_length
  * output magnitude |CQT| with gradient-safe backward

The kernel bank is cached per parameter tuple (it is ~75 MB for the paper's
285-bin 16 kHz setup and takes a moment to build).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.stft import _complex_abs

Array = jax.Array


@functools.lru_cache(maxsize=8)
def build_cqt_kernels(
    sr: int,
    fmin: float,
    n_bins: int,
    bins_per_octave: int,
    filter_scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Build the complex CQT kernel bank.

    Returns (kernels_real, kernels_imag, frequencies, kernel_width) where
    kernels_* have shape [kernel_width, n_bins] (matmul-ready) and already
    include the librosa-style sqrt(l_k) output scaling.
    """
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    if np.max(freqs) > sr / 2.0:
        raise ValueError(
            f"The top bin {np.max(freqs):.1f} Hz exceeds the Nyquist frequency; "
            f"reduce n_bins."
        )
    max_len = int(np.ceil(q * sr / fmin))
    kernel_width = int(2 ** math.ceil(math.log2(max_len)))

    kernels = np.zeros((n_bins, kernel_width), dtype=np.complex64)
    for k in range(n_bins):
        f = freqs[k]
        l = int(np.ceil(q * sr / f))
        # centre the support; odd lengths sit one sample earlier
        start = int(np.ceil(kernel_width / 2.0 - l / 2.0)) - (l % 2)
        n = np.arange(-(l // 2), l - (l // 2))
        window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(l) / l)  # periodic hann
        sig = window * np.exp(2j * np.pi * f * n / sr) / l
        sig = sig / np.linalg.norm(sig, 1)
        # librosa normalisation folds sqrt(l_k) into the kernel itself
        kernels[k, start:start + l] = sig * np.sqrt(l)

    k_real = np.ascontiguousarray(kernels.real.T.astype(np.float32))
    # conv correlation with the imaginary part is negated in CQT1992v2
    k_imag = np.ascontiguousarray((-kernels.imag.T).astype(np.float32))
    lengths = np.ceil(q * sr / freqs).astype(np.int64)
    return k_real, k_imag, freqs.astype(np.float32), kernel_width, lengths


def _use_pallas_cqt(batch: int, kernel_width: int, hop: int,
                    n_frames: int) -> bool:
    """SOT_TPU_CQT_PALLAS gate (A/B-adopted like the other kernel gates);
    forward-only — the CQT is the feature extractor on input data, so no
    gradient ever flows through it (trainer.py:164)."""
    from sot_tpu.ops.numerics import env_flag

    if not env_flag("SOT_TPU_CQT_PALLAS"):
        return False
    from sot_tpu.ops.pallas.cqt import supported
    from sot_tpu.ops.pallas.sot import _interpret

    if not supported(batch, kernel_width, hop, n_frames):
        return False
    if _interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def cqt_magnitude(
    audio: Array,
    sr: int = 16000,
    fmin: float = 32.7,
    n_bins: int = 285,
    bins_per_octave: int = 36,
    hop_length: int = 256,
    filter_scale: float = 1.0,
    center: bool = True,
) -> Array:
    """|CQT| of [batch, T] audio -> [batch, n_frames, n_bins] (time-major).

    n_frames = floor(T / hop_length) + 1 with center=True.
    """
    audio = jnp.asarray(audio, jnp.float32)
    k_real, k_imag, _, kernel_width, _lengths = build_cqt_kernels(
        sr, fmin, n_bins, bins_per_octave, filter_scale
    )
    if center:
        pad = kernel_width // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    total = audio.shape[-1]
    n_frames = (total - kernel_width) // hop_length + 1
    bank = jnp.asarray(np.concatenate([k_real, k_imag], axis=1))
    if _use_pallas_cqt(audio.shape[0], kernel_width, hop_length, n_frames):
        # Fused Pallas frame-slab matmul: the hop (256) is ~1% of the
        # kernel width (32768), so gathering frames materializes the
        # signal 128x over in HBM — the step's #1 single op
        # (results/round4/profile_step.txt). The kernel keeps the padded
        # signal in VMEM and slices windows in-register instead.
        from sot_tpu.ops.pallas.cqt import cqt_project

        proj = cqt_project(audio, bank, hop_length, n_frames, 2 * n_bins)
    else:
        # One fused real matmul for both quadratures: [B, F, W] @
        # [W, 2*n_bins]. (A strided conv lowering was tried and measured
        # ~1.3x slower than the explicit frame gather + MXU matmul.)
        idx = (np.arange(n_frames)[:, None] * hop_length
               + np.arange(kernel_width)[None, :])
        frames = audio[:, idx]  # [batch, n_frames, kernel_width]
        proj = jnp.einsum("bfw,wn->bfn", frames, bank,
                          preferred_element_type=jnp.float32)
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    return _complex_abs(re, im)


def cqt_frequencies(sr: int = 16000, fmin: float = 32.7, n_bins: int = 285,
                    bins_per_octave: int = 36) -> np.ndarray:
    return (fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)).astype(np.float32)
