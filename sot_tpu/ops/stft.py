"""Batched STFT magnitude for TPU.

Behavioural contract (verified against torch.stft on CPU in tests):
  * tf-style ``pad_end=True`` framing — the window slides until completely
    beyond the signal (reference utils.py:252-275, features.py:191-214)
  * ``center=False``: frame k covers samples [k*hop, k*hop + n_fft)
  * spectrum = rfft(window * frame); ``normalized=True`` divides by
    sqrt(n_fft) (torch.stft convention used throughout the reference)
  * magnitude = |rfft| with a gradient-safe backward (d|z| at z=0 is NaN in
    plain autodiff; the reference carries an unused ``add_in_sqrt`` arg for
    the same reason, features.py:217-237)

TPU notes: framing is a static gather that XLA fuses with the window
multiply; the rfft lowers to the XLA TPU FFT. Frame counts and pad amounts
are Python ints -> static shapes under jit. Output is time-major
(batch, frames, freq) which is the layout every consumer wants
(reference permutes to it at features.py:104-110).
"""

from __future__ import annotations

import functools

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.numerics import pad_for_stft_length
from sot_tpu.ops.windows import get_window, hann_window

Array = jax.Array


@jax.custom_jvp
def _complex_abs(re: Array, im: Array) -> Array:
    return jnp.sqrt(re * re + im * im)


@_complex_abs.defjvp
def _complex_abs_jvp(primals, tangents):
    re, im = primals
    dre, dim = tangents
    mag = jnp.sqrt(re * re + im * im)
    # Forward values exactly match |z|; the tangent clamps the denominator so
    # gradients at spectral zeros are 0 instead of NaN.
    safe = jnp.maximum(mag, 1e-20)
    return mag, (re * dre + im * dim) / safe


def complex_magnitude(z: Array) -> Array:
    """|z| with NaN-free gradient at 0."""
    return _complex_abs(jnp.real(z), jnp.imag(z))


def _frame_gather(audio: Array, n_frames: int, frame_size: int,
                  hop_length: int) -> Array:
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_size)[None, :])
    return audio[..., idx]


def _make_framer(frame_size: int, hop_length: int):
    """Framing with a dense overlap-add VJP when hop divides frame size.

    The gather's default transpose is a scatter-add (measured ~0.5 ms/step
    across the MSS scales). With q = frame_size // hop_length, frame k's
    r-th hop-chunk covers samples [(k+r)h, (k+r+1)h), so the cotangent is
    the sum over r of the frames' r-th chunks shifted by r — reshapes and
    adds only.
    """
    q, rem = divmod(frame_size, hop_length)

    if rem != 0:
        return functools.partial(_frame_gather, frame_size=frame_size,
                                 hop_length=hop_length)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def framer(audio, n_frames):
        return _frame_gather(audio, n_frames, frame_size, hop_length)

    def fwd(audio, n_frames):
        return framer(audio, n_frames), audio.shape

    def bwd(n_frames, shape, dframes):
        t = shape[-1]
        h = hop_length
        lead = dframes.shape[:-2]
        chunks = dframes.reshape(lead + (n_frames, q, h))
        total = jnp.zeros(lead + (n_frames + q - 1, h), dframes.dtype)
        for r in range(q):
            total = total.at[..., r : r + n_frames, :].add(chunks[..., :, r, :])
        flat = total.reshape(lead + ((n_frames + q - 1) * h,))
        flat = flat[..., :t]
        pad = t - flat.shape[-1]
        if pad > 0:
            flat = jnp.pad(flat, [(0, 0)] * (len(lead)) + [(0, pad)])
        return (flat,)

    framer.defvjp(fwd, bwd)
    return framer


@functools.lru_cache(maxsize=64)
def _framer_cached(frame_size: int, hop_length: int):
    return _make_framer(frame_size, hop_length)


def frame_signal(audio: Array, frame_size: int, hop_length: int,
                 pad_end: bool = True) -> Array:
    """Slice audio [..., T] into overlapping frames [..., n_frames, frame_size].

    With ``pad_end=True`` uses tf-style padding: n_frames = ceil(T / hop).
    Purely static shapes; backward is a dense overlap-add (no scatter) when
    hop divides frame_size.
    """
    t = audio.shape[-1]
    if pad_end:
        pad = pad_for_stft_length(t, frame_size, hop_length)
        if pad:
            pad_widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
            audio = jnp.pad(audio, pad_widths)
        n_frames = -(-t // hop_length)
    else:
        n_frames = 1 + (t - frame_size) // hop_length
    return _framer_cached(frame_size, hop_length)(audio, n_frames)


def rfft_frequencies(n_fft: int, sample_rate: float) -> np.ndarray:
    """Bin centre frequencies in Hz (np.fft.rfftfreq semantics)."""
    return np.fft.rfftfreq(n_fft, d=1.0 / sample_rate).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _dft_matrix(n_fft: int) -> np.ndarray:
    """Real-DFT basis [n_fft, 2*(n_fft//2+1)]: frames @ M = [re | im] of
    the rfft. One MXU matmul instead of the XLA TPU FFT — the same
    lowering trick as the CQT kernel bank (ops/cqt.py), with a matmul VJP
    instead of an irfft. f32 table; used at f32 matmul precision."""
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * t[:, None] * k[None, :] / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(
        np.float32)


def _use_dft_matmul(n_fft: int) -> bool:
    from sot_tpu.ops.numerics import env_flag

    return env_flag("SOT_TPU_DFT_MATMUL") and n_fft <= 4096


def _rfft_magnitude(frames: Array, n_fft: int) -> Array:
    """|rfft(frames)| via the gated DFT matmul or the XLA FFT."""
    if _use_dft_matmul(n_fft):
        proj = jnp.dot(frames, jnp.asarray(_dft_matrix(n_fft)),
                       precision=jax.lax.Precision.HIGHEST)
        re, im = jnp.split(proj, 2, axis=-1)
        return _complex_abs(re, im)
    return complex_magnitude(jnp.fft.rfft(frames, axis=-1))


def stft_magnitude(
    audio: Array,
    size: int = 2048,
    overlap: float = 0.75,
    window: Optional[Union[str, Array]] = None,
    pad_end: bool = True,
    normalized: bool = True,
    time_major: bool = True,
    center: bool = False,
) -> Array:
    """Magnitude STFT of [batch, T] audio -> [batch, frames, size//2+1].

    Matches the reference ``compute_mag`` (features.py:191-237): hann window
    by default, center=False, pad_end=True, divided by sqrt(size).
    ``center=True`` reflect-pads size//2 each side and frames without end
    padding (torch.stft center semantics, used by the loudness path,
    reference features.py:251-259); ``window='ones'`` is rectangular.
    """
    audio = jnp.asarray(audio, jnp.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    hop_length = int(size * (1.0 - overlap))
    if window is None:
        win = hann_window(size)
    elif isinstance(window, str):
        win = (jnp.ones(size, jnp.float32) if window == "ones"
               else get_window(window, size))
    else:
        win = jnp.asarray(window, jnp.float32)
    if center:
        # reference stft() end-pads FIRST when both flags are set
        # (features.py:196-198), then torch.stft centre-reflect-pads
        if pad_end:
            pad = pad_for_stft_length(audio.shape[-1], size, hop_length)
            if pad:
                audio = jnp.pad(audio,
                                [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
        half = size // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(half, half)],
                        mode="reflect")
        frames = frame_signal(audio, size, hop_length, pad_end=False)
    else:
        from sot_tpu.ops.pallas.stft import (frontend_applicable,
                                             stft_frontend_projection)

        if (audio.ndim == 2 and isinstance(win, np.ndarray)
                and frontend_applicable(size, hop_length, audio.shape[-1],
                                        pad_end, center)):
            # fused Pallas framing+window+DFT projection (SOT_TPU_STFT_PALLAS)
            proj = stft_frontend_projection(audio, size, hop_length,
                                            tuple(win.tolist()))
            n_bins = size // 2 + 1
            mag = _complex_abs(proj[..., :n_bins], proj[..., n_bins:])
            if normalized:
                mag = mag / np.sqrt(size).astype(np.float32)
            if not time_major:
                mag = jnp.swapaxes(mag, -1, -2)
            return mag[0] if squeeze else mag
        frames = frame_signal(audio, size, hop_length, pad_end=pad_end)
    mag = _rfft_magnitude(frames * win, size)
    if normalized:
        mag = mag / np.sqrt(size).astype(np.float32)
    if not time_major:
        mag = jnp.swapaxes(mag, -1, -2)
    if squeeze:
        mag = mag[0]
    return mag
