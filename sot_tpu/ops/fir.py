"""FIR filtering via frequency sampling + blockwise FFT convolution.

Rebuilds the reference's DDSP filtering chain (ddsp.py:350-769):
  * ``frequency_impulse_response`` — zero-phase IR from a one-sided magnitude
    response via irfft + hann windowing
  * ``fft_convolve`` — time-varying blockwise convolution with overlap-add
    (power-of-2 FFT sizes: the TPU FFT constraint the reference itself notes
    at ddsp.py:496-498), optional sin^2/cos^2 cross-fade between IR frames
  * ``crop_and_compensate_delay`` — group-delay compensation crop
  * ``slope_frequency_response`` — -X dB/octave rolloff curve used by the
    MSS-LogLin experiment's synth (synths.py:121-126)

TPU notes: audio framing is a reshape (frames are non-overlapping here),
overlap-add across the IR tail is a pad+add over the frame axis rather than a
scatter; everything stays fp32 and static-shaped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.windows import hann_window

Array = jax.Array


def apply_window_to_impulse_response(impulse_response: Array, window_size: int = 0,
                                     causal: bool = False) -> Array:
    """Hann-window an IR around its zero-phase peak; return the causal form.

    The whole alignment problem is solved on the HOST as two constant
    vectors — a zero-phase-aligned window and a causal-reorder index list —
    so the device work is one multiply and one static gather.  Semantics
    (including the asymmetric crop offsets) pin the frequency-sampling FIR
    design of reference ddsp.py:417-482, itself derived from Google's
    Apache-2.0 DDSP library.
    """
    ir = jnp.asarray(impulse_response, jnp.float32)
    batch_only = ir.ndim == 2
    if batch_only:
        ir = ir[:, None, :]
    n = ir.shape[-1]
    if causal:  # input given in causal form: rotate the peak to index 0
        ir = jnp.roll(ir, n // 2, axis=-1)

    w = window_size if 0 < window_size <= n else n
    head = (w + 1) // 2  # taps on the peak side of the zero-phase IR
    win = np.asarray(hann_window(w), np.float32)

    if w < n:
        # zero-phase layout: the window's halves sit at the two array ends
        # (peak side wrapped to the back), zeros over the discarded middle
        win_zp = np.concatenate(
            [win[head:], np.zeros(n - w, np.float32), win[:head]])
        # causal reorder cropped to the window support: head-2 leading +
        # head+1 trailing taps (the off-by-one asymmetry is the reference's)
        order = np.concatenate([np.arange(n - head + 2, n), np.arange(head + 1)])
    else:
        # full-length window: plain rotation between zero-phase and causal
        win_zp = np.roll(win, n // 2)
        order = (np.arange(n) - n // 2) % n

    out = ir * jnp.asarray(win_zp)[None, None, :]
    out = out[..., jnp.asarray(order)]
    return out[:, 0, :] if batch_only else out


def frequency_impulse_response(magnitudes: Array, window_size: int = 0) -> Array:
    """One-sided magnitude response -> windowed zero-phase FIR
    (frequency sampling method; reference ddsp.py:382-414)."""
    impulse_response = jnp.fft.irfft(jnp.asarray(magnitudes, jnp.float32), axis=-1)
    return apply_window_to_impulse_response(impulse_response, window_size)


def get_fft_size(frame_size: int, ir_size: int) -> int:
    """Next power-of-2 >= frame_size + ir_size - 1 (TPU FFT constraint)."""
    convolved = ir_size + frame_size - 1
    return int(2 ** math.ceil(math.log2(convolved)))


def crop_and_compensate_delay(audio: Array, audio_size: int, ir_size: int,
                              padding: str, delay_compensation: int) -> Array:
    """Crop convolved audio to compensate the linear-phase group delay
    (reference ddsp.py:695-734)."""
    if padding == "valid":
        crop_size = ir_size + audio_size - 1
    elif padding == "same":
        crop_size = audio_size
    else:
        raise ValueError(f"Padding must be 'valid' or 'same', instead of {padding}.")
    total_size = audio.shape[-1]
    crop = total_size - crop_size
    start = (ir_size - 1) // 2 - 1 if delay_compensation < 0 else delay_compensation
    end = crop - start
    return audio[:, start:total_size - end]


def _cross_fade_frames(frames: Array, frames_prev: Array, overlap: int) -> Array:
    """sin^2/cos^2 cross-fade between each frame's own-IR and previous-IR
    convolutions (reference ddsp.py:636-692; first frame gets no fade)."""
    n = frames.shape[-1]
    ramp = np.linspace(0.0, float(overlap), overlap, dtype=np.float32)
    fade_in_head = np.sin(np.pi * ramp / (2.0 * overlap)) ** 2
    fade_out_head = np.cos(np.pi * ramp / (2.0 * overlap)) ** 2
    fade_in = np.ones(n, np.float32)
    fade_in[:overlap] = fade_in_head
    fade_out = np.zeros(n, np.float32)
    fade_out[:overlap] = fade_out_head
    fade_in_full = jnp.concatenate(
        [jnp.ones((1, n), jnp.float32), jnp.broadcast_to(jnp.asarray(fade_in), (frames.shape[1] - 1, n))]
    )[None]
    fade_out_full = jnp.concatenate(
        [jnp.zeros((1, n), jnp.float32), jnp.broadcast_to(jnp.asarray(fade_out), (frames.shape[1] - 1, n))]
    )[None]
    return frames * fade_in_full + frames_prev * fade_out_full


def fft_convolve(audio: Array, impulse_response: Array, padding: str = "same",
                 delay_compensation: int = -1, cross_fade: bool = False) -> Array:
    """Blockwise (time-varying) FFT convolution with overlap-add
    (reference ddsp.py:504-633).

    Args:
      audio: [batch, T].
      impulse_response: [batch, ir_size] (LTI) or [batch, n_frames, ir_size]
        (time-varying; audio is chopped into n_frames equal blocks).
    """
    audio = jnp.asarray(audio, jnp.float32)
    impulse_response = jnp.asarray(impulse_response, jnp.float32)
    if impulse_response.ndim == 2:
        impulse_response = impulse_response[:, None, :]
    batch_size_ir, n_ir_frames, ir_size = impulse_response.shape
    batch_size, audio_size = audio.shape
    if batch_size != batch_size_ir:
        raise ValueError(
            f"Batch size of audio ({batch_size}) and impulse response "
            f"({batch_size_ir}) must be the same."
        )

    frame_size = -(-audio_size // n_ir_frames)  # ceil
    pad_tail = frame_size * n_ir_frames - audio_size
    if pad_tail:
        audio = jnp.pad(audio, ((0, 0), (0, pad_tail)))
    audio_frames = audio.reshape(batch_size, n_ir_frames, frame_size)

    fft_size = get_fft_size(frame_size, ir_size)
    audio_fft = jnp.fft.rfft(audio_frames, n=fft_size, axis=-1)
    ir_fft = jnp.fft.rfft(impulse_response, n=fft_size, axis=-1)

    if cross_fade:
        frames_own = jnp.fft.irfft(audio_fft * ir_fft, n=fft_size, axis=-1)
        frames_prev = jnp.fft.irfft(audio_fft * jnp.roll(ir_fft, 1, axis=1),
                                    n=fft_size, axis=-1)
        audio_frames_out = _cross_fade_frames(frames_own, frames_prev, ir_size - 1)
    else:
        audio_frames_out = jnp.fft.irfft(audio_fft * ir_fft, n=fft_size, axis=-1)

    # Overlap-add at stride frame_size. Frame k covers [k*frame_size,
    # k*frame_size + fft_size); split each frame into chunks of frame_size and
    # add along anti-diagonals — a pad+add, not a scatter.
    n_chunks = -(-fft_size // frame_size)
    pad_to = n_chunks * frame_size - fft_size
    if pad_to:
        audio_frames_out = jnp.pad(audio_frames_out, ((0, 0), (0, 0), (0, pad_to)))
    chunks = audio_frames_out.reshape(batch_size, n_ir_frames, n_chunks, frame_size)
    out_len_frames = n_ir_frames + n_chunks - 1
    acc = jnp.zeros((batch_size, out_len_frames, frame_size), jnp.float32)
    for c in range(n_chunks):
        acc = acc.at[:, c:c + n_ir_frames, :].add(chunks[:, :, c, :])
    audio_out = acc.reshape(batch_size, out_len_frames * frame_size)
    audio_out_size = (n_ir_frames - 1) * frame_size + fft_size
    audio_out = audio_out[:, :audio_out_size]

    return crop_and_compensate_delay(audio_out, audio_size, ir_size, padding,
                                     delay_compensation)


def frequency_filter(audio: Array, magnitudes: Array, window_size: int = 0,
                     padding: str = "same", cross_fade: bool = False) -> Array:
    """Filter audio with an FIR built from a magnitude response
    (reference ddsp.py:350-379)."""
    impulse_response = frequency_impulse_response(magnitudes, window_size=window_size)
    return fft_convolve(audio, impulse_response, padding=padding, cross_fade=cross_fade)


def slope_frequency_response(decay_per_octave_db: Array, n_freqs: int, f_ref: float) -> Array:
    """-X dB/octave amplitude rolloff above f_ref over [0, 8000] Hz
    (reference ddsp.py:738-769)."""
    decay = jnp.asarray(decay_per_octave_db, jnp.float32)
    freqs = np.linspace(0.0, 8000.0, n_freqs, dtype=np.float32)
    freqs[0] += 1e-7
    freqs = jnp.asarray(freqs)[None, None, :]
    a_0 = 10.0 ** (-decay / 20.0)
    return jnp.where(freqs > f_ref, a_0 ** jnp.log2(freqs / f_ref), 1.0)
