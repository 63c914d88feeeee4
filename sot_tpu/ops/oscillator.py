"""Sinusoidal oscillator bank: phase accumulation + amplitude-weighted sum.

Reference semantics (ddsp.py:6-50, 208-331):
  * harmonic expansion: f0 * [1..K]
  * Nyquist masking of amplitudes
  * phase = cumsum(2*pi*f / sr) along time, sin, weighted sum over sinusoids

TPU notes: the phase cumsum runs in fp32 along the 4096-sample axis. JAX's
`jnp.cumsum` is deterministic on TPU (unlike CUDA torch, which the reference
flags at ddsp.py:253). `angular_cumsum` provides the chunked mod-2pi variant
for long signals / reduced precision (ddsp.py:266-331) — the same chunk
stitching is the carry-exchange scheme for cross-chip sample sharding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_TWO_PI = 2.0 * math.pi


def get_harmonic_frequencies(frequencies: Array, n_harmonics: int) -> Array:
    """f0 [batch, time, 1] -> integer multiples [batch, time, n_harmonics].

    Uses linspace(1, K, K) for exact reference parity (ddsp.py:6-22).
    """
    frequencies = jnp.asarray(frequencies, jnp.float32)
    f_ratios = jnp.linspace(1.0, float(n_harmonics), int(n_harmonics), dtype=jnp.float32)
    return frequencies * f_ratios


def remove_above_nyquist(frequency_envelopes: Array, amplitude_envelopes: Array,
                         sample_rate: int = 16000) -> Array:
    """Zero amplitudes of oscillators at/above Nyquist (ddsp.py:25-50)."""
    frequency_envelopes = jnp.asarray(frequency_envelopes, jnp.float32)
    amplitude_envelopes = jnp.asarray(amplitude_envelopes, jnp.float32)
    return jnp.where(
        frequency_envelopes >= sample_rate / 2.0,
        jnp.zeros_like(amplitude_envelopes),
        amplitude_envelopes,
    )


def angular_cumsum(angular_frequency: Array, chunk_size: int = 1000) -> Array:
    """Chunked phase accumulation with mod-2pi stitching (ddsp.py:266-331).

    Splits the time axis into chunks, cumsums each, and carries the chunk-end
    phase (mod 2pi) forward — bounding fp accumulation error independent of
    signal length. Returns phase in [0, 2pi).
    """
    x = jnp.asarray(angular_frequency, jnp.float32)
    n_batch = x.shape[0]
    n_time = x.shape[1]
    tail_shape = x.shape[2:]

    remainder = n_time % chunk_size
    pad = (chunk_size - remainder) % chunk_size
    if pad:
        pad_widths = [(0, 0), (0, pad)] + [(0, 0)] * len(tail_shape)
        x = jnp.pad(x, pad_widths)
    length = n_time + pad
    n_chunks = length // chunk_size

    chunks = x.reshape((n_batch, n_chunks, chunk_size) + tail_shape)
    phase = jnp.cumsum(chunks, axis=2)

    # Carry = chunk-end phase mod 2pi, accumulated (exclusively) across chunks.
    offsets = phase[:, :, -1:] % _TWO_PI
    offsets = jnp.pad(offsets, [(0, 0), (1, 0), (0, 0)] + [(0, 0)] * len(tail_shape))
    offsets = offsets[:, :-1]
    offsets = jnp.cumsum(offsets, axis=1) % _TWO_PI

    phase = (phase + offsets) % _TWO_PI
    phase = phase.reshape((n_batch, length) + tail_shape)
    if pad:
        phase = phase[:, :n_time]
    return phase


def oscillator_bank(
    frequency_envelopes: Array,
    amplitude_envelopes: Array,
    sample_rate: int = 16000,
    sum_sinusoids: bool = True,
    use_angular_cumsum: bool = False,
) -> Array:
    """Audio from sample-wise frequency/amplitude envelopes (ddsp.py:208-263).

    Args:
      frequency_envelopes: [batch, n_samples, n_sinusoids] Hz.
      amplitude_envelopes: [batch, n_samples, n_sinusoids].
    Returns: [batch, n_samples] if sum_sinusoids else the per-sinusoid stack.
    """
    frequency_envelopes = jnp.asarray(frequency_envelopes, jnp.float32)
    amplitude_envelopes = jnp.asarray(amplitude_envelopes, jnp.float32)

    amplitude_envelopes = remove_above_nyquist(
        frequency_envelopes, amplitude_envelopes, sample_rate
    )

    omegas = frequency_envelopes * (_TWO_PI / float(sample_rate))
    if use_angular_cumsum:
        phases = angular_cumsum(omegas)
    else:
        # blocked tri-matmul prefix (MXU) — XLA's cumsum lowers to a slow
        # reduce-window on TPU; same tree-reduction numerics class
        from sot_tpu.ops.scan import prefix_sum

        phases = prefix_sum(omegas, axis=1)

    wavs = jnp.sin(phases)
    audio = amplitude_envelopes * wavs
    if sum_sinusoids:
        audio = jnp.sum(audio, axis=-1)
    return audio
