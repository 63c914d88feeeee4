"""L0 numeric utilities: safe math, pitch-scale maps, nonlinearities.

Semantics mirror the reference implementation's conventions so the SOT loss
(which is sensitive to normalisation) reproduces identically:
  * ``safe_divide``  — eps = 1e-7, denominator <= eps is replaced by eps
    (cf. reference utils.py:135-142)
  * ``safe_log``     — eps = 1e-5, x <= eps is replaced by eps
    (cf. reference utils.py:145-151)
  * hz <-> midi <-> unit maps (cf. reference utils.py:68-114)
  * ``exp_sigmoid``  — max_value * sigmoid(x)**log(exponent) + threshold
    (cf. reference utils.py:27-46)

Everything is a pure function of jnp arrays; float32 throughout (the SOT
pipeline accumulates CDFs whose tails matter — bf16 is reserved for the
encoder matmuls, not for loss-domain math).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Number = Union[float, Array]


def safe_divide(numerator: Number, denominator: Number, eps: float = 1e-7) -> Array:
    """Divide, replacing denominators <= eps with eps (reference utils.py:135-142)."""
    denominator = jnp.asarray(denominator)
    safe_denominator = jnp.where(denominator <= eps, jnp.asarray(eps, denominator.dtype), denominator)
    return numerator / safe_denominator


def safe_log(x: Number, eps: float = 1e-5) -> Array:
    """log(max(x, eps)) with the reference's `x <= eps -> eps` clamp (utils.py:145-151)."""
    x = jnp.asarray(x)
    safe_x = jnp.where(x <= eps, jnp.asarray(eps, x.dtype), x)
    return jnp.log(safe_x)


def safe_log10(x: Number, eps: float = 1e-5) -> Array:
    x = jnp.asarray(x)
    safe_x = jnp.where(x <= eps, jnp.asarray(eps, x.dtype), x)
    return jnp.log10(safe_x)


def logb(x: Number, base: float = 2.0, safe: bool = False) -> Array:
    x = jnp.asarray(x, jnp.float32)
    if safe:
        return safe_divide(safe_log(x), math.log(base))
    return jnp.log(x) / math.log(base)


def log10(x: Number) -> Array:
    """Safe log base 10 (reference utils.py:323-325 routes through safe logb)."""
    return logb(x, base=10.0, safe=True)


# ---------------------------------------------------------------------------
# Pitch scale maps (hz <-> midi <-> unit). Reference utils.py:68-114.
# ---------------------------------------------------------------------------


def hz_to_midi(frequencies: Number) -> Array:
    """Hz -> MIDI; 0 Hz maps to MIDI 0 (reference utils.py:88-98)."""
    frequencies = jnp.asarray(frequencies, jnp.float32)
    notes = 12.0 * (logb(frequencies, 2.0) - logb(440.0, 2.0)) + 69.0
    return jnp.where(frequencies <= 0.0, jnp.zeros_like(notes), notes)


def midi_to_hz(notes: Number) -> Array:
    notes = jnp.asarray(notes, jnp.float32)
    return 440.0 * (2.0 ** ((notes - 69.0) / 12.0))


def unit_to_midi(unit: Number, midi_min: Number = 20.0, midi_max: Number = 90.0,
                 clip: bool = False) -> Array:
    unit = jnp.asarray(unit, jnp.float32)
    if clip:
        unit = jnp.clip(unit, 0.0, 1.0)
    return midi_min + (midi_max - midi_min) * unit


def midi_to_unit(midi: Number, midi_min: Number = 20.0, midi_max: Number = 90.0,
                 clip: bool = False) -> Array:
    midi = jnp.asarray(midi, jnp.float32)
    unit = (midi - midi_min) / (midi_max - midi_min)
    return jnp.clip(unit, 0.0, 1.0) if clip else unit


def unit_to_hz(unit: Number, hz_min: Number, hz_max: Number, clip: bool = False) -> Array:
    """[0,1] -> [hz_min, hz_max] logarithmically (reference utils.py:68-71)."""
    midi = unit_to_midi(unit, midi_min=hz_to_midi(hz_min), midi_max=hz_to_midi(hz_max), clip=clip)
    return midi_to_hz(midi)


def hz_to_unit(hz: Number, hz_min: Number = 20.0, hz_max: Number = 8000.0,
               clip: bool = False) -> Array:
    """[hz_min, hz_max] -> [0,1] logarithmically (reference utils.py:101-106)."""
    midi = hz_to_midi(hz)
    return midi_to_unit(midi, midi_min=hz_to_midi(hz_min), midi_max=hz_to_midi(hz_max), clip=clip)


# ---------------------------------------------------------------------------
# Nonlinearities
# ---------------------------------------------------------------------------


def exp_sigmoid(x: Number, exponent: float = 10.0, max_value: float = 2.0,
                threshold: float = 1e-7) -> Array:
    """Exponentiated sigmoid, bounded to [threshold, max_value] (utils.py:27-46)."""
    x = jnp.asarray(x, jnp.float32)
    return max_value * jax.nn.sigmoid(x) ** math.log(exponent) + threshold


def frequencies_softmax(freqs: Array, depth: int = 64, hz_min: float = 20.0,
                        hz_max: float = 8000.0) -> Array:
    """Softmax over `depth` log-spaced bins per sinusoid -> Hz (utils.py:278-311)."""
    if freqs.ndim == 3:
        n_batch, n_time, n_combined = freqs.shape
        freqs = freqs.reshape(n_batch, n_time, n_combined // depth, depth)
    else:
        depth = freqs.shape[-1]
    f_probs = jax.nn.softmax(freqs, axis=-1)
    unit_bins = jnp.linspace(0.0, 1.0, depth)[None, None, None, :]
    f_unit = jnp.sum(unit_bins * f_probs, axis=-1)
    return unit_to_hz(f_unit, hz_min=hz_min, hz_max=hz_max)


def power_to_db(power: Array, ref_db: float = 0.0, range_db: float = 80.0) -> Array:
    """Linear power -> dB with a dynamic-range floor (reference utils.py:328-340)."""
    power = jnp.asarray(power, jnp.float32)
    pmin = 10.0 ** -(range_db / 10.0)
    power = jnp.maximum(pmin, power)
    db = 10.0 * log10(power)
    db = db - ref_db
    return jnp.maximum(db, -range_db)


# ---------------------------------------------------------------------------
# Derived-config helpers
# ---------------------------------------------------------------------------


def get_cqt_n_bins(sr: int, fmin: float, bins_per_semitone: int = 3) -> int:
    """Number of CQT bins from fmin to Nyquist (reference utils.py:49-51)."""
    max_semitones = int(math.floor(12 * math.log2(sr / 2) - 12 * math.log2(fmin)))
    return max_semitones * bins_per_semitone


def pad_for_stft_length(signal_len: int, frame_size: int, hop_length: int) -> int:
    """Samples of right-padding for tf-style ``pad_end=True`` framing.

    Mirrors reference utils.py:252-275: num_frames = ceil(len/hop); pad so the
    window slides until fully beyond the signal. Static -> keeps shapes static
    under jit.
    """
    num_frames = -(-signal_len // hop_length)
    return max(0, frame_size + hop_length * (num_frames - 1) - signal_len)


def get_fn_by_name(name: Optional[Union[str, Callable]], **kwargs) -> Optional[Callable]:
    """Scaling-function registry (reference utils.py:10-24)."""
    if callable(name):
        return name
    if name == "exp_sigmoid":
        return functools.partial(exp_sigmoid, **kwargs)
    if name == "frequencies_softmax":
        return functools.partial(frequencies_softmax, **kwargs)
    if name == "identity":
        return lambda x: x
    if name is None:
        return None
    raise ValueError(f"Unknown scaling function: {name}")


def env_flag(name: str) -> bool:
    """Boolean env gate: unset/''/'0'/'false'/'off'/'no' are OFF.

    The kernel gates are flipped programmatically (sot_tpu.kernel_gates
    writes '1') but users export them by hand; GATE=0 must mean off."""
    import os

    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "off", "no")
