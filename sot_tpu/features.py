"""Feature transforms (L2): STFT / CQT / identity with frequency metadata.

Every transform is a lightweight, hashable config object exposing
  * ``__call__(audio)`` -> (batch, time, freq) features (pure, jit-safe)
  * ``get_frequencies()`` -> np.ndarray of bin centre frequencies in Hz

mirroring the reference's dual use of one factory for both the encoder input
("feature_extractor") and the loss domain ("transform")
(reference features.py:33-61, trainer.py:62-63).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.cqt import cqt_magnitude, cqt_frequencies
from sot_tpu.ops.numerics import get_cqt_n_bins, safe_log
from sot_tpu.ops.stft import rfft_frequencies, stft_magnitude

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class STFT:
    """Magnitude STFT, time-major (reference TorchSTFT, features.py:85-113)."""

    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 16000
    window: Optional[str] = None  # None -> hann; 'flattop' for SOT loss domain
    log: bool = False

    def __call__(self, audio: Array, reduce: bool = False, log: bool = False) -> Array:
        x = stft_magnitude(
            audio,
            size=self.n_fft,
            overlap=1.0 - self.hop_length / self.n_fft,
            window=self.window,
        )
        if reduce:
            x = jnp.mean(x, axis=1)
        if log or self.log:
            x = safe_log(x)
        return x

    def get_frequencies(self) -> np.ndarray:
        return rfft_frequencies(self.n_fft, self.sample_rate)


@dataclasses.dataclass(frozen=True)
class CQT:
    """Magnitude CQT, time-major (reference CQT/nnAudio, features.py:116-188)."""

    sample_rate: int = 16000
    fmin: float = 32.7
    bins_per_semitone: int = 3
    n_bins: int = 285
    hop_length: int = 256
    log: bool = False

    @property
    def bins_per_octave(self) -> int:
        return 12 * self.bins_per_semitone

    def __call__(self, audio: Array, reduce: bool = False, log: bool = False) -> Array:
        x = cqt_magnitude(
            audio,
            sr=self.sample_rate,
            fmin=self.fmin,
            n_bins=self.n_bins,
            bins_per_octave=self.bins_per_octave,
            hop_length=self.hop_length,
        )
        if log or self.log:
            # reference scales log-CQT by 20 with float32-eps clamp
            x = safe_log(x, eps=float(np.finfo(np.float32).eps)) * 20.0
        if reduce:
            x = jnp.mean(x, axis=1, keepdims=True)
        return x

    def get_frequencies(self) -> np.ndarray:
        return cqt_frequencies(self.sample_rate, self.fmin, self.n_bins,
                               self.bins_per_octave)


@dataclasses.dataclass(frozen=True)
class Identity:
    """Loss on raw audio (MSS experiments; reference features.py:58-59)."""

    def __call__(self, audio: Array, **_kwargs) -> Array:
        return audio

    def get_frequencies(self) -> Optional[np.ndarray]:
        return None


Transform = Union[STFT, CQT, Identity]


def get_transform(transform: Union[str, dict, None], sample_rate: int) -> Transform:
    """str-or-dict factory (reference features.py:33-61).

    dict keys mirror the reference configs, e.g.
      {'type': 'stft', 'n_fft': 2048, 'hop_length': 256, 'window': 'flattop'}
      {'type': 'cqt', 'fmin': 32.7, 'bins_per_semitone': 3, 'n_bins': 'auto'}
    Unknown keys (center/output_format/pad_mode) are accepted and ignored, as
    the reference effectively does.
    """
    if transform is None:
        return Identity()
    if isinstance(transform, dict):
        kwargs = dict(transform)
        name = kwargs.pop("type")
    else:
        name, kwargs = transform, {}

    if name == "stft":
        return STFT(
            n_fft=int(kwargs.get("n_fft", 1024)),
            hop_length=int(kwargs.get("hop_length", 256)),
            sample_rate=sample_rate,
            window=kwargs.get("window", None),
            log=bool(kwargs.get("log", False)),
        )
    if name == "cqt":
        fmin = float(kwargs.get("fmin", 32.7))
        bps = int(kwargs.get("bins_per_semitone", 3))
        n_bins = kwargs.get("n_bins", "auto")
        if n_bins == "auto" or n_bins is None:
            n_bins = get_cqt_n_bins(sample_rate, fmin, bps)
        return CQT(
            sample_rate=sample_rate,
            fmin=fmin,
            bins_per_semitone=bps,
            n_bins=int(n_bins),
            hop_length=int(kwargs.get("hop_length", 256)),
            log=bool(kwargs.get("log", False)),
        )
    if name == "identity":
        return Identity()
    raise ValueError(f"Unknown transform {name}")


# ---------------------------------------------------------------------------
# Loudness (reference features.py:240-288)
# ---------------------------------------------------------------------------


def a_weighting_db(frequencies: np.ndarray, min_db: float = -80.0) -> np.ndarray:
    """IEC 61672 A-weighting curve in dB (librosa.A_weighting semantics).

    The reference obtains this from librosa (features.py:265-266); here it is
    the closed-form pole/zero expression, clamped at ``min_db``.
    """
    f = np.asarray(frequencies, np.float64)
    f2 = f * f
    c1, c2, c3, c4 = 20.6**2, 107.7**2, 737.9**2, 12194.0**2
    num = c4 * f2 * f2
    den = (f2 + c1) * np.sqrt((f2 + c2) * (f2 + c3)) * (f2 + c4)
    with np.errstate(divide="ignore"):
        weights = 2.0 + 20.0 * (np.log10(num) - np.log10(den))
    return np.maximum(weights, min_db).astype(np.float32)


def a_weighting_from_audio(
    audio: Array,
    num_fft: int,
    hopsize: int,
    sample_rate: int = 16000,
    weighting: Optional[Array] = None,
) -> Array:
    """Per-frame A-weighted loudness in dB (reference features.py:240-279).

    torch.stft semantics: centre reflect padding, rectangular window,
    unnormalised; power spectrum weighted by the linear-scale A-curve,
    averaged over frequency, then power_to_db(ref_db=0, range_db=80).
    Returns [batch, n_frames] (or [n_frames] for 1D input).
    """
    from sot_tpu.ops.numerics import power_to_db
    from sot_tpu.ops.stft import stft_magnitude

    audio = jnp.asarray(audio, jnp.float32)
    is_1d = audio.ndim == 1
    if is_1d:
        audio = audio[None]
    mag = stft_magnitude(
        audio, size=num_fft, overlap=1.0 - hopsize / num_fft, window="ones",
        normalized=False, center=True, pad_end=False,
    )  # [batch, frames, bins]
    power = mag * mag
    if weighting is None:
        freqs = rfft_frequencies(num_fft, sample_rate)
        weighting = jnp.asarray(10.0 ** (a_weighting_db(freqs) / 10.0))
    power = power * weighting
    avg_power = jnp.mean(power, axis=-1)  # over frequency
    loudness = power_to_db(avg_power, ref_db=0.0, range_db=80.0)
    return loudness[0] if is_1d else loudness


def get_loudness(audio: Array, hopsize: int, num_fft: int = 1024,
                 sample_rate: int = 16000,
                 weighting: Optional[Array] = None) -> Array:
    """Normalised loudness in ~[0, 1] (reference features.py:282-288)."""
    return (a_weighting_from_audio(audio, num_fft, hopsize, sample_rate,
                                   weighting=weighting) + 50.0) / 80.0
