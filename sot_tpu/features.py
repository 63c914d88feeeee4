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
