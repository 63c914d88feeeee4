"""Training losses (L4): SOT (Wasserstein-1D), multi-scale spectral, KL, mixes.

Pure-function loss objects (frozen dataclasses) over jnp arrays. Semantics
mirror the reference losses.py exactly:
  * ``Wasserstein1D`` — normalisation rules (x self-normalised; y divided by
    x's mass under ``dont_normalize``), ``square_dist`` pre-squaring,
    ``limit_quantile_range`` cutoff, optional hinge, fixed_x linspace support,
    3D->2D row flattening, mean over frames (reference losses.py:89-211)
  * ``MSSLoss`` — L1/L2 over linear and/or safe-log magnitudes at multiple
    fft sizes (reference losses.py:365-425)
  * ``MixOfLosses`` — weighted dict of losses keyed by loss name
    (reference losses.py:346-362)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.numerics import safe_divide, safe_log
from sot_tpu.ops.stft import stft_magnitude
from sot_tpu.ops.wasserstein import wasserstein_1d, wasserstein_1d_same_grid

Array = jax.Array


def mean_difference(target: Array, value: Array, loss_type: str = "L1",
                    weights: Optional[Array] = None) -> Array:
    """Mean L1/L2 difference (reference losses.py:7-36)."""
    difference = target - value
    w = 1.0 if weights is None else weights
    loss_type = loss_type.upper()
    if loss_type == "L1":
        return jnp.mean(jnp.abs(difference * w))
    if loss_type == "L2":
        return jnp.mean(difference**2 * w)
    raise ValueError(f'Loss type ({loss_type}), must be "L1", "L2"')


@dataclasses.dataclass(frozen=True)
class MeanDifference:
    loss_type: str = "L1"

    def __call__(self, x: Array, y: Array, weights: Optional[Array] = None,
                 sort: bool = False, **_kw) -> Array:
        if sort:
            x = jnp.sort(x, axis=-1)
            y = jnp.sort(y, axis=-1)
        return mean_difference(x, y, loss_type=self.loss_type, weights=weights)


@dataclasses.dataclass(frozen=True)
class KL:
    """Normalised KL between spectra (reference losses.py:57-86)."""

    eps: float = 1e-10
    reverse: bool = False

    def __call__(self, input: Array, target: Array, **_kw) -> Array:
        original_shape = input.shape[:-1]
        if input.ndim == 3:
            input = input.reshape(-1, input.shape[-1])
        if target.ndim == 3:
            target = target.reshape(-1, target.shape[-1])
        if self.reverse:
            input, target = target, input
        input = safe_divide(input, jnp.sum(input, axis=-1, keepdims=True))
        target = safe_divide(target, jnp.sum(target, axis=-1, keepdims=True))
        kl = input * (jnp.log(input + self.eps) - jnp.log(target + self.eps))
        kl = jnp.sum(kl, axis=-1).reshape(original_shape)
        return jnp.mean(kl)


@dataclasses.dataclass(frozen=True)
class Wasserstein1D:
    """Spectral-optimal-transport loss module (reference losses.py:89-211).

    Normalisation + batching wrapper around ops.wasserstein.wasserstein_1d.
    ``dont_normalize`` + ``limit_quantile_range`` together implement the
    paper's frequency cutoff. ``log_scaled_x`` is a *marker* consumed by the
    trainer (positions are log-mapped by the caller), as in the reference
    (losses.py:117, trainer.py:187-191).
    """

    p: float = 1
    fixed_x: Optional[int] = None
    require_sort: bool = True
    log_scaled_x: bool = False
    dont_normalize: bool = False
    limit_quantile_range: bool = False
    hinge: Union[bool, float] = False
    square_dist: bool = False
    # x (the target spectrum) is input data with no gradient: lets the fused
    # kernel skip the target-side cotangents (training always sets this)
    target_constant: bool = False
    # optional same-grid solver override `(grid, u_rows, v_rows) -> [rows]`;
    # the multi-chip train step injects a row-sharded shard_map solve here
    # (parallel.sharded_ops.wasserstein_same_grid_row_sharded)
    solver: Optional[Any] = None

    name = "Wasserstein1D"

    def __call__(self, x: Array, y: Array, x_pos: Optional[Array] = None,
                 y_pos: Optional[Array] = None, return_quantiles: bool = False,
                 **kw):
        if (x_pos is None or y_pos is None) and self.fixed_x is None:
            raise ValueError("If fixed_x is not provided, x_pos and y_pos must be provided")
        if x_pos is None:
            x_pos = jnp.linspace(0.0, 1.0, self.fixed_x)
        if y_pos is None:
            y_pos = jnp.linspace(0.0, 1.0, self.fixed_x)

        original_shape = x.shape[:-1]
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
        if y.ndim == 3:
            y = y.reshape(-1, y.shape[-1])
        # same-grid detection: one shared 1D position vector for both
        # spectra (true in training: both STFTs sit on the same grid).
        # The fused kernel additionally requires the grid to be SORTED —
        # log-scaled positions can be non-monotone at bin 0 (hz_to_midi
        # maps 0 Hz to MIDI 0 above bin 1's negative MIDI for fine
        # rfft grids), in which case we keep the general sorting path.
        from sot_tpu.ops.numerics import env_flag

        same_grid = (x_pos is y_pos and getattr(x_pos, "ndim", 0) == 1
                     and not env_flag("SOT_TPU_FORCE_GENERAL"))
        if same_grid:
            import jax.core

            if isinstance(x_pos, jax.core.Tracer):
                # can't verify sortedness of an abstract value: stay on the
                # general (sorting) path. Callers that want the fused kernel
                # pass positions as numpy/concrete arrays (the trainer does).
                same_grid = False
            else:
                same_grid = bool(np.all(np.diff(np.asarray(x_pos)) >= 0))
        grid_1d = x_pos if same_grid else None
        if same_grid:
            grid_1d = jnp.asarray(grid_1d)
        if x_pos.ndim == 3:
            x_pos = x_pos.reshape(-1, x_pos.shape[-1])
        if y_pos.ndim == 3:
            y_pos = y_pos.reshape(-1, y_pos.shape[-1])
        if x_pos.ndim == 1:
            x_pos = jnp.broadcast_to(x_pos[None, :], x.shape)
        if y_pos.ndim == 1:
            y_pos = jnp.broadcast_to(y_pos[None, :], y.shape)

        if self.square_dist:
            x = x**2
            y = y**2

        total_mass_x = jnp.sum(x, axis=1, keepdims=True)
        x = safe_divide(x, total_mass_x)
        if self.dont_normalize:
            y = safe_divide(y, total_mass_x)
        else:
            y = safe_divide(y, jnp.sum(y, axis=1, keepdims=True))

        if same_grid and not return_quantiles:
            # training hot path: both spectra on one shared sorted grid ->
            # sort-free fused kernel (identical values/gradients)
            if self.solver is not None:
                loss = self.solver(grid_1d, x, y)
            else:
                loss = wasserstein_1d_same_grid(
                    grid_1d, x, y, p=self.p,
                    limit_quantile_range=self.limit_quantile_range,
                    target_constant=self.target_constant,
                )
        else:
            loss = wasserstein_1d(
                x_pos, y_pos, u_weights=x, v_weights=y, p=self.p,
                require_sort=self.require_sort,
                return_quantiles=return_quantiles,
                limit_quantile_range=self.limit_quantile_range,
            )
        if return_quantiles:
            return tuple(l.reshape(original_shape + (-1,)) for l in loss)
        if self.hinge:
            # self.hinge is an on/off flag; the threshold comes from the
            # call kwarg, default 0.0 (reference losses.py:203-205)
            loss = jax.nn.relu(loss - float(kw.get("hinge", 0.0)))
        loss = loss.reshape(original_shape)
        return jnp.mean(loss)


@dataclasses.dataclass(frozen=True)
class MSSLoss:
    """Multi-scale spectrogram loss, DDSP-style (reference losses.py:365-425)."""

    fft_sizes: Tuple[int, ...] = (2048, 1024, 512, 256, 128, 64)
    loss_type: str = "L1"
    mag_weight: float = 0.0
    logmag_weight: float = 0.0

    name = "MSSLoss"

    def __call__(self, target_audio: Array, audio: Array, **_kw) -> Array:
        loss = 0.0
        for size in self.fft_sizes:
            target_mag = stft_magnitude(target_audio, size=size, overlap=0.75)
            value_mag = stft_magnitude(audio, size=size, overlap=0.75)
            if self.mag_weight > 0:
                loss += self.mag_weight * mean_difference(
                    target_mag, value_mag, self.loss_type
                )
            if self.logmag_weight > 0:
                loss += self.logmag_weight * mean_difference(
                    safe_log(target_mag), safe_log(value_mag), self.loss_type
                )
        return loss


@dataclasses.dataclass(frozen=True)
class Wasserstein1DWithTransform:
    """W1D preceded by its own STFT (reference losses.py:316-343)."""

    wasserstein: Wasserstein1D
    n_fft: int = 512
    hop_length: int = 128
    sample_rate: int = 16000
    window: Optional[str] = None

    name = "Wasserstein1DWithTransform"

    def __call__(self, x: Array, y: Array, **kw) -> Array:
        overlap = 1.0 - self.hop_length / self.n_fft
        sx = stft_magnitude(x, size=self.n_fft, overlap=overlap, window=self.window)
        sy = stft_magnitude(y, size=self.n_fft, overlap=overlap, window=self.window)
        freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / self.sample_rate).astype(np.float32)
        pos = freqs / freqs.max()  # numpy: lets the fused-path guard inspect
        kw.pop("x_pos", None)
        kw.pop("y_pos", None)
        return self.wasserstein(sx, sy, x_pos=pos, y_pos=pos, **kw)


@dataclasses.dataclass(frozen=True)
class MixOfLosses:
    """Weighted mix; returns {loss_name: weighted_value}
    (reference losses.py:346-362)."""

    losses: Tuple[object, ...]
    weights: Tuple[float, ...]

    def __call__(self, x: Array, y: Array, **kw) -> Dict[str, Array]:
        out = {}
        for loss_fn, weight in zip(self.losses, self.weights):
            out[type(loss_fn).__name__] = loss_fn(x, y, **kw) * weight
        return out
