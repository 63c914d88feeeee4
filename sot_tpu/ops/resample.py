"""Frame-rate -> sample-rate control upsampling.

Two methods used by the synth (reference synths.py:106-112):
  * 'window'   — hann overlap-add upsampling for amplitude envelopes
                 (ddsp.py:121-205). Re-derived here without `F.fold`: with
                 50% overlapping windows the OLA collapses to one reshape +
                 one add (exact same output, TPU-friendly, no scatter).
  * 'bilinear'/'bicubic'/'nearest' — torch F.interpolate parity
                 (align_corners = not add_endpoint) for frequency
                 envelopes (ddsp.py:93-104); bicubic is a static Keys
                 interpolation matrix applied on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.windows import hann_window

Array = jax.Array


def upsample_with_windows(inputs: Array, n_timesteps: int, add_endpoint: bool = True) -> Array:
    """Hann-window overlap-add upsample of [batch, n_frames, ch] to n_timesteps.

    Equivalent to reference ddsp.py:121-205 (verified elementwise in tests):
    each frame is multiplied by a hann window of 2*hop and overlap-added at
    stride hop, then the rise of the first and fall of the last window are
    trimmed. With 50% overlap the OLA is exactly
        out_chunk[j] = second_half[j-1] + first_half[j],  j = 1..n_frames-1
    which is a reshape + slice + add: no fold/scatter needed.
    """
    inputs = jnp.asarray(inputs, jnp.float32)
    if inputs.ndim != 3:
        raise ValueError(f"upsample_with_windows expects 3D input, got {inputs.shape}")

    if add_endpoint:
        inputs = jnp.concatenate([inputs, inputs[:, -1:, :]], axis=1)

    n_frames = inputs.shape[1]
    n_intervals = n_frames - 1
    if n_frames >= n_timesteps:
        raise ValueError(
            f"Upsample with windows cannot be used for downsampling "
            f"(frames={n_frames}, timesteps={n_timesteps})"
        )
    if n_timesteps % n_intervals != 0:
        raise ValueError(
            f"n_timesteps ({n_timesteps}) must be divisible by n_intervals ({n_intervals})"
        )

    hop_size = n_timesteps // n_intervals
    window = hann_window(2 * hop_size)  # periodic hann, torch parity

    # [batch, n_frames, window, ch]
    windowed = inputs[:, :, None, :] * window[None, None, :, None]
    first = windowed[:, :, :hop_size, :]
    second = windowed[:, :, hop_size:, :]
    # Overlap-add with 50% overlap; trimming the first/last half-windows keeps
    # exactly chunks j=1..n_frames-1.
    chunks = first[:, 1:, :, :] + second[:, :-1, :, :]
    batch, _, _, ch = chunks.shape
    return chunks.reshape(batch, n_timesteps, ch)


def _interp_linear(inputs: Array, n_timesteps: int, align_corners: bool) -> Array:
    """1D linear interpolation along axis 1, torch F.interpolate parity."""
    n_frames = inputs.shape[1]
    if align_corners:
        coords = np.linspace(0.0, n_frames - 1, n_timesteps, dtype=np.float64)
    else:
        scale = n_frames / n_timesteps
        coords = (np.arange(n_timesteps, dtype=np.float64) + 0.5) * scale - 0.5
        coords = np.clip(coords, 0.0, n_frames - 1)
    lo = np.floor(coords).astype(np.int32)
    lo = np.minimum(lo, n_frames - 2) if n_frames > 1 else np.zeros_like(lo)
    frac = jnp.asarray((coords - lo).astype(np.float32))[None, :, None]
    x_lo = inputs[:, lo, :]
    x_hi = inputs[:, np.minimum(lo + 1, n_frames - 1), :]
    return x_lo + frac * (x_hi - x_lo)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights, torch's a=-0.75 variant."""
    at = np.abs(t)
    w1 = (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0          # |t| <= 1
    w2 = a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a  # 1 < |t| < 2
    return np.where(at <= 1.0, w1, np.where(at < 2.0, w2, 0.0))


def _interp_cubic(inputs: Array, n_timesteps: int, align_corners: bool) -> Array:
    """1D bicubic interpolation along axis 1, torch F.interpolate parity
    (reference ddsp.py:96-104 with method='bicubic').

    Border semantics match torch: the source coordinate is NOT clamped
    (fractions stay real near the edges); each of the 4 taps clamps its
    index to [0, n-1] (edge replication). All coordinates are static, so
    the whole interpolation collapses to one [n_timesteps, n_frames]
    constant matrix applied on the MXU — no gathers at runtime."""
    n_frames = inputs.shape[1]
    if align_corners and n_frames > 1:
        coords = np.linspace(0.0, n_frames - 1, n_timesteps, dtype=np.float64)
    elif align_corners:
        coords = np.zeros(n_timesteps, dtype=np.float64)
    else:
        scale = n_frames / n_timesteps
        coords = (np.arange(n_timesteps, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(coords).astype(np.int64)
    frac = coords - lo
    mat = np.zeros((n_timesteps, n_frames), dtype=np.float64)
    for k in range(-1, 3):
        idx = np.clip(lo + k, 0, n_frames - 1)
        w = _cubic_kernel(frac - k)
        np.add.at(mat, (np.arange(n_timesteps), idx), w)
    mat32 = jnp.asarray(mat.astype(np.float32))
    return jnp.einsum("tf,bfc->btc", mat32, inputs)


def _interp_nearest(inputs: Array, n_timesteps: int) -> Array:
    n_frames = inputs.shape[1]
    scale = n_frames / n_timesteps
    idx = np.minimum((np.arange(n_timesteps) * scale).astype(np.int32), n_frames - 1)
    return inputs[:, idx, :]


def resample(inputs: Array, n_timesteps: int, method: str = "bilinear",
             add_endpoint: bool = True) -> Array:
    """Resample framewise controls to n_timesteps (reference ddsp.py:53-118).

    Accepts [n_frames], [batch, n_frames] or [batch, n_frames, ch]; returns
    the same rank at the new time resolution.
    """
    inputs = jnp.asarray(inputs, jnp.float32)
    is_1d = inputs.ndim == 1
    is_2d = inputs.ndim == 2
    if is_1d:
        inputs = inputs[None, :, None]
    elif is_2d:
        inputs = inputs[:, :, None]

    if method == "window":
        outputs = upsample_with_windows(inputs, n_timesteps, add_endpoint)
    elif method == "bilinear":
        outputs = _interp_linear(inputs, n_timesteps, align_corners=not add_endpoint)
    elif method == "bicubic":
        outputs = _interp_cubic(inputs, n_timesteps, align_corners=not add_endpoint)
    elif method == "nearest":
        outputs = _interp_nearest(inputs, n_timesteps)
    else:
        raise ValueError(
            f"Method ({method}) is invalid. Must be one of "
            f"['nearest', 'bilinear', 'bicubic', 'window']."
        )

    if is_1d:
        outputs = outputs[0, :, 0]
    elif is_2d:
        outputs = outputs[:, :, 0]
    return outputs
