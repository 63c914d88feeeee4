"""Prefix sums as blocked triangular matmuls (MXU) instead of XLA cumsum.

XLA lowers ``jnp.cumsum`` on TPU to ``reduce-window`` — O(T * window) work on
the VPU that showed up as ~2.6 ms/step in the SOT-2048 train-step profile
(phase accumulation over 4096 samples x 20 sinusoids, CDF cumsums over 1025
bins x 1024 rows). A prefix sum is a lower-triangular matmul: splitting the
axis into chunks of 128, computing within-chunk prefixes with one [128, 128]
tri-matmul per chunk (a single einsum on the MXU), and adding the exclusive
cumsum of the (tiny) per-chunk totals reproduces the same tree-reduction
numerics class at a fraction of the cost.

Gradient note: the VJP of this formulation is the transposed tri-matmul —
a reversed prefix sum, exactly cumsum's VJP — so autodiff through it is as
fast as the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_CHUNK = 128


@functools.lru_cache(maxsize=4)
def _tril(chunk: int):
    return np.tril(np.ones((chunk, chunk), np.float32))


def prefix_sum(x: Array, axis: int = -1) -> Array:
    """Inclusive prefix sum along ``axis`` via blocked tri-matmul.

    Falls back to jnp.cumsum when the axis is too short to benefit.

    Precision (deliberate): the einsum inherits the JAX default matmul
    precision. On the TPU MXU that truncates *operands* to bf16 while
    ``preferred_element_type`` keeps the *accumulator* fp32 — i.e. each
    128-term within-chunk sum is an fp32 sum of bf16-rounded terms, and the
    cross-chunk offsets are exact fp32. Relative error along a 4096-element
    phase accumulation stays ~1e-3 (pinned in
    tests/test_scan.py::test_prefix_sum_bf16_operand_numerics), and default
    bf16 matmul arithmetic was measured to *help* training escape the
    SOT plateau (round-1 A/B; see CLAUDE.md) — do not pin this to
    Precision.HIGHEST.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    t = x.shape[axis]
    if t < 2 * _CHUNK or not jnp.issubdtype(x.dtype, jnp.floating):
        # integer sums must stay exact: the tri-matmul accumulates in f32
        return jnp.cumsum(x, axis=axis)

    # move target axis to position -2 so the tri-matmul contracts over it
    # while the trailing axis rides the lanes
    if x.ndim == 1:
        x = x[:, None]
        out = prefix_sum(x, axis=0)[:, 0]
        return out
    moved = axis != x.ndim - 2
    if moved:
        x = jnp.moveaxis(x, axis, x.ndim - 2)

    t_ax = x.shape[-2]
    pad = (-t_ax) % _CHUNK
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)])
    lead = x.shape[:-2]
    k = x.shape[-1]
    nc = x.shape[-2] // _CHUNK
    xc = x.reshape(lead + (nc, _CHUNK, k))
    tri = jnp.asarray(_tril(_CHUNK))
    within = jnp.einsum("dc,...nck->...ndk", tri, xc,
                        preferred_element_type=jnp.float32)
    sums = within[..., :, -1, :]                         # [..., nc, k]
    offsets = jnp.cumsum(sums, axis=-2) - sums           # exclusive, tiny
    out = (within + offsets[..., :, None, :]).reshape(
        lead + (nc * _CHUNK, k))
    if pad:
        out = out[..., : t_ax, :]
    if moved:
        out = jnp.moveaxis(out, x.ndim - 2, axis)
    return out.astype(x.dtype)
