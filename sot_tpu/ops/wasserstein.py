"""1D Wasserstein distance (spectral optimal transport) — the SOT kernel.

Closed-form 1D OT between discrete distributions via quantile matching
(POT semantics; reference losses.py:223-313):

    sort values+weights -> cumsum -> CDFs
    qs = sorted merge of both CDFs (the joint quantile grid)
    u_q, v_q = inverse-CDF lookups (searchsorted + gather)
    W_p^p = sum delta(qs) * |u_q - v_q|^p

Differentiability: gradients flow through the *sorted weight* path
(cumsum -> sort permutation -> delta) and through the gathered *values*
(quantile lookups); searchsorted indices are integer and correctly carry no
gradient — identical autograd semantics to the reference.

`limit_quantile_range` zeroes quantile-grid segments beyond total mass 1,
which together with the caller's `dont_normalize` implements the paper's
"frequency cutoff" (reference losses.py:139-143, 180-184, 306-307).

TPU notes: rows (batch*frames) are embarrassingly parallel; per-row work is
sort/cumsum/binary-search over the frequency lane. This XLA version keeps
everything in fp32, uses a single fused key-value `lax.sort` per
distribution, and a vectorised `searchsorted`. A fused Pallas kernel for the
fixed-grid hot path lives in sot_tpu.ops.pallas.sot.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def quantile_function(qs: Array, cws: Array, xs: Array) -> Array:
    """Step-function inverse CDF: values of xs at quantile levels qs.

    Args:
      qs:  [rows, k] quantile levels (sorted per row).
      cws: [rows, n] cumulative weights (CDF, sorted per row).
      xs:  [rows, n] support positions (sorted per row).
    Returns: [rows, k] xs[searchsorted(cws, qs)] clamped to valid indices.
    (reference losses.py:214-220; torch.searchsorted side='left')
    """
    n = xs.shape[-1]
    idx = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="left", method="sort"))(cws, qs)
    return jnp.take_along_axis(xs, jnp.clip(idx, 0, n - 1), axis=-1)


def wasserstein_1d(
    u_values: Array,
    v_values: Array,
    u_weights: Optional[Array] = None,
    v_weights: Optional[Array] = None,
    p: float = 1,
    require_sort: bool = True,
    return_quantiles: bool = False,
    limit_quantile_range: bool = False,
) -> Array:
    """Batched closed-form 1D Wasserstein distance.

    Args:
      u_values, v_values: [rows, n] / [rows, m] support positions.
      u_weights, v_weights: matching weights; default uniform.
      p: order (>= 1).
      require_sort: sort values (carrying weights) first.
      return_quantiles: return (u_quantiles, v_quantiles, qs, u_cdf, v_cdf).
      limit_quantile_range: zero segments where the quantile level exceeds 1
        (the paper's frequency cutoff when v is not self-normalised).
    Returns: [rows] distances W_p^p (not the p-th root — reference parity,
      losses.py:311-313).
    """
    if p < 1:
        raise ValueError(f"The OT loss is only valid for p>=1, {p} was given")
    u_values = jnp.asarray(u_values, jnp.float32)
    v_values = jnp.asarray(v_values, jnp.float32)
    n = u_values.shape[-1]
    m = v_values.shape[-1]

    if u_weights is None:
        u_weights = jnp.full_like(u_values, 1.0 / n)
    if v_weights is None:
        v_weights = jnp.full_like(v_values, 1.0 / m)
    u_weights = jnp.asarray(u_weights, jnp.float32)
    v_weights = jnp.asarray(v_weights, jnp.float32)

    if require_sort:
        # Single fused key-value sort per distribution (values carry weights).
        u_values, u_weights = jax.lax.sort((u_values, u_weights), dimension=-1, num_keys=1)
        v_values, v_weights = jax.lax.sort((v_values, v_weights), dimension=-1, num_keys=1)

    u_cumweights = jnp.cumsum(u_weights, axis=-1)
    v_cumweights = jnp.cumsum(v_weights, axis=-1)

    qs = jnp.sort(jnp.concatenate([u_cumweights, v_cumweights], axis=-1), axis=-1)
    u_quantiles = quantile_function(qs, u_cumweights, u_values)
    v_quantiles = quantile_function(qs, v_cumweights, v_values)
    if return_quantiles:
        return u_quantiles, v_quantiles, qs, u_cumweights, v_cumweights

    pad = [(0, 0)] * (qs.ndim - 1) + [(1, 0)]
    qs_padded = jnp.pad(qs, pad)
    delta = qs_padded[..., 1:] - qs_padded[..., :-1]
    if limit_quantile_range:
        delta = jnp.where(qs > 1.0, jnp.zeros_like(delta), delta)

    diff_quantiles = jnp.abs(u_quantiles - v_quantiles)
    if p == 1:
        return jnp.sum(delta * diff_quantiles, axis=-1)
    if p == 2:
        return jnp.sum(delta * diff_quantiles * diff_quantiles, axis=-1)
    return jnp.sum(delta * diff_quantiles**p, axis=-1)


def wasserstein_1d_same_grid(
    grid: Array,
    u_weights: Array,
    v_weights: Array,
    p: float = 1,
    limit_quantile_range: bool = False,
    target_constant: bool = False,
) -> Array:
    """Fast path: both distributions live on one shared *sorted* grid.

    This is the training hot path (both spectra sit on the same rfft
    frequency grid): the merged quantile integral is computed sort-free via
    the overlap bilinear form (fused Pallas kernel on TPU; see
    sot_tpu.ops.pallas.sot), with an O(n) closed form for p=1. Matches
    ``wasserstein_1d(grid, grid, ...)`` in values and gradients.

    Args:
      grid: [n] sorted support positions (shared by both distributions).
      u_weights, v_weights: [rows, n].
    Returns: [rows] W_p^p.
    """
    from sot_tpu.ops.pallas.sot import wasserstein_same_grid

    if grid.ndim != 1:
        grid = grid[0]
    return wasserstein_same_grid(
        grid, u_weights, v_weights, p=p,
        limit_quantile_range=limit_quantile_range,
        target_constant=target_constant,
    )
