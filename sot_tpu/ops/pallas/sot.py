"""Fused spectral-optimal-transport kernel (same-grid 1D Wasserstein).

The training hot path evaluates W_p^p between two spectra that live on the
SAME sorted frequency grid (reference losses.py:223-313 sorts + merges two
CDFs and integrates |quantile gap|^p over the merged quantile grid; here both
value arrays equal the rfft/log-frequency grid). Instead of translating the
reference's sort -> cumsum -> merged-sort -> searchsorted pipeline (three
O(n log^2 n) XLA sorts over HBM), we use an equivalent sort-free overlap
formulation that maps onto the TPU VPU:

    U_i = cumsum(u)_i, V_j = cumsum(v)_j                (CDFs, sorted)
    cap = largest merged CDF value <= 1 if limiting the quantile range
          (the paper's frequency cutoff, reference losses.py:306-307),
          else max total mass
    alpha_i = min(U_i, cap) (+ one virtual tail lane = cap, accounting for
          the reference's index clamp at the grid end, losses.py:219-220)
    beta_j  = min(V_j, cap) (+ tail)
    mu_ij  = ReLU(min(alpha_i, beta_j) - max(alpha_{i-1}, beta_{j-1}))
    W_p^p  = sum_ij  mu_ij * |g_i - g_j|^p

mu_ij is the Lebesgue measure of quantile levels q where the u-inverse-CDF
sits on grid bin i and the v-inverse-CDF on bin j — exactly the merged-grid
segments the reference integrates, so forward values AND autograd semantics
match the reference (gradients flow through the cumsum/min/max path into the
weights; grid positions are static). Every term is non-negative: unlike a
(sum of squares) - (cross term) expansion there is no cancellation as the
two spectra converge during training.

For p = 1 the integral collapses to the classic O(n) CDF-difference form
    W_1 = sum_i |alpha_i - beta_i| * (g_{i+1} - g_i).

The O(n^2) bilinear form runs as a Pallas kernel: each program owns a
128-row block (rows on the 128 lanes) with both CDFs resident in VMEM in
[n, rows] layout; i advances in sublane groups of 8 and j in 128-bin slabs
restricted to precomputed active bands, so the n^2 plane never touches
HBM. A custom VJP reuses the same plane structure for the cotangents
(alpha-side reductions skipped when the target is constant). Non-TPU
backends use a jnp fallback with identical math (and lax.min/max tie
conventions) so CPU tests and the multichip dryrun need no TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_ROWS_PER_PROGRAM = 128  # lane-dim tile of the transposed CDFs
_SLAB = 128  # j-dimension sublane slab size (also the n padding quantum)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grid_dist_pow(d: Array, p: float) -> Array:
    if p == 2.0:
        return d * d
    if p == 1.0:
        return jnp.abs(d)
    return jnp.abs(d) ** p


# ---------------------------------------------------------------------------
# XLA fallback (CPU tests, dryrun, parity checks) — plain autodiff
# ---------------------------------------------------------------------------


def _sot_bilinear_xla(alpha: Array, beta: Array, g: Array, p: float) -> Array:
    """Dense jnp version of sum_ij mu_ij |g_i-g_j|^p. [rows, n] -> [rows]."""
    gamma = jnp.pad(alpha, ((0, 0), (1, 0)))[:, :-1]
    delta = jnp.pad(beta, ((0, 0), (1, 0)))[:, :-1]
    mu = jax.nn.relu(
        jnp.minimum(alpha[:, :, None], beta[:, None, :])
        - jnp.maximum(gamma[:, :, None], delta[:, None, :])
    )
    dist = _grid_dist_pow(g[:, None] - g[None, :], p)
    return jnp.sum(mu * dist[None], axis=(1, 2))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(lo_ref, hi_ref, alpha_t_ref, gamma_t_ref, beta_t_ref,
                delta_t_ref, g_t_ref, out_ref, *, p: float):
    """One program: W for a 128-row block, everything in [n, rows] layout.

    i (the u-side grid bin) advances sequentially in sublane-groups of 8;
    for each group only the j-slabs inside the precomputed active band
    [lo, hi) are touched (CDF monotonicity makes the mu support a staircase
    band — for harmonic spectra most of the n^2 plane is provably zero).
    Rows ride the 128 lanes, j rides sublanes: no transposes and no dynamic
    lane indexing.
    """
    import jax.experimental.pallas as pl

    n = alpha_t_ref.shape[0]
    r_lanes = alpha_t_ref.shape[1]

    def group(g, acc):
        base = pl.multiple_of(g * 8, 8)
        a_blk = alpha_t_ref[pl.ds(base, 8), :]   # [8, R]
        c_blk = gamma_t_ref[pl.ds(base, 8), :]
        g_blk = g_t_ref[pl.ds(base, 8), :]       # [8, 1]
        j_lo = lo_ref[0, 0, g]
        j_hi = hi_ref[0, 0, g]

        def slab(s, acc):
            off = pl.multiple_of(s * _SLAB, _SLAB)
            beta_s = beta_t_ref[pl.ds(off, _SLAB), :]     # [J, R]
            delta_s = delta_t_ref[pl.ds(off, _SLAB), :]
            g_s = g_t_ref[pl.ds(off, _SLAB), :]           # [J, 1]
            for t in range(8):
                a_row = a_blk[t : t + 1, :]               # [1, R]
                c_row = c_blk[t : t + 1, :]
                gi = g_blk[t : t + 1, :]                  # [1, 1]
                d2 = _grid_dist_pow(g_s - gi, p)          # [J, 1]
                mu = jax.nn.relu(jnp.minimum(a_row, beta_s)
                                 - jnp.maximum(c_row, delta_s))  # [J, R]
                acc = acc + jnp.sum(mu * d2, axis=0, keepdims=True)
            return acc

        return jax.lax.fori_loop(j_lo, j_hi, slab, acc)

    acc = jax.lax.fori_loop(0, n // 8, group,
                            jnp.zeros((1, r_lanes), jnp.float32))
    out_ref[0] = acc


def _bwd_kernel(lo_ref, hi_ref, alpha_t_ref, gamma_t_ref, beta_t_ref,
                delta_t_ref, g_t_ref, wbar_ref, *out_refs, p: float,
                alpha_grads: bool):
    """Cotangent planes. With ``alpha_grads=False`` (the training case:
    the target spectrum is input data, no gradient needed) only the
    beta-side cotangents are produced, skipping two lane-reductions per
    plane and the alpha-side output traffic."""
    import jax.experimental.pallas as pl

    if alpha_grads:
        da_t_ref, dc_t_ref, db_t_ref, dd_t_ref, db_scratch, dd_scratch = out_refs
    else:
        db_t_ref, dd_t_ref, db_scratch, dd_scratch = out_refs
    n = alpha_t_ref.shape[0]
    r_lanes = alpha_t_ref.shape[1]
    wb = wbar_ref[0]            # [1, R]
    db_scratch[:] = jnp.zeros_like(db_scratch)
    dd_scratch[:] = jnp.zeros_like(dd_scratch)

    def group(g, _):
        base = pl.multiple_of(g * 8, 8)
        a_blk = alpha_t_ref[pl.ds(base, 8), :]
        c_blk = gamma_t_ref[pl.ds(base, 8), :]
        g_blk = g_t_ref[pl.ds(base, 8), :]
        j_lo = lo_ref[0, 0, g]
        j_hi = hi_ref[0, 0, g]
        zero_row = jnp.zeros((1, r_lanes), jnp.float32)

        def slab(s, carry):
            da_acc, dc_acc = carry
            off = pl.multiple_of(s * _SLAB, _SLAB)
            beta_s = beta_t_ref[pl.ds(off, _SLAB), :]
            delta_s = delta_t_ref[pl.ds(off, _SLAB), :]
            g_s = g_t_ref[pl.ds(off, _SLAB), :]
            db_acc = jnp.zeros((_SLAB, r_lanes), jnp.float32)
            dd_acc = jnp.zeros((_SLAB, r_lanes), jnp.float32)
            da_new = []
            dc_new = []
            for t in range(8):
                a_row = a_blk[t : t + 1, :]
                c_row = c_blk[t : t + 1, :]
                gi = g_blk[t : t + 1, :]
                d2 = _grid_dist_pow(g_s - gi, p)              # [J, 1]
                lo = jnp.maximum(c_row, delta_s)              # [J, R]
                hi = jnp.minimum(a_row, beta_s)
                m = (hi > lo).astype(jnp.float32)
                k_plane = m * d2 * wb                         # [J, R]
                # d mu/d alpha_i: 1 if a<b, 0.5 at ties (lax.min convention)
                wa = jnp.where(a_row < beta_s, 1.0,
                               jnp.where(a_row == beta_s, 0.5, 0.0))
                wc = jnp.where(c_row > delta_s, 1.0,
                               jnp.where(c_row == delta_s, 0.5, 0.0))
                kw = k_plane * wa
                kc = k_plane * wc
                if alpha_grads:
                    da_new.append(da_acc[t] + jnp.sum(kw, axis=0,
                                                      keepdims=True))
                    dc_new.append(dc_acc[t] - jnp.sum(kc, axis=0,
                                                      keepdims=True))
                db_acc = db_acc + (k_plane - kw)
                dd_acc = dd_acc + (kc - k_plane)
            db_scratch[pl.ds(off, _SLAB), :] = (
                db_scratch[pl.ds(off, _SLAB), :] + db_acc)
            dd_scratch[pl.ds(off, _SLAB), :] = (
                dd_scratch[pl.ds(off, _SLAB), :] + dd_acc)
            if not alpha_grads:
                return carry
            return tuple(da_new), tuple(dc_new)

        init = (tuple(zero_row for _ in range(8)),
                tuple(zero_row for _ in range(8)))
        da_rows, dc_rows = jax.lax.fori_loop(j_lo, j_hi, slab, init)
        if alpha_grads:
            da_t_ref[pl.ds(base, 8), :] = jnp.concatenate(da_rows, axis=0)
            dc_t_ref[pl.ds(base, 8), :] = jnp.concatenate(dc_rows, axis=0)
        return 0

    jax.lax.fori_loop(0, n // 8, group, 0)
    db_t_ref[:] = db_scratch[:]
    dd_t_ref[:] = dd_scratch[:]


def _pad_rows_cols(x: Array, rows_p: int, n_p: int) -> Array:
    """Pad columns with the edge value (empty [cap, cap] intervals => mu = 0,
    and CDF monotonicity — which the band limits rely on — is preserved),
    then rows with zeros (all-empty rows, discarded after the kernel)."""
    rows, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, n_p - n)), mode="edge")
    return jnp.pad(x, ((0, rows_p - rows), (0, 0)))


def _interpret() -> bool:
    from sot_tpu.ops.numerics import env_flag

    return env_flag("SOT_TPU_PALLAS_INTERPRET")


def _prep(alpha, beta, rows_p, n_p):
    alpha_p = _pad_rows_cols(alpha, rows_p, n_p)
    beta_p = _pad_rows_cols(beta, rows_p, n_p)
    gamma_p = jnp.pad(alpha_p, ((0, 0), (1, 0)))[:, :-1]
    delta_p = jnp.pad(beta_p, ((0, 0), (1, 0)))[:, :-1]
    return alpha_p, gamma_p, beta_p, delta_p


def _band_limits(alpha_p, gamma_p, beta_p, delta_p, n_prog):
    """Active j-slab range [j_lo, j_hi) per (program, i-group). [n_prog, G].

    A slab s is provably inert for i-group g over the whole 128-row block if
    for every row either the slab's top CDF value is below the group's
    bottom (beta_end < gamma_base => mu = 0) or the slab's bottom exceeds
    the group's top (delta_start > alpha_end => mu = 0). Both predicates are
    monotone in s, so the active set is a contiguous slab range.
    """
    rows_p, n_p = alpha_p.shape
    n_groups = n_p // 8
    n_slabs = n_p // _SLAB
    r = rows_p // n_prog
    gamma_base = gamma_p[:, ::8].reshape(n_prog, r, n_groups)
    alpha_end = alpha_p[:, 7::8].reshape(n_prog, r, n_groups)
    beta_end = beta_p[:, _SLAB - 1 :: _SLAB].reshape(n_prog, r, n_slabs)
    delta_start = delta_p[:, ::_SLAB].reshape(n_prog, r, n_slabs)
    below = jnp.all(beta_end[:, :, :, None] < gamma_base[:, :, None, :],
                    axis=1)   # [n_prog, n_slabs, n_groups]
    above = jnp.all(delta_start[:, :, :, None] > alpha_end[:, :, None, :],
                    axis=1)
    # Padded zero columns break beta_end/delta_start monotonicity in the
    # tail slab, so count the contiguous prefix/suffix runs rather than
    # summing the predicates (a below=True beyond a below=False slab must
    # not shift the range start past real work).
    j_lo = jnp.sum(jnp.cumprod(below.astype(jnp.int32), axis=1), axis=1)
    j_hi = n_slabs - jnp.sum(
        jnp.cumprod(above.astype(jnp.int32)[:, ::-1, :], axis=1), axis=1)
    j_hi = jnp.maximum(j_hi, j_lo)
    # saturated i-groups (alpha_end <= gamma_base in every row: all quantile
    # intervals empty, e.g. the CDF tail past the last harmonic) do no work
    empty = jnp.all(
        alpha_end[:, :, None, :] <= gamma_base[:, :, None, :], axis=1
    )[:, 0, :]
    j_hi = jnp.where(empty, j_lo, j_hi)
    return j_lo, j_hi


def _pallas_fwd(alpha: Array, beta: Array, g: Array, p: float) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = alpha.shape
    n_p = _round_up(n, _SLAB)
    rows_p = _round_up(rows, _ROWS_PER_PROGRAM)
    # zero padding is inert: padded intervals are empty => mu = 0
    alpha_p, gamma_p, beta_p, delta_p = _prep(alpha, beta, rows_p, n_p)
    g_p = jnp.pad(g, (0, n_p - n))
    n_prog = rows_p // _ROWS_PER_PROGRAM
    j_lo, j_hi = _band_limits(alpha_p, gamma_p, beta_p, delta_p, n_prog)
    n_groups = n_p // 8

    col_block = lambda i: (0, i)
    cdf_spec = pl.BlockSpec((n_p, _ROWS_PER_PROGRAM), col_block,
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1, n_groups), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, p=p),
        grid=(n_prog,),
        in_specs=[
            smem_spec, smem_spec,
            cdf_spec, cdf_spec, cdf_spec, cdf_spec,
            pl.BlockSpec((n_p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _ROWS_PER_PROGRAM), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog, 1, _ROWS_PER_PROGRAM),
                                       jnp.float32),
        interpret=_interpret(),
    )(j_lo[:, None, :], j_hi[:, None, :], alpha_p.T, gamma_p.T, beta_p.T,
      delta_p.T, g_p[:, None])
    return out.reshape(rows_p)[:rows]


def _pallas_bwd(alpha: Array, beta: Array, g: Array, p: float, wbar: Array,
                alpha_grads: bool = True) -> Tuple[Array, Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n = alpha.shape
    n_p = _round_up(n, _SLAB)
    rows_p = _round_up(rows, _ROWS_PER_PROGRAM)
    alpha_p, gamma_p, beta_p, delta_p = _prep(alpha, beta, rows_p, n_p)
    g_p = jnp.pad(g, (0, n_p - n))
    n_prog = rows_p // _ROWS_PER_PROGRAM
    j_lo, j_hi = _band_limits(alpha_p, gamma_p, beta_p, delta_p, n_prog)
    n_groups = n_p // 8
    wbar_p = jnp.pad(wbar, (0, rows_p - rows)).reshape(
        n_prog, 1, _ROWS_PER_PROGRAM)

    col_block = lambda i: (0, i)
    cdf_spec = pl.BlockSpec((n_p, _ROWS_PER_PROGRAM), col_block,
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1, n_groups), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    n_outs = 4 if alpha_grads else 2
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, p=p, alpha_grads=alpha_grads),
        grid=(n_prog,),
        in_specs=[
            smem_spec, smem_spec,
            cdf_spec, cdf_spec, cdf_spec, cdf_spec,
            pl.BlockSpec((n_p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _ROWS_PER_PROGRAM), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[cdf_spec] * n_outs,
        out_shape=[
            jax.ShapeDtypeStruct((n_p, rows_p), jnp.float32)
            for _ in range(n_outs)
        ],
        scratch_shapes=[
            pltpu.VMEM((n_p, _ROWS_PER_PROGRAM), jnp.float32),
            pltpu.VMEM((n_p, _ROWS_PER_PROGRAM), jnp.float32),
        ],
        interpret=_interpret(),
    )(j_lo[:, None, :], j_hi[:, None, :], alpha_p.T, gamma_p.T, beta_p.T,
      delta_p.T, g_p[:, None], wbar_p)
    if alpha_grads:
        da_t, dc_t, db_t, dd_t = outs
    else:
        db_t, dd_t = outs
    # fold the gamma/delta (shift-by-one) chain rule back onto alpha/beta:
    # gamma_i = alpha_{i-1}  =>  dalpha_i += dgamma_{i+1}  (the padded
    # column n's cotangent is identically zero, so including it when
    # n_p > n is a no-op; when n_p == n we append an explicit zero)
    def _shift_left(dg_arr: Array) -> Array:
        dg_arr = dg_arr[:rows]
        if n_p > n:
            return dg_arr[:, 1 : n + 1]
        return jnp.concatenate(
            [dg_arr[:, 1:n], jnp.zeros((rows, 1), dg_arr.dtype)], axis=-1)

    db_full = db_t.T[:rows, :n] + _shift_left(dd_t.T)
    if not alpha_grads:
        return jnp.zeros_like(db_full), db_full
    da = da_t.T[:rows, :n] + _shift_left(dc_t.T)
    return da, db_full


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sot_bilinear_pallas(alpha: Array, beta: Array, g: Array, p: float) -> Array:
    return _pallas_fwd(alpha, beta, g, p)


def _sot_fwd(alpha, beta, g, p):
    return _pallas_fwd(alpha, beta, g, p), (alpha, beta, g)


def _sot_bwd(p, res, wbar):
    alpha, beta, g = res
    da, db = _pallas_bwd(alpha, beta, g, p, wbar)
    return da, db, jnp.zeros_like(g)


_sot_bilinear_pallas.defvjp(_sot_fwd, _sot_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sot_bilinear_pallas_target_const(alpha: Array, beta: Array, g: Array,
                                      p: float) -> Array:
    """Variant declaring alpha (the target spectrum's CDF) constant: its
    cotangent is zero and the bwd kernel skips the alpha-side reductions.
    Used by the training loss where the target is input data."""
    return _pallas_fwd(alpha, beta, g, p)


def _sot_fwd_tc(alpha, beta, g, p):
    return _pallas_fwd(alpha, beta, g, p), (alpha, beta, g)


def _sot_bwd_tc(p, res, wbar):
    alpha, beta, g = res
    da, db = _pallas_bwd(alpha, beta, g, p, wbar, alpha_grads=False)
    return da, db, jnp.zeros_like(g)


_sot_bilinear_pallas_target_const.defvjp(_sot_fwd_tc, _sot_bwd_tc)


def _use_pallas() -> bool:
    from sot_tpu.ops.numerics import env_flag

    if env_flag("SOT_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def sot_bilinear(alpha: Array, beta: Array, g: Array, p: float = 2.0,
                 use_pallas: bool | None = None,
                 target_constant: bool = False) -> Array:
    """sum_ij ReLU(min(a_i,b_j) - max(a_{i-1},b_{j-1})) |g_i-g_j|^p, per row.

    alpha, beta: [rows, n] nondecreasing clipped CDFs; g: [n] sorted grid.
    Differentiable in alpha/beta (grid is static). Dispatches to the fused
    Pallas kernel on TPU, dense jnp elsewhere.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas:
        if target_constant:
            return _sot_bilinear_pallas_target_const(alpha, beta, g, float(p))
        return _sot_bilinear_pallas(alpha, beta, g, float(p))
    if target_constant:
        # match the Pallas variant's semantics (zero cotangent to the target)
        alpha = jax.lax.stop_gradient(alpha)
    return _sot_bilinear_xla(alpha, beta, g, float(p))


# ---------------------------------------------------------------------------
# O(n log n) sort-merge formulation for p = 2 — TEST ORACLE ONLY.
# The production dispatch for this path was removed in round 4: the on-chip
# A/B measured it ~10x worse than the Pallas merge kernel (grad 17.7 ms at
# [1024x1025] — lax.sort/gather VJPs; results/round2/sot_ab.json, PERF.md
# "negative results"), and its tie subgradients differ from the reference
# convention at the kinks. It remains as an INDEPENDENT implementation of
# the coupling used to cross-check the merge kernel (tests/test_sot_merge,
# tests/test_sot_pallas).
# ---------------------------------------------------------------------------


def _sot_w2_sortmerge(alpha: Array, beta: Array, g: Array) -> Array:
    """W_2^2 rows via marginals + a merged-sort coupling integral.

    Same quantity as ``_sot_bilinear_xla(alpha, beta, g, p=2)``:

        W = sum_i (alpha_i - gamma_i) g_i^2 + sum_j (beta_j - delta_j) g_j^2
            - 2 * C,   C = int_0^cap Fu^{-1}(q) Fv^{-1}(q) dq

    Writing the inverse CDFs as step sums Fu^{-1}(q) = g_0 +
    sum_k dg_k H(q - alpha_{k-1}) turns the coupling into

        C = g_0^2 cap + g_0 sum_k dg_k (a_k + b_k) + S,
        S = sum_{k,l} dg_k dg_l min(a_k, b_l),
        a_k = cap - alpha_{k-1},  b_l = cap - beta_{l-1}  (both >= 0),

    and with min(a,b) = int 1[t<a] 1[t<b] dt, S becomes
    int P(t) Q(t) dt with P a prefix sum over the DESC-sorted merged values
    {a} u {b} — ONE lax.sort with static weight payloads + MXU prefix sums,
    no n^2 plane and no per-row gathers (sort's VJP is the permutation).
    Subgradients at exact ties (notably the saturated a=b=0 cap tail) are
    distributed differently from the kernel's 0.5 convention — the usual
    measure-zero kink caveat; the clip upstream zeroes most of them anyway.
    """
    from sot_tpu.ops.scan import prefix_sum

    rows, n_aug = alpha.shape
    gamma = jnp.pad(alpha, ((0, 0), (1, 0)))[:, :-1]
    delta = jnp.pad(beta, ((0, 0), (1, 0)))[:, :-1]
    g2 = g * g
    marg = jnp.einsum("rn,n->r", alpha - gamma, g2) + jnp.einsum(
        "rn,n->r", beta - delta, g2)

    cap = alpha[:, -1]  # == beta[:, -1] (both end clipped at cap)
    x = (g[1:] - g[:-1]).astype(jnp.float32)          # [n_aug-1] static
    a = cap[:, None] - alpha[:, :-1]                  # [rows, n_aug-1]
    b = cap[:, None] - beta[:, :-1]
    m2 = 2 * (n_aug - 1)
    vals = jnp.concatenate([a, b], axis=-1)           # [rows, m2]
    wa = jnp.broadcast_to(
        jnp.concatenate([x, jnp.zeros_like(x)]), (rows, m2))
    wb = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros_like(x), x]), (rows, m2))
    neg_t, swa, swb = jax.lax.sort((-vals, wa, wb), dimension=-1, num_keys=1)
    t = -neg_t                                        # DESC merged values
    X = prefix_sum(swa, axis=-1)
    Y = prefix_sum(swb, axis=-1)
    widths = t - jnp.concatenate(
        [t[:, 1:], jnp.zeros((rows, 1), t.dtype)], axis=-1)
    S = jnp.sum(X * Y * widths, axis=-1)
    cross = (g[0] * g[0]) * cap + g[0] * (
        jnp.einsum("rn,n->r", a, x) + jnp.einsum("rn,n->r", b, x)) + S
    return marg - 2.0 * cross


def _merge_mode(n_bins: int | None = None) -> str:
    """SOT_TPU_W2_MERGE: off | full | hybrid | ref.

    Per-shape override (round-4 A/B finding): at the SOT-512 families'
    shape ([rows x 257]) the plane backward is cheap enough that hybrid
    BEATS ref (0.570 vs 0.630 ms total, results/round2/refgrad_ab_512.json)
    — the merge-route backward's log-factor overhead only pays off at
    large n. When ``SOT_TPU_W2_MERGE_SMALL`` is set and the row length is
    <= SOT_TPU_W2_SMALL_N (default 512 bins), it overrides the main gate;
    kernel_gates emits it from the committed 512-shape A/Bs.

    'hybrid' pairs the O(n log n) merge FORWARD (values are
    convention-free and 7x faster than the plane kernel) with the plane
    kernel's BACKWARD — the gradient convention validated end-to-end
    against the torch reference.  Full-merge gradients realize exact
    min-halving subgradients instead; real spectra sit exactly on the
    cap-tie kink manifold (the quantile cap is DEFINED as an attained CDF
    value), so the two conventions differ macroscopically there and only
    training evidence can justify 'full' (see PERF.md, round 3).

    'ref' upgrades hybrid: the backward is the O(n log n) merge-route
    kernel of ops/pallas/refgrad.py, which reproduces the plane kernel's
    EXACT gradient convention (rank-query identities; parity-tested at
    the kinks), so it is training-safe by construction — no n^2 plane
    anywhere.  Falls back to the plane backward when the target needs a
    cotangent (non-training path)."""
    from sot_tpu.ops.numerics import env_flag

    if n_bins is not None and n_bins <= int(
            os.environ.get("SOT_TPU_W2_SMALL_N", "512")):
        small = os.environ.get("SOT_TPU_W2_MERGE_SMALL", "").strip().lower()
        if small in ("off", "full", "hybrid", "ref"):
            return small
    raw = os.environ.get("SOT_TPU_W2_MERGE", "").strip().lower()
    if raw in ("hybrid", "ref"):
        return raw
    return "full" if env_flag("SOT_TPU_W2_MERGE") else "off"


def _use_merge_kernel() -> bool:
    return _merge_mode() != "off"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _w2_merge_hybrid(alpha: Array, beta: Array, g: Array,
                     target_constant: bool) -> Array:
    from sot_tpu.ops.pallas.merge import sot_w2_merge

    return sot_w2_merge(alpha, beta, g, target_constant=target_constant)


def _w2_merge_hybrid_fwd(alpha, beta, g, target_constant):
    from sot_tpu.ops.pallas.merge import sot_w2_merge

    value = sot_w2_merge(alpha, beta, g, target_constant=target_constant)
    return value, (alpha, beta, g)


def _w2_merge_hybrid_bwd(target_constant, res, wbar):
    alpha, beta, g = res
    da, db = _pallas_bwd(alpha, beta, g, 2.0, wbar,
                         alpha_grads=not target_constant)
    return da, db, jnp.zeros_like(g)


_w2_merge_hybrid.defvjp(_w2_merge_hybrid_fwd, _w2_merge_hybrid_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _w2_merge_refbwd(alpha: Array, beta: Array, g: Array,
                     target_constant: bool) -> Array:
    """Merge forward + reference-convention merge-route backward: the
    target-constant training case runs entirely in O(n log n) Pallas
    (ops/pallas/refgrad.py reproduces the plane kernel's exact gradient
    convention via rank queries); with a live target cotangent it falls
    back to the plane backward for both sides."""
    from sot_tpu.ops.pallas.merge import sot_w2_merge

    return sot_w2_merge(alpha, beta, g, target_constant=target_constant)


def _w2_merge_refbwd_fwd(alpha, beta, g, target_constant):
    from sot_tpu.ops.pallas.merge import sot_w2_merge

    value = sot_w2_merge(alpha, beta, g, target_constant=target_constant)
    return value, (alpha, beta, g)


def _w2_merge_refbwd_bwd(target_constant, res, wbar):
    alpha, beta, g = res
    if target_constant:
        from sot_tpu.ops.pallas.refgrad import ref_grad_beta

        db = ref_grad_beta(alpha, beta, g, wbar)
        return jnp.zeros_like(alpha), db, jnp.zeros_like(g)
    da, db = _pallas_bwd(alpha, beta, g, 2.0, wbar, alpha_grads=True)
    return da, db, jnp.zeros_like(g)


_w2_merge_refbwd.defvjp(_w2_merge_refbwd_fwd, _w2_merge_refbwd_bwd)


# ---------------------------------------------------------------------------
# Same-grid Wasserstein entry point
# ---------------------------------------------------------------------------


def wasserstein_same_grid(
    grid: Array,
    u_weights: Array,
    v_weights: Array,
    p: float = 2.0,
    limit_quantile_range: bool = False,
    use_pallas: bool | None = None,
    target_constant: bool = False,
) -> Array:
    """W_p^p between weight rows on one shared sorted grid. [rows].

    Matches reference losses.py:223-313 for u_values == v_values == grid
    (sorted): identical forward values and gradient paths, without the three
    sorts. ``limit_quantile_range`` integrates quantile levels over [0, Q*]
    with Q* the largest merged CDF value <= 1 — exactly the reference's
    "zero all merged segments whose right endpoint exceeds 1".
    """
    from sot_tpu.ops.scan import prefix_sum

    if p < 1:
        raise ValueError(f"The OT loss is only valid for p>=1, {p} was given")
    u_weights = jnp.asarray(u_weights, jnp.float32)
    v_weights = jnp.asarray(v_weights, jnp.float32)
    grid = jnp.asarray(grid, jnp.float32)
    rows, n = u_weights.shape
    if target_constant:
        # uniform semantics across p/backend paths: the target (u) carries
        # no gradient; the Pallas bwd additionally skips its reductions
        u_weights = jax.lax.stop_gradient(u_weights)

    U = prefix_sum(u_weights, axis=-1)
    V = prefix_sum(v_weights, axis=-1)
    if limit_quantile_range:
        cap = jnp.maximum(
            jnp.max(jnp.where(U <= 1.0, U, 0.0), axis=-1),
            jnp.max(jnp.where(V <= 1.0, V, 0.0), axis=-1),
        )[:, None]
    else:
        cap = jnp.maximum(U[:, -1], V[:, -1])[:, None]
    # one virtual tail lane at level cap: the reference clamps quantile
    # lookups past the grid end to the last bin (losses.py:219-220)
    alpha = jnp.concatenate([jnp.minimum(U, cap), cap], axis=-1)
    beta = jnp.concatenate([jnp.minimum(V, cap), cap], axis=-1)
    gaug = jnp.concatenate([grid, grid[-1:]], axis=-1)

    if p == 1.0:
        dg = gaug[1:] - gaug[:-1]
        return jnp.sum(jnp.abs(alpha[:, :-1] - beta[:, :-1]) * dg[None, :], -1)

    mode_n = _merge_mode(n_bins=n)
    merge_mode = ("off" if not (p == 2.0 and mode_n != "off"
                                and (_use_pallas() or _interpret()))
                  else mode_n)
    if merge_mode == "full":
        # O(n log n) Pallas bitonic-merge coupling (ops/pallas/merge.py)
        from sot_tpu.ops.pallas.merge import sot_w2_merge

        return sot_w2_merge(alpha, beta, gaug,
                            target_constant=target_constant)

    if merge_mode == "ref":
        if target_constant:
            # fully O(n log n): merge fwd + reference-convention merge bwd
            # (no banded plane anywhere -> no row grouping needed)
            return _w2_merge_refbwd(alpha, beta, gaug, True)
        merge_mode = "hybrid"  # plane bwd for the target cotangent

    if use_pallas is None:
        use_pallas = _use_pallas()

    def _solve(al, be):
        if merge_mode == "hybrid":
            # merge forward + plane backward (reference-convention grads)
            return _w2_merge_hybrid(al, be, gaug, target_constant)
        return sot_bilinear(al, be, gaug, p=p, use_pallas=use_pallas,
                            target_constant=target_constant)

    if (use_pallas or merge_mode == "hybrid") and (
            rows >= 2 * _ROWS_PER_PROGRAM):
        # The plane kernel's band limits are per 128-row block (AND over
        # rows).  Rows are per (clip, frame) and clips differ wildly in f0,
        # so group similar rows: sort by the CDF's half-mass bin
        # (differentiable gather; inverse-permute the per-row results
        # after).  Empirically this recovers most of the ~60%
        # per-row-skippable work.  The hybrid mode routes through the same
        # grouping: its BACKWARD is the plane kernel and loses ~1.4 ms to
        # loose bands on unsorted rows (on-chip round-3 measurement).
        key = jnp.sum((alpha < 0.5 * cap).astype(jnp.int32), axis=-1)
        order = jnp.argsort(key)
        inv = jnp.argsort(order)
        w = _solve(jnp.take(alpha, order, axis=0),
                   jnp.take(beta, order, axis=0))
        return jnp.take(w, inv)
    return _solve(alpha, beta)
