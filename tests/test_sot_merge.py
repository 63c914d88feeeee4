"""Parity tests for the O(n log n) Pallas merge coupling (ops/pallas/merge).

The merge kernel must reproduce the banded-plane/XLA overlap formulation
(ops/pallas/sot.py) — the reference-parity anchor (reference
losses.py:223-313) — in values everywhere and in gradients away from kinks
(exact CDF ties at the cap, zero bins), where subgradient conventions
legitimately differ between reduction orders.  Runs in Pallas interpreter
mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sot_tpu.ops.pallas.sot import _sot_bilinear_xla, wasserstein_same_grid
from sot_tpu.ops.pallas.merge import sot_w2_merge
from sot_tpu.ops.wasserstein import wasserstein_1d

from test_sot_pallas import _alpha_beta, _make_case


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")


# rows > 128 exercises multi-program row blocking + padding; n = 64 makes
# m8 == M2 (no sentinel region); n = 97 pads both.
@pytest.mark.parametrize("rows,n", [(12, 97), (130, 64), (7, 130)])
@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 1.9])
def test_merge_kernel_matches_xla_forward(rows, n, lqr, v_mass):
    grid, u, v = _make_case(21 + n, rows=rows, n=n, v_mass=v_mass)
    alpha, beta, gaug = _alpha_beta(grid, u, v, lqr)
    ref = _sot_bilinear_xla(alpha, beta, gaug, 2.0)
    out = sot_w2_merge(alpha, beta, gaug)
    # unlike the plane form, the merge form subtracts large marginal and
    # coupling terms, so there is an absolute fp32 cancellation floor on
    # top of the relative tolerance
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5 * scale + 3e-7)


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 1.9])
def test_merge_kernel_gradients_match_xla(lqr, v_mass):
    from functools import partial

    grid, u, v = _make_case(23, rows=10, n=89, v_mass=v_mass, zeros=False)

    def f(fn, uu, vv):
        a, b, gaug = _alpha_beta(grid, uu, vv, lqr)
        return jnp.sum(fn(a, b, gaug))

    gu_m, gv_m = jax.grad(partial(f, sot_w2_merge), argnums=(0, 1))(u, v)
    gu_p, gv_p = jax.grad(
        partial(f, lambda a, b, g: _sot_bilinear_xla(a, b, g, 2.0)),
        argnums=(0, 1))(u, v)

    U = np.cumsum(np.asarray(u), -1)
    V = np.cumsum(np.asarray(v), -1)
    if lqr:
        cap = np.maximum(np.max(np.where(U <= 1.0, U, 0.0), -1),
                         np.max(np.where(V <= 1.0, V, 0.0), -1))[:, None]
    else:
        cap = np.maximum(U[:, -1], V[:, -1])[:, None]
    ok = (U < cap - 1e-5) & (V < cap - 1e-5)
    scale = max(float(jnp.max(jnp.abs(gu_p))), float(jnp.max(jnp.abs(gv_p))))
    np.testing.assert_allclose(np.asarray(gu_m)[ok], np.asarray(gu_p)[ok],
                               atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(gv_m)[ok], np.asarray(gv_p)[ok],
                               atol=1e-3 * scale)


def _merge_form_dense(alpha, beta, g):
    """Dense XLA mirror of sot_w2_merge's decomposition with the coupling
    as an explicit jnp.minimum bilinear — autodiff of jnp.minimum splits
    ties 0.5/0.5, so this realizes EXACTLY the min-halving subgradient
    convention the merge kernel's two-pass average implements."""
    gamma = jnp.pad(alpha, ((0, 0), (1, 0)))[:, :-1]
    delta = jnp.pad(beta, ((0, 0), (1, 0)))[:, :-1]
    g2 = g * g
    marg = jnp.einsum("rn,n->r", alpha - gamma, g2) + jnp.einsum(
        "rn,n->r", beta - delta, g2)
    cap = alpha[:, -1]
    x = (g[1:] - g[:-1]).astype(jnp.float32)
    a = cap[:, None] - alpha[:, :-1]
    b = cap[:, None] - beta[:, :-1]
    S = jnp.einsum("rkl,k,l->r",
                   jnp.minimum(a[:, :, None], b[:, None, :]), x, x)
    cross = (g[0] * g[0]) * cap + g[0] * (
        jnp.einsum("rn,n->r", a, x) + jnp.einsum("rn,n->r", b, x)) + S
    return marg - 2.0 * cross


@pytest.mark.parametrize("lqr", [False, True])
def test_merge_kernel_tie_subgradients_match_min_halving(lqr):
    """Gradient parity at exact ties, NO kink masking, against the dense
    min-halving oracle.  Regression for the round-3 on-chip failure: a
    single merge with network tie routing interleaves tied elements,
    misattributes their prefix sums, and diverges training (LSD ~88 vs
    ~23); the two-pass lexicographic average realizes the same balanced
    0.5 tie splits as jnp.minimum autodiff.  (The overlap-form XLA/plane
    path composes 0.5 splits through relu(min-max) differently — at kinks
    the conventions differ by bounded amounts; both are valid balanced
    subgradients, and away from kinks all paths agree — see the masked
    test above.)  Sparse weights with exact zeros + the quantile cap
    maximize tie count, like real spectra."""
    from functools import partial

    grid, u, v = _make_case(47, rows=12, n=97, v_mass=1.4, zeros=True)

    def f(fn, uu, vv):
        a, b, gaug = _alpha_beta(grid, uu, vv, lqr)
        return jnp.sum(fn(a, b, gaug))

    gu_m, gv_m = jax.grad(partial(f, sot_w2_merge), argnums=(0, 1))(u, v)
    gu_d, gv_d = jax.grad(partial(f, _merge_form_dense),
                          argnums=(0, 1))(u, v)
    scale = max(float(jnp.max(jnp.abs(gu_d))), float(jnp.max(jnp.abs(gv_d))))
    np.testing.assert_allclose(np.asarray(gu_m), np.asarray(gu_d),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(gv_m), np.asarray(gv_d),
                               atol=1e-4 * scale)


def test_merge_kernel_target_constant_matches_stopgrad_spec():
    """target_constant's exact spec: identical to the full VJP with
    stop_gradient applied to the alpha BODY lanes (cap lane stays live —
    its (sum x)^2 coupling cotangent is target-independent)."""
    grid, u, v = _make_case(29, rows=8, n=77, v_mass=1.3)

    def gv(tc):
        def loss(vv):
            alpha, beta, gaug = _alpha_beta(grid, u, vv, True)
            if not tc:
                alpha = jnp.concatenate(
                    [jax.lax.stop_gradient(alpha[:, :-1]), alpha[:, -1:]],
                    axis=-1)
            return jnp.sum(sot_w2_merge(alpha, beta, gaug,
                                        target_constant=tc))
        return jax.grad(loss)(v)

    np.testing.assert_allclose(np.asarray(gv(True)), np.asarray(gv(False)),
                               rtol=1e-6, atol=1e-8)


def test_merge_kernel_exact_tie_rows_finite():
    """Identical spectra (fully saturated CDFs, maximal tie count) must give
    W = 0 and finite gradients through the merge + compaction."""
    grid = jnp.linspace(0.0, 1.0, 64)
    u = jnp.ones((4, 64)) / 64.0
    a, b, gaug = _alpha_beta(grid, u, u, True)
    out = sot_w2_merge(a, b, gaug)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    g = jax.grad(lambda vv: jnp.sum(
        sot_w2_merge(*_alpha_beta(grid, u, vv, True))))(u)
    assert np.isfinite(np.asarray(g)).all()


def test_merge_kernel_composes_with_row_sharding(monkeypatch):
    """SOT_TPU_W2_MERGE inside the row-sharded shard_map solver (the
    multi-chip training loss path) matches the unsharded merge solve."""
    from sot_tpu.parallel.mesh import make_mesh
    from sot_tpu.parallel.sharded_ops import wasserstein_same_grid_row_sharded

    monkeypatch.setenv("SOT_TPU_W2_MERGE", "1")
    mesh = make_mesh(8, freq=2)
    grid, u, v = _make_case(37, rows=16, n=96, v_mass=1.4)
    sharded = wasserstein_same_grid_row_sharded(
        grid, u, v, mesh, p=2.0, limit_quantile_range=True)
    single = wasserstein_same_grid(grid, u, v, p=2.0,
                                   limit_quantile_range=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-7)


def test_hybrid_mode_merge_value_plane_grads(monkeypatch):
    """SOT_TPU_W2_MERGE=hybrid: forward value identical to the full merge
    path, gradients identical to the plane/overlap path (the convention
    validated e2e against the torch reference) — including at the cap-tie
    kinks real spectra always sit on."""
    grid, u, v = _make_case(53, rows=12, n=97, v_mass=1.4, zeros=True)

    def run(env):
        if env is None:
            monkeypatch.delenv("SOT_TPU_W2_MERGE", raising=False)
        else:
            monkeypatch.setenv("SOT_TPU_W2_MERGE", env)

        def loss(uu, vv):
            return jnp.sum(wasserstein_same_grid(
                grid, uu, vv, p=2.0, limit_quantile_range=True))

        val = wasserstein_same_grid(grid, u, v, p=2.0,
                                    limit_quantile_range=True)
        gu, gv = jax.grad(loss, argnums=(0, 1))(u, v)
        return np.asarray(val), np.asarray(gu), np.asarray(gv)

    val_h, gu_h, gv_h = run("hybrid")
    val_m, _, _ = run("1")
    val_p, gu_p, gv_p = run(None)
    np.testing.assert_allclose(val_h, val_m, rtol=0, atol=0)
    # plane-kernel bwd vs dense-XLA autodiff: same convention, different
    # f32 reduction orders
    scale = float(np.abs(gu_p).max() + np.abs(gv_p).max()) + 1e-9
    np.testing.assert_allclose(gu_h, gu_p, atol=1e-5 * scale)
    np.testing.assert_allclose(gv_h, gv_p, atol=1e-5 * scale)


def test_merge_env_dispatch_matches_general(monkeypatch):
    """SOT_TPU_W2_MERGE=1 routes wasserstein_same_grid(p=2) through the
    Pallas merge and still matches the general sort-based implementation."""
    monkeypatch.setenv("SOT_TPU_W2_MERGE", "1")
    grid, u, v = _make_case(31, v_mass=1.9)
    rows, n = u.shape
    gridr = jnp.tile(grid, (rows, 1))
    ref = wasserstein_1d(gridr, gridr, u, v, p=2, require_sort=False,
                         limit_quantile_range=True)
    new = wasserstein_same_grid(grid, u, v, p=2.0, limit_quantile_range=True)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_merge_kernel_full_production_shape():
    """Parity at the EXACT SOT-2048 training shape (rows = batch 64 x 16
    frames = 1024, n_aug = 1026 -> m8 = 1032, M2 = 2048, L = 4096): the
    small-shape cases above never exercise the production padding geometry
    (sentinel region, 8-program row blocking) at full size."""
    rng = np.random.default_rng(0)
    rows, n = 1024, 1025

    def cdfs(seed):
        r = np.random.default_rng(seed)
        w = r.random((rows, n)).astype(np.float32) ** 3
        w *= r.random((rows, n)) < 0.2  # sparse-ish, like spectra
        c = np.cumsum(w, axis=-1)
        c /= np.maximum(c[:, -1:], 1e-9)
        return np.minimum(c, 1.0)

    U, V = cdfs(1), cdfs(2)
    cap = np.maximum(U[:, -1], V[:, -1])[:, None].astype(np.float32)
    alpha = jnp.asarray(np.concatenate([np.minimum(U, cap), cap], axis=-1))
    beta = jnp.asarray(np.concatenate([np.minimum(V, cap), cap], axis=-1))
    grid = np.linspace(0.0, 1.0, n).astype(np.float32)
    gaug = jnp.asarray(np.concatenate([grid, grid[-1:]]))

    from sot_tpu.ops.pallas.sot import _sot_w2_sortmerge

    ref = _sot_w2_sortmerge(alpha, beta, gaug)
    got = sot_w2_merge(alpha, beta, gaug)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4 * scale)

    gref = jax.grad(lambda b: jnp.sum(_sot_w2_sortmerge(alpha, b, gaug)))(beta)
    gmer = jax.grad(lambda b: jnp.sum(sot_w2_merge(alpha, b, gaug)))(beta)
    d = np.abs(np.asarray(gref - gmer))
    assert float(np.mean(d > 1e-3)) < 0.01  # kink-bin allowance
