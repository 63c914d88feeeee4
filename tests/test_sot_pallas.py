"""Parity tests for the fused same-grid SOT kernel (sot_tpu.ops.pallas.sot).

Three layers of checking:
  1. wasserstein_same_grid (XLA overlap formulation) vs the general
     sort-based wasserstein_1d — values AND gradients, across mass ratios,
     p, and limit_quantile_range (incl. zero weights / tied CDS values).
  2. The Pallas kernel (interpret mode on CPU) vs the XLA formulation —
     forward and custom-VJP gradients.
  3. The Wasserstein1D loss module's same-grid dispatch vs its general path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sot_tpu.ops.pallas.sot import (
    _sot_bilinear_xla,
    sot_bilinear,
    wasserstein_same_grid,
)
from sot_tpu.ops.wasserstein import wasserstein_1d


def _make_case(seed, rows=12, n=97, v_mass=1.0, zeros=True):
    rng = np.random.default_rng(seed)
    grid = np.sort(rng.random(n)).astype(np.float32)
    u = rng.random((rows, n)).astype(np.float32)
    v = rng.random((rows, n)).astype(np.float32)
    if zeros:
        u[:, ::7] = 0.0
        v[:, ::5] = 0.0
    u /= u.sum(-1, keepdims=True)
    v /= v.sum(-1, keepdims=True) / v_mass
    return jnp.asarray(grid), jnp.asarray(u), jnp.asarray(v)


@pytest.mark.parametrize("p", [1.0, 2.0])
@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 0.62, 1.9])
def test_same_grid_matches_general(p, lqr, v_mass):
    grid, u, v = _make_case(0, v_mass=v_mass)
    rows, n = u.shape
    gridr = jnp.tile(grid, (rows, 1))
    ref = wasserstein_1d(gridr, gridr, u, v, p=p, require_sort=False,
                         limit_quantile_range=lqr)
    new = wasserstein_same_grid(grid, u, v, p=p, limit_quantile_range=lqr)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 0.62, 1.9])
def test_same_grid_gradients_match_general(lqr, v_mass):
    grid, u, v = _make_case(1, v_mass=v_mass)
    rows, n = u.shape
    gridr = jnp.tile(grid, (rows, 1))

    def f_ref(uu, vv):
        return jnp.sum(wasserstein_1d(gridr, gridr, uu, vv, p=2,
                                      require_sort=False,
                                      limit_quantile_range=lqr))

    def f_new(uu, vv):
        return jnp.sum(wasserstein_same_grid(grid, uu, vv, p=2.0,
                                             limit_quantile_range=lqr))

    gu_r, gv_r = jax.grad(f_ref, argnums=(0, 1))(u, v)
    gu_n, gv_n = jax.grad(f_new, argnums=(0, 1))(u, v)
    # At zero-weight bins the CDF has tied values and W is non-differentiable
    # (kink): the sort path and the overlap path pick different — equally
    # valid — subgradients (finite differences sit between them). Compare
    # only away from kinks; real magnitude spectra have no exact-zero bins.
    mask = (np.asarray(u) > 0) & (np.asarray(v) > 0)
    scale = max(float(jnp.max(jnp.abs(gu_r))), float(jnp.max(jnp.abs(gv_r))))
    np.testing.assert_allclose(np.asarray(gu_n)[mask], np.asarray(gu_r)[mask],
                               atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(gv_n)[mask], np.asarray(gv_r)[mask],
                               atol=5e-4 * scale)


@pytest.mark.parametrize("p", [1.0, 2.0, 3.0])
def test_pallas_kernel_matches_xla_forward(p):
    os.environ["SOT_TPU_PALLAS_INTERPRET"] = "1"
    try:
        grid, u, v = _make_case(2, rows=10, n=70, v_mass=0.8)
        U = jnp.cumsum(u, -1)
        V = jnp.cumsum(v, -1)
        cap = jnp.maximum(U[:, -1], V[:, -1])[:, None]
        alpha = jnp.minimum(U, cap)
        beta = jnp.minimum(V, cap)
        ref = _sot_bilinear_xla(alpha, beta, grid, p)
        out = sot_bilinear(alpha, beta, grid, p=p, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-7)
    finally:
        os.environ.pop("SOT_TPU_PALLAS_INTERPRET", None)


def test_pallas_kernel_matches_xla_grad():
    os.environ["SOT_TPU_PALLAS_INTERPRET"] = "1"
    try:
        grid, u, v = _make_case(3, rows=9, n=66, v_mass=1.0)
        U = jnp.cumsum(u, -1)
        V = jnp.cumsum(v, -1)
        cap = jnp.maximum(U[:, -1], V[:, -1])[:, None]
        alpha = jnp.minimum(U, cap)
        beta = jnp.minimum(V, cap)
        wbar = jnp.asarray(np.random.default_rng(0).random(u.shape[0]),
                           jnp.float32)

        def f(impl):
            def inner(a, b):
                return jnp.sum(
                    sot_bilinear(a, b, grid, p=2.0, use_pallas=impl) * wbar)
            return inner

        da_x, db_x = jax.grad(f(False), argnums=(0, 1))(alpha, beta)
        da_p, db_p = jax.grad(f(True), argnums=(0, 1))(alpha, beta)
        scale = float(jnp.max(jnp.abs(da_x))) + 1e-12
        np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_x),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_x),
                                   atol=1e-5 * scale)
    finally:
        os.environ.pop("SOT_TPU_PALLAS_INTERPRET", None)


def test_pallas_kernel_exact_slab_multiple():
    """n == padded size exercises the n_p == n shift-chain edge case."""
    os.environ["SOT_TPU_PALLAS_INTERPRET"] = "1"
    try:
        rng = np.random.default_rng(4)
        rows, n = 8, 256
        grid = jnp.asarray(np.sort(rng.random(n)).astype(np.float32))
        u = jnp.asarray(rng.random((rows, n)).astype(np.float32))
        v = jnp.asarray(rng.random((rows, n)).astype(np.float32))
        alpha = jnp.cumsum(u / u.sum(-1, keepdims=True), -1)
        beta = jnp.cumsum(v / v.sum(-1, keepdims=True), -1)
        ref = _sot_bilinear_xla(alpha, beta, grid, 2.0)
        out = sot_bilinear(alpha, beta, grid, p=2.0, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-7)

        def fx(a, b):
            return jnp.sum(sot_bilinear(a, b, grid, p=2.0, use_pallas=False))

        def fp(a, b):
            return jnp.sum(sot_bilinear(a, b, grid, p=2.0, use_pallas=True))

        gx = jax.grad(fx, argnums=(0, 1))(alpha, beta)
        gp = jax.grad(fp, argnums=(0, 1))(alpha, beta)
        for a, b in zip(gx, gp):
            sc = float(jnp.max(jnp.abs(a))) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5 * sc)
    finally:
        os.environ.pop("SOT_TPU_PALLAS_INTERPRET", None)


def test_loss_module_same_grid_dispatch_matches_general():
    from sot_tpu.losses import Wasserstein1D

    rng = np.random.default_rng(5)
    batch, frames, n = 4, 3, 81
    x = jnp.asarray(rng.random((batch, frames, n)).astype(np.float32))
    y = jnp.asarray(rng.random((batch, frames, n)).astype(np.float32))
    pos = jnp.asarray(np.sort(rng.random(n)).astype(np.float32))
    loss = Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                         limit_quantile_range=True)
    # same object => fused path; distinct (equal) objects => general path
    fused = loss(x, y, x_pos=pos, y_pos=pos)
    general = loss(x, y, x_pos=pos, y_pos=jnp.array(pos))
    np.testing.assert_allclose(float(fused), float(general),
                               rtol=2e-4, atol=1e-7)


def test_pallas_band_skip_concentrated_mass_multi_slab():
    """Regression: spectra with mass concentrated in low bins + tail padding.

    Exercises the band-skip limits across multiple 256-bin j-slabs where the
    padded zero columns break beta_end monotonicity (the bug: summing the
    'below' predicate instead of its contiguous prefix skipped real slabs).
    """
    os.environ["SOT_TPU_PALLAS_INTERPRET"] = "1"
    try:
        rng = np.random.default_rng(7)
        rows, n = 16, 1026  # pads to 1280: 5 slabs
        grid = jnp.asarray(np.linspace(0, 1, n).astype(np.float32))
        # mass concentrated in the first ~100 bins, tiny tail
        base = np.zeros((rows, n), np.float32)
        base[:, :100] = rng.random((rows, 100)).astype(np.float32)
        base[:, 100:] = 1e-6 * rng.random((rows, n - 100)).astype(np.float32)
        u = base / base.sum(-1, keepdims=True)
        v = np.roll(base, 1, axis=0)
        v = v / v.sum(-1, keepdims=True) * 0.93
        U = jnp.cumsum(jnp.asarray(u), -1)
        V = jnp.cumsum(jnp.asarray(v), -1)
        cap = jnp.maximum(U[:, -1], V[:, -1])[:, None]
        alpha = jnp.minimum(U, cap)
        beta = jnp.minimum(V, cap)
        ref = _sot_bilinear_xla(alpha, beta, grid, 2.0)
        out = sot_bilinear(alpha, beta, grid, p=2.0, use_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-9)

        def fx(a, b):
            return jnp.sum(sot_bilinear(a, b, grid, p=2.0, use_pallas=False))

        def fp(a, b):
            return jnp.sum(sot_bilinear(a, b, grid, p=2.0, use_pallas=True))

        gx = jax.grad(fx, argnums=(0, 1))(alpha, beta)
        gp_ = jax.grad(fp, argnums=(0, 1))(alpha, beta)
        for a, b in zip(gx, gp_):
            sc = float(jnp.max(jnp.abs(a))) + 1e-12
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5 * sc)
    finally:
        os.environ.pop("SOT_TPU_PALLAS_INTERPRET", None)


# ---------------------------------------------------------------------------
# O(n log n) sort-merge W2 path (SOT_TPU_W2_SORTMERGE)
# ---------------------------------------------------------------------------


def _alpha_beta(grid, u, v, lqr):
    """Replicate wasserstein_same_grid's CDF preprocessing (cap + tail lane)."""
    U = jnp.cumsum(u, -1)
    V = jnp.cumsum(v, -1)
    if lqr:
        cap = jnp.maximum(jnp.max(jnp.where(U <= 1.0, U, 0.0), -1),
                          jnp.max(jnp.where(V <= 1.0, V, 0.0), -1))[:, None]
    else:
        cap = jnp.maximum(U[:, -1], V[:, -1])[:, None]
    alpha = jnp.concatenate([jnp.minimum(U, cap), cap], axis=-1)
    beta = jnp.concatenate([jnp.minimum(V, cap), cap], axis=-1)
    gaug = jnp.concatenate([grid, grid[-1:]], axis=-1)
    return alpha, beta, gaug


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 0.62, 1.9])
def test_sortmerge_matches_xla_forward(lqr, v_mass):
    from sot_tpu.ops.pallas.sot import _sot_w2_sortmerge

    grid, u, v = _make_case(11, rows=14, n=103, v_mass=v_mass)
    alpha, beta, gaug = _alpha_beta(grid, u, v, lqr)
    ref = _sot_bilinear_xla(alpha, beta, gaug, 2.0)
    out = _sot_w2_sortmerge(alpha, beta, gaug)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5 * scale)


def test_sortmerge_env_flag_is_dead(monkeypatch):
    """The sortmerge production dispatch was removed in round 4 (lost its
    on-chip A/B 10x; see the oracle-only banner in sot.py). Setting the old
    env var must be inert: wasserstein_same_grid still matches the general
    implementation because it never routes through sortmerge."""
    monkeypatch.setenv("SOT_TPU_W2_SORTMERGE", "1")
    grid, u, v = _make_case(12, v_mass=1.9)
    rows, n = u.shape
    gridr = jnp.tile(grid, (rows, 1))
    ref = wasserstein_1d(gridr, gridr, u, v, p=2, require_sort=False,
                         limit_quantile_range=True)
    new = wasserstein_same_grid(grid, u, v, p=2.0, limit_quantile_range=True)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 1.9])
def test_sortmerge_gradients_match_xla(lqr, v_mass):
    """Cotangents through the sort+prefix-sum formulation equal the plane
    form's away from kinks (zero bins / cap-saturated CDF ties, where
    subgradient conventions legitimately differ)."""
    from sot_tpu.ops.pallas.sot import _sot_w2_sortmerge

    grid, u, v = _make_case(13, rows=10, n=89, v_mass=v_mass, zeros=False)

    def f_merge(uu, vv):
        a, b, gaug = _alpha_beta(grid, uu, vv, lqr)
        return jnp.sum(_sot_w2_sortmerge(a, b, gaug))

    def f_plane(uu, vv):
        a, b, gaug = _alpha_beta(grid, uu, vv, lqr)
        return jnp.sum(_sot_bilinear_xla(a, b, gaug, 2.0))

    gu_m, gv_m = jax.grad(f_merge, argnums=(0, 1))(u, v)
    gu_p, gv_p = jax.grad(f_plane, argnums=(0, 1))(u, v)

    # kink mask: bins whose CDF is clipped at the cap (the saturated tail,
    # where a==b==0 ties make the subgradient convention-dependent)
    U = np.cumsum(np.asarray(u), -1)
    V = np.cumsum(np.asarray(v), -1)
    if lqr:
        cap = np.maximum(np.max(np.where(U <= 1.0, U, 0.0), -1),
                         np.max(np.where(V <= 1.0, V, 0.0), -1))[:, None]
    else:
        cap = np.maximum(U[:, -1], V[:, -1])[:, None]
    eps = 1e-5
    ok = (U < cap - eps) & (V < cap - eps)
    scale = max(float(jnp.max(jnp.abs(gu_p))), float(jnp.max(jnp.abs(gv_p))))
    np.testing.assert_allclose(np.asarray(gu_m)[ok], np.asarray(gu_p)[ok],
                               atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(gv_m)[ok], np.asarray(gv_p)[ok],
                               atol=1e-3 * scale)


def test_sortmerge_exact_tie_rows_finite():
    """Degenerate rows (identical spectra, fully saturated CDFs) must still
    produce finite values (0) and finite gradients on the merge path."""
    from sot_tpu.ops.pallas.sot import _sot_w2_sortmerge

    grid = jnp.linspace(0.0, 1.0, 64)
    u = jnp.ones((4, 64)) / 64.0
    a, b, gaug = _alpha_beta(grid, u, u, True)
    out = _sot_w2_sortmerge(a, b, gaug)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    g = jax.grad(lambda vv: jnp.sum(
        _sot_w2_sortmerge(*_alpha_beta(grid, u, vv, True))))(u)
    assert np.isfinite(np.asarray(g)).all()
