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
