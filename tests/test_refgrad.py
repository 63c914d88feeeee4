"""Parity tests for the reference-convention O(n log n) SOT backward
(sot_tpu.ops.pallas.refgrad) and the SOT_TPU_W2_MERGE=ref dispatch.

Unlike the full-merge kernel (whose min-halving subgradients legitimately
differ from the plane kernel's at cap-tie kinks — tests/test_sot_merge.py
masks those), refgrad's whole contract is reproducing the plane kernel's
EXACT gradient convention (the one validated end-to-end against the torch
reference, losses.py:223-313) via rank-query identities.  So every test
here compares UNMASKED, kinks included: production rows all carry exact
cap ties (the quantile cutoff is an attained CDF value) and zero bins.

Layers:
  1. plane_grad_beta_dense (the O(n^2) jnp transcription of
     ops/pallas/sot.py:_bwd_kernel's beta side) vs the actual plane Pallas
     kernel — anchors the oracle.
  2. ref_grad_beta_xla (rank-query closed form, searchsorted) vs the oracle
     — validates the derivation.
  3. ref_grad_beta (the bitonic-merge Pallas kernel, interpret mode) vs the
     oracle — validates the kernel incl. its total-order tie handling.
  4. wasserstein_same_grid end-to-end: merge-mode "ref" gradients vs the
     default plane path, target-constant (training) case, tight tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sot_tpu.ops.pallas.refgrad import (plane_grad_beta_dense, ref_grad_beta,
                                        ref_grad_beta_xla)
from sot_tpu.ops.pallas.sot import _pallas_bwd, wasserstein_same_grid

from test_sot_pallas import _alpha_beta, _make_case


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")


def _case(seed, rows, n, lqr, v_mass=1.9, zeros=True):
    grid, u, v = _make_case(seed, rows=rows, n=n, v_mass=v_mass, zeros=zeros)
    alpha, beta, gaug = _alpha_beta(grid, u, v, lqr)
    rng = np.random.default_rng(seed + 1)
    wbar = jnp.asarray(rng.random(rows).astype(np.float32) + 0.5)
    return alpha, beta, gaug, wbar


def _assert_close(got, want, tol=2e-5):
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=tol * scale)


# --- 1. the dense oracle reproduces the plane Pallas kernel -----------------


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("rows,n", [(6, 60), (10, 97)])
def test_dense_oracle_matches_plane_kernel(lqr, rows, n):
    alpha, beta, gaug, wbar = _case(3, rows, n, lqr)
    _, db_plane = _pallas_bwd(alpha, beta, gaug, 2.0, wbar,
                              alpha_grads=False)
    db_dense = plane_grad_beta_dense(alpha, beta, gaug, wbar)
    _assert_close(db_dense, db_plane)


# --- 2. the rank-query closed form matches the oracle -----------------------


@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("v_mass", [1.0, 1.9])
@pytest.mark.parametrize("rows,n", [(6, 60), (9, 97), (4, 130)])
def test_rank_form_matches_dense(lqr, v_mass, rows, n):
    alpha, beta, gaug, wbar = _case(7, rows, n, lqr, v_mass=v_mass)
    _assert_close(ref_grad_beta_xla(alpha, beta, gaug, wbar),
                  plane_grad_beta_dense(alpha, beta, gaug, wbar))


# --- 3. the Pallas kernel matches the oracle (kinks included) ---------------

# n = 65 -> kernel range m = 64 exercises m8 == M2 (no mid-valley sentinel
# branch); the others exercise the pad branch; rows = 130 exercises
# multi-program row blocking (R = 8 on CPU interpret).
@pytest.mark.parametrize("lqr", [False, True])
@pytest.mark.parametrize("rows,n", [(6, 65), (9, 97), (130, 40)])
def test_refgrad_kernel_matches_dense(lqr, rows, n):
    alpha, beta, gaug, wbar = _case(11, rows, n, lqr)
    _assert_close(ref_grad_beta(alpha, beta, gaug, wbar),
                  plane_grad_beta_dense(alpha, beta, gaug, wbar))


def test_refgrad_kernel_tie_heavy():
    """Duplicate CDF plateaus + many zero bins: every tie class at once
    (a==b values, gamma==q, equal-value a-runs of empty bins — the case
    that required the total-order merge)."""
    rng = np.random.default_rng(0)
    rows, n = 5, 48
    grid = np.sort(rng.random(n)).astype(np.float32)
    u = rng.integers(0, 3, (rows, n)).astype(np.float32)  # many exact ties
    v = rng.integers(0, 3, (rows, n)).astype(np.float32)
    u /= u.sum(-1, keepdims=True)
    v /= v.sum(-1, keepdims=True) / 1.5
    alpha, beta, gaug = _alpha_beta(jnp.asarray(grid), jnp.asarray(u),
                                    jnp.asarray(v), True)
    wbar = jnp.ones((rows,), jnp.float32)
    _assert_close(ref_grad_beta(alpha, beta, gaug, wbar),
                  plane_grad_beta_dense(alpha, beta, gaug, wbar))


# --- 4. end-to-end dispatch parity ------------------------------------------


@pytest.mark.parametrize("lqr", [False, True])
def test_ref_mode_end_to_end_grads_match_plane(monkeypatch, lqr):
    """SOT_TPU_W2_MERGE=ref vs the default plane path through the real
    entry point, target-constant training case: forward values AND v-side
    gradients must agree to fp32 noise EVERYWHERE (no kink masking)."""
    grid, u, v = _make_case(19, rows=10, n=89, v_mass=1.9)

    def loss(vv, mode):
        monkeypatch.setenv("SOT_TPU_W2_MERGE", mode)
        w = wasserstein_same_grid(grid, u, vv, p=2.0,
                                  limit_quantile_range=lqr,
                                  target_constant=True)
        return jnp.sum(w * jnp.arange(1.0, 11.0))  # non-uniform cotangent

    val_ref, gv_ref = jax.value_and_grad(
        functools.partial(loss, mode="ref"))(v)
    monkeypatch.delenv("SOT_TPU_W2_MERGE")
    val_pl, gv_pl = jax.value_and_grad(functools.partial(loss, mode=""))(v)
    np.testing.assert_allclose(float(val_ref), float(val_pl), rtol=3e-5)
    _assert_close(gv_ref, gv_pl, tol=3e-5)


def test_ref_mode_live_target_falls_back_to_hybrid(monkeypatch):
    """With a live target cotangent (target_constant=False) ref mode must
    route through the plane backward and still deliver u-side grads."""
    monkeypatch.setenv("SOT_TPU_W2_MERGE", "ref")
    grid, u, v = _make_case(23, rows=6, n=60)

    def loss(uu, vv):
        return jnp.sum(wasserstein_same_grid(grid, uu, vv, p=2.0,
                                             limit_quantile_range=True))

    gu, gv = jax.grad(loss, argnums=(0, 1))(u, v)
    monkeypatch.delenv("SOT_TPU_W2_MERGE")
    gu_p, gv_p = jax.grad(loss, argnums=(0, 1))(u, v)
    _assert_close(gu, gu_p, tol=3e-5)
    _assert_close(gv, gv_p, tol=3e-5)
