"""SOT kernel vs an independent numpy implementation of the POT closed form,
plus scipy cross-check and gradient finite-difference checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sot_tpu.ops.wasserstein import (
    wasserstein_1d,
    wasserstein_1d_same_grid,
    quantile_function,
)


def np_wasserstein_1d(u_values, v_values, u_weights, v_weights, p=1,
                      limit_quantile_range=False):
    """Independent numpy reference of the POT quantile-matching closed form."""
    out = []
    for uv, vv, uw, vw in zip(u_values, v_values, u_weights, v_weights):
        us = np.argsort(uv, kind="stable")
        vs = np.argsort(vv, kind="stable")
        uv, uw = uv[us], uw[us]
        vv, vw = vv[vs], vw[vs]
        ucw = np.cumsum(uw)
        vcw = np.cumsum(vw)
        qs = np.sort(np.concatenate([ucw, vcw]))
        uq = uv[np.clip(np.searchsorted(ucw, qs, side="left"), 0, len(uv) - 1)]
        vq = vv[np.clip(np.searchsorted(vcw, qs, side="left"), 0, len(vv) - 1)]
        qs_pad = np.concatenate([[0.0], qs])
        delta = np.diff(qs_pad)
        if limit_quantile_range:
            delta = np.where(qs > 1.0, 0.0, delta)
        out.append(np.sum(delta * np.abs(uq - vq) ** p))
    return np.array(out)


def _rand_dists(rng, rows=5, n=33, m=17, normalized=True):
    uv = np.sort(rng.uniform(0, 1, (rows, n)).astype(np.float32), axis=1)
    vv = np.sort(rng.uniform(0, 1, (rows, m)).astype(np.float32), axis=1)
    uw = rng.uniform(0.01, 1, (rows, n)).astype(np.float32)
    vw = rng.uniform(0.01, 1, (rows, m)).astype(np.float32)
    if normalized:
        uw /= uw.sum(1, keepdims=True)
        vw /= vw.sum(1, keepdims=True)
    return uv, vv, uw, vw


@pytest.mark.parametrize("p", [1, 2])
def test_matches_numpy_reference(p):
    rng = np.random.default_rng(0)
    uv, vv, uw, vw = _rand_dists(rng)
    ours = wasserstein_1d(uv, vv, uw, vw, p=p)
    ref = np_wasserstein_1d(uv, vv, uw, vw, p=p)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_matches_scipy():
    # scipy returns W_1 itself; ours returns W_p^p, equal at p=1
    from scipy.stats import wasserstein_distance

    rng = np.random.default_rng(1)
    uv, vv, uw, vw = _rand_dists(rng, rows=4)
    ours = wasserstein_1d(uv, vv, uw, vw, p=1)
    ref = [wasserstein_distance(uv[i], vv[i], uw[i], vw[i]) for i in range(4)]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_uniform_weights_default():
    rng = np.random.default_rng(2)
    uv, vv, _, _ = _rand_dists(rng, rows=3)
    ours = wasserstein_1d(uv, vv)
    n, m = uv.shape[1], vv.shape[1]
    ref = np_wasserstein_1d(uv, vv, np.full_like(uv, 1 / n), np.full_like(vv, 1 / m))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_require_sort_handles_unsorted():
    rng = np.random.default_rng(3)
    uv, vv, uw, vw = _rand_dists(rng)
    perm = rng.permutation(uv.shape[1])
    ours = wasserstein_1d(uv[:, perm], vv, uw[:, perm], vw, p=2, require_sort=True)
    ref = np_wasserstein_1d(uv, vv, uw, vw, p=2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_limit_quantile_range_cutoff():
    """With un-normalised v mass > 1, segments above level 1 are dropped.

    u mass is scaled to 0.93 so no quantile level sits exactly on the 1.0
    cutoff boundary — with u normalised to exactly 1, a 1-ulp cumsum rounding
    difference flips the `qs > 1` mask on the final segment (a boundary
    sensitivity the torch reference has as well).
    """
    rng = np.random.default_rng(4)
    uv, vv, uw, vw = _rand_dists(rng, normalized=True)
    uw = uw * 0.93
    vw = vw * 1.7  # over-massed second distribution
    ours = wasserstein_1d(uv, vv, uw, vw, p=2, limit_quantile_range=True)
    ref = np_wasserstein_1d(uv, vv, uw, vw, p=2, limit_quantile_range=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # and it differs from the uncut version
    uncut = wasserstein_1d(uv, vv, uw, vw, p=2)
    assert not np.allclose(ours, uncut)


def test_identical_distributions_zero():
    rng = np.random.default_rng(5)
    uv, _, uw, _ = _rand_dists(rng)
    out = wasserstein_1d(uv, uv, uw, uw, p=2)
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_point_mass_translation():
    """W_p^p between two unit point masses at a, b is |a-b|^p."""
    a, b = 0.2, 0.7
    uv = np.array([[a, 0.0]], np.float32)
    vv = np.array([[b, 0.0]], np.float32)
    uw = np.array([[1.0, 0.0]], np.float32)
    vw = np.array([[1.0, 0.0]], np.float32)
    np.testing.assert_allclose(
        wasserstein_1d(uv, vv, uw, vw, p=2), (b - a) ** 2, rtol=1e-5
    )
    np.testing.assert_allclose(
        wasserstein_1d(uv, vv, uw, vw, p=1), abs(b - a), rtol=1e-5
    )


def test_same_grid_fast_path():
    rng = np.random.default_rng(6)
    n, rows = 65, 7
    grid = np.sort(rng.uniform(0, 1, n).astype(np.float32))
    uw = rng.uniform(0, 1, (rows, n)).astype(np.float32)
    vw = rng.uniform(0, 1, (rows, n)).astype(np.float32)
    uw /= uw.sum(1, keepdims=True)
    vw /= vw.sum(1, keepdims=True)
    fast = wasserstein_1d_same_grid(jnp.asarray(grid), uw, vw, p=2)
    grid_rows = np.broadcast_to(grid, (rows, n))
    ref = np_wasserstein_1d(grid_rows, grid_rows, uw, vw, p=2)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_quantile_function():
    cws = jnp.array([[0.25, 0.5, 0.75, 1.0]])
    xs = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    qs = jnp.array([[0.1, 0.25, 0.26, 0.99, 1.0, 1.5]])
    out = quantile_function(qs, cws, xs)
    np.testing.assert_allclose(out[0], [10.0, 10.0, 20.0, 40.0, 40.0, 40.0])


def _torch_w1d(u_values, v_values, u_weights, v_weights, p, limit_quantile_range):
    """The POT closed form written in torch — gives the reference's exact
    autograd semantics (sort permutation grads, no grad through searchsorted,
    gather grads through quantile values) to compare against."""
    import torch

    u_cum = torch.cumsum(u_weights, 1)
    v_cum = torch.cumsum(v_weights, 1)
    qs = torch.sort(torch.cat((u_cum, v_cum), 1), 1)[0]
    n, m = u_values.shape[1], v_values.shape[1]
    ui = torch.clamp(torch.searchsorted(u_cum.detach(), qs.detach()), 0, n - 1)
    vi = torch.clamp(torch.searchsorted(v_cum.detach(), qs.detach()), 0, m - 1)
    uq = torch.take_along_dim(u_values, ui, dim=1)
    vq = torch.take_along_dim(v_values, vi, dim=1)
    qs_pad = torch.nn.functional.pad(qs, pad=(1, 0))
    delta = qs_pad[..., 1:] - qs_pad[..., :-1]
    if limit_quantile_range:
        delta = torch.where(qs > 1, torch.zeros_like(delta), delta)
    diff = torch.abs(uq - vq)
    return torch.sum(delta * diff**p, 1)


@pytest.mark.parametrize("p", [1, 2])
def test_gradients_match_torch_autograd(p):
    """Weight gradients must match the reference's torch autograd exactly
    (finite differences are unreliable here: the loss is piecewise smooth in
    the weights, with kinks at quantile crossings)."""
    import torch

    rng = np.random.default_rng(7)
    uv, vv, uw, vw = _rand_dists(rng, rows=3, n=9, m=6)
    uw, vw = uw * 0.95, vw * 1.21  # keep quantile levels off the 1.0 boundary

    def loss(uw_, vw_):
        return jnp.sum(wasserstein_1d(uv, vv, uw_, vw_, p=p, require_sort=False,
                                      limit_quantile_range=True))

    g_uw, g_vw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(uw), jnp.asarray(vw))

    tuv = torch.as_tensor(uv)
    tvv = torch.as_tensor(vv)
    tuw = torch.as_tensor(uw).requires_grad_(True)
    tvw = torch.as_tensor(vw).requires_grad_(True)
    tloss = _torch_w1d(tuv, tvv, tuw, tvw, p=p, limit_quantile_range=True).sum()
    tloss.backward()

    np.testing.assert_allclose(loss(jnp.asarray(uw), jnp.asarray(vw)),
                               tloss.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(g_uw, tuw.grad.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_vw, tvw.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_value_gradients_flow():
    """Gradient wrt positions (through quantile gathers) is defined and finite."""
    rng = np.random.default_rng(8)
    uv, vv, uw, vw = _rand_dists(rng, rows=2, n=8, m=8)

    def loss(uv_):
        return jnp.sum(wasserstein_1d(uv_, vv, uw, vw, p=2))

    g = jax.grad(loss)(jnp.asarray(uv))
    assert np.isfinite(np.asarray(g)).all()
    v = rng.standard_normal(uv.shape).astype(np.float32)
    eps = 1e-4
    fd = (loss(jnp.asarray(uv) + eps * v) - loss(jnp.asarray(uv) - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.sum(np.asarray(g) * v), fd, rtol=5e-2, atol=1e-4)


def test_p_below_one_raises():
    with pytest.raises(ValueError):
        wasserstein_1d(jnp.ones((1, 4)), jnp.ones((1, 4)), p=0.5)


def test_jit_compiles():
    rng = np.random.default_rng(9)
    uv, vv, uw, vw = _rand_dists(rng)
    fn = jax.jit(lambda a, b, c, d: wasserstein_1d(a, b, c, d, p=2,
                                                   limit_quantile_range=True))
    out = fn(uv, vv, uw, vw)
    ref = np_wasserstein_1d(uv, vv, uw, vw, p=2, limit_quantile_range=True)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
