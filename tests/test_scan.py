"""prefix_sum (blocked tri-matmul cumsum) vs jnp.cumsum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sot_tpu.ops.scan import prefix_sum


@pytest.mark.parametrize("shape,axis", [
    ((64, 4096, 20), 1),     # oscillator phase layout
    ((37, 1025), -1),        # CDF layout (odd length, needs padding)
    ((5, 300, 7), 1),
    ((513,), 0),             # 1D
    ((8, 100), -1),          # short axis -> jnp.cumsum fallback
    ((3, 4, 600), 2),
    ((3, 600, 4, 5), 1),     # axis move path
])
def test_prefix_sum_matches_cumsum(shape, axis):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = jnp.cumsum(x, axis=axis)
    out = prefix_sum(x, axis=axis)
    assert out.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 * scale)


def test_prefix_sum_gradient():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 600, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 600, 3)).astype(np.float32))
    g_ref = jax.grad(lambda v: jnp.sum(jnp.cumsum(v, axis=1) * w))(x)
    g_new = jax.grad(lambda v: jnp.sum(prefix_sum(v, axis=1) * w))(x)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=2e-5 * scale)


def test_prefix_sum_integer_exact():
    """Integer dtypes must bypass the f32 tri-matmul (exact cumsum)."""
    x = jnp.full((2, 600), 3_000_000, jnp.int64)  # running sum >> 2^24
    out = prefix_sum(x, axis=-1)
    ref = jnp.cumsum(x, axis=-1)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
