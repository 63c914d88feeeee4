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


def test_prefix_sum_bf16_operand_numerics():
    """Pin the numerics class of the production TPU path.

    On the MXU the default matmul precision rounds *operands* to bf16 while
    the accumulator stays fp32 (preferred_element_type). CI runs on CPU, so
    emulate that worst case by pre-rounding the inputs to bf16 and bound the
    error of a 4096-sample oscillator-phase accumulation (the longest, most
    precision-sensitive prefix_sum in the framework) against the exact f64
    cumsum. If a JAX default-precision change ever makes the real TPU path
    WORSE than this emulation, oscillator phase (thousands of radians)
    drifts and tests/test_synth_ops catches it; this test documents the
    accepted bound. See ops/scan.py docstring: bf16 default is deliberate.
    """
    rng = np.random.default_rng(2)
    # phase increments for 40 Hz-2 kHz tones at 16 kHz: 2*pi*f/sr
    f = rng.uniform(40.0, 2000.0, (8, 1, 20))
    inc = (2 * np.pi * f / 16000.0) * np.ones((8, 4096, 20))
    inc32 = inc.astype(np.float32)
    exact = np.cumsum(inc.astype(np.float64), axis=1)

    emulated = np.asarray(prefix_sum(
        jnp.asarray(inc32).astype(jnp.bfloat16).astype(jnp.float32), axis=1))
    rel = np.abs(emulated - exact) / np.abs(exact)
    assert rel.max() < 4e-3, rel.max()  # bf16 operand rounding bound

    fp32 = np.asarray(prefix_sum(jnp.asarray(inc32), axis=1))
    rel32 = np.abs(fp32 - exact) / np.abs(exact)
    assert rel32.max() < 1e-5, rel32.max()


def test_prefix_sum_integer_exact():
    """Integer dtypes must bypass the f32 tri-matmul (exact cumsum)."""
    x = jnp.full((2, 600), 3_000_000, jnp.int64)  # running sum >> 2^24
    out = prefix_sum(x, axis=-1)
    ref = jnp.cumsum(x, axis=-1)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
