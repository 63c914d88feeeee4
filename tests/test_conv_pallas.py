"""Parity tests for the Pallas 'same' conv1d (ops/pallas/conv.py) vs
XLA's conv_general_dilated — values and grads, at the encoder's shapes
(reference encoder.py:159-233: k=15 convs, 1->40 and 40->40 channels over
285 CQT bins) plus edge shapes (lane-multiple widths, tiny k).

Interpret mode; SOT_TPU_CONV_DTYPE=float32 pins the kernel to exact-parity
numerics (production default is bf16 operands, matching XLA's
default-precision TPU conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sot_tpu.ops.pallas.conv import conv1d_same


@pytest.fixture(autouse=True)
def _interpret_f32(monkeypatch):
    monkeypatch.setenv("SOT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SOT_TPU_CONV_DTYPE", "float32")


def _xla_conv_same(x, kernel):
    k = kernel.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"))


SHAPES = [
    (4, 285, 1, 40, 15),    # conv1 (row count cut for interpret speed)
    (4, 285, 40, 40, 15),   # prefilt
    (3, 64, 8, 16, 15),     # width already covered by one lane tile
    (8, 128, 4, 4, 15),     # width an exact lane multiple (wrap guard)
    (5, 33, 3, 7, 5),       # small odd k, row pad (5 -> 8)
    (1, 285, 2, 3, 1),      # k=1 degenerate
    (24, 285, 4, 8, 15),    # rows > _ROW_TILE: THREE row programs
]


@pytest.mark.parametrize("b,w,cin,cout,k", SHAPES)
def test_conv1d_same_value_parity(b, w, cin, cout, k):
    kx, kw = jax.random.split(jax.random.key(b * 1000 + w + k))
    x = jax.random.normal(kx, (b, w, cin), jnp.float32)
    kern = jax.random.normal(kw, (k, cin, cout), jnp.float32) / (k * cin)
    got = conv1d_same(x, kern, k)
    want = _xla_conv_same(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,w,cin,cout,k", [
    (4, 285, 1, 40, 15),
    (4, 285, 40, 40, 15),
    (8, 128, 4, 4, 15),
    (5, 33, 3, 7, 5),
])
def test_conv1d_same_grad_parity(b, w, cin, cout, k):
    kx, kw, kc = jax.random.split(jax.random.key(77 + b + w), 3)
    x = jax.random.normal(kx, (b, w, cin), jnp.float32)
    kern = jax.random.normal(kw, (k, cin, cout), jnp.float32) / (k * cin)
    cot = jax.random.normal(kc, (b, w, cout), jnp.float32)

    def loss(fn):
        return lambda xx, kk: jnp.sum(fn(xx, kk) * cot)

    gx, gk = jax.grad(loss(lambda xx, kk: conv1d_same(xx, kk, k)),
                      argnums=(0, 1))(x, kern)
    wx, wk = jax.grad(loss(_xla_conv_same), argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-5, atol=1e-4)


def test_conv1d_same_bf16_default_close(monkeypatch):
    """Production dtype (bf16 operands / f32 accumulation) stays within
    bf16 tolerance of the f32 conv."""
    monkeypatch.setenv("SOT_TPU_CONV_DTYPE", "bfloat16")
    kx, kw = jax.random.split(jax.random.key(5))
    x = jax.random.normal(kx, (4, 285, 40), jnp.float32)
    kern = jax.random.normal(kw, (15, 40, 40), jnp.float32) / 600.0
    got = conv1d_same(x, kern, 15)
    want = _xla_conv_same(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_encoder_pallas_conv_gate(monkeypatch):
    """SOT_TPU_CONV_PALLAS=1 swaps the encoder's k>1 convs onto the Pallas
    kernel with an IDENTICAL param tree and (f32 mode) identical outputs."""
    from sot_tpu.models.encoder import PESTOEncoder

    enc = PESTOEncoder(n_bins_in=285, output_size=285)
    x = jax.random.normal(jax.random.key(0), (4, 285), jnp.float32)

    monkeypatch.delenv("SOT_TPU_CONV_PALLAS", raising=False)
    params = enc.init(jax.random.key(1), x)
    base = enc.apply(params, x)

    monkeypatch.setenv("SOT_TPU_CONV_PALLAS", "1")
    params_p = enc.init(jax.random.key(1), x)
    chex = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(params_p) == chex
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got = enc.apply(params, x)
    for key in base:
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(base[key]),
                                   rtol=1e-5, atol=1e-5)
