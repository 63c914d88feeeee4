"""PESTO-style CNN pitch encoder (L3) in Flax.

Re-architecture of the reference encoder (encoder.py:73-365) for TPU:
  * convs run in NWC layout (XLA's native TPU conv layout)
  * ``ToeplitzLinear`` — the PESTO translation-equivariance trick (a linear
    map constrained to a Toeplitz matrix, reference encoder.py:22-33) — is
    implemented as an explicit Toeplitz-matrix gather + matmul: a (in, out)
    MXU matmul instead of a width-1139 conv, same math, same parameters
  * flatten order is channel-major to preserve the reference's feature
    ordering into the Toeplitz heads
  * initialisers follow torch's conv/linear defaults (kaiming-uniform with
    a=sqrt(5) -> U(+-1/sqrt(fan_in))) so training dynamics are comparable

Output heads (reference encoder.py:236-302): 'frequency' logits (out_size
bins, Toeplitz), 'weights' (n_modes harmonic amplitudes via exp-sigmoid,
dense), optional 'gain'. ``predict_pitch`` implements soft-argmax /
kernel-soft-argmax / regression heads (reference encoder.py:304-365).

~46K parameters in the paper configuration (n_bins_in=285, n_modes=20).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sot_tpu.ops.numerics import exp_sigmoid

Array = jax.Array


def _torch_uniform_init(fan_in: int):
    """torch kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _toeplitz_matrix(w: Array, in_f: int, out_f: int) -> Array:
    """T[i, j] = w[i - j + out_f - 1] via a shear reshape — no gather.

    Broadcasting w to in_f+1 rows and re-viewing with a row stride of
    n_w + 1 shifts each row one step right, so arr[i, j'] = w[i + j'];
    flipping the first out_f columns yields the Toeplitz matrix. TPU
    gathers/scatters of this matrix were the encoder's top backward cost
    (2-3 ms/step); this build is pads/reshapes only.
    """
    n_w = in_f + out_f - 1  # == w.shape[0]
    big = jnp.broadcast_to(w, (in_f + 1, n_w)).reshape(-1)
    arr = big[: in_f * (n_w + 1)].reshape(in_f, n_w + 1)  # arr[i,j'] = w[i+j']
    return arr[:, :out_f][:, ::-1]


def _diag_sums(g: Array, in_f: int, out_f: int) -> Array:
    """dw[k] = sum_j g[j + k - (out_f - 1), j] via the same shear, no gather.

    With M = flip(g.T): dw[k] = sum_r M[r, k - r]; padding M's rows to
    width in_f + out_f and re-viewing with row stride n_w aligns each
    diagonal into a column (out-of-range reads land in the zero padding).
    """
    n_w = in_f + out_f - 1
    m = jnp.pad(g.T[::-1, :], ((0, 0), (0, out_f)))  # [out_f, in_f + out_f]
    flat = m.reshape(-1)
    arr = flat[: out_f * n_w].reshape(out_f, n_w)
    return jnp.sum(arr, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _toeplitz_apply(x: Array, w: Array, in_f: int, out_f: int) -> Array:
    """y[b, j] = sum_i x[b, i] * w[i - j + out_f - 1] as an MXU matmul."""
    return jnp.dot(x, _toeplitz_matrix(w, in_f, out_f),
                   preferred_element_type=jnp.float32)


def _toeplitz_fwd(x, w, in_f, out_f):
    t = _toeplitz_matrix(w, in_f, out_f)
    return (jnp.dot(x, t, preferred_element_type=jnp.float32), (x, t))


def _toeplitz_bwd(in_f, out_f, res, dy):
    x, t = res
    dx = jnp.dot(dy, t.T, preferred_element_type=jnp.float32)
    g = jnp.dot(x.T, dy, preferred_element_type=jnp.float32)  # [in, out]
    return dx, _diag_sums(g, in_f, out_f)


_toeplitz_apply.defvjp(_toeplitz_fwd, _toeplitz_bwd)


class ToeplitzLinear(nn.Module):
    """Linear layer constrained to a Toeplitz matrix (weight sharing along
    diagonals): in+out-1 parameters, applied as an MXU matmul.

    Equivalent to the reference's width-(in+out-1) Conv1d with padding out-1
    (encoder.py:22-33): out[j] = sum_i x[i] * w[i - j + out - 1].
    """

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n_w = self.in_features + self.out_features - 1
        w = self.param("kernel", _torch_uniform_init(n_w), (n_w,))
        return _toeplitz_apply(x, w, self.in_features, self.out_features)


def _use_pallas_conv(kernel_size: int, padding: int) -> bool:
    if kernel_size <= 1 or padding != (kernel_size - 1) // 2:
        return False
    from sot_tpu.ops.numerics import env_flag

    if not env_flag("SOT_TPU_CONV_PALLAS"):
        return False
    if env_flag("SOT_TPU_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


class _PallasConvInner(nn.Module):
    """Param-compatible stand-in for ``nn.Conv`` (same 'kernel'/'bias'
    names, shapes, and path-derived init RNG) dispatching the wide-kernel
    convs to the fused Pallas kernel (ops/pallas/conv.py)."""

    features: int
    kernel_size: int
    fan_in: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from sot_tpu.ops.pallas.conv import conv1d_same

        in_ch = x.shape[-1]
        init = _torch_uniform_init(self.fan_in)
        w = self.param("kernel", init,
                       (self.kernel_size, in_ch, self.features))
        b = self.param("bias", init, (self.features,))
        return conv1d_same(x, w, self.kernel_size) + b


class _Conv(nn.Module):
    """1D conv (NWC) with torch-default initialisation.

    SOT_TPU_CONV_PALLAS=1 routes k>1 'same' convs through the fused
    Pallas im2col kernel (identical param tree; A/B gate). ``dtype``
    sets the computation dtype (params stay f32; bf16 halves the HBM
    traffic of the [rows, bins, ch] activations — the conv stack is the
    step's #1 category at 2.3 ms — gated on a training verdict like
    every numerics-affecting speed variant)."""

    features: int
    kernel_size: int
    padding: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        if _use_pallas_conv(self.kernel_size, self.padding):
            return _PallasConvInner(self.features, self.kernel_size,
                                    fan_in, name="Conv_0")(x)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            padding=self.padding,
            dtype=self.dtype,
            kernel_init=_torch_uniform_init(fan_in),
            bias_init=_torch_uniform_init(fan_in),
        )(x)


class _Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            kernel_init=_torch_uniform_init(fan_in),
            bias_init=_torch_uniform_init(fan_in),
        )(x)


class PESTOEncoder(nn.Module):
    """1D CNN over a single CQT frame -> dict of head outputs.

    Args mirror the reference (encoder.py:95-139). Input is
    [batch, n_bins_in] (a flattened (batch*time) of single-channel frames).
    """

    n_bins_in: int = 285
    output_size: int = 285
    n_modes: int = 20
    output_splits: Sequence[str] = ("frequency", "weights")
    harmonic: bool = True
    n_chan_layers: Sequence[int] = (40, 30, 30, 10, 3)
    n_prefilt_layers: int = 2
    residual: bool = True
    kernel_size: int = 15
    a_lrelu: float = 0.3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        if x.ndim == 2:
            x = x[:, :, None]  # [batch, bins, 1] (NWC)
        act = lambda y: nn.leaky_relu(y, negative_slope=self.a_lrelu)

        ch = list(self.n_chan_layers)
        if len(ch) < 5:
            ch.append(1)

        # LayerNorm over (channel, bins) with per-(channel,bin) affine —
        # torch LayerNorm([n_in, n_bins]) parity (reference encoder.py:154).
        x = nn.LayerNorm(epsilon=1e-5, reduction_axes=(-2, -1),
                         feature_axes=(-2, -1))(x)

        # SOT_TPU_CONV_BF16: bf16 ACTIVATIONS through the conv stack
        # (params stay f32; the MXU computes bf16 either way — this only
        # adds output-storage rounding while halving activation HBM
        # traffic). Training-verdict-gated like the synth kernel.
        from sot_tpu.ops.numerics import env_flag

        cdt = jnp.bfloat16 if env_flag("SOT_TPU_CONV_BF16") else None

        pad = (self.kernel_size - 1) // 2
        x = act(_Conv(ch[0], self.kernel_size, pad, dtype=cdt,
                      name="conv1")(x))
        for p in range(self.n_prefilt_layers - 1):
            y = act(_Conv(ch[0], self.kernel_size, pad, dtype=cdt,
                          name=f"prefilt{p}")(x))
            x = y + x if self.residual else y
        x = act(_Conv(ch[1], 1, 0, dtype=cdt, name="conv2")(x))
        x = act(_Conv(ch[2], 1, 0, dtype=cdt, name="conv3")(x))
        x = act(_Conv(ch[3], 1, 0, dtype=cdt, name="conv4a")(x))
        x = nn.Dropout(rate=self.p_dropout, deterministic=not train)(x)
        x = _Conv(ch[4], 1, 0, dtype=cdt, name="conv4b")(x)
        x = x.astype(jnp.float32)

        # channel-major flatten (torch NCW flatten parity)
        batch = x.shape[0]
        feat = jnp.swapaxes(x, 1, 2).reshape(batch, -1)
        feature_size = self.n_bins_in * ch[4]

        outputs: Dict[str, Array] = {}
        if "frequency" in self.output_splits:
            n_mean_outs = 1 if self.harmonic else self.n_modes
            heads = [
                ToeplitzLinear(feature_size, self.output_size, name=f"frequency{i}")(feat)
                for i in range(n_mean_outs)
            ]
            out = jnp.stack(heads, axis=1)
            if n_mean_outs == 1:
                out = out[:, 0]
            outputs["frequency"] = out
        if "gain" in self.output_splits:
            outputs["gain"] = exp_sigmoid(_Dense(1, name="gain")(feat)[..., 0])
        if "weights" in self.output_splits:
            outputs["weights"] = exp_sigmoid(_Dense(self.n_modes, name="weights")(feat))
        return outputs


def predict_pitch(
    logits: Array,
    estimation_type: str = "soft-argmax",
    temperature: float = 1.0,
    mask: Optional[Array] = None,
    kernel_std: float = 0.025,
) -> Dict[str, Array]:
    """Normalised pitch in [0, 1] from frequency logits
    (reference encoder.py:304-365).

    Args:
      logits: [batch, out_size] or [batch, n_modes, out_size].
    Returns dict with 'pitch_unit' (+ 'probabilities' for argmax heads).
    """
    if logits.ndim == 2:
        # keep the mode axis in the outputs, as the reference does
        logits = logits[:, None, :]
    seq_len = logits.shape[-1]
    positions = jnp.linspace(0.0, 1.0, seq_len)

    outputs: Dict[str, Array] = {}
    if estimation_type == "soft-argmax":
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[:, None, :]
            logits = logits * mask + 1e-7
        probabilities = jax.nn.softmax(logits / temperature, axis=-1)
        expectation = jnp.sum(probabilities * positions, axis=-1)
        outputs.update({"pitch_unit": expectation, "probabilities": probabilities})
    elif estimation_type == "kernel-soft-argmax":
        discrete_argmax = jnp.argmax(logits, axis=-1)
        argmax_pos = discrete_argmax.astype(jnp.float32) / (seq_len - 1)
        kernel = jnp.exp(
            -((positions[None, None, :] - argmax_pos[..., None]) ** 2)
            / (2.0 * kernel_std**2)
        )
        kernel = kernel / jnp.sum(kernel, axis=-1, keepdims=True)
        probabilities = jax.nn.softmax(kernel * logits / temperature, axis=-1)
        expectation = jnp.sum(probabilities * positions, axis=-1)
        outputs.update(
            {"pitch_unit": expectation, "probabilities": probabilities, "kernel": kernel}
        )
    elif estimation_type == "regression":
        outputs["pitch_unit"] = jax.nn.sigmoid(logits)[..., 0]
    else:
        raise ValueError(f"Unknown estimation_type: {estimation_type}")
    return outputs
