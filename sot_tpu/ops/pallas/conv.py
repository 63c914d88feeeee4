"""Fused 'same' conv1d for the encoder's k=15 prefilter stack (Pallas).

The reference encoder's hot convs (reference encoder.py:159-233) are
small-channel (1->40, 40->40) width-15 convs over 285 CQT bins. XLA's
NWC conv1d on TPU leaves most of the MXU idle at these shapes (measured
~1.7 ms of the 15 ms SOT-2048 train step, round-1 profile). This kernel
reaches the same math as one MXU matmul per row tile:

  * layout: channel-major [rows, C, W] with the BIN axis on lanes (W pads
    to a 128 multiple), so building the im2col matrix is k lane-rolls +
    one sublane concat — all Mosaic-native, no gathers and no HBM
    round-trip for the 15x-expanded window matrix (XLA's im2col would
    materialise ~700 MB/step in HBM at training shapes).
  * per row: Y [C_out, W] = Wflat [C_out, C_in*k] @ Xwin [C_in*k, W] —
    K = C_in*k = 600 rides the MXU's contraction axis (vs K = 40 for a
    tap-by-tap formulation).
  * operands are cast to bf16 inside the kernel (f32 accumulation),
    matching XLA's default-precision conv on TPU; compute_dtype=float32
    gives exact-parity mode for tests.

Backward is two more instances of the same structure: dx is the 'same'
conv of dy with the tap-flipped, (ci<->co)-transposed kernel; dw is the
per-tile partial contraction Xwin @ dy^T accumulated in XLA.

Enable in training with SOT_TPU_CONV_PALLAS=1 (hook in
models/encoder.py:_Conv); A/B against the XLA conv before defaulting.

STATUS (round 5): TWICE-NEGATIVE — kept for the record, gated off. The
round-5 rework (one batched-N matmul per program, tile flattened into
lanes before the f32 rolls) still loses the in-step A/B ~30% to XLA's
conv fusion (97.9k vs 140.2k frames/s/chip,
results/round5/conv_ab_instep.json; first attempt lost 2.5x in round 3).
Mosaic lesson encoded in _xwin_tile: there is no bf16 rotate — every
lane-roll and lane-concat must happen on 32-bit data, with one trailing
cast into the dot.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .sot import _interpret

Array = jax.Array

def _row_tile() -> int:
    """Rows per program (VMEM ~1 MB/program at training shapes with the
    default 8; SOT_TPU_CONV_ROWS widens the per-program matmul N axis
    for the in-step A/B)."""
    return int(os.environ.get("SOT_TPU_CONV_ROWS", "8"))


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _roll_left(v: Array, d: int) -> Array:
    """out[..., w] = v[..., w + d] (circular along lanes)."""
    if d == 0:
        return v
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(v, shift=v.shape[-1] - d, axis=len(v.shape) - 1)


def _xwin_tile(x_blk: Array, k: int, dtype) -> Array:
    """Batched im2col [C_in*k, tile*Wp] from a [tile, C_in, Wp] block:
    row index d*C_in + ci, column b*Wp + w holds x[b, ci, w + d].

    The row tile is flattened into the LANE axis FIRST (f32 relayout),
    then the k window offsets are lane-rolls of the flattened array and
    one sublane concat. A roll crossing a row boundary only pollutes the
    last k-1 lanes of that row's Wp segment — exactly the circular-wrap
    lanes the existing invariant already excludes (outside kept outputs
    in fwd, zero-dy lanes in dw). Crucially this keeps every roll on
    32-bit data with a single trailing cast: rolling bf16 (or lane-
    concatenating bf16 pieces) hits Mosaic's 'Rotate with non-32-bit
    data: not implemented' (probed on-chip, round 5)."""
    tile, cin, wp = x_blk.shape
    xf = jnp.moveaxis(x_blk, 0, 1).reshape(cin, tile * wp)
    return jnp.concatenate([_roll_left(xf, d) for d in range(k)],
                           axis=0).astype(dtype)


def _fwd_kernel(x_ref, w_ref, y_ref, *, k: int, dtype):
    # ONE matmul per program: the row tile rides the matmul's N axis
    # ([C_out, C_in*k] @ [C_in*k, tile*Wp]) instead of `tile` small
    # N=Wp matmuls — fewer, larger MXU issues (round-5 rework; the
    # per-row unrolled loop was part of why the v1 kernel lost its A/B).
    # Per-output values are bit-identical to the per-row form: matmul
    # output columns are independent and the K-contraction order is
    # unchanged.
    tile, _, wp = x_ref.shape
    xw = _xwin_tile(x_ref[:], k, dtype)
    y = jnp.dot(w_ref[:].astype(dtype), xw,
                preferred_element_type=jnp.float32)  # [C_out, tile*Wp]
    y_ref[:] = jnp.moveaxis(y.reshape(y.shape[0], tile, wp), 1, 0)


def _dw_kernel(x_ref, dy_ref, dw_ref, *, k: int, dtype):
    # single contraction over all tile*Wp lanes: dW = Xwin_cat @ dy_cat^T.
    # Same MXU-batching rationale as _fwd_kernel; the contraction order
    # over W differs from the per-row sum (fp-noise-level only, and the
    # f32 accumulator keeps it below the committed test tolerances).
    tile, _, wp = x_ref.shape
    xw = _xwin_tile(x_ref[:], k, dtype)
    dyc = jnp.moveaxis(dy_ref[:], 0, 1).reshape(-1, tile * wp).astype(dtype)
    dw_ref[0] = jax.lax.dot_general(
        xw, dyc, (((1,), (1,)), ((), ())),  # contract over tile*Wp lanes
        preferred_element_type=jnp.float32)


def _compute_dtype() -> jnp.dtype:
    return jnp.dtype(os.environ.get("SOT_TPU_CONV_DTYPE", "bfloat16"))


def _prep(x: Array, k: int):
    """[B, W, C] -> channel-major zero-padded [Bp, C, Wp].

    The kernel's lane rolls are circular, so the last k-1 lanes of every
    rolled copy hold wrapped head values; Wp >= w + k - 1 keeps them
    strictly outside the kept outputs [0, w) (fwd) and on zero dy lanes
    (dw). y_cm[q] = sum_d K[d] x_cm[q + d] = sum_d K[d] x[q + d - pad] is
    the 'same' output at w_out = q directly."""
    b, w, _ = x.shape
    pad = (k - 1) // 2
    wp = _round_up(w + k - 1, 128)
    bp = _round_up(b, _row_tile())
    # blocks are fed f32: the kernel's lane-rolls must run on 32-bit data
    # (Mosaic has no bf16 rotate — see _xwin_tile), so a bf16 feed would
    # force per-roll up-casts rather than save traffic
    x_cm = jnp.pad(jnp.swapaxes(x, 1, 2).astype(jnp.float32),
                   ((0, bp - b), (0, 0), (pad, wp - w - pad)))
    return x_cm, wp, bp, pad


def _conv_cmajor_fwd(x_cm: Array, wflat: Array, k: int) -> Array:
    """x_cm [Bp, C_in, Wp], wflat [C_out, C_in*k] -> y_cm [Bp, C_out, Wp]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bp, cin, wp = x_cm.shape
    cout = wflat.shape[0]
    tile = _row_tile()
    n_prog = bp // tile
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, dtype=_compute_dtype()),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((tile, cin, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, cin * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, cout, wp), jnp.float32),
        interpret=_interpret(),
    )(x_cm, wflat)


def _conv_cmajor_dw(x_cm: Array, dy_cm: Array, k: int) -> Array:
    """Partial dW per row tile, summed in XLA -> [C_in*k, C_out]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bp, cin, wp = x_cm.shape
    cout = dy_cm.shape[1]
    tile = _row_tile()
    n_prog = bp // tile
    partials = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, dtype=_compute_dtype()),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((tile, cin, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cout, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cin * k, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog, cin * k, cout), jnp.float32),
        interpret=_interpret(),
    )(x_cm, dy_cm)
    return jnp.sum(partials, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1d_same(x: Array, kernel: Array, k: int) -> Array:
    """'same' conv1d, NWC in/out: x [B, W, C_in], kernel [k, C_in, C_out]
    (flax nn.Conv layout), odd k. Matches
    ``lax.conv_general_dilated(..., padding=[(p, p)])`` with p=(k-1)//2 at
    the kernel's compute dtype (bf16 operands / f32 accumulation by
    default — XLA's default-precision TPU conv; SOT_TPU_CONV_DTYPE=float32
    for exact parity)."""
    return _conv1d_same_fwd(x, kernel, k)[0]


def _conv1d_same_fwd(x, kernel, k):
    b, w, cin = x.shape
    cout = kernel.shape[-1]
    x_cm, wp, bp, pad = _prep(x, k)
    wflat = jnp.swapaxes(kernel.reshape(k * cin, cout), 0, 1)
    y_cm = _conv_cmajor_fwd(x_cm, wflat.astype(jnp.float32), k)
    y = jnp.swapaxes(y_cm[:b, :, :w], 1, 2)
    return y, (x, kernel)


def _conv1d_same_bwd(k, res, dy):
    x, kernel = res
    b, w, cin = x.shape
    cout = kernel.shape[-1]
    # dx: 'same' conv of dy with the tap-flipped, (ci<->co)-swapped kernel
    kflip = jnp.swapaxes(kernel[::-1], 1, 2)  # [k, C_out, C_in]
    dx = conv1d_same(dy, kflip, k)
    # dw[d, ci, co] = sum_{rows, w} x[row, ci, w + d - pad] dy[row, co, w]:
    # contract the im2col of x against dy placed at the x grid's offsets
    x_cm, wp, bp, pad = _prep(x, k)
    # dy aligns with y_cm's q-grid (w_out = q): left-aligned, zero tail
    dy_cm = jnp.pad(jnp.swapaxes(dy, 1, 2).astype(jnp.float32),
                    ((0, bp - b), (0, 0), (0, wp - w)))
    dwflat = _conv_cmajor_dw(x_cm, dy_cm, k)  # [(d*cin+ci), cout]
    dw = dwflat.reshape(k, cin, cout)
    return dx, dw


conv1d_same.defvjp(lambda x, kern, k: _conv1d_same_fwd(x, kern, k),
                   _conv1d_same_bwd)
