"""Fused CQT frame-slab matmul (round-4 profile target).

The XLA CQT path (ops/cqt.py) gathers 99%-overlapping analysis windows —
hop 256 against a 32768-sample kernel width — into a materialized
bf16[B*n_frames, W] frame matrix before the bank matmul. At the paper
shape that gather writes+rereads 64 MB of HBM and is the step's single
most expensive op (fusion.1794, 0.97 ms, results/round4/profile_step.txt)
even though the padded signal itself is only 4.5 MB.

This kernel keeps the WHOLE padded signal resident in VMEM and builds each
window block by in-VMEM dynamic slices (one per frame, static Python loop),
feeding the MXU directly:

    grid over window blocks c:
        A_c = concat_f x[:, f*hop + c*Wb : +Wb]      # [n_frames*B, Wb] VMEM
        out += A_c @ K[c*Wb:(c+1)*Wb, :]             # f32 accumulator

No frame matrix ever touches HBM; the signal is read once, the bank once.
VMEM budget at the paper shape (B=64, T_pad=36864, Wb=1024, NB_pad=640):
signal 4.5 MB (bf16) + A 2 MB + K block 1.25 MB (+ double buffer) + f32
accumulator 2.6 MB ≈ 12 MB < the 16 MB stack.

Forward-only by design: the CQT is the encoder's feature extractor and is
computed on input DATA (sot_tpu/training/trainer.py:164) — no gradient
ever flows through it in training or eval. The dispatcher
(ops/cqt.py:cqt_magnitude) only routes here under the
SOT_TPU_CQT_PALLAS gate and falls back to the XLA path for shapes the
kernel does not cover.

Mosaic constraints honoured (PERF.md round-3 lessons): all lane dims are
128-divisible (T_pad, Wb, NB_pad), dynamic slice starts are multiples of
the 256-sample hop, and no boolean-vector selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cqt_slab_kernel(x_ref, k_ref, o_ref, *, n_frames: int, hop: int,
                     w_blk: int):
    c = pl.program_id(0)
    base = c * w_blk
    slabs = [x_ref[:, pl.ds(base + f * hop, w_blk)] for f in range(n_frames)]
    a = jnp.concatenate(slabs, axis=0)  # [n_frames*B, w_blk] bf16, f-major
    acc = jnp.dot(a, k_ref[...], preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(c > 0)
    def _acc():
        o_ref[...] += acc


# populated lazily so CPU-only imports never touch pallas
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl
    return pl


def supported(batch: int, kernel_width: int, hop: int, n_frames: int) -> bool:
    """Shape envelope the kernel covers (everything else -> XLA path)."""
    return (batch % 8 == 0
            and kernel_width % 1024 == 0
            and hop % _LANE == 0
            and 1 <= n_frames * batch <= 4096)


@functools.partial(jax.jit, static_argnames=("hop", "n_frames", "n_out"))
def cqt_project(audio: Array, bank: Array, hop: int, n_frames: int,
                n_out: int) -> Array:
    """[B, T] audio x [W, n_out] bank -> [B, n_frames, n_out] projections.

    Equivalent to gathering frames at offsets f*hop and one matmul, with
    bf16 MXU arithmetic exactly like the XLA path's default-precision dot.
    """
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    from sot_tpu.ops.pallas.sot import _interpret

    batch, total = audio.shape
    width, n_cols = bank.shape
    w_blk = 1024
    n_blk = width // w_blk

    # lane padding: signal long enough for the last slice, bank cols to 128
    t_need = _round_up(max(total, (n_frames - 1) * hop + width), _LANE)
    nb_pad = _round_up(n_cols, _LANE)
    x = jnp.pad(jnp.asarray(audio, jnp.bfloat16), ((0, 0), (0, t_need - total)))
    k = jnp.pad(jnp.asarray(bank, jnp.bfloat16),
                ((0, 0), (0, nb_pad - n_cols)))

    rows = n_frames * batch
    kern = functools.partial(_cqt_slab_kernel, n_frames=n_frames, hop=hop,
                             w_blk=w_blk)
    out = pl.pallas_call(
        kern,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((batch, t_need), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_blk, nb_pad), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, nb_pad), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nb_pad), jnp.float32),
        interpret=_interpret(),
    )(x, k)
    # kernel rows are f-major; callers want [B, n_frames, n_out]
    return out.reshape(n_frames, batch, nb_pad)[:, :, :n_out].swapaxes(0, 1)
