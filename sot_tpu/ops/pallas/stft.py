"""Fused STFT frontend kernel: framing + window + real-DFT projection.

Closes SURVEY §2.3's "Pallas framing/windowing kernel" line (reference
torch.stft at features.py:204-213): one Pallas program produces the
[re | im] rfft projection of every frame directly from the audio, with no
HBM round-trip for the frames tensor and no XLA gather.

Design (TPU-first, not a torch translation):
  * the window is folded into the DFT basis outside the kernel —
    (f ⊙ w) @ M == f @ (w[:, None] * M) — so the kernel body is pure
    framing + one MXU matmul;
  * framing exploits hop | T (tf-style ``pad_end`` framing then has
    exactly C = T/hop frames per clip): audio reshaped to hop-chunks
    [B*C, hop] makes frame slab r (samples [r*hop, (r+1)*hop) of every
    frame) equal to the chunk rows shifted UP by r, with rows whose
    chunk index wraps past the clip masked to the pad value (zero) — a
    static sublane slice + select per slab, no gathers;
  * grid = (row tiles, K tiles); the frames scratch is built once per row
    tile (at k == 0, TPU grid iteration is sequential with the last axis
    innermost) and reused across the K tiles of the projection matrix.

Applicability (dispatcher ``stft_magnitude`` checks): pad_end framing
without centring, hop a multiple of 128 (the lane width — smaller hops
waste >50% of every vector register and stay on the XLA path) and
hop | T.  That covers the FLOPs-dominant scales: the loss-domain STFT
(2048/256) and the MSS 2048/1024/512 scales; MSS 256/128/64 stay on XLA.

Backward is XLA: d_audio = OLA(dproj @ Mw^T) with the same dense
overlap-add used by ops/stft.py's framer VJP — the cotangent math is
shared, only the forward is fused.

Enable with SOT_TPU_STFT_PALLAS=1 (A/B: scripts/bench_mss_ab.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sot import _interpret, _use_pallas

Array = jax.Array

_K_TILE = 256   # projection columns per program (M block [n_fft, 256])
_ROW_TILE = 256  # frame rows per program ([256, n_fft] f32 scratch <= 2 MB;
# 512 OOMed the 16 MB scoped VMEM on-chip: the q-unrolled slab temporaries
# + scratch + streamed M blocks summed to 25 MB — real-TPU finding, round 3)


@functools.lru_cache(maxsize=32)
def _windowed_dft(n_fft: int, window_key) -> np.ndarray:
    """[n_fft, K_pad] real-DFT basis with the window folded in and the
    column count padded to a multiple of the K tile; columns are
    [cos | -sin] (re | im halves), zeros in the padding."""
    win = np.asarray(window_key, np.float32)
    k = np.arange(n_fft // 2 + 1)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * t[:, None] * k[None, :] / n_fft
    m = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)
    m *= win[:, None]
    n_cols = m.shape[1]
    k_pad = -(-n_cols // _K_TILE) * _K_TILE
    return np.pad(m, ((0, 0), (0, k_pad - n_cols)))


def _frontend_kernel(chunks_ref, m_ref, out_ref, frames_ref, *, q: int,
                     q8: int, c: int, r_t: int, hop: int):
    """Grid (rows, k): build the frame slab scratch at k == 0, then one
    MXU matmul per K tile."""
    i = jax.lax.mul(pl.program_id(0), r_t)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        # Mosaic requires dynamic sublane offsets provably 8-aligned, so
        # the original per-slab loads at i + r (r = 1..q-1) are rejected at
        # lowering (real-TPU finding, round 3).  Instead: ONE aligned load
        # of the row tile plus its q8-row tail, then shift in-register with
        # static rolls — slab r = rows [r, r + r_t) of the extended block.
        base = chunks_ref[pl.ds(i, r_t), :]
        tail = chunks_ref[pl.ds(i + r_t, q8), :]
        ext = jnp.concatenate([base, tail], axis=0)
        for r in range(q):
            slab = ext if r == 0 else pltpu.roll(
                ext, shift=ext.shape[0] - r, axis=0)
            slab = slab[:r_t]
            if r:
                # rows whose chunk index wraps past the clip read the
                # next clip's samples; tf pad_end semantics = zeros there
                j = jax.lax.broadcasted_iota(jnp.int32, (r_t, hop), 0)
                slab = jnp.where((j % c) + r >= c, 0.0, slab)
            frames_ref[:, r * hop:(r + 1) * hop] = slab

    out_ref[:, :] = jnp.dot(frames_ref[:, :], m_ref[:, :],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)


try:  # pallas imported lazily so CPU-only environments never touch it
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


def _project_pallas(chunks: Array, m: Array, q: int, q8: int, c: int,
                    n_fft: int, hop: int) -> Array:
    rows = chunks.shape[0] - q8  # q8 zero pad rows for the last tile's slabs
    r_t = _ROW_TILE if rows % _ROW_TILE == 0 else rows
    k_pad = m.shape[1]
    grid = (rows // r_t, k_pad // _K_TILE)
    return pl.pallas_call(
        functools.partial(_frontend_kernel, q=q, q8=q8, c=c, r_t=r_t,
                          hop=hop),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full chunk array
            pl.BlockSpec((n_fft, _K_TILE), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_t, _K_TILE), lambda i, k: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, k_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r_t, n_fft), jnp.float32)],
        interpret=_interpret(),
    )(chunks, m)


def _ola(dframes: Array, q: int, hop: int, t: int) -> Array:
    """Dense overlap-add of frame cotangents back to audio [..., T] —
    the same reshape-and-shift math as ops/stft.py _make_framer.bwd."""
    lead = dframes.shape[:-2]
    n_frames = dframes.shape[-2]
    chunks = dframes.reshape(lead + (n_frames, q, hop))
    total = jnp.zeros(lead + (n_frames + q - 1, hop), dframes.dtype)
    for r in range(q):
        total = total.at[..., r:r + n_frames, :].add(chunks[..., :, r, :])
    flat = total.reshape(lead + ((n_frames + q - 1) * hop,))
    return flat[..., :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def stft_frontend_projection(audio: Array, size: int, hop_length: int,
                             window: tuple) -> Array:
    """rfft projection [batch, C, 2*(size//2+1)] of hann/flattop-windowed
    pad_end frames of ``audio`` [batch, T]; re/im concatenated along the
    last axis.  ``window`` is the window samples as a hashable tuple.
    Requires hop_length | T and 128 | hop_length (see module docstring)."""
    return _frontend_fwd(audio, size, hop_length, window)[0]


def _frontend_fwd(audio, size, hop_length, window):
    b, t = audio.shape
    c = t // hop_length
    q = size // hop_length
    m = jnp.asarray(_windowed_dft(size, window))
    chunks = audio.reshape(b * c, hop_length)
    q8 = -(-q // 8) * 8  # tail padded to an 8-aligned sublane load
    chunks = jnp.pad(chunks, ((0, q8), (0, 0)))
    proj = _project_pallas(chunks, m, q, q8, c, size, hop_length)
    n_cols = 2 * (size // 2 + 1)
    return proj[:, :n_cols].reshape(b, c, n_cols), (b, t)


def _frontend_bwd(size, hop_length, window, res, dproj):
    b, t = res
    m = jnp.asarray(_windowed_dft(size, window))
    n_cols = 2 * (size // 2 + 1)
    q = size // hop_length
    dframes = jnp.einsum("bck,nk->bcn", dproj, m[:, :n_cols],
                         precision=jax.lax.Precision.HIGHEST)
    return (_ola(dframes, q, hop_length, t),)


stft_frontend_projection.defvjp(_frontend_fwd, _frontend_bwd)


def frontend_applicable(size: int, hop_length: int, t: int,
                        pad_end: bool, center: bool) -> bool:
    from sot_tpu.ops.numerics import env_flag

    if not env_flag("SOT_TPU_STFT_PALLAS"):
        return False
    if pl is None or center or not pad_end:
        return False
    if hop_length % 128 or t % hop_length or size % hop_length:
        return False
    if not (_use_pallas() or _interpret()):
        return False
    return True
