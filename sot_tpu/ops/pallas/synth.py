"""Fused sinusoidal-synth Pallas kernel: frame controls -> per-sinusoid audio.

Round-4 profile (results/round4/profile_step_post.txt): after the CQT and
SOT kernels, ~1.3 ms/step of the SOT-2048 train step is the synth block —
envelope upsampling (window-OLA amps, bilinear freqs), the phase prefix
sum, sin, and the amplitude weighting — split across several XLA loop
fusions plus two [64,32,128,20] layout copies. The intermediates are five
[B, 4096, K] f32 tensors (~21 MB each) while the actual INPUTS are ~90 KB
of frame-rate controls: the block is pure HBM traffic.

This kernel computes the whole chain per 128-lane block of (harmonic,
batch) pairs with everything resident in VMEM:

    env_f = Wf @ f_frames        (f32, Precision.HIGHEST — frequencies
    env_a = Wa @ a_frames         feed pitch; bf16 operands would cost
                                  ~0.4% = octave-scale cents errors)
    env_a = [env_f < sr/2] env_a (sample-rate Nyquist mask, f32 select)
    phase = prefix(env_f * 2pi/sr) along T — blocked [128,128] tri-matmul
            with BF16 OPERANDS + f32 accumulation, replicating
            ops/scan.prefix_sum's deliberate numerics (bf16 MXU noise in
            the phase was measured to HELP training escape the SOT
            plateau — round 1; do not "fix")
    out   = env_a * sin(phase)   # [T, lanes] per-sinusoid audio

The harmonic sum and the [T, lanes] -> [B, T] transpose happen in XLA
(their VJP then feeds this kernel's backward the per-lane cotangent
directly). The upsampling matrices Wf/Wa are built by running the
EXISTING resample ops on identity inputs at trace time, so the linear
maps are exact by construction (ops/resample.py stays the source of
truth for interpolation semantics).

Backward (custom VJP, same grid): recompute env/phase (cheaper than
storing 21 MB), then
    d_amp_frames  = Wa^T @ (sin(phase) * [mask] * dout)
    d_phase       = env_a * cos(phase) * dout
    d_omega       = suffix-sum(d_phase)      (transposed prefix: same
                    tri-matmul blocks, reversed carry)
    d_freq_frames = Wf^T @ (d_omega * 2pi/sr)
The Nyquist mask contributes no env_f gradient (piecewise-constant
`where`, matching ops/oscillator.remove_above_nyquist's VJP).

Gate: SOT_TPU_SYNTH_PALLAS (A/B-adopted via kernel_gates like the CQT
kernel). Shape envelope: T and n_lanes = K*B multiples of 128, frame
counts <= 64.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_TWO_PI = 2.0 * math.pi
_CHUNK = 128
_LANES = 128


def supported(t: int, n_lanes: int, frames_f: int, frames_a: int) -> bool:
    return (t % _CHUNK == 0 and n_lanes % _LANES == 0
            and frames_f <= 64 and frames_a <= 64 and t <= 16384)


def _tri(chunk: int, dtype):
    """Lower-tri ones built IN-KERNEL from iotas (pallas_call forbids
    captured array constants; bool compare -> f32 where, per the Mosaic
    no-boolean-vector-select lesson)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return jnp.where(rows >= cols, 1.0, 0.0).astype(dtype)


def _hi_dot(a, b, transpose_a=False):
    """f32 matmul at Precision.HIGHEST (envelope precision is pitch
    precision — see module docstring)."""
    dims = (((0,) if transpose_a else (1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _chunk_envs(f_all, a_all, wf_ref, wa_ref, c, nyquist):
    """Per-chunk envelopes [CHUNK, 128] via HIGHEST matmuls on the chunk's
    rows of the upsampling matrices (the full-T envelopes never exist —
    the first full-buffer version of this kernel OOMed scoped VMEM at
    18.3 MB vs the 16 MB stack; per-chunk streaming peaks ~3 MB)."""
    wf_c = wf_ref[c * _CHUNK:(c + 1) * _CHUNK, :]
    wa_c = wa_ref[c * _CHUNK:(c + 1) * _CHUNK, :]
    env_f = _hi_dot(wf_c, f_all)
    env_a = jnp.where(env_f >= nyquist, 0.0, _hi_dot(wa_c, a_all))
    return env_f, env_a, wf_c, wa_c


def _within_prefix(omega_c, tri):
    """Within-chunk inclusive prefix via tri-matmul, replicating
    ops/scan.prefix_sum's backend-default precision (bf16 operands + f32
    accumulation on the MXU; f32 in interpret mode)."""
    return jax.lax.dot_general(tri, omega_c.astype(tri.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(f_ref, a_ref, wf_ref, wa_ref, o_ref, *, t, nyquist, scale,
                op_dtype):
    tri = _tri(_CHUNK, op_dtype)
    f_all, a_all = f_ref[...], a_ref[...]
    carry = jnp.zeros((1, _LANES), jnp.float32)
    for c in range(t // _CHUNK):
        env_f, env_a, _, _ = _chunk_envs(f_all, a_all, wf_ref, wa_ref, c,
                                         nyquist)
        within = _within_prefix(env_f * scale, tri)
        phase = within + carry
        carry = carry + within[-1:, :]
        o_ref[c * _CHUNK:(c + 1) * _CHUNK, :] = env_a * jnp.sin(phase)


def _bwd_kernel(f_ref, a_ref, wf_ref, wa_ref, do_ref, df_ref, da_ref, *,
                t, nyquist, scale, op_dtype):
    tri = _tri(_CHUNK, op_dtype)
    f_all, a_all = f_ref[...], a_ref[...]
    nc = t // _CHUNK
    # pass 1: per-chunk phase entry carries (tiny [1,128] rows)
    carries = []
    carry = jnp.zeros((1, _LANES), jnp.float32)
    for c in range(nc):
        env_f = _hi_dot(wf_ref[c * _CHUNK:(c + 1) * _CHUNK, :], f_all)
        within = _within_prefix(env_f * scale, tri)
        carries.append(carry)
        carry = carry + within[-1:, :]
    # pass 2 (reverse): suffix-carry for d_omega, accumulate frame grads
    da_acc = jnp.zeros_like(a_all)
    df_acc = jnp.zeros_like(f_all)
    s = jnp.zeros((1, _LANES), jnp.float32)
    for c in range(nc - 1, -1, -1):
        env_f, env_a, wf_c, wa_c = _chunk_envs(f_all, a_all, wf_ref, wa_ref,
                                               c, nyquist)
        within = _within_prefix(env_f * scale, tri)
        phase = within + carries[c]
        do_c = do_ref[c * _CHUNK:(c + 1) * _CHUNK, :]
        d_env_a = jnp.where(env_f >= nyquist, 0.0, jnp.sin(phase) * do_c)
        da_acc = da_acc + _hi_dot(wa_c, d_env_a, transpose_a=True)
        d_phase = env_a * jnp.cos(phase) * do_c
        # within-chunk inclusive suffix: transposed tri contraction
        w_suf = jax.lax.dot_general(tri, d_phase.astype(op_dtype),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        d_omega = w_suf + s
        s = s + w_suf[:1, :]
        df_acc = df_acc + _hi_dot(wf_c, d_omega * scale, transpose_a=True)
    da_ref[...] = da_acc
    df_ref[...] = df_acc


def _call_fwd(freq_frames, amp_frames, wf, wa, sample_rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sot_tpu.ops.pallas.sot import _interpret

    frames_f, n_lanes = freq_frames.shape
    frames_a = amp_frames.shape[0]
    t = wf.shape[0]
    interp = _interpret()
    kern = functools.partial(
        _fwd_kernel, t=t, nyquist=sample_rate / 2.0,
        scale=_TWO_PI / float(sample_rate),
        op_dtype=jnp.float32 if interp else jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(n_lanes // _LANES,),
        in_specs=[
            pl.BlockSpec((frames_f, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frames_a, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, frames_f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, frames_a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n_lanes), jnp.float32),
        interpret=interp,
    )(freq_frames, amp_frames, wf, wa)


def _call_bwd(freq_frames, amp_frames, wf, wa, sample_rate, dout):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sot_tpu.ops.pallas.sot import _interpret

    frames_f, n_lanes = freq_frames.shape
    frames_a = amp_frames.shape[0]
    t = wf.shape[0]
    interp = _interpret()
    kern = functools.partial(
        _bwd_kernel, t=t, nyquist=sample_rate / 2.0,
        scale=_TWO_PI / float(sample_rate),
        op_dtype=jnp.float32 if interp else jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(n_lanes // _LANES,),
        in_specs=[
            pl.BlockSpec((frames_f, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frames_a, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, frames_f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, frames_a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((frames_f, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frames_a, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames_f, n_lanes), jnp.float32),
            jax.ShapeDtypeStruct((frames_a, n_lanes), jnp.float32),
        ],
        interpret=interp,
    )(freq_frames, amp_frames, wf, wa, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def synth_lanes(freq_frames: Array, amp_frames: Array, wf: Array, wa: Array,
                sample_rate: int) -> Array:
    """[frames_f, L] freqs + [frames_a, L] amps -> [T, L] per-sinusoid
    audio, L = lane-major (harmonic-major, batch-minor) pairs."""
    return _call_fwd(freq_frames, amp_frames, wf, wa, sample_rate)


def _synth_fwd(freq_frames, amp_frames, wf, wa, sample_rate):
    out = _call_fwd(freq_frames, amp_frames, wf, wa, sample_rate)
    return out, (freq_frames, amp_frames, wf, wa)


def _synth_bwd(sample_rate, res, dout):
    freq_frames, amp_frames, wf, wa = res
    df, da = _call_bwd(freq_frames, amp_frames, wf, wa, sample_rate, dout)
    return df, da, jnp.zeros_like(wf), jnp.zeros_like(wa)


synth_lanes.defvjp(_synth_fwd, _synth_bwd)


@functools.lru_cache(maxsize=8)
def _resample_matrices(n_frames: int, t: int, amp_method: str):
    """Exact [T, frames] matrices for the synth's two upsamplers, built by
    pushing identity frames through ops/resample (single source of truth).
    The amp matrix folds the add_endpoint duplication into its last
    column, so it consumes the RAW n_frames amplitudes."""
    from sot_tpu.ops.resample import resample

    # runs under jit tracing (the synth is called inside the train step):
    # identity inputs are compile-time constants, so force eager eval
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(n_frames, dtype=jnp.float32)[None, :, :]
        wf = jnp.asarray(np.asarray(resample(eye, t, method="bilinear",
                                             add_endpoint=True)[0]))
        wa = jnp.asarray(np.asarray(resample(eye, t, method=amp_method,
                                             add_endpoint=True)[0]))
    return wf, wa


def synth_render(amplitudes: Array, frequencies: Array, n_samples: int,
                 sample_rate: int, amp_resample_method: str = "window"
                 ) -> Array:
    """Drop-in for resample+oscillator_bank on [B, frames, K] controls
    (already scaled/expanded/frame-rate-masked): returns [B, n_samples].
    Caller must check `supported()` first."""
    b, n_frames, k = amplitudes.shape
    wf, wa = _resample_matrices(n_frames, n_samples, amp_resample_method)
    # lane-major [frames, K*B], l = k*B + b
    f_l = jnp.transpose(frequencies, (1, 2, 0)).reshape(n_frames, k * b)
    a_l = jnp.transpose(amplitudes, (1, 2, 0)).reshape(n_frames, k * b)
    contrib = synth_lanes(f_l, a_l, wf, wa, sample_rate)  # [T, K*B]
    audio = contrib.reshape(n_samples, k, b).sum(axis=1)  # [T, B]
    return audio.T
