"""Fused sinusoidal-synth Pallas kernel: frame controls -> per-sinusoid audio.

Round-4 profile (results/round4/profile_step_post.txt): after the CQT and
SOT kernels, ~1.3 ms/step of the SOT-2048 train step is the synth block —
envelope upsampling (window-OLA amps, bilinear freqs), the phase prefix
sum, sin, and the amplitude weighting — split across several XLA loop
fusions plus two [64,32,128,20] layout copies. The intermediates are five
[B, 4096, K] f32 tensors (~21 MB each) while the actual INPUTS are ~90 KB
of frame-rate controls: the block is pure HBM traffic.

The kernel streams the chain per 128-sample chunk x 128-lane block of
(harmonic, batch) pairs, everything in VMEM (a full-T-buffer first
version OOMed the 16 MB VMEM stack at 18.3 MB; streaming peaks ~3 MB).

BIT-EXACT ENVELOPES (the round-4 synth lesson): a first version computed
the envelopes as dense HIGHEST-precision matmuls against the upsampling
matrices — mathematically the same linear map, fp-differently rounded at
the ~1e-6 level. That tiny seed is amplified by 4096 samples of phase
accumulation into ~1% audio/gradient noise, and TWO independent 25k
training runs (seeds 42/123) degraded identically: comb RPA 94.8/94.9 vs
the XLA path's 98.9/99.5, LSD +8..+25 (results/round2/
synth_train_verdict.json). Speed that does not train is not adopted — so
the envelopes are now computed with the XLA path's EXACT arithmetic:

  freqs (bilinear, ops/resample._interp_linear):
      env_f = x_lo + frac * (x_hi - x_lo)
  amps (hann OLA, ops/resample.upsample_with_windows, endpoint-padded):
      env_a = w_rise * a_{j+1} + w_fall * a_j

with x_lo/x_hi/a_j gathered via ONE-HOT HIGHEST matmuls (exact: 1*x and
0*x are exact and every sum has a single nonzero term) and the per-sample
scalars (frac, window taps) extracted from the real resample ops run on
identity frames. The phase prefix replicates ops/scan.prefix_sum's
bf16-operand tri-matmul + f32 carry (backend-default precision; the bf16
MXU phase noise was measured to HELP training — round 1). Remaining
divergence from the XLA path: reduction ORDER of the cross-chunk phase
carry and of the backward's frame-gradient accumulations — the class the
repo's convention policy explicitly tolerates.

Backward (custom VJP, same grid, two passes): pass 1 records per-chunk
phase-entry carries (32 tiny rows); pass 2 walks chunks in reverse,
recomputing envelopes/phase and accumulating
    d_a_frames += OHa_{lo,hi}^T @ (w_{fall,rise} * [mask] * sin * dout)
    d_phase     = env_a * cos * dout
    d_omega     = within-chunk suffix (transposed tri) + end-carry
    d_f_frames += OHf_lo^T @ (d_env - frac*d_env) + OHf_hi^T @ (frac*d_env)
The Nyquist mask contributes no env_f gradient (piecewise-constant
`where`, matching ops/oscillator.remove_above_nyquist's VJP).

Gate: SOT_TPU_SYNTH_PALLAS — adoption requires the on-chip A/B
(synth_ab.json) AND a committed positive training verdict
(synth_train_verdict.json), per kernel_gates._synth_gate.
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


def supported(t: int, n_lanes: int, frames: int, amp_method: str) -> bool:
    # frames bound: all taps pack into one [T, 128] VMEM array
    # (2F one-hot freq cols + 2(F+1) amp cols + 3 scalar cols <= 128;
    # separate tap arrays each pad to 128 lanes and OOM the VMEM stack)
    # t bound set by the 16 MB VMEM stack, not correctness: the packed tap
    # block [T,128] f32 + output [T,128] are ~4.2 MB each at T=8192, and the
    # backward adds an equal-size dout block (~12.6 MB total + temps). At
    # t=16384 the backward would fail Mosaic compilation (ADVICE round 4),
    # so the gate stops at 8192 (shipped configs use n_samples=4096).
    return (t % _CHUNK == 0 and n_lanes % _LANES == 0
            and frames <= 30 and t <= 8192 and amp_method == "window")


def _tri(chunk: int, dtype):
    """Lower-tri ones built IN-KERNEL from iotas (pallas_call forbids
    captured array constants; bool compare -> f32 where, per the Mosaic
    no-boolean-vector-select lesson)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return jnp.where(rows >= cols, 1.0, 0.0).astype(dtype)


def _hi_dot(a, b, transpose_a=False):
    """HIGHEST-precision f32 matmul. For the one-hot gathers this is
    EXACT (single nonzero per row); Mosaic honours the precision attr
    (on-chip probe: 2e-7 rel vs 1e-3 at DEFAULT)."""
    dims = (((0,) if transpose_a else (1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _within_prefix(omega_c, tri):
    return jax.lax.dot_general(tri, omega_c.astype(tri.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cols(frames: int):
    """Column layout of the packed [T, 128] tap array."""
    fa = frames + 1
    o = {"flo": (0, frames), "fhi": (frames, 2 * frames),
         "alo": (2 * frames, 2 * frames + fa),
         "ahi": (2 * frames + fa, 2 * frames + 2 * fa)}
    s = 2 * frames + 2 * fa
    o["frac"], o["w_lo"], o["w_hi"] = s, s + 1, s + 2
    return o


def _chunk_envs(f_all, a_all, tap_ref, c, nyquist, cols):
    """Per-chunk [CHUNK, 128] envelopes with the XLA path's exact
    arithmetic (see module docstring). ``c`` may be a traced loop index
    (the chunk loops are lax.fori_loops — python unrolling kept 32
    copies of every [128,128] temp alive and OOMed the VMEM stack)."""
    import jax.experimental.pallas as pl

    tap = tap_ref[pl.ds(c * _CHUNK, _CHUNK), :]
    x_lo = _hi_dot(tap[:, cols["flo"][0]:cols["flo"][1]], f_all)
    x_hi = _hi_dot(tap[:, cols["fhi"][0]:cols["fhi"][1]], f_all)
    frac = tap[:, cols["frac"]:cols["frac"] + 1]
    env_f = x_lo + frac * (x_hi - x_lo)
    a_lo = _hi_dot(tap[:, cols["alo"][0]:cols["alo"][1]], a_all)
    a_hi = _hi_dot(tap[:, cols["ahi"][0]:cols["ahi"][1]], a_all)
    env_a = (tap[:, cols["w_lo"]:cols["w_lo"] + 1] * a_lo
             + tap[:, cols["w_hi"]:cols["w_hi"] + 1] * a_hi)
    env_a = jnp.where(env_f >= nyquist, 0.0, env_a)
    return env_f, env_a, tap


def _fwd_kernel(f_ref, a_ref, tap_ref, o_ref, *, t, nyquist, scale,
                op_dtype, cols):
    import jax.experimental.pallas as pl

    tri = _tri(_CHUNK, op_dtype)
    f_all, a_all = f_ref[...], a_ref[...]

    def body(c, carry):
        env_f, env_a, _ = _chunk_envs(f_all, a_all, tap_ref, c, nyquist,
                                      cols)
        within = _within_prefix(env_f * scale, tri)
        phase = within + carry
        o_ref[pl.ds(c * _CHUNK, _CHUNK), :] = env_a * jnp.sin(phase)
        return carry + within[-1:, :]

    jax.lax.fori_loop(0, t // _CHUNK, body,
                      jnp.zeros((1, _LANES), jnp.float32))


def _bwd_kernel(f_ref, a_ref, tap_ref, do_ref, df_ref, da_ref, carr_ref,
                *, t, nyquist, scale, op_dtype, cols):
    import jax.experimental.pallas as pl

    tri = _tri(_CHUNK, op_dtype)
    f_all, a_all = f_ref[...], a_ref[...]
    nc = t // _CHUNK

    # pass 1: per-chunk phase entry carries into VMEM scratch [nc, 128]
    def fwd_body(c, carry):
        env_f, _, _ = _chunk_envs(f_all, a_all, tap_ref, c, nyquist, cols)
        within = _within_prefix(env_f * scale, tri)
        carr_ref[pl.ds(c, 1), :] = carry
        return carry + within[-1:, :]

    jax.lax.fori_loop(0, nc, fwd_body,
                      jnp.zeros((1, _LANES), jnp.float32))

    # pass 2 (reverse): suffix-carry for d_omega, accumulate frame grads
    def bwd_body(i, state):
        s, da_acc, df_acc = state
        c = nc - 1 - i
        env_f, env_a, tap = _chunk_envs(f_all, a_all, tap_ref, c, nyquist,
                                        cols)
        within = _within_prefix(env_f * scale, tri)
        phase = within + carr_ref[pl.ds(c, 1), :]
        do_c = do_ref[pl.ds(c * _CHUNK, _CHUNK), :]
        keep = env_f < nyquist
        d_env_a = jnp.where(keep, jnp.sin(phase) * do_c, 0.0)
        da_acc = da_acc + _hi_dot(
            tap[:, cols["alo"][0]:cols["alo"][1]],
            tap[:, cols["w_lo"]:cols["w_lo"] + 1] * d_env_a,
            transpose_a=True)
        da_acc = da_acc + _hi_dot(
            tap[:, cols["ahi"][0]:cols["ahi"][1]],
            tap[:, cols["w_hi"]:cols["w_hi"] + 1] * d_env_a,
            transpose_a=True)
        d_phase = env_a * jnp.cos(phase) * do_c
        w_suf = jax.lax.dot_general(tri, d_phase.astype(op_dtype),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        d_env_f = (w_suf + s) * scale
        s = s + w_suf[:1, :]
        frac = tap[:, cols["frac"]:cols["frac"] + 1]
        e2 = frac * d_env_f
        df_acc = df_acc + _hi_dot(
            tap[:, cols["flo"][0]:cols["flo"][1]], d_env_f - e2,
            transpose_a=True)
        df_acc = df_acc + _hi_dot(
            tap[:, cols["fhi"][0]:cols["fhi"][1]], e2, transpose_a=True)
        return s, da_acc, df_acc

    init = (jnp.zeros((1, _LANES), jnp.float32), jnp.zeros_like(a_all),
            jnp.zeros_like(f_all))
    _, da_acc, df_acc = jax.lax.fori_loop(0, nc, bwd_body, init)
    da_ref[...] = da_acc
    df_ref[...] = df_acc


def _specs(t, frames_f, frames_a, with_dout):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lane_blk = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    specs = [lane_blk(frames_f), lane_blk(frames_a),
             pl.BlockSpec((t, _LANES), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)]
    if with_dout:
        specs.append(lane_blk(t))
    return specs


def _call_fwd(f_l, a_l, taps, sample_rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sot_tpu.ops.pallas.sot import _interpret

    frames_f, n_lanes = f_l.shape
    frames_a = a_l.shape[0]
    t = taps.shape[0]
    interp = _interpret()
    kern = functools.partial(
        _fwd_kernel, t=t, nyquist=sample_rate / 2.0,
        scale=_TWO_PI / float(sample_rate),
        op_dtype=jnp.float32 if interp else jnp.bfloat16,
        cols=_cols(frames_f))
    return pl.pallas_call(
        kern,
        grid=(n_lanes // _LANES,),
        in_specs=_specs(t, frames_f, frames_a, with_dout=False),
        out_specs=pl.BlockSpec((t, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n_lanes), jnp.float32),
        interpret=interp,
    )(f_l, a_l, taps)


def _call_bwd(f_l, a_l, taps, sample_rate, dout):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sot_tpu.ops.pallas.sot import _interpret

    frames_f, n_lanes = f_l.shape
    frames_a = a_l.shape[0]
    t = taps.shape[0]
    interp = _interpret()
    kern = functools.partial(
        _bwd_kernel, t=t, nyquist=sample_rate / 2.0,
        scale=_TWO_PI / float(sample_rate),
        op_dtype=jnp.float32 if interp else jnp.bfloat16,
        cols=_cols(frames_f))
    return pl.pallas_call(
        kern,
        grid=(n_lanes // _LANES,),
        in_specs=_specs(t, frames_f, frames_a, with_dout=True),
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
        scratch_shapes=[pltpu.VMEM((t // _CHUNK, _LANES), jnp.float32)],
        interpret=interp,
    )(f_l, a_l, taps, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def synth_lanes(f_l, a_l, taps, sample_rate):
    """[frames, L] freqs + [frames+1, L] endpoint-padded amps + packed
    [T, 128] tap array -> [T, L] per-sinusoid audio; L = lane-major
    (harmonic-major, batch-minor)."""
    return _call_fwd(f_l, a_l, taps, sample_rate)


def _synth_fwd(f_l, a_l, taps, sample_rate):
    out = _call_fwd(f_l, a_l, taps, sample_rate)
    return out, (f_l, a_l, taps)


def _synth_bwd(sample_rate, res, dout):
    f_l, a_l, taps = res
    df, da = _call_bwd(f_l, a_l, taps, sample_rate, dout)
    return df, da, jnp.zeros_like(taps)


synth_lanes.defvjp(_synth_fwd, _synth_bwd)


def _extract_taps(mat: np.ndarray):
    """Per-row (lo one-hot, hi one-hot, w_lo, w_hi) from a <=2-tap
    interpolation matrix built on identity frames (the window-OLA amp
    upsampler; extraction is exact because identity inputs make each
    matrix entry the raw tap weight)."""
    t, frames = mat.shape
    lo = np.zeros(t, np.int64)
    hi = np.zeros(t, np.int64)
    w_lo = np.zeros(t, np.float32)
    w_hi = np.zeros(t, np.float32)
    for r in range(t):
        nz = np.flatnonzero(mat[r])
        if nz.size == 0:
            continue
        if nz.size == 1:
            lo[r] = hi[r] = nz[0]
            w_lo[r], w_hi[r] = mat[r, nz[0]], 0.0
        elif nz.size == 2:
            lo[r], hi[r] = nz[0], nz[1]
            w_lo[r], w_hi[r] = mat[r, nz[0]], mat[r, nz[1]]
        else:
            raise ValueError(f"row {r} has {nz.size} taps; the exact-tap "
                             "kernel only covers <=2-tap interpolators")
    onehot_lo = np.eye(frames, dtype=np.float32)[lo]
    onehot_hi = np.eye(frames, dtype=np.float32)[hi]
    return onehot_lo, onehot_hi, w_lo, w_hi


@functools.lru_cache(maxsize=8)
def _build_taps(n_frames: int, t: int):
    """One-hot gather matrices + per-sample scalars for the two
    upsamplers, extracted from the REAL resample ops run on identity
    frames (ops/resample stays the source of truth). The amp taps are
    built on n_frames+1 channels with add_endpoint=False so the endpoint
    duplication stays a separate column (a collapsed matrix would merge
    the last chunk's two taps into one rounded weight)."""
    from sot_tpu.ops.resample import upsample_with_windows

    # freq taps: replicate ops/resample._interp_linear's index math
    # EXACTLY (align_corners=False). A matrix extraction cannot represent
    # the clipped tail rows, where the reference computes
    # x_{n-2} + 1.0*(x_{n-1} - x_{n-2}) — NOT bitwise x_{n-1}; the
    # bit-exactness contract is tests/test_synth_pallas.py::
    # test_extracted_envelopes_bit_exact.
    scale_c = n_frames / t
    coords = (np.arange(t, dtype=np.float64) + 0.5) * scale_c - 0.5
    coords = np.clip(coords, 0.0, n_frames - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = (np.minimum(lo, n_frames - 2) if n_frames > 1
          else np.zeros_like(lo))
    frac = (coords - lo).astype(np.float32)
    hi = np.minimum(lo + 1, n_frames - 1)
    flo = np.eye(n_frames, dtype=np.float32)[lo]
    fhi = np.eye(n_frames, dtype=np.float32)[hi]
    cols = _cols(n_frames)

    with jax.ensure_compile_time_eval():
        eye_a = jnp.eye(n_frames + 1, dtype=jnp.float32)[None, :, :]
        mat_a = np.asarray(upsample_with_windows(eye_a, t,
                                                 add_endpoint=False)[0])
        alo, ahi, w_lo, w_hi = _extract_taps(mat_a)
        # pack everything into ONE [T, 128] array: separate [T, frames]
        # arrays each pad to 128 lanes in VMEM (2 MB apiece) and blew the
        # 16 MB stack in the combined val+grad program
        packed = np.zeros((t, _LANES), np.float32)
        packed[:, cols["flo"][0]:cols["flo"][1]] = flo
        packed[:, cols["fhi"][0]:cols["fhi"][1]] = fhi
        packed[:, cols["alo"][0]:cols["alo"][1]] = alo
        packed[:, cols["ahi"][0]:cols["ahi"][1]] = ahi
        packed[:, cols["frac"]] = frac
        packed[:, cols["w_lo"]] = w_lo
        packed[:, cols["w_hi"]] = w_hi
        # the jnp conversion must ALSO be eager: this function is
        # lru-cached and may first run inside a jit trace — a traced
        # constant in the cache leaks into every later trace
        out = jnp.asarray(packed)
    return out


def synth_render(amplitudes: Array, frequencies: Array, n_samples: int,
                 sample_rate: int, amp_resample_method: str = "window"
                 ) -> Array:
    """Drop-in for resample+oscillator_bank on [B, frames, K] controls
    (already scaled/expanded/frame-rate-masked): returns [B, n_samples].
    Caller must check `supported()` first."""
    if amp_resample_method != "window":
        raise ValueError("fused synth covers amp_resample_method='window'")
    b, n_frames, k = amplitudes.shape
    taps = _build_taps(n_frames, n_samples)
    # lane-major [frames, K*B], l = k*B + b; amps endpoint-padded
    f_l = jnp.transpose(frequencies, (1, 2, 0)).reshape(n_frames, k * b)
    a_pad = jnp.concatenate([amplitudes, amplitudes[:, -1:, :]], axis=1)
    a_l = jnp.transpose(a_pad, (1, 2, 0)).reshape(n_frames + 1, k * b)
    contrib = synth_lanes(f_l, a_l, taps, sample_rate)  # [T, K*B]
    audio = contrib.reshape(n_samples, k, b).sum(axis=1)  # [T, B]
    return audio.T
