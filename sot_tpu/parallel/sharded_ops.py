"""Explicitly sharded DSP ops (shard_map + collectives).

Two sharding strategies the single-chip code cannot express (SURVEY.md
sections 2.3/5 "long-context"):

* ``stft_magnitude_frame_sharded`` — the audio's *time* axis is sharded
  across the mesh's 'freq' axis; each device computes its own frames after an
  overlap-save halo exchange with its right neighbours via ``ppermute``
  (halo = n_fft - hop samples, the exact frame geometry of the reference's
  pad_end framing, utils.py:252-275). Output spectra come back sharded over
  the *frame* axis.

* ``wasserstein_1d_freq_sharded`` — spectra sharded over (rows='data',
  bins='freq'); the per-row sort/cumsum/quantile merge needs full rows, so
  rows all_gather their frequency shards over ICI (1025 floats/row — cheap)
  and each device then solves its row shard independently.

* ``oscillator_bank_sample_sharded`` — the synth's *sample* axis is sharded
  across the mesh; phase accumulation (a cumsum over time) crosses shard
  boundaries, so each device prefix-sums its local chunk and the per-chunk
  phase totals are exchanged in ONE tiny all_gather (n_sinusoids floats per
  device), exclusive-summed mod 2pi into a per-device carry — the
  cross-chip generalisation of the reference's ``angular_cumsum`` chunk
  stitching (ddsp.py:266-331), which bounds fp error independent of signal
  length AND device count.

Both are differentiable end-to-end (collectives have well-defined
transposes: ppermute <-> inverse permute, all_gather <-> psum_scatter).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sot_tpu.ops.oscillator import remove_above_nyquist
from sot_tpu.ops.stft import frame_signal, _complex_abs
from sot_tpu.ops.windows import get_window, hann_window
from sot_tpu.ops.wasserstein import wasserstein_1d

Array = jax.Array


def stft_magnitude_frame_sharded(
    audio: Array,
    mesh: Mesh,
    size: int = 2048,
    hop_length: int = 256,
    window: Optional[str] = None,
    axis: str = "freq",
    batch_axis: Optional[str] = None,
) -> Array:
    """Frame-sharded magnitude STFT over `mesh[axis]`.

    audio: [batch, T] with T divisible by hop*n_shards. Equals the
    single-device ``stft_magnitude(..., pad_end=True, normalized=True)``.
    Returns [batch, n_frames, size//2+1] sharded over the frame axis.
    ``batch_axis`` additionally shards the batch dimension (the DP axis)
    so the op composes with the data-parallel train step.
    """
    n = mesh.shape[axis]
    t = audio.shape[-1]
    if t % (hop_length * n) != 0:
        raise ValueError(f"T={t} must be divisible by hop*n_shards={hop_length * n}")
    chunk = t // n
    halo = size - hop_length
    halo_chunks = -(-halo // chunk)
    win = hann_window(size) if window is None else get_window(window, size)
    scale = np.float32(1.0 / np.sqrt(size))

    def local_stft(x_local: Array) -> Array:
        # x_local: [batch, chunk] — this device's contiguous sample span.
        idx = jax.lax.axis_index(axis)
        parts = [x_local]
        cur = x_local
        # Collect halo_chunks right-neighbour chunks. ppermute send-to-left ==
        # receive-from-right; wrapped (circular) data past the signal end is
        # zeroed to emulate pad_end.
        perm = [(d, (d - 1) % n) for d in range(n)]
        for i in range(halo_chunks):
            cur = jax.lax.ppermute(cur, axis, perm)
            valid = (idx + 1 + i) < n
            parts.append(jnp.where(valid, cur, jnp.zeros_like(cur)))
        ext = jnp.concatenate(parts, axis=-1)[..., : chunk + halo]

        frames_per_shard = chunk // hop_length
        fidx = (np.arange(frames_per_shard)[:, None] * hop_length
                + np.arange(size)[None, :])
        frames = ext[..., fidx]
        spec = jnp.fft.rfft(frames * win, axis=-1)
        return _complex_abs(jnp.real(spec), jnp.imag(spec)) * scale

    fn = shard_map(
        local_stft, mesh=mesh,
        in_specs=P(batch_axis, axis),
        out_specs=P(batch_axis, axis, None),
        check_vma=False,
    )
    return fn(audio)


def wasserstein_same_grid_row_sharded(
    grid: Array,
    u_weights: Array,
    v_weights: Array,
    mesh: Mesh,
    p: float = 2.0,
    limit_quantile_range: bool = False,
    target_constant: bool = False,
    row_axes: tuple = ("data", "freq"),
) -> Array:
    """Same-grid W1D with the ROW axis sharded over the whole mesh.

    The training-loss rows are (batch x frames); after the frame-sharded
    STFT the frames ride the 'freq' mesh axis and the batch rides 'data',
    so flattening gives rows sharded over both axes. Per-row transport is
    embarrassingly parallel: each device runs the fused same-grid solve
    (Pallas on TPU) on its local row block with NO collectives — the ideal
    mapping for this loss. Returns [rows] sharded over ``row_axes``.
    """
    from sot_tpu.ops.pallas.sot import wasserstein_same_grid

    axes = tuple(a for a in row_axes if mesh.shape.get(a, 1) >= 1)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    rows = u_weights.shape[0]
    if rows % n_shards != 0:
        raise ValueError(f"rows={rows} must divide over {n_shards} shards")

    def local_rows(g, u_l, v_l):
        return wasserstein_same_grid(
            g, u_l, v_l, p=p, limit_quantile_range=limit_quantile_range,
            target_constant=target_constant)

    fn = shard_map(
        local_rows, mesh=mesh,
        in_specs=(P(None), P(axes, None), P(axes, None)),
        out_specs=P(axes),
        check_vma=False,
    )
    return fn(grid, u_weights, v_weights)


def oscillator_bank_sample_sharded(
    frequency_envelopes: Array,
    amplitude_envelopes: Array,
    mesh: Mesh,
    sample_rate: int = 16000,
    axis: str = "freq",
    batch_axis: Optional[str] = None,
) -> Array:
    """Sample-sharded sinusoidal oscillator bank (cross-chip phase carry).

    Inputs are [batch, n_samples, n_sinusoids] with the SAMPLE axis sharded
    over ``mesh[axis]`` (and optionally batch over ``batch_axis``).  Matches
    the single-device ``oscillator_bank(..., use_angular_cumsum=True)``
    semantics: phase is accumulated per chunk and stitched mod 2pi — here a
    chunk is a device shard, and the stitch is an ICI carry exchange instead
    of a reshape.  Reference anchor: ddsp.py:266-331 (angular_cumsum's
    chunk/carry scheme), ddsp.py:208-263 (bank semantics).

    The carry exchange is one all_gather of [n_dev, batch, 1, n_sin] phase
    totals (tiny) followed by a masked exclusive sum — O(n_dev) bytes per
    sinusoid on the wire, fully differentiable (all_gather transposes to
    psum_scatter; the mod shifts gradients by nothing since d(x mod c)/dx = 1
    a.e.).

    Returns [batch, n_samples] audio, sharded [batch_axis, axis].
    """
    from sot_tpu.ops.oscillator import angular_cumsum

    n = mesh.shape[axis]
    t = frequency_envelopes.shape[1]
    if t % n != 0:
        raise ValueError(f"n_samples={t} must be divisible by n_shards={n}")

    def local_bank(f_local: Array, a_local: Array) -> Array:
        a_local = remove_above_nyquist(f_local, a_local, sample_rate)
        omega = jnp.asarray(f_local, jnp.float32) * (
            2.0 * np.pi / float(sample_rate))
        # local accumulation is itself mod-stitched (angular_cumsum), so the
        # exchanged totals stay in [0, 2pi) — raw fp32 chunk totals reach
        # thousands of radians where float spacing alone is ~2e-4 rad and
        # the carry error compounds ~7x (measured vs a float64 oracle)
        local_phase = angular_cumsum(omega)
        totals = local_phase[:, -1:, :]
        all_totals = jax.lax.all_gather(totals, axis)  # [n, batch, 1, n_sin]
        idx = jax.lax.axis_index(axis)
        mask = (jnp.arange(n) < idx).astype(jnp.float32)
        carry = jnp.einsum("d,dbts->bts", mask, all_totals) % (2.0 * np.pi)
        phase = (local_phase + carry) % (2.0 * np.pi)
        return jnp.sum(a_local * jnp.sin(phase), axis=-1)

    fn = shard_map(
        local_bank, mesh=mesh,
        in_specs=(P(batch_axis, axis, None), P(batch_axis, axis, None)),
        out_specs=P(batch_axis, axis),
        check_vma=False,
    )
    return fn(frequency_envelopes, amplitude_envelopes)


def wasserstein_1d_freq_sharded(
    grid: Array,
    u_weights: Array,
    v_weights: Array,
    mesh: Mesh,
    p: float = 1,
    limit_quantile_range: bool = False,
    row_axis: str = "data",
    freq_axis: str = "freq",
) -> Array:
    """Same-grid W1D over (rows x bins) arrays sharded (row_axis, freq_axis).

    all_gathers the frequency shards (rows stay sharded), then solves rows
    locally. Returns [rows] sharded over row_axis.
    """


    def local_w1d(grid_l: Array, u_l: Array, v_l: Array) -> Array:
        u_full = jax.lax.all_gather(u_l, freq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, freq_axis, axis=1, tiled=True)
        g_full = jax.lax.all_gather(grid_l, freq_axis, axis=0, tiled=True)
        g_rows = jnp.broadcast_to(g_full[None, :], u_full.shape)
        return wasserstein_1d(
            g_rows, g_rows, u_weights=u_full, v_weights=v_full, p=p,
            require_sort=False, limit_quantile_range=limit_quantile_range,
        )

    fn = shard_map(
        local_w1d, mesh=mesh,
        in_specs=(P(freq_axis), P(row_axis, freq_axis), P(row_axis, freq_axis)),
        out_specs=P(row_axis),
        check_vma=False,
    )
    return fn(grid, u_weights, v_weights)
