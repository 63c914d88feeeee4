"""Evaluation metrics (L4): LSD, MSE, MSS, RPA, RCA, octave difference, W1/W2.

Reference parity (metrics.py):
  * pitch accuracies re-implemented in pure jnp with mir_eval.melody
    semantics (hz2cents base 10 Hz, 50-cent tolerance, octave folding for
    chroma) — no host round-trip, so eval runs on-device (the reference's
    mir_eval call is a per-step device->CPU sync, metrics.py:33-34)
  * LSD = L2 of 10*log10(mag^2) at n_fft=1024 (metrics.py:82-85,171-182)
  * MSS metric = 6-scale mag+logmag L1 (metrics.py:183-193)
  * signed mean octave difference with the 50-cent guard (metrics.py:90-141)
  * W1/W2 spectral distance at n_fft=512 (metrics.py:145-149)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from sot_tpu.losses import Wasserstein1D, mean_difference
from sot_tpu.ops.numerics import safe_log, safe_log10
from sot_tpu.ops.stft import stft_magnitude

Array = jax.Array


def mse(x: Array, x_hat: Array, sort: bool = False) -> Array:
    if sort:
        x = jnp.sort(x, axis=-1)
        x_hat = jnp.sort(x_hat, axis=-1)
    return mean_difference(x, x_hat, "L2")


def ms_spectral_distance(
    target_audio: Array,
    audio: Array,
    fft_sizes: Sequence[int],
    mag_weight: float = 1.0,
    logmag_weight: float = 1.0,
    log_spectral_distance_weight: float = 0.0,
    loss_type: str = "L1",
) -> Array:
    """Multi-scale spectral distance with an LSD option (metrics.py:52-87)."""
    loss = 0.0
    for size in fft_sizes:
        target_mag = stft_magnitude(target_audio, size=size, overlap=0.75)
        value_mag = stft_magnitude(audio, size=size, overlap=0.75)
        if mag_weight > 0:
            loss += mag_weight * mean_difference(target_mag, value_mag, loss_type)
        if logmag_weight > 0:
            loss += logmag_weight * mean_difference(
                safe_log(target_mag), safe_log(value_mag), loss_type
            )
        if log_spectral_distance_weight > 0:
            t = 10.0 * safe_log10(target_mag**2)
            v = 10.0 * safe_log10(value_mag**2)
            loss += log_spectral_distance_weight * mean_difference(t, v, loss_type)
    return loss


def log_spectral_distance(x: Array, x_hat: Array) -> Array:
    """The checkpoint-selection metric: LSD at n_fft=1024, L2."""
    return ms_spectral_distance(
        x, x_hat, fft_sizes=[1024], mag_weight=0.0, logmag_weight=0.0,
        log_spectral_distance_weight=1.0, loss_type="L2",
    )


# ---------------------------------------------------------------------------
# Pitch accuracy (mir_eval.melody semantics, pure jnp)
# ---------------------------------------------------------------------------


def hz_to_cents(freq_hz: Array, base_frequency: float = 10.0) -> Array:
    """mir_eval.melody.hz2cents: 1200*log2(f/base); 0 for non-positive."""
    freq_hz = jnp.asarray(freq_hz, jnp.float32)
    cents = 1200.0 * jnp.log2(jnp.where(freq_hz > 0, freq_hz, 1.0) / base_frequency)
    return jnp.where(freq_hz > 0, cents, 0.0)


def raw_pitch_accuracy(pred_hz: Array, true_hz: Array,
                       cent_tolerance: float = 50.0) -> Array:
    """Fraction of frames within the cent tolerance (all frames voiced)."""
    diff = hz_to_cents(true_hz) - hz_to_cents(pred_hz)
    return jnp.mean((jnp.abs(diff) <= cent_tolerance).astype(jnp.float32))


def raw_chroma_accuracy(pred_hz: Array, true_hz: Array,
                        cent_tolerance: float = 50.0) -> Array:
    """Octave-folded pitch accuracy (mir_eval.melody.raw_chroma_accuracy)."""
    diff = hz_to_cents(true_hz) - hz_to_cents(pred_hz)
    folded = jnp.abs(diff - 1200.0 * jnp.round(diff / 1200.0))
    return jnp.mean((folded <= cent_tolerance).astype(jnp.float32))


def mean_octave_difference(pred_hz: Array, true_hz: Array) -> Array:
    """Signed mean octave error with a 50-cent half-semitone guard
    (reference metrics.py:90-141; voicing all-ones, cents of 0 Hz excluded)."""
    ref_cent = hz_to_cents(true_hz).reshape(-1)
    est_cent = hz_to_cents(pred_hz).reshape(-1)
    nonzero = jnp.logical_and(est_cent != 0, ref_cent != 0)
    diff = ref_cent - est_cent
    sign = jnp.sign(diff)
    diff = diff + 50.0 * sign
    oct_diff = jnp.floor(jnp.abs(diff) / 1200.0)
    num = jnp.sum(jnp.where(nonzero, oct_diff * sign, 0.0))
    total = ref_cent.shape[0]
    return jnp.where(jnp.sum(nonzero) == 0, 0.0, num / total)


def octave_correct_pitch(x: Array, pitch_hz: Array, sample_rate: float = 16000,
                         n_fft: int = 2048, rel_threshold: float = 0.1,
                         down_threshold: float = 0.25,
                         max_shifts: int = 3,
                         min_frequency_hz: float = 38.0) -> Array:
    """Unsupervised test-time octave disambiguation (no reference
    counterpart; see README 'Optimisation-dynamics knobs').

    The 20-mode harmonic synth explains any clip equally well at f0/2 with
    even-only amplitudes, so unsupervised training converges octave-DOWN on
    a subset of clips (``cli analyze``: 99/102 residual errors). The INPUT
    spectrum disambiguates for free: a true fundamental has energy at the
    predicted f0; an octave-down prediction points at a frequency bin with
    none. Rules (clip-level, on the median frame pitch): while the input
    magnitude near f0-hat (a +-2% band) is < rel_threshold x the clip's
    global spectral peak, double the prediction (the global-peak reference
    also catches multi-octave errors, where 2*f0-hat is empty too; the
    dataset's amplitudes are >= 0.4 x max, so true fundamentals sit far
    above the threshold). Symmetrically, strong energy (> down_threshold
    x peak) at f0-hat/2 means the true fundamental is BELOW the
    prediction (harmonic signals have no energy under the fundamental):
    halve it (octave-UP errors, e.g. the SOT-2048-SS family).
    ``min_frequency_hz`` bounds the down-shifts — tie it to the dataset's
    generation range (ExperimentConfig.freq_gen_min).

    x: [batch, T] audio; pitch_hz: [batch, frames, 1]. Returns corrected
    pitch_hz of the same shape.
    """
    spec = stft_magnitude(x, size=n_fft, overlap=0.75).mean(axis=1)  # [b, bins]
    df = sample_rate / n_fft
    n_bins = spec.shape[-1]
    f0 = jnp.median(pitch_hz[:, :, 0], axis=1)  # [b]
    factor = jnp.ones_like(f0)
    nyquist = sample_rate / 2.0
    global_peak = spec.max(axis=-1)
    max_halfwidth = max(1, int(0.02 * (n_bins - 1)))  # full +-2% at Nyquist
    offsets = jnp.arange(-max_halfwidth, max_halfwidth + 1)

    def band_peak(freq):
        idx = jnp.round(freq / df).astype(jnp.int32)
        vals = jnp.take_along_axis(
            spec, jnp.clip(idx[:, None] + offsets[None, :], 0, n_bins - 1),
            axis=1)
        halfwidth = jnp.maximum(1, (0.02 * idx).astype(jnp.int32))
        mask = jnp.abs(offsets)[None, :] <= halfwidth[:, None]
        return jnp.where(mask, vals, 0.0).max(axis=-1)

    # octave-DOWN errors (f0-hat = f0/2, even-only amplitudes): the
    # predicted fundamental band is empty -> shift up
    for _ in range(max_shifts):
        cur = f0 * factor
        fundamental = band_peak(cur)
        shift = ((fundamental < rel_threshold * global_peak)
                 & (2.0 * cur < nyquist))
        factor = jnp.where(shift, factor * 2.0, factor)
    # octave-UP errors (f0-hat = 2*f0): the harmonic signal has no energy
    # BELOW its fundamental, so strong energy at f0-hat/2 means the true
    # fundamental is lower -> shift down (symmetric rule; a clip corrected
    # up cannot trigger it, its old fundamental band was empty)
    for _ in range(max_shifts):
        cur = f0 * factor
        half = band_peak(0.5 * cur)
        shift = ((half > down_threshold * global_peak)
                 & (0.5 * cur >= min_frequency_hz))
        factor = jnp.where(shift, factor * 0.5, factor)
    return pitch_hz * factor[:, None, None]


_COMB_RATIOS = (1.0, 2.0, 3.0, 4.0, 0.5, 1.0 / 3.0, 0.25,
                2.0 / 3.0, 1.5, 0.75, 4.0 / 3.0)


def comb_correct_pitch(x: Array, pitch_hz: Array, sample_rate: float = 16000,
                       n_fft: int = 2048, rel_threshold: float = 0.1,
                       down_threshold: float = 0.25,
                       margin: float = 0.1,
                       n_harmonics: int = 8,
                       ratios: Sequence[float] = _COMB_RATIOS,
                       min_frequency_hz: float = 38.0) -> Array:
    """Unsupervised test-time harmonic-comb disambiguation (generalizes
    ``octave_correct_pitch``; no reference counterpart).

    Unsupervised pitch models fail CLIP-wise by locking onto a wrong
    rational interpretation of the spectrum: octave errors (f/2, 2f) but
    also fifths/fourths (3f/2, 4f/3, 2f/3 — `cli analyze` on SOT-512 found
    51 fifth-class residual clips the octave rule cannot touch). The input
    spectrum again disambiguates for free. For each candidate ratio r the
    corrected pitch r*f0-hat implies a harmonic comb {k r f0-hat}; score it
    by the summed input magnitude in +-2% bands at the comb positions
    (normalized by the clip's spectral peak). Two hard physical constraints
    prune the search:

      * a candidate whose OWN fundamental band is empty is inadmissible
        (true fundamentals carry energy in this synth family), which kills
        every subharmonic of the truth (harmonic signals have no energy
        strictly below or between their harmonics);
      * the decision hinges on the IDENTITY's admissibility, exactly like
        the octave rule: if the predicted fundamental band is EMPTY the
        prediction is provably wrong — switch to the highest-scoring
        admissible candidate (comb scores are NOT compared against the
        invalid identity: a wrong half-pitch comb contains the true comb
        and ties it in score). If the predicted fundamental is occupied,
        the only remaining error class is a harmonic of the truth, so only
        DOWN candidates (r < 1) are considered and must beat the identity
        score by ``margin`` (relative) — for a correct prediction every
        down candidate's fundamental falls strictly below or between true
        harmonics and is inadmissible, so correct clips are never moved.

    Down-shifting candidates (r < 1) use the stricter ``down_threshold``
    for admissibility, mirroring the bidirectional octave rule's
    asymmetric thresholds. With ``ratios`` restricted to (1, 2, 0.5) this
    reduces to (one round of) the octave rule.

    x: [batch, T] audio; pitch_hz: [batch, frames, 1]. Returns corrected
    pitch_hz (clip-level factor applied to every frame).
    """
    spec = stft_magnitude(x, size=n_fft, overlap=0.75).mean(axis=1)  # [b, bins]
    df = sample_rate / n_fft
    n_bins = spec.shape[-1]
    b = spec.shape[0]
    f0 = jnp.median(pitch_hz[:, :, 0], axis=1)  # [b]
    nyquist = sample_rate / 2.0
    global_peak = spec.max(axis=-1)  # [b]
    max_halfwidth = max(1, int(0.02 * (n_bins - 1)))
    offsets = jnp.arange(-max_halfwidth, max_halfwidth + 1)

    def band_peak(freq):
        # freq: [b, m] Hz -> max magnitude in a +-2% band around each
        flat = freq.reshape(b, -1)
        idx = jnp.round(flat / df).astype(jnp.int32)
        vals = jnp.take_along_axis(
            spec[:, None, :].repeat(flat.shape[1], axis=1),
            jnp.clip(idx[..., None] + offsets[None, None, :], 0, n_bins - 1),
            axis=-1)
        halfwidth = jnp.maximum(1, (0.02 * idx).astype(jnp.int32))
        mask = jnp.abs(offsets)[None, None, :] <= halfwidth[..., None]
        return jnp.where(mask, vals, 0.0).max(-1).reshape(freq.shape)

    r = jnp.asarray(ratios, jnp.float32)  # [R]
    ks = jnp.arange(1, n_harmonics + 1, dtype=jnp.float32)  # [K]
    fc = f0[:, None] * r[None, :]  # [b, R]
    comb = fc[..., None] * ks[None, None, :]  # [b, R, K]
    s = band_peak(comb.reshape(b, -1)).reshape(comb.shape)
    s = s / (global_peak[:, None, None] + 1e-20)
    in_range = comb < nyquist
    score = jnp.sum(jnp.where(in_range, jnp.minimum(s, 1.0), 0.0), axis=-1)

    fund = s[..., 0]
    thr = jnp.where(r < 1.0, down_threshold, rel_threshold)[None, :]
    admissible = (fund >= thr) & (fc >= min_frequency_hz) & (fc < nyquist)
    i1 = list(ratios).index(1.0)
    identity_valid = admissible[:, i1]
    identity_score = score[:, i1][:, None]
    not_identity = (r != 1.0)[None, :]
    # identity invalid -> any admissible candidate; identity valid -> only
    # down candidates that clearly beat it
    elig_invalid = admissible & not_identity
    elig_valid = (admissible & (r < 1.0)[None, :]
                  & (score > identity_score * (1.0 + margin)))
    eligible = jnp.where(identity_valid[:, None], elig_valid, elig_invalid)
    masked = jnp.where(eligible, score, -jnp.inf)
    best = jnp.argmax(masked, axis=-1)
    factor = jnp.where(jnp.any(eligible, axis=-1), r[best], 1.0)
    return pitch_hz * factor[:, None, None]


def wasserstein_distance(x: Array, x_hat: Array, p: float = 1, n_fft: int = 512) -> Array:
    """W_p^p between magnitude spectra on a fixed linspace support
    (reference metrics.py:145-149)."""
    mag_x = stft_magnitude(x, size=n_fft, overlap=0.75)
    mag_x_hat = stft_magnitude(x_hat, size=n_fft, overlap=0.75)
    w = Wasserstein1D(p=p, fixed_x=mag_x.shape[-1])
    return w(mag_x, mag_x_hat)


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


def compute_metrics(
    evaluation_metrics: Dict[str, bool],
    x: Array,
    x_hat: Array,
    pitch_hz: Array,
    true_pitch_hz: Array,
    frequency_unit: Optional[Array] = None,
    true_frequency_unit: Optional[Array] = None,
) -> Dict[str, Array]:
    """Gated metric suite (reference metrics.py:153-219). Pure + jit-safe."""
    out: Dict[str, Array] = {}
    if evaluation_metrics.get("mse", False):
        out["mse"] = mse(x, x_hat)
    if evaluation_metrics.get("log_spectral_distance", False):
        out["log_spectral_distance"] = log_spectral_distance(x, x_hat)
    if evaluation_metrics.get("mss", False):
        out["mss"] = ms_spectral_distance(
            x, x_hat, fft_sizes=[2048, 1024, 512, 256, 128, 64],
            mag_weight=1.0, logmag_weight=1.0, loss_type="L1",
        )
    if evaluation_metrics.get("pitch_mse", False) and frequency_unit is not None:
        pitch_mse = mse(frequency_unit, true_frequency_unit, sort=True)
        out["pitch_mse"] = pitch_mse
        out["pitch_mse_db"] = 10.0 * safe_log10(pitch_mse)
    if evaluation_metrics.get("raw_pitch_accuracy", False):
        out["raw_pitch_accuracy"] = raw_pitch_accuracy(pitch_hz, true_pitch_hz)
    if evaluation_metrics.get("raw_chroma_accuracy", False):
        out["raw_chroma_accuracy"] = raw_chroma_accuracy(pitch_hz, true_pitch_hz)
    if evaluation_metrics.get("octave_difference", False):
        out["octave_difference"] = mean_octave_difference(pitch_hz, true_pitch_hz)
    if evaluation_metrics.get("1-wasserstein", False):
        out["1-wasserstein"] = wasserstein_distance(x, x_hat, p=1)
    if evaluation_metrics.get("2-wasserstein", False):
        out["2-wasserstein"] = wasserstein_distance(x, x_hat, p=2)
    return out
