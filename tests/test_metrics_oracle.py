"""mir_eval-parity oracle for RPA / RCA / octave difference (VERDICT r3
task 4).

The paper's accuracy claims rest on `mir_eval.melody.raw_pitch_accuracy`
(reference metrics.py:17-48), which is not installable here (zero egress).
`_oracle` below vendors the relevant ~40 lines of mir_eval.melody's
formulas — hz2cents (base 10 Hz), the nonzero-cent voicing mask, the
ref-voicing-weighted normalisation, and the 1200-cent chroma fold — as a
plain-numpy reference (mir_eval is MIT-licensed, © mir_eval development
team; formulas restated for test purposes). mean_octave_difference is the
reference repo's own mir_eval-style extension (metrics.py:90-141) and is
vendored from its published formula (sign-aware 50-cent guard).

These tests diff `sot_tpu.metrics` against the oracle on random batches
(not hand-picked cases), including octave-error-heavy distributions.

Known deliberate deltas (asserted separately, not papered over):
  * tolerance boundary: sot_tpu uses `<= 50` cents; frames at exactly
    50.000... cents are measure-zero for real predictions, and random
    draws are filtered to stay 1e-3 cents away from the boundary.
  * zero-Hz estimates: mir_eval excludes est_cent == 0 frames from the
    RCA fold; sot_tpu folds everything (its pitch head can only emit
    positive Hz). Tests use positive pitches, matching production.
"""

from __future__ import annotations

import numpy as np
import pytest

from sot_tpu import metrics


# --------------------------------------------------------------------------
# Vendored oracle (mir_eval.melody formulas, numpy)
# --------------------------------------------------------------------------


def _hz2cents(freq_hz: np.ndarray, base_frequency: float = 10.0) -> np.ndarray:
    """mir_eval.melody.hz2cents: 1200*log2(|f|/base) at nonzero f, else 0."""
    out = np.zeros(freq_hz.shape[0])
    nz = np.flatnonzero(freq_hz)
    out[nz] = 1200.0 * np.log2(np.abs(freq_hz[nz]) / base_frequency)
    return out


def _raw_pitch_accuracy(ref_voicing, ref_cent, est_voicing, est_cent,
                        cent_tolerance=50.0):
    if ref_voicing.size == 0 or ref_voicing.sum() == 0 \
            or ref_cent.size == 0 or est_cent.size == 0:
        return 0.0
    nonzero_freqs = np.logical_and(est_cent != 0, ref_cent != 0)
    freq_diff_cents = np.abs(ref_cent - est_cent)[nonzero_freqs]
    correct_frequencies = freq_diff_cents < cent_tolerance
    return float(np.sum(ref_voicing[nonzero_freqs] * correct_frequencies)
                 / np.sum(ref_voicing))


def _raw_chroma_accuracy(ref_voicing, ref_cent, est_voicing, est_cent,
                         cent_tolerance=50.0):
    if ref_voicing.size == 0 or ref_voicing.sum() == 0 \
            or ref_cent.size == 0 or est_cent.size == 0:
        return 0.0
    nonzero_freqs = np.logical_and(est_cent != 0, ref_cent != 0)
    freq_diff_cents = np.abs(ref_cent - est_cent)[nonzero_freqs]
    octave = 1200.0 * np.floor(freq_diff_cents / 1200.0 + 0.5)
    correct_chroma = np.abs(freq_diff_cents - octave) < cent_tolerance
    return float(np.sum(ref_voicing[nonzero_freqs] * correct_chroma)
                 / np.sum(ref_voicing))


def _mean_octave_difference(ref_voicing, ref_cent, est_voicing, est_cent):
    """Reference repo's mir_eval-style extension (metrics.py:90-141)."""
    if ref_voicing.size == 0 or est_cent.size == 0 or ref_cent.size == 0:
        return 0.0
    nonzero_freqs = np.logical_and(est_cent != 0, ref_cent != 0)
    if np.sum(nonzero_freqs) == 0:
        return 0.0
    freq_diff_cents = (ref_cent - est_cent)[nonzero_freqs]
    sign = np.sign(freq_diff_cents)
    freq_diff_cents = freq_diff_cents + 50.0 * sign
    oct_diff = np.floor(np.abs(freq_diff_cents) / 1200.0)
    return float(np.sum(ref_voicing[nonzero_freqs] * oct_diff * sign)
                 / np.sum(ref_voicing))


# --------------------------------------------------------------------------
# Random-batch generators
# --------------------------------------------------------------------------


def _pitch_batch(rng, n=512, boundary_margin_cents=1e-3):
    """True pitches over the task's range, predictions a mix of accurate
    frames, near-tolerance frames, octave errors, and wild misses — with
    the exact 50-cent boundary excluded (the one convention delta)."""
    true_hz = rng.uniform(32.7, 2000.0, size=n)
    kind = rng.integers(0, 5, size=n)
    cents_off = np.select(
        [kind == 0, kind == 1, kind == 2, kind == 3, kind == 4],
        [rng.uniform(-45, 45, n),            # correct
         rng.uniform(46, 54, n) * rng.choice([-1, 1], n),  # near boundary
         1200.0 * rng.integers(1, 4, n) * rng.choice([-1, 1], n)
         + rng.uniform(-45, 45, n),          # octave error, right chroma
         rng.uniform(60, 1100, n) * rng.choice([-1, 1], n),  # wrong
         rng.uniform(-45, 45, n)],           # correct
    )
    # keep away from the <= vs < boundary
    dist = np.abs(np.abs(cents_off) - 50.0)
    cents_off = np.where(dist < boundary_margin_cents,
                         cents_off + 2 * boundary_margin_cents, cents_off)
    pred_hz = true_hz * 2.0 ** (cents_off / 1200.0)
    return pred_hz.astype(np.float32), true_hz.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_rpa_matches_mir_eval_formula(seed):
    rng = np.random.default_rng(seed)
    pred, true = _pitch_batch(rng)
    voicing = np.ones(pred.size)
    want = _raw_pitch_accuracy(voicing, _hz2cents(true.ravel()),
                               voicing, _hz2cents(pred.ravel()))
    got = float(metrics.raw_pitch_accuracy(pred, true))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_rca_matches_mir_eval_formula(seed):
    rng = np.random.default_rng(seed)
    pred, true = _pitch_batch(rng)
    voicing = np.ones(pred.size)
    want = _raw_chroma_accuracy(voicing, _hz2cents(true.ravel()),
                                voicing, _hz2cents(pred.ravel()))
    got = float(metrics.raw_chroma_accuracy(pred, true))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_od_matches_reference_formula(seed):
    rng = np.random.default_rng(seed)
    pred, true = _pitch_batch(rng)
    voicing = np.ones(pred.size)
    want = _mean_octave_difference(voicing, _hz2cents(true.ravel()),
                                   voicing, _hz2cents(pred.ravel()))
    got = float(metrics.mean_octave_difference(pred, true))
    assert got == pytest.approx(want, abs=1e-6)


def test_batched_shapes_flatten_like_reference():
    """The reference flattens (batch, time, partials) before mir_eval
    (metrics.py:28-34); ours must agree on 3D inputs."""
    rng = np.random.default_rng(7)
    pred, true = _pitch_batch(rng, n=240)
    pred3, true3 = pred.reshape(4, 30, 2), true.reshape(4, 30, 2)
    voicing = np.ones(pred.size)
    want = _raw_pitch_accuracy(voicing, _hz2cents(true.ravel()),
                               voicing, _hz2cents(pred.ravel()))
    assert float(metrics.raw_pitch_accuracy(pred3, true3)) == \
        pytest.approx(want, abs=1e-6)


def test_octave_error_battery():
    """Pure octave errors: RPA 0, RCA 1, OD = signed octave count."""
    true = np.full(64, 440.0, np.float32)
    for shift, od_sign in ((0.5, 1.0), (2.0, -1.0), (4.0, -2.0)):
        pred = (true * shift).astype(np.float32)
        assert float(metrics.raw_pitch_accuracy(pred, true)) == 0.0
        assert float(metrics.raw_chroma_accuracy(pred, true)) == 1.0
        got_od = float(metrics.mean_octave_difference(pred, true))
        voicing = np.ones(64)
        want_od = _mean_octave_difference(
            voicing, _hz2cents(true), voicing, _hz2cents(pred))
        assert got_od == pytest.approx(want_od, abs=1e-6)
        assert got_od == pytest.approx(od_sign, abs=1e-6)


def test_boundary_convention_documented():
    """The one deliberate delta: sot_tpu counts exactly-50.0-cent frames as
    correct (<=), the vendored mir_eval formula as incorrect (<). The
    oracle's exclusive boundary is pinned here in fp64; sot_tpu's fp32
    hz->cents pipeline cannot even represent an exact 50.000-cent offset
    (rounding perturbs it by ~1e-3 cents), so the conventions can never
    disagree on data that flows through the metrics module."""
    true64 = np.full(8, 440.0, np.float64)
    pred64 = true64 * 2.0 ** (50.0 / 1200.0)
    voicing = np.ones(8)
    want = _raw_pitch_accuracy(voicing, _hz2cents(true64),
                               voicing, _hz2cents(pred64))
    assert want == 0.0  # vendored mir_eval formula: exclusive boundary
    got = float(metrics.raw_pitch_accuracy(pred64, true64))
    assert got == 1.0  # sot_tpu: inclusive boundary
