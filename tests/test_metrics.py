"""Metrics vs mir_eval semantics (hand-checked) and the reference formulas."""

import numpy as np
import torch
import jax.numpy as jnp

from tests._reference import import_reference
from sot_tpu import metrics as M


def test_hz_to_cents():
    np.testing.assert_allclose(M.hz_to_cents(jnp.asarray(10.0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(M.hz_to_cents(jnp.asarray(20.0)), 1200.0, atol=1e-3)
    np.testing.assert_allclose(M.hz_to_cents(jnp.asarray(0.0)), 0.0, atol=1e-6)


def test_raw_pitch_accuracy_tolerance():
    true = jnp.asarray([440.0, 440.0, 440.0, 440.0])
    # +0c, +49c, +51c, +1200c
    pred = jnp.asarray([440.0, 440.0 * 2 ** (49 / 1200), 440.0 * 2 ** (51 / 1200),
                        880.0])
    rpa = M.raw_pitch_accuracy(pred, true)
    np.testing.assert_allclose(rpa, 0.5, atol=1e-6)
    rca = M.raw_chroma_accuracy(pred, true)
    np.testing.assert_allclose(rca, 0.75, atol=1e-6)  # octave error forgiven


def test_octave_difference_signed():
    true = jnp.asarray([440.0, 440.0, 440.0, 440.0])
    pred = jnp.asarray([220.0, 880.0, 880.0, 440.0])  # -1 oct, +1 oct, +1 oct, 0
    od = M.mean_octave_difference(pred, true)
    # reference semantics: sign of (ref - est) => est above ref counts negative
    np.testing.assert_allclose(od, (1 - 1 - 1 + 0) / 4, atol=1e-6)


def test_octave_difference_matches_reference_impl():
    ref_metrics = import_reference("metrics")
    rng = np.random.default_rng(0)
    true = rng.uniform(60, 2000, 64).astype(np.float32)
    # predictions: noisy, some octave errors
    factor = rng.choice([0.5, 1.0, 2.0, 4.0], 64, p=[0.2, 0.5, 0.2, 0.1])
    pred = (true * factor * 2 ** (rng.uniform(-30, 30, 64) / 1200)).astype(np.float32)
    ref_cent = 1200 * np.log2(true / 10.0)
    est_cent = 1200 * np.log2(pred / 10.0)
    voicing = np.ones_like(ref_cent)
    ref_od = ref_metrics.mean_octave_difference(voicing, ref_cent, voicing, est_cent)
    my_od = M.mean_octave_difference(jnp.asarray(pred), jnp.asarray(true))
    np.testing.assert_allclose(float(my_od), ref_od, atol=1e-5)


def test_lsd_matches_reference_formula():
    ref_metrics = import_reference("metrics")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    ref = ref_metrics.ms_spectral_distance(
        torch.as_tensor(x), torch.as_tensor(y), fft_sizes=[1024],
        mag_weight=0, logmag_weight=0, log_spectral_distance_weight=1.0,
        loss_type="L2")
    mine = M.log_spectral_distance(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-4)


def test_mss_metric_matches_reference():
    ref_metrics = import_reference("metrics")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    ref = ref_metrics.ms_spectral_distance(
        torch.as_tensor(x), torch.as_tensor(y),
        fft_sizes=[2048, 1024, 512, 256, 128, 64], mag_weight=1,
        logmag_weight=1, loss_type="L1")
    mine = M.ms_spectral_distance(jnp.asarray(x), jnp.asarray(y),
                                  fft_sizes=[2048, 1024, 512, 256, 128, 64])
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-4)


def test_wasserstein_metric_matches_reference():
    ref_metrics = import_reference("metrics")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    with torch.inference_mode():
        ref = ref_metrics.wasserstein_distance(torch.as_tensor(x), torch.as_tensor(y),
                                               p=2, n_fft=512)
    mine = M.wasserstein_distance(jnp.asarray(x), jnp.asarray(y), p=2, n_fft=512)
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-3)


def test_compute_metrics_dispatcher():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    x_hat = x + 0.01
    pitch_hz = jnp.asarray(rng.uniform(100, 1000, (2, 16, 1)).astype(np.float32))
    true_pitch_hz = pitch_hz * 1.001
    cfg = {"mse": True, "log_spectral_distance": True, "mss": True,
           "raw_pitch_accuracy": True, "raw_chroma_accuracy": True,
           "octave_difference": True}
    out = M.compute_metrics(cfg, x, x_hat, pitch_hz, true_pitch_hz)
    assert set(out.keys()) == {"mse", "log_spectral_distance", "mss",
                               "raw_pitch_accuracy", "raw_chroma_accuracy",
                               "octave_difference"}
    np.testing.assert_allclose(out["raw_pitch_accuracy"], 1.0, atol=1e-6)
    assert float(out["mse"]) > 0


def test_octave_correct_pitch():
    # clip = harmonics 1..4 of f0: octave-down predictions get doubled,
    # correct and octave-up-impossible ones stay
    sr, T = 16000, 4096
    t = np.arange(T) / sr
    f0 = np.array([440.0, 440.0, 200.0, 7000.0])
    x = np.stack([
        sum(np.sin(2 * np.pi * k * f * t) / k for k in range(1, 5))
        for f in f0
    ]).astype(np.float32)
    frames = 16
    pred = np.stack([
        np.full(frames, 220.0),   # octave-down error -> corrected to 440
        np.full(frames, 440.0),   # correct -> unchanged
        np.full(frames, 50.0),    # two octaves down -> 100 -> 200
        np.full(frames, 7000.0),  # correct; doubling would pass nyquist
    ]).astype(np.float32)[..., None]
    out = np.asarray(M.octave_correct_pitch(jnp.asarray(x), jnp.asarray(pred),
                                            sample_rate=sr))
    np.testing.assert_allclose(out[0, :, 0], 440.0)
    np.testing.assert_allclose(out[1, :, 0], 440.0)
    np.testing.assert_allclose(out[2, :, 0], 200.0)
    np.testing.assert_allclose(out[3, :, 0], 7000.0)

    # octave-UP errors: strong energy at f0-hat/2 -> shift down
    pred_up = np.stack([
        np.full(frames, 880.0),   # octave-up error -> corrected to 440
        np.full(frames, 440.0),   # correct -> unchanged (no energy at 220)
        np.full(frames, 800.0),   # two octaves up (f0 200) -> 400 -> 200
        np.full(frames, 7000.0),  # correct -> unchanged
    ]).astype(np.float32)[..., None]
    out = np.asarray(M.octave_correct_pitch(jnp.asarray(x),
                                            jnp.asarray(pred_up),
                                            sample_rate=sr))
    np.testing.assert_allclose(out[0, :, 0], 440.0)
    np.testing.assert_allclose(out[1, :, 0], 440.0)
    np.testing.assert_allclose(out[2, :, 0], 200.0)
    np.testing.assert_allclose(out[3, :, 0], 7000.0)


def test_comb_correct_pitch():
    """Harmonic-comb correction fixes octave AND fifth/third-ratio clip
    errors while leaving correct predictions (incl. subharmonic-ambiguous
    ones) untouched."""
    sr, T = 16000, 4096
    t = np.arange(T) / sr
    f0 = np.array([440.0, 440.0, 440.0, 400.0, 440.0, 200.0])
    x = np.stack([
        sum(np.sin(2 * np.pi * k * f * t) / k for k in range(1, 5))
        for f in f0
    ]).astype(np.float32)
    frames = 16
    pred = np.stack([
        np.full(frames, 220.0),   # octave down -> 440
        np.full(frames, 660.0),   # fifth up (1.5x) -> x2/3 -> 440
        np.full(frames, 440.0),   # correct -> unchanged
        np.full(frames, 1200.0),  # 3x -> x1/3 -> 400
        np.full(frames, 880.0),   # octave up -> 440
        np.full(frames, 266.67),  # 4/3 up -> x3/4 -> 200
    ]).astype(np.float32)[..., None]
    out = np.asarray(M.comb_correct_pitch(jnp.asarray(x), jnp.asarray(pred),
                                          sample_rate=sr))
    np.testing.assert_allclose(out[0, :, 0], 440.0)
    np.testing.assert_allclose(out[1, :, 0], 440.0)
    np.testing.assert_allclose(out[2, :, 0], 440.0)
    np.testing.assert_allclose(out[3, :, 0], 400.0)
    np.testing.assert_allclose(out[4, :, 0], 440.0)
    np.testing.assert_allclose(out[5, :, 0], 200.0, rtol=1e-3)


def test_comb_correction_no_subharmonic_collapse():
    """A correct prediction must not be dragged to f0/2 or f0/3 even though
    those combs CONTAIN every true harmonic: their own fundamental band is
    empty, so they are inadmissible."""
    sr, T = 16000, 4096
    t = np.arange(T) / sr
    x = np.stack([
        sum(np.sin(2 * np.pi * k * 600.0 * t) for k in range(1, 9)),
        np.sin(2 * np.pi * 3000.0 * t),  # single partial: nothing to gain
    ]).astype(np.float32)
    pred = np.stack([
        np.full(16, 600.0),
        np.full(16, 3000.0),
    ]).astype(np.float32)[..., None]
    out = np.asarray(M.comb_correct_pitch(jnp.asarray(x), jnp.asarray(pred),
                                          sample_rate=sr))
    np.testing.assert_allclose(out[0, :, 0], 600.0)
    np.testing.assert_allclose(out[1, :, 0], 3000.0)


def test_predict_inference_octave_correction():
    """trainer.predict applies the (config-gated) octave correction to the
    RETURNED pitch — the deployment path, not just eval metrics."""
    import jax
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.trainer import (apply_octave_correction,
                                          build_modules, forward, init_state,
                                          predict)
    from sot_tpu import data as D

    cfg = get_experiment("SOT-2048", batch_size=4, cqt_fmin=261.6,
                         n_samples=1024, transform_n_fft=512,
                         transform_hop=128)
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    signals, _, _ = D.generate_sinusoid_dataset(
        seed=5, size=4, n_samples=1024, render_batch=4)
    x = jnp.asarray(D.peak_normalize(signals))

    raw = forward(mod, state.params, x, train=False)
    out_off = predict(mod, state.params, x)
    np.testing.assert_allclose(np.asarray(out_off["pitch_hz"]),
                               np.asarray(raw["pitch_hz"]))

    mod_on = build_modules(cfg.replace(inference_octave_correction=True))
    out_on = predict(mod_on, state.params, x)
    want_hz, want_unit = apply_octave_correction(mod_on, x, raw["pitch_hz"])
    np.testing.assert_allclose(np.asarray(out_on["pitch_hz"]),
                               np.asarray(want_hz))
    np.testing.assert_allclose(np.asarray(out_on["pitch_unit"]),
                               np.asarray(want_unit))
    # explicit argument overrides the config gate
    out_forced = predict(mod, state.params, x, octave_correction=True)
    np.testing.assert_allclose(np.asarray(out_forced["pitch_hz"]),
                               np.asarray(want_hz))
