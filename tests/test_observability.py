"""Observability (L9) and CLI config plumbing tests."""

import json
import os

import numpy as np


def test_figure_logger_writes_gallery(tmp_path):
    from sot_tpu.training.observability import FigureLogger

    rng = np.random.default_rng(0)
    fl = FigureLogger(str(tmp_path))
    outputs = {
        "x": rng.standard_normal((2, 256)).astype(np.float32),
        "x_hat": rng.standard_normal((2, 256)).astype(np.float32),
        "spec_x": np.abs(rng.standard_normal((2, 4, 33))).astype(np.float32),
        "spec_x_hat": np.abs(rng.standard_normal((2, 4, 33))).astype(np.float32),
        "probabilities": np.abs(rng.standard_normal((2, 285))).astype(np.float32),
        "true_frequency_unit": np.array([0.4]),
    }
    freqs = np.linspace(32.7, 8000, 285).astype(np.float32)
    tfreqs = np.linspace(0, 8000, 33).astype(np.float32)
    fl.plot_and_log(100, "val", outputs, transform_frequencies=tfreqs,
                    feature_frequencies=freqs)
    d = tmp_path / "figures" / "step100"
    names = sorted(p.name for p in d.iterdir())
    assert "Signal_val_Original_Signal.png" in names
    assert "Signal_val_Reconstructed_Spectrum.png" in names
    assert "Signal_val_Original_vs_Reconstructed.png" in names
    assert "Signal_val_Probabilities.png" in names


def test_figure_logger_disabled_is_noop():
    from sot_tpu.training.observability import FigureLogger

    fl = FigureLogger(None)
    fl.log_signal(0, "val", "x", np.zeros((2, 8)))  # must not raise
    fl.log_quantiles(0, "val", np.zeros(8), np.zeros(8), np.zeros(8))


def test_figure_logger_quantile_figure(tmp_path):
    """Quantile-function figure from Wasserstein1D(return_quantiles=True)
    (VERDICT r4 task 7 — the reference exposes the hook, losses.py:140,
    but never renders it)."""
    import jax.numpy as jnp

    from sot_tpu.losses import Wasserstein1D
    from sot_tpu.training.observability import FigureLogger

    rng = np.random.default_rng(0)
    spec_x = jnp.asarray(np.abs(rng.standard_normal((1, 4, 33))), jnp.float32)
    spec_y = jnp.asarray(np.abs(rng.standard_normal((1, 4, 33))), jnp.float32)
    pos = np.linspace(0.0, 1.0, 33).astype(np.float32)
    w = Wasserstein1D(p=2, square_dist=True, dont_normalize=True,
                      limit_quantile_range=True)
    q = w(spec_x, spec_y, x_pos=pos, y_pos=pos, return_quantiles=True)
    uq, vq, qs = q[0], q[1], q[2]
    assert uq.shape[:2] == (1, 4) and uq.shape == vq.shape
    fl = FigureLogger(str(tmp_path))
    fl.log_quantiles(7, "val", np.asarray(qs), np.asarray(uq), np.asarray(vq))
    assert (tmp_path / "figures" / "step7"
            / "Signal_val_Quantile_Functions.png").exists()


def test_cli_yaml_config_and_master_expansion(tmp_path):
    import yaml

    from sot_tpu.cli import _load_config_files, _parse_set_overrides

    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({"batch_size": 16, "seed": 7}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({"seed": 9}))
    master = tmp_path / "master.yaml"
    master.write_text(yaml.safe_dump(
        {"configs": ["base.yaml", "child.yaml"], "max_steps": 10}))
    merged = _load_config_files([str(master)])
    assert merged == {"batch_size": 16, "seed": 9, "max_steps": 10}

    o = _parse_set_overrides(["learning_rate=0.001", "transform_window=flattop"])
    assert o == {"learning_rate": 0.001, "transform_window": "flattop"}


def test_train_loop_writes_figures(tmp_path):
    from sot_tpu.configs import get_experiment
    from sot_tpu.training.trainer import train

    cfg = get_experiment(
        "SOT-512", batch_size=8, n_samples=1024, cqt_fmin=261.6,
        dataset_size=32, eval_every_steps=2,
    )
    train(cfg, max_steps=2, log_every=1, figure_dir=str(tmp_path))
    figs = list((tmp_path / "figures").rglob("*.png"))
    assert len(figs) >= 4
    # the quantile-function figure rides the same val gallery pass
    assert any(p.name == "Signal_val_Quantile_Functions.png" for p in figs)


def test_eval_paper_table_formatting():
    from sot_tpu.eval_paper import aggregate, format_paper_table, rename_metrics

    m = rename_metrics({"log_spectral_distance": 2.0, "octave_difference": -0.01,
                        "raw_pitch_accuracy": 0.97, "raw_chroma_accuracy": 0.98,
                        "mse": 0.5, "mss": 3.0})
    assert m["RPA"] == 97.0 and m["OD"] == 0.01 and m["LSD"] == 2.0

    rows_a = [{"LSD": 1.0, "RPA": 90.0}, {"LSD": 2.0, "RPA": 96.0}]
    rows_b = [{"LSD": 3.0, "RPA": 99.0}, {"LSD": 4.0, "RPA": 97.0}]
    table = {"A": aggregate(rows_a), "B": aggregate(rows_b)}
    assert table["A"]["LSD"]["mean"] == 1.5
    lines = format_paper_table(table)
    assert lines[0] == "experiment,LSD,RPA"
    # A is best (lowest) LSD -> bold; B best (highest) RPA -> bold
    assert "\\textbf" in lines[1].split(",")[1]
    assert "\\textbf" in lines[2].split(",")[2]
    assert "\\emph" in lines[1].split(",")[2]
    # sub-protocol seed counts are labelled, not passed off as real stds
    assert "[n=2]" in lines[1].split(",")[1]
    single = format_paper_table({"C": aggregate([{"LSD": 1.0}])})
    assert "1.000(n=1)" in single[1]
    assert "(0.000)" not in single[1]


def test_pitch_error_report():
    from sot_tpu.analysis import pitch_error_report

    rng = np.random.default_rng(0)
    f0 = rng.uniform(100, 1000, 40)
    pitch = np.tile(f0[:, None], (1, 16))
    pitch[:5] *= 2.0        # octave up
    pitch[5:8] /= 2.0       # octave down
    pitch[8:10] *= 1.5      # fifth
    r = pitch_error_report(pitch, f0)
    assert abs(r["rpa"] - 30 / 40) < 1e-6
    assert r["clip_failures"]["kinds"]["octave_up"] == 5
    assert r["clip_failures"]["kinds"]["octave_down"] == 3
    assert r["clip_failures"]["kinds"]["fifth"] == 2
    assert r["clip_failures"]["n_wrong_clips"] == 10
