"""CLI integration: train -> resume -> evaluate -> analyze on a tiny config."""

import json
import os

import numpy as np
import pytest

TINY = ["--set", "n_samples=1024", "--set", "cqt_fmin=261.6",
        "--set", "batch_size=8", "--set", "transform_n_fft=512",
        "--set", "transform_hop=128", "--dataset-size", "32"]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from sot_tpu.cli import main

    out = str(tmp_path_factory.mktemp("cli_run"))
    rc = main(["train", "--experiment", "SOT-512", "--steps", "2",
               "--eval-every", "2", "--out", out] + TINY)
    assert rc == 0
    return out


def test_train_outputs(run_dir):
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "best-lsd"))
    cfg = json.load(open(os.path.join(run_dir, "train_config.json")))
    assert cfg["name"] == "SOT-512" and cfg["batch_size"] == 8
    best = json.load(open(os.path.join(run_dir, "best_metrics.json")))
    assert np.isfinite(best["loss/total"])


def test_resume_continues(run_dir, tmp_path):
    from sot_tpu.cli import main

    out2 = str(tmp_path / "resumed")
    rc = main(["train", "--experiment", "SOT-512", "--steps", "4",
               "--eval-every", "4", "--out", out2,
               "--resume", os.path.join(run_dir, "checkpoints", "best-lsd")]
              + TINY)
    assert rc == 0
    lines = [json.loads(l) for l in open(os.path.join(out2, "log.jsonl"))]
    steps = [l["step"] for l in lines if "step" in l]
    assert max(steps) == 4  # resumed from step 2, trained to 4


def test_saved_config_round_trip_coercion():
    """Replayed train_config.json values are type-coerced (lists back to
    tuples) and str-coerced non-str fields fail loudly instead of being
    silently injected into the dataclass."""
    from sot_tpu.cli import _coerce_saved_config

    out = _coerce_saved_config("SOT-2048", {
        "evaluation_metrics": ["mse", "raw_pitch_accuracy"],
        "temperature_schedule": [1.0, 0.1, 1500],
        "batch_size": 8,
        "dataset_path": "/tmp/x.pth",
    })
    assert out["evaluation_metrics"] == ("mse", "raw_pitch_accuracy")
    assert out["temperature_schedule"] == (1.0, 0.1, 1500)
    assert out["batch_size"] == 8 and out["dataset_path"] == "/tmp/x.pth"

    with pytest.raises(ValueError, match="did not round-trip"):
        _coerce_saved_config("SOT-2048", {"batch_size": "64"})
    with pytest.raises(ValueError, match="not an ExperimentConfig"):
        _coerce_saved_config("SOT-2048", {"no_such_field": 1})


def test_evaluate_and_analyze(run_dir, capsys):
    from sot_tpu.cli import main

    # config auto-loads from the run's train_config.json next to the ckpt
    rc = main(["evaluate", "--split", "val",
               "--ckpt", os.path.join(run_dir, "checkpoints", "best-lsd")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "val_metrics" in out and np.isfinite(out["val_metrics"]["mse"])

    rc = main(["analyze", "--split", "val",
               "--ckpt", os.path.join(run_dir, "checkpoints", "best-lsd")])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert 0.0 <= rep["rpa"] <= 1.0
    assert rep["clip_failures"]["n_clips"] > 0

    # post-correction residual breakdown (--correction comb) cannot be
    # worse than the uncorrected report on chroma-consistent errors
    rc = main(["analyze", "--split", "val", "--correction", "comb",
               "--ckpt", os.path.join(run_dir, "checkpoints", "best-lsd")])
    assert rc == 0
    rep_c = json.loads(capsys.readouterr().out)
    assert 0.0 <= rep_c["rpa"] <= 1.0
    assert rep_c["clip_failures"]["n_clips"] == rep["clip_failures"]["n_clips"]


def test_predict(run_dir, tmp_path, capsys):
    """Serving entry: batch inference from an .npy, both output modes,
    with the comb correction enabled via --set."""
    from sot_tpu import data as D
    from sot_tpu.cli import main

    sig, _, _ = D.generate_sinusoid_dataset(seed=5, size=6, n_samples=1024,
                                            render_batch=6)
    inp = str(tmp_path / "audio.npy")
    np.save(inp, np.asarray(sig))
    outp = str(tmp_path / "pred.npz")

    rc = main(["predict", "--ckpt", os.path.join(run_dir, "checkpoints",
                                                 "best-lsd"),
               "--input", inp, "--output", outp,
               "--set", "inference_comb_correction=true"])
    assert rc == 0
    z = np.load(outp)
    assert z["pitch_hz"].shape[0] == 6 and z["pitch_hz"].ndim == 2
    assert z["weights"].shape[:2] == z["pitch_hz"].shape
    assert np.isfinite(z["pitch_hz"]).all() and (z["pitch_hz"] > 0).all()
    capsys.readouterr()

    rc = main(["predict", "--ckpt", os.path.join(run_dir, "checkpoints",
                                                 "best-lsd"),
               "--input", inp])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["pitch_hz"]) == 6
