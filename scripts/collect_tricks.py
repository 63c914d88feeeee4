"""Collect runs/tricks/*/test_metrics*.json into results/round1/trick_sweep.json
with the round-1 baseline (no-trick, same experiment+seed) numbers alongside."""

import glob
import json
import os

# test-split baselines from the reference-protocol runs:
# SOT-2048 5-seed protocol (results/round1/synthetic_results_best-lsd.json)
# + the one-seed-42 family sweep (results/round1/family_sweep.json)
BASELINE = {
    ("SOT-2048", "101112"): {"RPA": 0.08, "RCA": 1.20, "LSD": 74.07, "OD": -3.195},
    ("SOT-2048", "789"): {"RPA": 23.66, "RCA": 99.34, "LSD": 48.36, "OD": 0.761},
    ("SOT-2048", "456"): {"RPA": 58.58, "RCA": 59.00, "LSD": 44.27, "OD": -0.601},
    ("SOT-2048", "123"): {"RPA": 62.36, "RCA": 76.06, "LSD": 27.25, "OD": -0.371},
    ("SOT-2048", "42"): {"RPA": 61.97, "RCA": 61.97, "LSD": 28.39, "OD": -0.234},
    ("SOT-512", "42"): {"RPA": 0.03, "RCA": 1.42, "LSD": 86.23},
    ("SOT-512-LogF", "42"): {"RPA": 99.11, "RCA": 99.41, "LSD": 28.75},
    ("SOT-NoCut", "42"): {"RPA": 64.19, "RCA": 64.61, "LSD": 19.86},
    ("SOT-2048-SS", "42"): {"RPA": 0.0, "RCA": 1.68, "LSD": 81.93},
    ("MSS-Lin", "42"): {"RPA": 0.77, "RCA": 24.83, "LSD": 56.92},
    ("MSS-LogLin", "42"): {"RPA": 0.02, "RCA": 19.65, "LSD": 88.50},
}

out = {}
for path in sorted(glob.glob("runs/tricks/*/test_metrics*.json")):
    run_dir = os.path.dirname(path)
    name = os.path.basename(run_dir)
    variant = os.path.basename(path).replace("test_metrics", "").replace(
        ".json", "").lstrip("_")
    try:
        m = json.load(open(path))["test_metrics"]
    except (json.JSONDecodeError, KeyError):
        continue  # empty/partial eval output
    cfg_path = os.path.join(run_dir, "train_config.json")
    experiment, seed = None, None
    if os.path.exists(cfg_path):
        cfg = json.load(open(cfg_path))
        # presets named e.g. SOT-2048-Anneal are overridden SOT-2048 configs
        experiment = cfg.get("name", "").replace("-Anneal", "")
        seed = str(cfg.get("seed"))
    key = name if not variant else f"{name}[{variant}]"
    out[key] = {
        "experiment": experiment,
        "seed": seed,
        "RPA": round(100 * m["raw_pitch_accuracy"], 2),
        "RCA": round(100 * m["raw_chroma_accuracy"], 2),
        "LSD": round(m["log_spectral_distance"], 2),
        "OD": round(-m["octave_difference"], 3),
        "baseline_same_experiment_seed": BASELINE.get((experiment, seed)),
    }

os.makedirs("results/round1", exist_ok=True)
with open("results/round1/trick_sweep.json", "w") as fh:
    json.dump(out, fh, indent=2)
print(json.dumps(out, indent=2))
