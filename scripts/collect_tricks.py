"""Collect runs/tricks/*/test_metrics.json into results/round1/trick_sweep.json
with the round-1 baseline (no-trick) numbers for the same seeds alongside."""

import glob
import json
import os

BASELINE = {  # test-split metrics from results/round1/synthetic_results_best-lsd.json
    "101112": {"RPA": 0.08, "RCA": 1.20, "LSD": 74.07, "OD": -3.195},
    "789": {"RPA": 23.66, "RCA": 99.34, "LSD": 48.36, "OD": 0.761},
    "456": {"RPA": 58.58, "RCA": 59.00, "LSD": 44.27, "OD": -0.601},
    "123": {"RPA": 62.36, "RCA": 76.06, "LSD": 27.25, "OD": -0.371},
    "42": {"RPA": 61.97, "RCA": 61.97, "LSD": 28.39, "OD": -0.234},
}

out = {}
for path in sorted(glob.glob("runs/tricks/*/test_metrics.json")):
    name = os.path.basename(os.path.dirname(path))
    m = json.load(open(path))["test_metrics"]
    seed = name.split("-")[-1]
    out[name] = {
        "RPA": round(100 * m["raw_pitch_accuracy"], 2),
        "RCA": round(100 * m["raw_chroma_accuracy"], 2),
        "LSD": round(m["log_spectral_distance"], 2),
        "OD": round(-m["octave_difference"], 3),
        "baseline_same_seed": BASELINE.get(seed),
    }

os.makedirs("results/round1", exist_ok=True)
with open("results/round1/trick_sweep.json", "w") as fh:
    json.dump(out, fh, indent=2)
print(json.dumps(out, indent=2))
