"""Training verdict for bf16 conv-stack activations (SOT_TPU_CONV_BF16).

The encoder's conv stack is the step's #1 category (2.34 ms of 6.8 ms,
results/round4/profile_step_final.txt). bf16 ACTIVATIONS between its
layers (params stay f32; the MXU computes bf16 regardless) halve the
activation HBM traffic — bench 129.4k -> 138.2k frames/s/chip (+6.7%) —
but add ~0.5% forward perturbation, above the threshold the round-4
synth-kernel lesson showed can hurt this recipe. Same verdict protocol:
one 25k SOT-2048-Anneal seed-42 run with the flag, against its
identical-gates twin without it (runs/round2/r4/synthverd-anneal-42,
comb RPA 99.68).

Usage: python scripts/convbf16_train_verdict.py
Writes results/round2/convbf16_train_verdict.json with ``conv_bf16_ok``.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refgrad_train_verdict import loss_trajectory, read_metrics  # noqa: E402

TWIN = "synthverd-anneal-42"  # same gates, CONV_BF16 off


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/round2/r4/convbf16verd-anneal-42")
    ap.add_argument("--out",
                    default="results/round2/convbf16_train_verdict.json")
    args = ap.parse_args()

    base, sub = os.path.dirname(args.run), os.path.basename(args.run)
    bf16 = read_metrics(base, sub)
    twin = read_metrics("runs/round2/r4", TWIN)
    if bf16 is None or twin is None:
        print("incomplete", file=sys.stderr)
        return 1
    traj = loss_trajectory(base, sub)
    rb, rt = bf16["comb"]["RPA"], twin["comb"]["RPA"]
    checks = {
        "bf16_reaches_recipe": rb >= 95.0,
        "twins_agree": abs(rb - rt) <= 3.0,
        "no_sustained_collapse": (
            ((traj or {}).get("10000") or 0.0) < 70.0
            and ((traj or {}).get("25000") or 0.0) < 50.0),
    }
    verdict = {
        "conv_bf16_ok": all(checks.values()),
        "checks": checks,
        "bench_frames_per_sec": {"off": 129434.3, "on": 138150.5},
        "protocol": "25k SOT-2048-Anneal seed 42 with SOT_TPU_CONV_BF16=1 "
                    "over the full round-4 gate set, vs the same-seed twin "
                    "without it (synth verdict run), TPU v5e",
        "bf16_run": bf16,
        "twin_without_bf16": twin,
        "val_lsd_trajectory": traj,
        "date": datetime.date.today().isoformat(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps(verdict, indent=1))
    return 0 if verdict["conv_bf16_ok"] else 2


if __name__ == "__main__":
    main()
