"""Training verdict for the fused Pallas synth kernel.

The fused synth (ops/pallas/synth.py) reproduces the XLA path's gradients
only to fp-noise (HIGHEST-precision envelope matmuls vs per-sample lerp;
same bf16 phase-prefix class) — by the round-3 gradient-convention policy
that means a speed A/B cannot certify it for training on its own.

Protocol: one 25k SOT-2048-Anneal seed-42 run with SOT_TPU_SYNTH_PALLAS=1
(on top of the shipped ref+CQT gates), compared against its existing twin
WITHOUT the synth kernel (runs/round2/r4/refverd-ref-anneal-42, comb RPA
98.86) on the same criteria as refgrad_train_verdict: recipe accuracy
(comb RPA >= 95), twin agreement (<= 3 RPA), and trajectory health (no
sustained val-LSD collapse: < 70 from 10k, < 50 final).

Usage: python scripts/synth_train_verdict.py [--run runs/round2/r4/synthverd-anneal-42]
Writes results/round2/synth_train_verdict.json with ``synth_ok``.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refgrad_train_verdict import loss_trajectory, read_metrics  # noqa: E402

TWIN = "refverd-ref-anneal-42"  # ref+no-synth twin from the refgrad verdict


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/round2/r4/synthverd-anneal-42")
    ap.add_argument("--out", default="results/round2/synth_train_verdict.json")
    args = ap.parse_args()

    base = os.path.dirname(args.run)
    sub = os.path.basename(args.run)
    synth = read_metrics(base, sub)
    twin = read_metrics("runs/round2/r4", TWIN)
    if synth is None or twin is None:
        print(f"incomplete: synth={synth is not None} twin={twin is not None}",
              file=sys.stderr)
        return 1
    traj = loss_trajectory(base, sub)

    rs, rt = synth["comb"]["RPA"], twin["comb"]["RPA"]
    checks = {
        "synth_reaches_recipe": rs >= 95.0,
        "twins_agree": abs(rs - rt) <= 3.0,
        "no_sustained_collapse": (
            ((traj or {}).get("10000") or 0.0) < 70.0
            and ((traj or {}).get("25000") or 0.0) < 50.0),
    }
    verdict = {
        "synth_ok": all(checks.values()),
        "checks": checks,
        "protocol": "25k SOT-2048-Anneal seed 42 with SOT_TPU_SYNTH_PALLAS=1 "
                    "over the shipped ref+CQT gates, vs the same-seed twin "
                    "without the synth kernel (refgrad verdict run), TPU v5e",
        "synth_run": synth,
        "twin_without_synth": twin,
        "val_lsd_trajectory": traj,
        "date": datetime.date.today().isoformat(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps(verdict, indent=1))
    return 0 if verdict["synth_ok"] else 2


if __name__ == "__main__":
    main()
