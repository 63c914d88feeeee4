"""Training verdict for the O(n log n) reference-convention SOT backward.

VERDICT round-3 task 1: `SOT_TPU_W2_MERGE=ref` (ops/pallas/refgrad.py) has
exact on-chip gradient parity with hybrid (refgrad_ab.json max_rel 0.0) —
but this round's hardest lesson (merge_train_verdict.json: an exactly-
correct kernel for the WRONG subgradient convention trains to collapse,
and speed/parity A/Bs at one point cannot always see it) demands full-run
evidence before the bench configuration becomes the trained default.

Reads the four round-4 twin runs written by scripts/round4_queue.sh
(ref vs hybrid merge backward, SOT-2048-Anneal + plain SOT-2048, seed 42,
otherwise identical data/init) plus the committed round-3 hybrid sweep run,
and writes results/round2/refgrad_train_verdict.json with ``ref_ok``.

Pass criteria:
  anneal twins — both reach the recipe's expected accuracy (comb-corrected
    test RPA >= 95; round-3 sweep: 99.5(0.3)) and agree within 3 RPA.
  plain twins — reference protocol is a basin lottery (seed-42 history:
    RPA 58-64), so only TWIN AGREEMENT is scored: |ref - hybrid| <= 10 RPA
    or both in the same qualitative basin class (collapsed <20 / partial /
    escaped >90). Kernel-convention collapses show up as LSD ~90 at step
    3k (merge_train_verdict.json evidence) — loss trajectories compared too.

Usage: python scripts/refgrad_train_verdict.py [--runs runs/round2/r4]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = {
    "ref_anneal": "refverd-ref-anneal-42",
    "hyb_anneal": "refverd-hyb-anneal-42",
    "ref_plain": "refverd-ref-plain-42",
    "hyb_plain": "refverd-hyb-plain-42",
}


def read_metrics(base: str, sub: str):
    out = {}
    for root in (base, "results/round2/runs/r4"):
        d = os.path.join(root, sub)
        for variant, suffix in (("plain", ""), ("comb", "_comb")):
            fp = os.path.join(d, f"test_metrics{suffix}.json")
            if variant in out or not os.path.exists(fp):
                continue
            m = json.load(open(fp))["test_metrics"]
            out[variant] = {
                "RPA": round(100 * m["raw_pitch_accuracy"], 2),
                "RCA": round(100 * m["raw_chroma_accuracy"], 2),
                "LSD": round(m["log_spectral_distance"], 2),
            }
    return out or None


def loss_trajectory(base: str, sub: str, at_steps=(1000, 3000, 10000, 25000)):
    """val LSD at checkpoints from the run's JSONL log (kernel-convention
    collapses are visible by step 3k: LSD ~90 vs ~30)."""
    fp = os.path.join(base, sub, "log.jsonl")
    if not os.path.exists(fp):
        return None
    vals = []
    with open(fp) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("split") == "val" and "log_spectral_distance" in rec:
                vals.append((rec.get("step", 0),
                             rec["log_spectral_distance"]))
    traj = {}
    for target in at_steps:
        past = [(s, v) for s, v in vals if s <= target]
        if past:
            s, v = past[-1]
            traj[str(target)] = round(v, 2)
    return traj or None


def basin(rpa: float) -> str:
    if rpa < 20:
        return "collapsed"
    if rpa > 90:
        return "escaped"
    return "partial"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs/round2/r4")
    ap.add_argument("--out", default="results/round2/refgrad_train_verdict.json")
    args = ap.parse_args()

    data = {k: read_metrics(args.runs, sub) for k, sub in RUNS.items()}
    traj = {k: loss_trajectory(args.runs, sub) for k, sub in RUNS.items()}
    missing = [k for k, v in data.items() if v is None]
    if missing:
        print(f"incomplete: missing runs {missing}", file=sys.stderr)
        return 1

    checks = {}
    ra, ha = data["ref_anneal"]["comb"]["RPA"], data["hyb_anneal"]["comb"]["RPA"]
    checks["anneal_ref_reaches_recipe"] = ra >= 95.0
    checks["anneal_twins_agree"] = abs(ra - ha) <= 3.0
    rp, hp = data["ref_plain"]["plain"]["RPA"], data["hyb_plain"]["plain"]["RPA"]
    checks["plain_twins_agree"] = (abs(rp - hp) <= 10.0
                                   or basin(rp) == basin(hp))
    # collapse guard: the known failure signature is val LSD ~90 by 3k
    for k in ("ref_anneal", "ref_plain"):
        t = traj.get(k) or {}
        lsd3k = t.get("3000")
        checks[f"{k}_no_early_collapse"] = lsd3k is None or lsd3k < 70.0

    ref_ok = all(checks.values())
    verdict = {
        "ref_ok": ref_ok,
        "checks": checks,
        "protocol": "seed-42 twin 25k runs (identical data/init, only the "
                    "SOT_TPU_W2_MERGE pin differs), SOT-2048-Anneal comb-"
                    "corrected + plain SOT-2048, TPU v5e; plus the committed "
                    "round-3 hybrid sweep run best/SOT-2048-42 (RPA 99.51)",
        "runs": data,
        "val_lsd_trajectories": traj,
        "date": datetime.date.today().isoformat(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps(verdict, indent=1))
    return 0 if ref_ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
