"""Assemble the round-2 paper tables from the sweep's per-run JSONs.

Column A  (reference protocol): 5 seeds x 7 families, plain test metrics —
the reference's `synthetic_results_paper_best-lsd` semantics
(reference eval_paper.py:111-253).
Column B  (best-known unsupervised recipe, beyond-reference): per family,
temperature-anneal [1.0,0.1,1500] where the family has the quantile cutoff
+ the harmonic-comb test-time correction (metrics.comb_correct_pitch) at
eval. The comb correction dominates or equals the older octave rule on
every family checkpoint measured (seed-42: SOT-512 61.6->98.7,
SOT-NoCut 64.2->99.5 where the octave rule MISFIRED, SOT-2048 parity,
MSS-Lin parity with octcorr), so it is the uniform recipe.

SOT-2048 column-A rows are reused from round 1 (identical protocol,
results/round1/synthetic_results_best-lsd.json); everything else reads
runs/round2/{ref,best}/<FAM>-<seed>/test_metrics[_octcorr].json written by
scripts/paper_protocol_r2.sh.

Usage: python scripts/collect_round2.py [--out results/round2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sot_tpu.eval_paper import aggregate, format_paper_table, rename_metrics

FAMILIES = ("SOT-2048", "SOT-512", "SOT-512-LogF", "SOT-NoCut",
            "SOT-2048-SS", "MSS-Lin", "MSS-LogLin")
SEEDS = (42, 123, 456, 789, 101112)

# column-B recipe per family: (runs subdir, which metrics file)
#   'best' = trained with the family's tuned recipe; 'ref' = reference
#   training. 'comb' = harmonic-comb correction at eval (supersedes
#   'octcorr' everywhere: >= the octave rule on every family, no misfires).
# Families marked 'auto' resolve at collection time (round-4): the tuned
# 'best' runs are used IFF all 5 seeds completed AND their mean RPA beats
# the ref+comb column — a tuned recipe that loses is never reported as
# "best-known". The resolution is recorded in recipe_map.
BEST_RECIPE = {
    "SOT-2048": ("best", "comb"),
    "SOT-512": ("best", "comb"),
    "SOT-2048-SS": ("best", "comb"),
    "SOT-512-LogF": ("auto", "comb"),
    "SOT-NoCut": ("auto", "comb"),
    # round-5: MSS flipped to 'auto' for the pre-registered init-probe rule
    # (scripts/round5_queue.sh P2/P6) — resolves to 'best' only when the
    # probe runs completed all 5 seeds AND beat ref+comb.
    "MSS-Lin": ("auto", "comb"),
    "MSS-LogLin": ("auto", "comb"),
}


def _resolve_auto(roots, fam: str, variant: str) -> str:
    """'best' when the tuned runs are complete and actually better."""
    def mean_rpa(sub):
        vals = []
        for seed in SEEDS:
            row = read_run(roots, f"{sub}/{fam}-{seed}", variant)
            if row is None:
                return None
            vals.append(row["RPA"])
        return sum(vals) / len(vals)

    best, ref = mean_rpa("best"), mean_rpa("ref")
    if best is not None and (ref is None or best > ref):
        return "best"
    return "ref"

_VARIANT_FILES = {"plain": "test_metrics.json",
                  "octcorr": "test_metrics_octcorr.json",
                  "comb": "test_metrics_comb.json"}


def read_run(roots, rel: str, variant: str):
    """Metrics for run ``rel`` from the first root that has them.

    Roots are searched in order: the live ``runs/round2`` tree first, then
    the git-committed mirror ``results/round2/runs`` (written by
    ``paper_protocol_r2.sh:persist_run``). The mirror makes collection
    merge-with-committed: a container wipe of gitignored ``runs/`` can no
    longer regress the table (round-2 postmortem)."""
    for root in roots:
        fp = os.path.join(root, rel, _VARIANT_FILES[variant])
        if os.path.exists(fp):
            return rename_metrics(json.load(open(fp))["test_metrics"])
    return None


def list_rel(roots, pattern: str):
    """Sorted union of run-dir paths matching ``pattern`` across roots,
    relative to their root."""
    rels = set()
    for root in roots:
        for d in glob.glob(os.path.join(root, pattern)):
            rels.add(os.path.relpath(d, root))
    return sorted(rels)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/round2")
    ap.add_argument("--runs", default="runs/round2")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    roots = (args.runs, os.path.join(args.out, "runs"))

    per_run = []
    table_a, table_b = {}, {}
    missing = []

    r1 = json.load(open("results/round1/synthetic_results_best-lsd.json"))

    for fam in FAMILIES:
        rows_a = []
        # round-5: SOT-2048 column A uses the six-gate refresh runs when the
        # full 5-seed set exists (apply_r5_refresh.py); the round-1 rows are
        # the fallback only while the refresh is incomplete.
        r5_sot2048 = all(
            read_run(roots, f"ref/SOT-2048-{s}", "plain") is not None
            for s in SEEDS)
        if fam == "SOT-2048" and not r5_sot2048:
            for r in r1:
                if r["experiment"] == "SOT-2048":
                    row = {k: v for k, v in r.items()
                           if k not in ("experiment", "run")}
                    rows_a.append(row)
                    per_run.append({"experiment": fam, "column": "reference",
                                    "run": r["run"], **row})
        else:
            for seed in SEEDS:
                row = read_run(roots, f"ref/{fam}-{seed}", "plain")
                if row is None:
                    missing.append(f"ref/{fam}-{seed}")
                    continue
                rows_a.append(row)
                per_run.append({"experiment": fam, "column": "reference",
                                "run": f"{fam}-{seed}", **row})
        if rows_a:
            table_a[fam] = aggregate(rows_a)

        sub, variant = BEST_RECIPE[fam]
        if sub == "auto":
            sub = _resolve_auto(roots, fam, variant)
            BEST_RECIPE[fam] = (sub, variant)  # recorded in recipe_map
        rows_b = []
        for seed in SEEDS:
            row = read_run(roots, f"{sub}/{fam}-{seed}", variant)
            if row is None:
                missing.append(f"{sub}/{fam}-{seed} ({variant})")
                continue
            rows_b.append(row)
            per_run.append({"experiment": fam, "column": "best-recipe",
                            "run": f"{sub}/{fam}-{seed}", **row})
        if rows_b:
            table_b[fam] = aggregate(rows_b)

    # Outage insurance: if a family has NO completed round-2 runs in a
    # column, surface the round-1 seed-42 point for it in a clearly
    # separated fallback section (single seed, round-1 protocol — NOT
    # mixed into the 5-seed mean/std tables above).
    fallback = {}
    try:
        r1_fam = json.load(open("results/round1/family_sweep.json"))
    except FileNotFoundError:
        r1_fam = {}
    for fam in FAMILIES:
        if fam in table_a or fam not in r1_fam or "note" in r1_fam[fam]:
            continue
        fallback[fam] = rename_metrics(r1_fam[fam])
    # Provisional cells: CPU evals of surviving round-1 checkpoints placed
    # under runs/round2/provisional/<FAM>-<seed>/ during the tunnel outage
    # (e.g. the SS 40k anneal extension standing in for the queued 50k
    # run). Reported separately; never mixed into the mean/std tables, and
    # the sweep queue does not treat them as done-markers.
    provisional = {}
    for rel in list_rel(roots, "provisional/*"):
        name = os.path.basename(rel)
        fam = name.rsplit("-", 1)[0]
        variant = BEST_RECIPE.get(fam, ("ref", "plain"))[1]
        row = read_run(roots, rel, variant)
        if row is not None:
            src = ""
            for root in roots:
                try:
                    src = open(os.path.join(
                        root, rel, "source_ckpt.txt")).read().strip()
                    break
                except OSError:
                    pass
            provisional[name] = {**row, "variant": variant, "source": src}

    # kernel-era stamp (VERDICT r4 task 1): which rows come from the
    # round-5 six-gate refresh, and under which gate configuration.
    try:
        refresh = json.load(open(os.path.join(args.out, "refresh_r5.json")))
    except FileNotFoundError:
        refresh = None

    out = {"reference_protocol": table_a, "best_recipe": table_b,
           "kernel_era": refresh,
           "recipe_map": {k: "+".join(v) for k, v in BEST_RECIPE.items()},
           "round1_seed42_fallback": fallback,
           "fallback_note": "families with zero completed round-2 "
           "reference-protocol runs, backfilled from the round-1 seed-42 "
           "family sweep (single seed; kept out of the mean/std tables)",
           "provisional_best_recipe": provisional,
           "missing_runs": missing}
    with open(os.path.join(args.out, "synthetic_results_best-lsd.json"), "w") as fh:
        json.dump(per_run, fh, indent=2)
    with open(os.path.join(args.out, "synthetic_results_paper_best-lsd.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    lines = ["# column A: reference protocol (5 seeds/family)"]
    lines += format_paper_table(table_a)
    lines += ["", "# column B: best-known unsupervised recipe"]
    lines += format_paper_table(table_b)
    with open(os.path.join(args.out, "synthetic_results_paper_best-lsd.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    # Collapse-rate addendum: all reference-protocol SOT-2048 seeds (round-1
    # headline 5 + runs/round2/refextra extras) — pins how often the
    # reference training protocol lands in a degenerate basin.
    rpas = {}
    for r in r1:
        if r["experiment"] == "SOT-2048":
            rpas[r["run"]] = r["RPA"]
    for rel in list_rel(roots, "refextra/SOT-2048-*"):
        row = read_run(roots, rel, "plain")
        if row is not None:
            rpas[os.path.basename(rel)] = row["RPA"]
    if rpas:
        vals = sorted(rpas.values())
        collapse = {
            "n_seeds": len(vals),
            "rpa_per_seed": rpas,
            "frac_below_20": sum(v < 20 for v in vals) / len(vals),
            "frac_below_50": sum(v < 50 for v in vals) / len(vals),
            "note": "reference-protocol SOT-2048; RPA<20 = never escaped "
                    "the plateau or full octave collapse, RPA<50 = any "
                    "degenerate basin (round-1 root-cause analysis)",
        }
        with open(os.path.join(args.out, "sot2048_collapse.json"), "w") as fh:
            json.dump(collapse, fh, indent=2)
        print(f"collapse rate over {len(vals)} seeds: "
              f"<20: {collapse['frac_below_20']:.2f}  "
              f"<50: {collapse['frac_below_50']:.2f}")

    for name, tab in (("REFERENCE PROTOCOL", table_a), ("BEST RECIPE", table_b)):
        print(f"== {name} ==")
        for fam, row in tab.items():
            msg = "  ".join(
                f"{m}={row[m]['mean']:.2f}({row[m]['std']:.2f})"
                for m in ("RPA", "RCA", "OD", "LSD") if m in row)
            print(f"  {fam:14s} {msg}")
    if missing:
        print(f"missing: {len(missing)} runs", missing[:8], file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
