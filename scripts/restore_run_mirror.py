"""Rebuild the per-run metrics mirror from the committed aggregate artifact.

Round-3 postmortem: ``paper_protocol_r2.sh:persist_run`` copied each finished
run's ``test_metrics*.json`` into ``results/round2/runs/`` but the files were
never ``git commit``-ed, so the mid-round container reset lost them along with
gitignored ``runs/``. The only committed per-run record is the flat list in
``results/round2/synthetic_results_best-lsd.json`` (one row per run+variant,
metrics already through ``eval_paper.rename_metrics``).

This script inverts that rename and writes minimal ``test_metrics*.json``
files back into BOTH roots the collector reads (``runs/round2`` and
``results/round2/runs``), so

  * ``scripts/collect_round2.py`` re-derives the identical table from git, and
  * the sweep queue's done-markers skip already-completed runs instead of
    retraining ~29 finished runs after a wipe.

Restored files carry ``"restored_from": "synthetic_results_best-lsd.json"`` so
they are distinguishable from live eval output. Idempotent; never overwrites
an existing live file.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sot_tpu.eval_paper import RENAME
from scripts.collect_round2 import BEST_RECIPE, _VARIANT_FILES

INVERSE = {name: (key, scale) for key, (name, scale) in RENAME.items()}


def inverse_rename(row: dict) -> dict:
    out = {}
    for name, (key, scale) in INVERSE.items():
        if name in row:
            out[key] = row[name] / scale
    return out


def main() -> int:
    src = "results/round2/synthetic_results_best-lsd.json"
    rows = json.load(open(src))
    n_written = 0
    for row in rows:
        fam, col, run = row["experiment"], row["column"], row["run"]
        if col == "reference":
            if fam == "SOT-2048":
                continue  # round-1 rows; collector reads results/round1 directly
            rel, variant = f"ref/{run}", "plain"
        else:
            rel, variant = run, BEST_RECIPE[fam][1]
        payload = {"test_metrics": inverse_rename(row),
                   "restored_from": os.path.basename(src)}
        for root in ("runs/round2", "results/round2/runs"):
            fp = os.path.join(root, rel, _VARIANT_FILES[variant])
            if os.path.exists(fp):
                continue
            os.makedirs(os.path.dirname(fp), exist_ok=True)
            json.dump(payload, open(fp, "w"), indent=1)
            n_written += 1
    print(f"restored {n_written} metric files from {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
