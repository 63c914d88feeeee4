"""Apply the pre-registered round-5 six-gate paper-table refresh.

Protocol (pre-registered in scripts/round5_queue.sh before any result
landed): every paper-table row is re-rolled under the shipped six-gate
``--kernels auto`` configuration — column A (reference protocol) for all
7 families, column B for the families whose tuned recipe predates the
round-4 kernel gates (SOT-2048 anneal, SOT-512 anneal, SOT-2048-SS
probes; SOT-512-LogF / SOT-NoCut column B already ran under the six
gates in round 4 and are left as-is).

A family+column is applied IFF all 5 seeds completed; the new rows
replace the old mirrors WHATEVER they say (old values stay in git
history). Incomplete families keep their old rows and are listed in the
provenance stamp so the table's kernel-era mix stays explicit.

Run with --quiet for the incremental in-queue calls (applies complete
families, skips the chatter about incomplete ones).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (42, 123, 456, 789, 101112)
FAMILIES = ("SOT-2048", "SOT-512", "SOT-512-LogF", "SOT-NoCut",
            "SOT-2048-SS", "MSS-Lin", "MSS-LogLin")
# (column, family) -> r5 run-name prefix; None = intentionally not refreshed
REFRESH = {
    ("ref", fam): f"r5/ref-{fam}" for fam in FAMILIES
}
REFRESH.update({
    ("best", "SOT-2048"): "r5/b-SOT-2048",
    ("best", "SOT-512"): "r5/b-SOT-512",
    ("best", "SOT-2048-SS"): "r5/b-SOT-2048-SS",
    # adaptive (P6 decision rule): runs exist only if seed-42 probes won
    ("best", "MSS-Lin"): "r5/b-MSS-Lin",
    ("best", "MSS-LogLin"): "r5/b-MSS-LogLin",
    # round-4 six-gate rows, already current era:
    ("best", "SOT-512-LogF"): None,
    ("best", "SOT-NoCut"): None,
})
ROOTS = ("runs/round2", "results/round2/runs")

SIX_GATES = {"SOT_TPU_W2_MERGE": "ref", "SOT_TPU_MERGE_ROWS": "128",
             "SOT_TPU_W2_MERGE_SMALL": "hybrid", "SOT_TPU_CQT_PALLAS": "1",
             "SOT_TPU_SYNTH_PALLAS": "1", "SOT_TPU_CONV_BF16": "1"}


def find_run(rel: str):
    for root in ROOTS:
        d = os.path.join(root, rel)
        if os.path.exists(os.path.join(d, "test_metrics_comb.json")):
            return d
    return None


def apply_family(col: str, fam: str, prefix: str, quiet: bool) -> bool:
    srcs = {}
    for s in SEEDS:
        d = find_run(f"{prefix}-{s}")
        if d is None:
            if not quiet:
                print(f"[{col}] {fam}: seed {s} missing — not applied")
            return False
        srcs[s] = d
    rpas = []
    variant = "" if col == "ref" else "_comb"
    for s in SEEDS:
        m = json.load(open(os.path.join(srcs[s], f"test_metrics{variant}.json")))
        rpas.append(100 * m["test_metrics"]["raw_pitch_accuracy"])
    mean = sum(rpas) / len(rpas)
    std = (sum((r - mean) ** 2 for r in rpas) / len(rpas)) ** 0.5
    already = all(
        os.path.exists(os.path.join(ROOTS[0], col, f"{fam}-{s}", "source_ckpt.txt"))
        and "round-5 six-gate refresh" in open(os.path.join(
            ROOTS[0], col, f"{fam}-{s}", "source_ckpt.txt")).read()
        for s in SEEDS)
    print(f"[{col}] {fam}: RPA per seed {[round(r, 2) for r in rpas]} "
          f"mean {mean:.2f} std {std:.2f}"
          + (" (already applied)" if already else " — APPLYING"))
    if already:
        return True
    for s in SEEDS:
        for root in ROOTS:
            dst = os.path.join(root, col, f"{fam}-{s}")
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(srcs[s]):
                if f.startswith("test_metrics"):
                    shutil.copy(os.path.join(srcs[s], f), os.path.join(dst, f))
            with open(os.path.join(dst, "source_ckpt.txt"), "w") as fh:
                fh.write(f"refreshed from {srcs[s]} (pre-registered "
                         "round-5 six-gate refresh)\n")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    applied, pending, skipped = [], [], []
    for (col, fam), prefix in sorted(REFRESH.items()):
        if prefix is None:
            skipped.append(f"{col}/{fam} (round-4 six-gate rows kept)")
            continue
        if apply_family(col, fam, prefix, args.quiet):
            applied.append(f"{col}/{fam}")
        else:
            pending.append(f"{col}/{fam}")

    stamp = {
        "kernel_gates": SIX_GATES,
        "protocol": "round-5 pre-registered six-gate refresh "
                    "(scripts/round5_queue.sh header)",
        "applied": applied,
        "not_applied_incomplete": pending,
        "kept_round4_six_gate_rows": skipped,
    }
    os.makedirs("results/round2", exist_ok=True)
    with open("results/round2/refresh_r5.json", "w") as fh:
        json.dump(stamp, fh, indent=2)
    if applied:
        subprocess.run([sys.executable, "scripts/collect_round2.py"],
                       check=False)
        for attempt in range(3):
            r = subprocess.run(
                ["git", "add", "results/round2"], capture_output=True)
            c = subprocess.run(
                ["git", "commit", "-q", "-m",
                 f"Apply round-5 six-gate refresh ({len(applied)} "
                 "family-columns)", "--", "results/round2"],
                capture_output=True)
            if r.returncode == 0 and c.returncode == 0:
                break
    print(f"applied={applied} pending={pending}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
