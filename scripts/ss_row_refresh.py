"""Apply the pre-registered six-gate SS-row refresh (VERDICT_R3_RESPONSE).

Preconditions: all five runs/round2/r4/ss-sixgate-<seed> completed (the
identical column-B recipe — anneal-1500, 50k, comb — under the shipped
six-gate `--kernels auto` configuration). Per the pre-registration the
row is replaced by the new aggregate WHATEVER it says: this script copies
the new metrics over the best/SOT-2048-SS-<seed> mirrors (old values
remain in git history and in the committed r4/ mirrors), records
provenance, and reruns the collector.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (42, 123, 456, 789, 101112)


def main() -> int:
    srcs = {}
    for s in SEEDS:
        d = f"runs/round2/r4/ss-sixgate-{s}"
        if not os.path.exists(os.path.join(d, "test_metrics_comb.json")):
            d = f"results/round2/runs/r4/ss-sixgate-{s}"
        if not os.path.exists(os.path.join(d, "test_metrics_comb.json")):
            print(f"missing seed {s}; refresh NOT applied", file=sys.stderr)
            return 1
        srcs[s] = d

    rows = []
    for s in SEEDS:
        m = json.load(open(os.path.join(srcs[s],
                                        "test_metrics_comb.json")))
        rows.append(100 * m["test_metrics"]["raw_pitch_accuracy"])
    mean = sum(rows) / len(rows)
    var = sum((r - mean) ** 2 for r in rows) / len(rows)
    print(f"new SS row comb RPA per seed: {[round(r,2) for r in rows]}; "
          f"mean {mean:.2f} std {var ** 0.5:.2f}")

    for s in SEEDS:
        for root in ("runs/round2", "results/round2/runs"):
            dst = f"{root}/best/SOT-2048-SS-{s}"
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(srcs[s]):
                if f.startswith("test_metrics"):
                    shutil.copy(os.path.join(srcs[s], f),
                                os.path.join(dst, f))
            with open(os.path.join(dst, "source_ckpt.txt"), "w") as fh:
                fh.write(f"refreshed from {srcs[s]} (pre-registered "
                         "six-gate SS-row refresh, round 4)\n")
    subprocess.run([sys.executable, "scripts/collect_round2.py"], check=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
