"""Kernel-gate selection from committed A/B results.

The env-gated alternative kernels (Pallas merge SOT, Pallas im2col conv,
DFT-matmul rfft, fused Pallas STFT frontend) are semantics-preserving
speed variants; which one wins depends on the chip and is decided by the
committed A/B JSONs produced on-device by the sweep prelude
(`scripts/bench_*_ab.py`). This module turns those artifacts into env-gate
settings: `bench.py`, `scripts/profile_step.py`, and `cli train --kernels
auto` all route through it so the shipped configuration is chosen in
exactly one place.

Rules: a candidate needs a >3% total (fwd+grad) win over its baseline
(bench noise on this setup is ±1.5%) AND a >=0.05 ms absolute win (the MSS
A/B measures µs-scale paths where a 3% relative delta is pure noise — a
gate flip must be worth real step time); an explicit env setting for any
gate a candidate touches removes that candidate (the user's pin wins); the
MSS rfft candidates are mutually exclusive recipes and the best total wins.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

_AB_GATES: Tuple = (
    # (ab json, baseline key, candidate key, env gates for the candidate)
    ("sot_ab.json", "plane", "merge", ("SOT_TPU_W2_MERGE",)),
    ("conv_ab.json", "xla", "pallas", ("SOT_TPU_CONV_PALLAS",)),
    ("mss_ab.json", "fft", "dft_matmul", ("SOT_TPU_DFT_MATMUL",)),
    ("mss_ab.json", "fft", "pallas", ("SOT_TPU_STFT_PALLAS",)),
    ("mss_ab.json", "fft", "pallas+dft",
     ("SOT_TPU_STFT_PALLAS", "SOT_TPU_DFT_MATMUL")),
)

_MSS_FILE = "mss_ab.json"

# The FULL merge kernel's backward realizes min-halving subgradients; real
# spectra sit exactly on the cap-tie kink manifold where that convention
# differs macroscopically from the reference's (see _merge_mode in
# ops/pallas/sot.py).  Speed alone therefore cannot justify 'full': it
# additionally needs a committed TRAINING verdict (a 25k run reaching
# reference-recipe accuracy).  Until then the A/B winner is demoted to
# 'hybrid' — merge forward, plane backward, exact reference gradients.
_MERGE_TRAIN_VERDICT = "merge_train_verdict.json"

# 'ref' mode (ops/pallas/refgrad.py) replaces hybrid's plane backward with
# an O(n log n) kernel computing the SAME gradient convention — so unlike
# 'full' it needs no training verdict, only the refgrad A/B's on-chip
# numerical parity check plus the usual speed margin.
_REFGRAD_AB = "refgrad_ab.json"


def _refgrad_upgrade(ab_dir: str) -> bool:
    """hybrid -> ref when the refgrad A/B is complete, parity-checked, and
    ref beats hybrid by the standard margin (grad side is where they
    differ; totals compared for uniformity with the other gates)."""
    try:
        ab = json.load(open(os.path.join(ab_dir, _REFGRAD_AB)))
    except Exception:  # noqa: BLE001 — A/B not run yet
        return False
    if not (ab.get("complete") and ab.get("parity", {}).get("ok")):
        return False
    ref, hyb = ab.get("ref", {}), ab.get("hybrid", {})
    t_ref = ref.get("fwd_ms", 1e9) + ref.get("grad_ms", 1e9)
    t_hyb = hyb.get("fwd_ms", 1e9) + hyb.get("grad_ms", 1e9)
    return t_ref < 0.97 * t_hyb and t_hyb - t_ref >= 0.05


def _full_merge_blessed(ab_dir: str) -> bool:
    try:
        v = json.load(open(os.path.join(ab_dir, _MERGE_TRAIN_VERDICT)))
    except Exception:  # noqa: BLE001 — no verdict yet
        return False
    return bool(v.get("full_ok"))


def auto_gates(ab_dir: str = "results/round2") -> Dict[str, str]:
    """Env-gate settings for the committed A/B winners under ``ab_dir``."""
    gates: Dict[str, str] = {}
    best_mss = (None, 1e9)  # (env tuple, total) across the mss candidates

    def total(d):
        return d.get("fwd_ms", 1e9) + d.get("grad_ms", 1e9)

    for fname, base_key, cand_key, envs in _AB_GATES:
        if any(env in os.environ for env in envs):
            continue  # explicit setting wins
        try:
            ab = json.load(open(os.path.join(ab_dir, fname)))
        except Exception:  # noqa: BLE001 — A/B not run yet
            continue
        cand, base = ab.get(cand_key, {}), ab.get(base_key, {})
        if (total(cand) < 0.97 * total(base)
                and total(base) - total(cand) >= 0.05):
            if fname == _MSS_FILE:
                if total(cand) < best_mss[1]:
                    best_mss = (envs, total(cand))
                continue
            for env in envs:
                gates[env] = "1"
            if "SOT_TPU_W2_MERGE" in envs:
                if not _full_merge_blessed(ab_dir):
                    gates["SOT_TPU_W2_MERGE"] = (
                        "ref" if _refgrad_upgrade(ab_dir) else "hybrid")
                if cand.get("rows"):
                    gates["SOT_TPU_MERGE_ROWS"] = str(cand["rows"])
    if best_mss[0]:
        for env in best_mss[0]:
            gates[env] = "1"
    return gates


def apply_auto_gates(ab_dir: str = "results/round2") -> Dict[str, str]:
    """Set the winning gates in ``os.environ`` (they are read at trace
    time by the dispatchers) and return what was applied."""
    gates = auto_gates(ab_dir)
    os.environ.update(gates)
    return gates
