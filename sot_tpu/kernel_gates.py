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
    ("cqt_ab.json", "xla", "pallas", ("SOT_TPU_CQT_PALLAS",)),
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
# an O(n log n) kernel computing the SAME gradient convention, adopted on
# the refgrad A/B's on-chip parity check plus the usual speed margin — and,
# since round 4, additionally confirmed end-to-end by twin 25k training
# runs (refgrad_train_verdict.json; a negative verdict there demotes ref
# back to hybrid even when parity+speed pass, per the round-3 lesson that
# point parity cannot always certify training behaviour).
_REFGRAD_AB = "refgrad_ab.json"
_REFGRAD_TRAIN_VERDICT = "refgrad_train_verdict.json"


def _refgrad_upgrade(ab_dir: str) -> bool:
    """hybrid -> ref when the refgrad A/B is complete, parity-checked, ref
    beats hybrid by the standard margin (grad side is where they differ;
    totals compared for uniformity with the other gates), and the training
    verdict — when one is committed — is not negative."""
    try:
        ab = json.load(open(os.path.join(ab_dir, _REFGRAD_AB)))
    except Exception:  # noqa: BLE001 — A/B not run yet
        return False
    if not (ab.get("complete") and ab.get("parity", {}).get("ok")):
        return False
    try:
        verdict = json.load(open(os.path.join(ab_dir, _REFGRAD_TRAIN_VERDICT)))
        if not verdict.get("ref_ok"):
            return False
    except Exception:  # noqa: BLE001 — no training verdict yet: parity rules
        pass
    ref, hyb = ab.get("ref", {}), ab.get("hybrid", {})
    t_ref = ref.get("fwd_ms", 1e9) + ref.get("grad_ms", 1e9)
    t_hyb = hyb.get("fwd_ms", 1e9) + hyb.get("grad_ms", 1e9)
    return t_ref < 0.97 * t_hyb and t_hyb - t_ref >= 0.05


def _synth_gate(ab_dir: str) -> bool:
    """SOT_TPU_SYNTH_PALLAS adoption: A/B win + parity AND a committed
    training verdict. The fused synth's gradients are fp-noise-equal (not
    bit-equal) to the XLA path — HIGHEST-precision envelope matmuls vs
    per-sample lerp — so by the round-3 gradient-convention policy a speed
    A/B alone cannot certify it for training."""
    try:
        ab = json.load(open(os.path.join(ab_dir, "synth_ab.json")))
        verdict = json.load(open(os.path.join(ab_dir,
                                              "synth_train_verdict.json")))
    except Exception:  # noqa: BLE001 — artifacts not committed yet
        return False
    if not (ab.get("complete") and ab.get("parity", {}).get("ok")
            and verdict.get("synth_ok")):
        return False

    def total(d):
        return d.get("fwd_ms", 1e9) + d.get("grad_ms", 1e9)

    cand, base = ab.get("pallas", {}), ab.get("xla", {})
    return (total(cand) < 0.97 * total(base)
            and total(base) - total(cand) >= 0.05)


def _convbf16_gate(ab_dir: str) -> bool:
    """SOT_TPU_CONV_BF16 (bf16 conv-stack activations): adoption requires
    a committed positive training verdict carrying a >3% recorded
    bench-level win — ~0.5% forward perturbation is above the noise floor
    the round-4 synth lesson showed can hurt this recipe, so speed alone
    never ships it."""
    try:
        v = json.load(open(os.path.join(ab_dir,
                                        "convbf16_train_verdict.json")))
    except Exception:  # noqa: BLE001 — verdict not committed yet
        return False
    if not v.get("conv_bf16_ok"):
        return False
    bench = v.get("bench_frames_per_sec", {})
    off, on = bench.get("off", 0.0), bench.get("on", 0.0)
    return off > 0 and on > 1.03 * off


def _small_shape_mode(ab_dir: str) -> str:
    """Winner at the SOT-512 families' shape ([rows x 257]), from the
    committed 512-shape refgrad A/B (refgrad_ab_512.json — the only input;
    sot_ab_512.json does not participate in this decision).
    Round-4 finding: the plane backward is cheap at n=257 so hybrid beats
    ref there — the dispatcher honours SOT_TPU_W2_MERGE_SMALL for rows of
    <= SOT_TPU_W2_SMALL_N bins. Returns '' when the 512 A/Bs are absent
    or parity failed (then the main gate applies at every shape)."""
    try:
        ab = json.load(open(os.path.join(ab_dir, "refgrad_ab_512.json")))
    except Exception:  # noqa: BLE001 — 512-shape A/B not run
        return ""
    if not (ab.get("complete") and ab.get("parity", {}).get("ok")):
        return ""

    def total(d):
        return d.get("fwd_ms", 1e9) + d.get("grad_ms", 1e9)

    ref, hyb = total(ab.get("ref", {})), total(ab.get("hybrid", {}))
    # same adoption margin as everywhere else; within noise -> follow the
    # main gate (return '') rather than pinning a second mode
    if hyb < 0.97 * ref and ref - hyb >= 0.05:
        return "hybrid"
    if ref < 0.97 * hyb and hyb - ref >= 0.05:
        return "ref"
    return ""


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
        if "parity" in ab and not ab["parity"].get("ok"):
            continue  # a fast-but-wrong candidate is not a candidate
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
                small = _small_shape_mode(ab_dir)
                if (small and small != gates["SOT_TPU_W2_MERGE"]
                        and "SOT_TPU_W2_MERGE_SMALL" not in os.environ):
                    gates["SOT_TPU_W2_MERGE_SMALL"] = small
    if best_mss[0]:
        for env in best_mss[0]:
            gates[env] = "1"
    if "SOT_TPU_SYNTH_PALLAS" not in os.environ and _synth_gate(ab_dir):
        gates["SOT_TPU_SYNTH_PALLAS"] = "1"
    if "SOT_TPU_CONV_BF16" not in os.environ and _convbf16_gate(ab_dir):
        gates["SOT_TPU_CONV_BF16"] = "1"
    return gates


def apply_auto_gates(ab_dir: str = "results/round2") -> Dict[str, str]:
    """Set the winning gates in ``os.environ`` (they are read at trace
    time by the dispatchers) and return what was applied."""
    gates = auto_gates(ab_dir)
    os.environ.update(gates)
    return gates
