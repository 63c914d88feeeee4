"""Profiling utilities (SURVEY §5: tracing/roofline notes).

``trace`` wraps ``jax.profiler.trace`` (TensorBoard-compatible output);
``summarize_trace`` parses the captured .trace.json.gz into per-op device
times — the workflow used to find every hot spot in this framework (SOT
kernel planes, reduce-window cumsums, Toeplitz scatter-adds, framing
gathers). See the commit history for the resulting optimizations.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from contextlib import contextmanager
from typing import Dict, List, Tuple


@contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (viewable in TensorBoard,
    parsable with summarize_trace)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def _load_tpu_events(log_dir: str):
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no .trace.json.gz under {log_dir}")
    with gzip.open(files[-1]) as fh:
        doc = json.load(fh)
    events = doc["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    return [e for e in events
            if (e.get("ph") == "X" and "dur" in e
                and "TPU" in str(pids.get(e.get("pid"), "")))]


def _op_annotation(args: Dict) -> str:
    """Short human hint for an HLO op: category + output/operand shapes
    pulled from the long_name (the detail that identifies e.g. 'the CQT
    frame gather' among anonymous fusion.NNNN names)."""
    cat = args.get("hlo_category", "")
    long_name = args.get("long_name", "")
    # "%fusion.1794 = bf16[524288,64]{...} fusion(bf16[64,36863]{...} ..."
    sig = ""
    if "=" in long_name:
        rhs = long_name.split("=", 1)[1].strip()
        sig = rhs.split("{", 1)[0].strip()[:48]
    return f"[{cat}] {sig}".strip()


def summarize_trace(log_dir: str, top: int = 25,
                    steps: int = 1) -> List[Tuple[str, float]]:
    """Aggregate device-op durations from the newest trace under log_dir.

    Returns [(annotated_op_name, ms_per_step)] sorted by cost, excluding
    module-level wrapper entries; each name carries its HLO category and
    output-shape signature so hot ops are identifiable without re-parsing
    the raw trace (round-4 profiling lesson).
    """
    totals: Dict[str, float] = collections.Counter()
    notes: Dict[str, str] = {}
    for e in _load_tpu_events(log_dir):
        name = e.get("name", "?")
        totals[name] += e["dur"]
        if name not in notes:
            notes[name] = _op_annotation(e.get("args", {}))
    rows = [(f"{name}  {notes.get(name, '')}".strip(),
             dur / (1e3 * steps)) for name, dur in totals.items()
            if not name.startswith("jit_") and not name.isdigit()]
    rows.sort(key=lambda kv: -kv[1])
    return rows[:top]


def summarize_trace_by_category(log_dir: str,
                                steps: int = 1) -> List[Tuple[str, float]]:
    """Device time per HLO category (convolution fusion, custom-call, data
    formatting, ...) excluding while-loop wrappers — the budget view that
    drives 'what to optimize next' (PERF.md per-op budget tables)."""
    totals: Dict[str, float] = collections.Counter()
    for e in _load_tpu_events(log_dir):
        name = e.get("name", "?")
        if name.startswith(("while.", "jit_")) or name.isdigit():
            continue
        totals[e.get("args", {}).get("hlo_category", "?")] += e["dur"]
    rows = [(cat, dur / (1e3 * steps)) for cat, dur in totals.items()]
    rows.sort(key=lambda kv: -kv[1])
    return rows


def print_trace_summary(log_dir: str, steps: int = 1, top: int = 25) -> None:
    print("# by HLO category:")
    for cat, ms in summarize_trace_by_category(log_dir, steps=steps):
        if ms >= 0.005:
            print(f"{ms:8.3f} ms/step  {cat}")
    print("# top ops:")
    for name, ms in summarize_trace(log_dir, top=top, steps=steps):
        print(f"{ms:8.3f} ms/step  {name[:140]}")
