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


def summarize_trace(log_dir: str, top: int = 25,
                    steps: int = 1) -> List[Tuple[str, float]]:
    """Aggregate device-op durations from the newest trace under log_dir.

    Returns [(op_name, ms_per_step)] sorted by cost, excluding the
    module-level wrapper entries.
    """
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no .trace.json.gz under {log_dir}")
    with gzip.open(files[-1]) as fh:
        doc = json.load(fh)
    events = doc["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    totals: Dict[str, float] = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in str(pids.get(e.get("pid"), ""))):
            totals[e.get("name", "?")] += e["dur"]
    rows = [(name, dur / (1e3 * steps)) for name, dur in totals.items()
            if not name.startswith("jit_") and not name.isdigit()]
    rows.sort(key=lambda kv: -kv[1])
    return rows[:top]


def print_trace_summary(log_dir: str, steps: int = 1, top: int = 25) -> None:
    for name, ms in summarize_trace(log_dir, top=top, steps=steps):
        print(f"{ms:8.3f} ms/step  {name[:100]}")
