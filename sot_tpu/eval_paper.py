"""Paper-table reproduction harness (L8).

Mirrors reference eval_paper.py: per experiment family, evaluate the best-LSD
checkpoint of each seed on the test split, rename metrics to the paper's
columns (LSD, MSE, MSS, OD*-1, RPA*100, RCA*100), aggregate mean(std) and
median per family, mark best/2nd-best, write CSV + LaTeX-ish table.

Usage:
    python -m sot_tpu.eval_paper --runs-dir runs --out results/
Expects runs laid out as runs/<EXPERIMENT>-<seed>/checkpoints/best-lsd
(what `python -m sot_tpu.cli train` produces).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

RENAME = {
    "log_spectral_distance": ("LSD", 1.0),
    "mse": ("MSE", 1.0),
    "mss": ("MSS", 1.0),
    "octave_difference": ("OD", -1.0),
    "raw_pitch_accuracy": ("RPA", 100.0),
    "raw_chroma_accuracy": ("RCA", 100.0),
}
HIGHER_BETTER = {"RPA", "RCA"}


def rename_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    out = {}
    for key, (name, scale) in RENAME.items():
        if key in metrics:
            out[name] = metrics[key] * scale
    return out


def evaluate_run(experiment: str, run_dir: str, dataset: Optional[str],
                 split: str = "test") -> Dict[str, float]:
    import jax

    from sot_tpu import data as data_lib
    from sot_tpu.configs import get_experiment
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.trainer import (build_modules, evaluate, init_state,
                                          make_eval_step)

    import argparse as _ap

    from sot_tpu.cli import _config_for_ckpt

    ckpt = os.path.join(run_dir, "checkpoints", "best-lsd")
    # resolve the run's own saved config (cli._config_for_ckpt) so sweeps
    # over runs trained with --set overrides evaluate on the right data
    cfg = _config_for_ckpt(_ap.Namespace(
        ckpt=ckpt, experiment=experiment, dataset=dataset,
        dataset_size=None, set=None))
    mod = build_modules(cfg)
    state = init_state(mod, jax.random.key(0))
    state, _ = ckpt_lib.restore(ckpt, state)
    splits = data_lib.dataset_from_config(cfg)
    eval_step = make_eval_step(mod)
    return evaluate(mod, eval_step, state.params, splits[split], cfg.batch_size)


def aggregate(rows: List[Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    """mean/std/median per metric (reference eval_paper.py:167-253)."""
    out = {}
    keys = rows[0].keys()
    for k in keys:
        vals = np.array([r[k] for r in rows], dtype=np.float64)
        out[k] = {"mean": float(vals.mean()), "std": float(vals.std()),
                  "median": float(np.median(vals)), "n": int(len(vals))}
    return out


def format_paper_table(table: Dict[str, Dict[str, Dict[str, float]]]
                       ) -> List[str]:
    """LaTeX-ready 'mean(std)' rows with \\textbf best and \\emph 2nd-best
    per column (reference eval_paper.py:167-253).

    Cells backed by fewer seeds than the paper protocol are labelled
    honestly: n=1 renders as ``mean(n=1)`` (a 0.000 std would be
    misleading), 1<n<5 appends ``[n=k]``."""
    if not table:
        return []
    metrics = list(next(iter(table.values())).keys())
    exps = list(table.keys())
    ranks: Dict[str, Dict[str, int]] = {m: {} for m in metrics}
    for m in metrics:
        means = {e: table[e][m]["mean"] for e in exps}
        order = sorted(exps, key=lambda e: means[e],
                       reverse=(m in HIGHER_BETTER))
        if m == "OD":  # closest to zero wins
            order = sorted(exps, key=lambda e: abs(means[e]))
        for rank, e in enumerate(order):
            ranks[m][e] = rank
    lines = ["experiment," + ",".join(metrics)]
    for e in exps:
        cells = []
        for m in metrics:
            cell = table[e][m]
            n = cell.get("n", 5)
            if n == 1:
                s = f"{cell['mean']:.3f}(n=1)"
            else:
                s = f"{cell['mean']:.3f}({cell['std']:.3f})"
                if n < 5:
                    s += f"[n={n}]"
            if ranks[m][e] == 0:
                s = "\\textbf{%s}" % s
            elif ranks[m][e] == 1:
                s = "\\emph{%s}" % s
            cells.append(s)
        lines.append(e + "," + ",".join(cells))
    return lines


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--runs-dir", default="runs")
    p.add_argument("--out", default="results")
    p.add_argument("--dataset", default=None, help="reference .pth test dataset")
    p.add_argument("--experiments", nargs="*", default=None)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    from sot_tpu.configs import EXPERIMENTS

    experiments = args.experiments or sorted(EXPERIMENTS)
    per_run_rows = []
    table: Dict[str, Dict[str, str]] = {}
    for exp in experiments:
        run_dirs = sorted(glob.glob(os.path.join(args.runs_dir, f"{exp}-*")))
        rows = []
        for rd in run_dirs:
            if not os.path.isdir(os.path.join(rd, "checkpoints", "best-lsd")):
                continue
            metrics = rename_metrics(evaluate_run(exp, rd, args.dataset))
            metrics["run"] = os.path.basename(rd)
            per_run_rows.append({"experiment": exp, **metrics})
            rows.append({k: v for k, v in metrics.items() if k != "run"})
            print(json.dumps({"experiment": exp, "run": rd, **{k: round(v, 4) for k, v in rows[-1].items()}}))
        if rows:
            table[exp] = aggregate(rows)

    with open(os.path.join(args.out, "synthetic_results_best-lsd.json"), "w") as fh:
        json.dump(per_run_rows, fh, indent=2)
    with open(os.path.join(args.out, "synthetic_results_paper_best-lsd.json"), "w") as fh:
        json.dump(table, fh, indent=2)
    latex_lines = format_paper_table(table)
    with open(os.path.join(args.out, "synthetic_results_paper_best-lsd.csv"),
              "w") as fh:
        fh.write("\n".join(latex_lines) + "\n")

    # console table
    if table:
        metrics = list(next(iter(table.values())).keys())
        header = "experiment".ljust(14) + "".join(m.ljust(26) for m in metrics)
        print(header)
        for exp, row in table.items():
            print(exp.ljust(14) + "".join(
                f"{row[m]['mean']:.3f}({row[m]['std']:.3f}) med={row[m]['median']:.3f}".ljust(26)
                for m in metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
