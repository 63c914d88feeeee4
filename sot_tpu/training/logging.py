"""Structured training logs: JSONL file + stdout mirror (+ wandb).

Replaces the reference's wandb scalar logging (trainer.py:235-245,
plot_log_utils.py) with a dependency-free JSONL stream; each line is one
logged event with a 'split' and 'step'. When a wandb run is active
(``wandb.init`` called by the user — wandb is optional and never imported
eagerly), scalars are mirrored there under the reference's key scheme.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Dict, Optional


def _wandb_run():
    try:
        import wandb

        return wandb.run
    except Exception:
        return None


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._fh = open(path, "a") if path else None
        self._echo = echo

    def write(self, record: Dict[str, Any]) -> None:
        record = {k: _jsonable(v) for k, v in record.items()}
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stdout, flush=True)
        run = _wandb_run()
        if run is not None:
            split = record.get("split", "train")
            step = record.get("step")
            scalars = {
                (k if "/" in k else f"{split}_metrics/{k}"): v
                for k, v in record.items()
                if isinstance(v, float) and k not in ("step",)
            }
            run.log(scalars, step=int(step) if step is not None else None)

    def close(self) -> None:
        if self._fh:
            self._fh.close()


def _jsonable(v: Any) -> Any:
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
