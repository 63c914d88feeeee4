"""Structured training logs: JSONL file + stdout mirror.

Replaces the reference's wandb scalar logging (trainer.py:235-245,
plot_log_utils.py) with a dependency-free JSONL stream; each line is one
logged event with a 'split' and 'step'.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Dict, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._fh = open(path, "a") if path else None
        self._echo = echo

    def write(self, record: Dict[str, Any]) -> None:
        line = json.dumps({k: _jsonable(v) for k, v in record.items()})
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()


def _jsonable(v: Any) -> Any:
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
