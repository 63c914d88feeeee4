"""Orbax checkpointing: params + optimizer state + step.

Reference semantics: save_top_k=1 on min val LSD, filename tag 'best-lsd',
plus resumable 'last' (reference ModelCheckpoint config + train.py:177-186).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(checkpoint_dir: str, tag: str) -> str:
    return os.path.join(os.path.abspath(checkpoint_dir), tag)


def save(checkpoint_dir: str, state: Any, step: int, tag: str = "best-lsd") -> str:
    """Save a TrainState under `<dir>/<tag>`. Overwrites previous (top-k=1)."""
    path = _path(checkpoint_dir, tag)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(step, np.int32),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore(path: str, reference_state: Any) -> Tuple[Any, int]:
    """Restore into the structure of `reference_state`; returns (state, step)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": reference_state.params,
        "opt_state": reference_state.opt_state,
        "step": np.asarray(0, np.int32),
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    state = type(reference_state)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )
    return state, int(restored["step"])
