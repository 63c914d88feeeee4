"""Device mesh plumbing.

One mesh, two axes:
  * 'data' — batch data-parallelism (the outer, DCN-friendly axis)
  * 'freq' — intra-sample sharding (STFT frames / frequency channels),
    rides ICI within a slice

The reference is strictly single-device (SURVEY.md section 2.3); this is the
TPU-native scaling design: shardings are expressed once here and threaded
through jit/shard_map everywhere else.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, freq: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (data = n/freq, freq)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % freq != 0:
        raise ValueError(f"n_devices ({n_devices}) not divisible by freq ({freq})")
    arr = np.asarray(devices).reshape(n_devices // freq, freq)
    return Mesh(arr, axis_names=("data", "freq"))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
