"""Device-mesh helpers for multi-chip execution.

The reference is single-process (SURVEY §2.4); scale-out here follows the
jax sharding recipe: build a Mesh, annotate shardings, let XLA insert
ICI/DCN collectives. Axes used across the engine:

  "hyp"  — RANSAC hypothesis batch (data parallelism over hypotheses)
  "lm"   — landmark blocks (map sharding for the BA backend)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "hyp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, axis: str = "hyp") -> NamedSharding:
    """Sharding for an array whose leading axis is the parallel batch."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
