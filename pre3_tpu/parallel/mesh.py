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
    """Build a 1-axis Mesh over the first n_devices devices.

    Raises when fewer devices exist than requested: silently truncating
    (the pre-round-5 behavior) let "multi-chip" validation degrade to a
    1-device mesh that exercises no collectives (ADVICE r4), which is how
    a crash in the 8-block pose-sharded BA went unnoticed.
    """
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devs)} JAX "
                f"device(s) exist; set "
                f"--xla_force_host_platform_device_count or request fewer"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, axis: str = "hyp") -> NamedSharding:
    """Sharding for an array whose leading axis is the parallel batch."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
