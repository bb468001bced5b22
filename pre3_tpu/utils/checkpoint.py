"""Checkpoint / record-replay for the SLAM engine.

Re-design of the reference's three disk-cache tiers (SURVEY §5): full
filter snapshots per step (mono_slam.m:251-264 DataSnapshots/snapshot%d.mat
with resume-from-step), replay mode (DATA_PLAY, mono_slam.m:265-427), and
intermediate caches. Here a checkpoint is one npz of the EkfState pytree
(+ step/RNG); replay = re-running the deterministic jitted step from a
loaded state — bit-stable because every stochastic choice derives from the
saved PRNG key (the reference needed rand('state',0) + snapshot files).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ekf.state import EkfState


def save_state(path: str, state: EkfState, step: int, key: jax.Array,
               extra: dict[str, Any] | None = None) -> None:
    arrays = {f"state__{f}": np.asarray(getattr(state, f))
              for f in state._fields}
    arrays["step"] = np.asarray(step)
    arrays["key"] = np.asarray(jax.random.key_data(key))
    meta = json.dumps(extra or {})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, __meta__=np.frombuffer(meta.encode(), np.uint8), **arrays)


def load_state(path: str) -> tuple[EkfState, int, jax.Array, dict]:
    with np.load(path) as z:
        fields = {
            f: jnp.asarray(z[f"state__{f}"]) for f in EkfState._fields
        }
        step = int(z["step"])
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        meta = json.loads(bytes(z["__meta__"]).decode())
    return EkfState(**fields), step, key, meta
