"""Checkpoint save/load/replay tests (the DataSnapshots + DATA_PLAY
pattern, SURVEY §5)."""

import tempfile, os

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ekf.state import init_state
from pre3_tpu.utils.checkpoint import load_state, save_state


def test_roundtrip():
    state = init_state(n_landmarks=8, desc_dim=16)
    state = state._replace(
        x=state.x.at[0].set(1.25), active=state.active.at[3].set(True)
    )
    key = jax.random.PRNGKey(42)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "snap.npz")
        save_state(p, state, step=7, key=key, extra={"note": "t"})
        st2, step, key2, meta = load_state(p)
    assert step == 7
    assert meta == {"note": "t"}
    for f in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, f)), np.asarray(getattr(st2, f))
        )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(key2)),
    )


def test_replay_determinism():
    """Same state + same key ⇒ identical stochastic draw (replaces the
    reference's rand('state',0) + snapshot replay)."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4,))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "snap.npz")
        save_state(p, init_state(4, 8), step=0, key=key)
        _, _, key2, _ = load_state(p)
    b = jax.random.normal(key2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
