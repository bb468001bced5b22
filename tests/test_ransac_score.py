"""Pallas RANSAC scoring kernel vs the XLA reference.

These tests pin the kernel semantics in interpret mode (the suite runs on
the 8-virtual-device CPU platform). The compiled TPU path is on the
production pipeline: vo/ransac.py scores through
ops.ransac_score.score_hypotheses, which dispatches to the Pallas kernel
whenever the backend is TPU — bench.py and tools/bench_kernels.py (the
measured XLA-vs-Pallas table lives in BASELINE.md) both execute it
compiled on the real chip."""

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ops.ransac_score import (
    score_hypotheses_pallas, score_hypotheses_xla,
)
from pre3_tpu.data.synthetic import _rodrigues


def make_problem(b=100, n=90, seed=0):
    rng = np.random.default_rng(seed)
    r = np.stack([_rodrigues(rng.normal(scale=0.2, size=3)) for _ in range(b)])
    t = rng.normal(scale=0.1, size=(b, 3))
    p2 = rng.uniform(-1, 1, (n, 3))
    p1 = p2 @ r[0].T + t[0] + rng.normal(scale=0.01, size=(n, 3))
    valid = rng.uniform(size=n) > 0.2
    return (
        jnp.asarray(r, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
        jnp.asarray(valid),
    )


def test_pallas_matches_xla():
    r, t, p1, p2, valid = make_problem()
    thr = jnp.asarray(0.01)
    s_ref, e_ref = score_hypotheses_xla(r, t, p1, p2, valid, thr)
    s_pal, e_pal = score_hypotheses_pallas(
        r, t, p1, p2, valid, thr, tile_b=32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(s_pal), np.asarray(s_ref))
    np.testing.assert_allclose(np.asarray(e_pal), np.asarray(e_ref),
                               atol=1e-5)


def test_hypothesis_zero_wins():
    """Hypothesis 0 is the true motion → must have max support."""
    r, t, p1, p2, valid = make_problem(seed=1)
    thr = jnp.asarray(0.01)
    s, e = score_hypotheses_pallas(r, t, p1, p2, valid, thr, tile_b=32,
                                   interpret=True)
    assert int(jnp.argmax(s)) == 0


def test_all_invalid():
    r, t, p1, p2, _ = make_problem(seed=2)
    s, e = score_hypotheses_pallas(
        r, t, p1, p2, jnp.zeros(p1.shape[0], bool), jnp.asarray(0.01),
        tile_b=32, interpret=True,
    )
    assert int(jnp.sum(s)) == 0
