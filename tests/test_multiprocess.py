"""Genuinely multi-process distributed execution (SURVEY §2.4 collective
backend): 2 local CPU `jax.distributed` processes (coordinator on
localhost, Gloo collectives) run `bundle_adjust_sharded` with landmark
shards split ACROSS the process boundary and `sharded_ransac_rigid` over
each process's local devices, via the production `initialize_distributed`
/ `hybrid_mesh` / `globalize_replicated` entry points (tests/mp_worker.py).

Asserts (a) every rank computes identical results — the SPMD program is
deterministic, so cross-process psums must agree — and (b) the
multi-process results match the single-process implementations run
in-process here."""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from pre3_tpu.backend.ba import bundle_adjust
from tests.test_ba import CAM, make_ba_problem
from tests.test_vo import make_rigid_problem

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def ranks(tmp_path_factory):
    """Spawn the N-process distributed run once; yield per-rank results."""
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # workers pick their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(pid), str(N_PROC), str(port), str(tmp / f"rank{pid}.json")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(N_PROC)
    ]
    logs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{log[-3000:]}"
    return [json.load(open(tmp / f"rank{pid}.json")) for pid in range(N_PROC)]


def test_ranks_agree(ranks):
    """Cross-process determinism: the replicated outputs of the sharded
    programs are identical on every rank."""
    a, b = ranks
    np.testing.assert_array_equal(a["ba_kf_t"], b["ba_kf_t"])
    np.testing.assert_array_equal(a["ba_points"], b["ba_points"])
    np.testing.assert_array_equal(a["ransac_r"], b["ransac_r"])
    np.testing.assert_array_equal(a["ransac_t"], b["ransac_t"])
    assert a["ransac_n_inliers"] == b["ransac_n_inliers"]
    # stage pipeline: frame-sharded frontend across processes feeds each
    # rank's backend; trajectories must agree bit-for-bit
    np.testing.assert_array_equal(a["pipeline_t"], b["pipeline_t"])
    assert np.isfinite(np.asarray(a["pipeline_t"])).all()


def test_multiprocess_ba_matches_single_process(ranks):
    prob, (gt_t, _, _) = make_ba_problem(n_kf=4, n_lm=24, seed=21,
                                         t_noise=0.03, p_noise=0.03)
    single = bundle_adjust(CAM, prob, iters=8)
    mp_t = np.asarray(ranks[0]["ba_kf_t"])
    assert ranks[0]["ba_cost_final"] < 1e-3
    np.testing.assert_allclose(mp_t, np.asarray(single.kf_t), atol=1e-3)
    np.testing.assert_allclose(mp_t, np.asarray(gt_t), atol=5e-3)


def test_multiprocess_ransac_recovers_motion(ranks):
    _, _, r_gt, t_gt, _ = make_rigid_problem(
        n=96, noise=0.003, outlier_frac=0.3, seed=11
    )
    assert ranks[0]["ransac_ok"]
    np.testing.assert_allclose(
        np.asarray(ranks[0]["ransac_r"]), r_gt, atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(ranks[0]["ransac_t"]), t_gt, atol=0.02
    )
