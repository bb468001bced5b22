"""Disk-cache tiers (SURVEY §5 tiers 1-2) + offline keyframe driver tests
(SR4000_key_frame_selection.m pass with VO-vs-last-keyframe semantics)."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.backend.keyframes import (
    export_keyframe_dataset, find_keyframes_vo,
)
from pre3_tpu.data.synthetic import render_sequence
from pre3_tpu.frontend.pipeline import extract_features
from pre3_tpu.utils.cache import FeatureCache, VoCache


def _feats(n_frames=6, step_t=0.03):
    frames, traj, scene = render_sequence(
        n_frames=n_frames, n_points=300, noise=0.003, step_t=step_t
    )
    out = [
        extract_features(
            jnp.asarray(f.intensity),
            jnp.asarray(np.nan_to_num(f.xyz)),
            jnp.asarray(f.confidence),
            threshold=0.05, max_features=192,
        )
        for f in frames
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *out)


def test_feature_cache_roundtrip():
    feats = _feats(n_frames=2)
    f0 = jax.tree.map(lambda x: x[0], feats)
    calls = []
    with tempfile.TemporaryDirectory() as d:
        cache = FeatureCache(d)
        a = cache.get(0, lambda: (calls.append(1), f0)[1])
        b = cache.get(0, lambda: (calls.append(1), f0)[1])
        assert len(calls) == 1  # second get is a disk hit
        for fld in f0._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld))
            )


def test_vo_cache_and_offline_keyframes():
    feats = _feats(n_frames=6, step_t=0.035)
    with tempfile.TemporaryDirectory() as d:
        cache = VoCache(d)
        res = find_keyframes_vo(
            feats, jax.random.PRNGKey(0),
            rot_thresh_deg=4.0, trans_thresh_m=0.05, vo_cache=cache,
            batch=256,
        )
        # 0.035 m/frame ⇒ threshold crossed roughly every 2 frames
        assert res.indices[0] == 0
        assert len(res.indices) >= 2
        assert all(np.diff(res.indices) >= 1)
        # accepted increments must each cross a threshold
        for k in range(1, len(res.indices)):
            dist = np.linalg.norm(res.delta_t[k])
            assert dist >= 0.05 - 1e-3 or dist == 0.0
        # cache makes the second pass pure disk hits (resume semantics)
        n_files = len(os.listdir(cache.dir))
        assert n_files == res.n_vo_calls
        res2 = find_keyframes_vo(
            feats, jax.random.PRNGKey(0),
            rot_thresh_deg=4.0, trans_thresh_m=0.05,
            vo_cache=VoCache(d), batch=256,
        )
        np.testing.assert_array_equal(res.indices, res2.indices)

        # export: renumbered features + manifest
        out = os.path.join(d, "KeyFrames")
        export_keyframe_dataset(res.indices, out, feats=feats, deltas=res)
        with open(os.path.join(out, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["original_indices"] == [int(i) for i in res.indices]
        assert os.path.exists(os.path.join(out, "features_0001.npz"))
        with np.load(os.path.join(
                out, f"features_{len(res.indices):04d}.npz")) as z:
            np.testing.assert_array_equal(
                z["uv"], np.asarray(feats.uv[res.indices[-1]])
            )


def test_fast_arc_variants():
    """FAST-10/11/12 accept subsets of what FAST-9 accepts (longer arc ⇒
    stricter test), mirroring fast_corner_detect_{9..12}.m."""
    from pre3_tpu.frontend.fast import fast_score_map

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (48, 64)).astype(np.float32))
    n_prev = None
    for arc in (9, 10, 11, 12):
        score = fast_score_map(img, threshold=0.08, arc=arc)
        n = int(jnp.sum(score > 0))
        if n_prev is not None:
            assert n <= n_prev
        n_prev = n
    assert n_prev is not None
