"""SIFT frontend tests: pyramid properties, detection, descriptor
invariances, and cross-frame matching on rendered scenes.

Mirrors what the reference verifies by hand (test_sift_tracking.m —
descriptor track consistency across frames), plus property tests the
reference lacks.
"""

import jax.numpy as jnp
import numpy as np

from pre3_tpu.data.synthetic import make_scene, make_trajectory, render_frame
from pre3_tpu.frontend.scalespace import build_pyramid, gaussian_blur
from pre3_tpu.frontend.sift import extract_sift
from pre3_tpu.ops.matching import match_descriptors


def blob_image(h=96, w=128, centers=((40, 50, 3.0), (70, 90, 5.0)), amp=1.0):
    """Gaussian blobs — DoG extrema at known positions/scales."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for cy, cx, s in centers:
        img += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return jnp.asarray(img.astype(np.float32))


class TestScaleSpace:
    def test_blur_preserves_mean(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(64, 64)).astype(np.float32))
        out = gaussian_blur(img, 2.0)
        # interior mean is preserved (edges clamp to zero padding)
        np.testing.assert_allclose(
            float(jnp.mean(out[8:-8, 8:-8])),
            float(jnp.mean(img[8:-8, 8:-8])),
            atol=0.02,
        )

    def test_pyramid_shapes(self):
        img = blob_image()
        octs = build_pyramid(img, n_octaves=3, s_levels=3)
        assert len(octs) == 3
        assert octs[0].gss.shape == (6, 96, 128)
        assert octs[0].dog.shape == (5, 96, 128)
        assert octs[1].gss.shape == (6, 48, 64)
        assert octs[2].gss.shape == (6, 24, 32)

    def test_dog_energy_decreases_with_smoothing(self):
        img = blob_image()
        octs = build_pyramid(img, n_octaves=1)
        # successive gss levels are progressively smoother
        tv = [float(jnp.abs(jnp.diff(octs[0].gss[s], axis=0)).sum())
              for s in range(6)]
        assert all(tv[i] >= tv[i + 1] for i in range(5))


class TestSiftDetect:
    def test_blob_detected_at_location(self):
        img = blob_image(centers=((48, 64, 2.5),))
        f = extract_sift(img, n_octaves=2, keypoints_per_octave=16)
        uv = np.asarray(f.uv[np.asarray(f.valid)])
        assert len(uv) >= 1
        d = np.linalg.norm(uv - np.array([64, 48]), axis=-1)
        assert d.min() < 2.0

    def test_scale_estimate_tracks_blob_size(self):
        small = extract_sift(blob_image(centers=((48, 64, 2.0),)),
                             n_octaves=3, keypoints_per_octave=8)
        large = extract_sift(blob_image(centers=((48, 64, 6.0),)),
                            n_octaves=3, keypoints_per_octave=8)

        def best_scale(f, target):
            uv = np.asarray(f.uv)
            ok = np.asarray(f.valid)
            d = np.linalg.norm(uv - np.array(target), axis=-1)
            d[~ok] = 1e9
            return float(np.asarray(f.scale)[np.argmin(d)])

        s_small = best_scale(small, [64, 48])
        s_large = best_scale(large, [64, 48])
        assert s_large > s_small

    def test_flat_image_no_keypoints(self):
        f = extract_sift(jnp.full((96, 128), 0.5), keypoints_per_octave=8)
        assert int(f.valid.sum()) == 0


class TestSiftDescriptor:
    def test_descriptor_normalized(self):
        scene = make_scene(n_points=60, seed=0)
        traj = make_trajectory(1, seed=1)
        fr = render_frame(scene, traj.t[0], traj.r[0], 0.0, noise=0.003)
        f = extract_sift(jnp.asarray(fr.intensity), keypoints_per_octave=64)
        ok = np.asarray(f.valid)
        norms = np.linalg.norm(np.asarray(f.desc)[ok], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_cross_frame_matching(self):
        """Descriptors of the same landmarks in consecutive frames match
        (the test_sift_tracking.m scenario, with ground truth)."""
        scene = make_scene(n_points=150, seed=2)
        traj = make_trajectory(2, seed=3)
        fr0 = render_frame(scene, traj.t[0], traj.r[0], 0.0, noise=0.003)
        fr1 = render_frame(scene, traj.t[1], traj.r[1], 0.1, noise=0.003,
                           seed=7)
        f0 = extract_sift(jnp.asarray(fr0.intensity), keypoints_per_octave=96)
        f1 = extract_sift(jnp.asarray(fr1.intensity), keypoints_per_octave=96)
        m = match_descriptors(f0.desc, f1.desc, valid1=f0.valid,
                              valid2=f1.valid, ratio=1.3)
        acc = np.asarray(m.accepted)
        assert acc.sum() >= 30, f"only {acc.sum()} SIFT matches"
        # matched pixel displacement must be small (small camera motion)
        uv0 = np.asarray(f0.uv)[acc]
        uv1 = np.asarray(f1.uv)[np.asarray(m.index)[acc]]
        disp = np.linalg.norm(uv0 - uv1, axis=-1)
        assert np.median(disp) < 10.0

    def test_rotation_invariance_with_orientation(self):
        """With upright=False, descriptors match across a 90° image
        rotation (the rotation invariance the reference's orientation
        assignment provides)."""
        scene = make_scene(n_points=120, seed=4)
        traj = make_trajectory(1, seed=5)
        fr = render_frame(scene, traj.t[0], traj.r[0], 0.0, noise=0.002)
        img = jnp.asarray(fr.intensity)
        rot = jnp.rot90(img)
        f0 = extract_sift(img, keypoints_per_octave=96, upright=False)
        f1 = extract_sift(rot, keypoints_per_octave=96, upright=False)
        m = match_descriptors(f0.desc, f1.desc, valid1=f0.valid,
                              valid2=f1.valid, ratio=1.3)
        acc = np.asarray(m.accepted)
        assert acc.sum() >= 10, f"only {acc.sum()} rotated matches"
        # verify geometric consistency: rot90 maps (u, v) → (v, W-1-u)
        h, w = img.shape
        uv0 = np.asarray(f0.uv)[acc]
        uv1 = np.asarray(f1.uv)[np.asarray(m.index)[acc]]
        expect = np.stack([uv0[:, 1], w - 1 - uv0[:, 0]], axis=-1)
        d = np.linalg.norm(uv1 - expect, axis=-1)
        assert np.median(d) < 3.0
