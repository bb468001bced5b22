"""Data layer tests: .dat parsing (numpy and native C++ paths agree),
synthetic renderer consistency."""

import os
import tempfile

import numpy as np
import pytest

from pre3_tpu.data.sr4000 import (
    Frame, H, W, depth_valid_mask, list_sequence, parse_dat, read_frame,
)
from pre3_tpu.data.native_loader import (
    native_available, read_frame_native, read_sequence_native,
)


def synth_dat(seed=0):
    """Construct a raw [721, 176] value matrix in the reference layout."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(0.5, 4.0, (H, W))
    x = rng.uniform(-1, 1, (H, W))
    y = rng.uniform(-1, 1, (H, W))
    inten = rng.uniform(0, 40000, (H, W))
    inten[0, 0] = 66000.0  # artifact to clamp
    conf = rng.uniform(0, 100, (H, W))
    ts = np.zeros((1, W))
    ts[0, 0] = 12345.0  # ms
    return np.concatenate([z, x, y, inten, conf, ts], axis=0)


def write_dat(path, raw):
    np.savetxt(path, raw, fmt="%.6f")


class TestParse:
    def test_layout_and_flip(self):
        raw = synth_dat()
        fr = parse_dat(raw, smooth=False)
        np.testing.assert_allclose(fr.xyz[..., 0], -raw[H : 2 * H], atol=1e-6)
        np.testing.assert_allclose(
            fr.xyz[..., 1], -raw[2 * H : 3 * H], atol=1e-6
        )
        np.testing.assert_allclose(fr.xyz[..., 2], raw[0:H], atol=1e-6)
        assert fr.timestamp == pytest.approx(12.345)
        assert fr.intensity.max() <= 1.0
        # the 66000 artifact must not dominate normalization
        assert fr.intensity[0, 0] == 0.0

    def test_depth_valid_mask(self):
        raw = synth_dat()
        fr = parse_dat(raw, smooth=False)
        m = depth_valid_mask(fr)
        assert m.dtype == bool and m.shape == (H, W)
        d = np.linalg.norm(fr.xyz, axis=-1)
        assert not np.any(m & (d < 0.4))

    def test_file_roundtrip(self):
        raw = synth_dat(seed=1)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "d1_0001.dat")
            write_dat(p, raw)
            fr = read_frame(p, smooth=False)
        ref = parse_dat(raw, smooth=False)
        np.testing.assert_allclose(fr.xyz, ref.xyz, atol=1e-5)
        np.testing.assert_allclose(fr.intensity, ref.intensity, atol=1e-5)

    def test_list_sequence_ordering(self):
        with tempfile.TemporaryDirectory() as td:
            for i in (3, 1, 10):
                open(os.path.join(td, f"d1_{i:04d}.dat"), "w").close()
            open(os.path.join(td, "other.txt"), "w").close()
            seq = list_sequence(td)
        names = [os.path.basename(p) for p in seq]
        assert names == ["d1_0001.dat", "d1_0003.dat", "d1_0010.dat"]


class TestNativeLoader:
    def test_native_matches_numpy(self):
        if not native_available():
            pytest.skip("native toolchain unavailable")
        raw = synth_dat(seed=2)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "d1_0001.dat")
            write_dat(p, raw)
            nat = read_frame_native(p, smooth=True)
            ref = read_frame(p, smooth=True)
        np.testing.assert_allclose(nat.intensity, ref.intensity, atol=1e-4)
        np.testing.assert_allclose(nat.xyz, ref.xyz, atol=1e-4)
        np.testing.assert_allclose(nat.confidence, ref.confidence, atol=1e-4)
        assert nat.timestamp == pytest.approx(ref.timestamp)

    def test_batch_decode(self):
        if not native_available():
            pytest.skip("native toolchain unavailable")
        with tempfile.TemporaryDirectory() as td:
            paths = []
            for i in range(6):
                p = os.path.join(td, f"d1_{i:04d}.dat")
                write_dat(p, synth_dat(seed=i))
                paths.append(p)
            frames = read_sequence_native(paths, threads=3)
        assert len(frames) == 6
        for i, fr in enumerate(frames):
            ref = parse_dat(synth_dat(seed=i))
            np.testing.assert_allclose(fr.xyz, ref.xyz, atol=1e-4)
