"""End-to-end real-format flow (VERDICT r2 item 6): synthetic sequence →
reference-layout `.dat` files on disk → loader (native C++ when built,
numpy otherwise) → OnlineSlam streaming → keyframes → Schur BA →
asserted ATE. Every byte passes through the real parser path
(read_xyz_sr4000.m:10-12 layout)."""

import numpy as np
import pytest

from pre3_tpu.data.export import export_dat_sequence, frame_to_raw
from pre3_tpu.data.native_loader import read_sequence_native
from pre3_tpu.data.sr4000 import list_sequence, parse_dat
from pre3_tpu.data.synthetic import render_sequence


def test_dat_export_roundtrip():
    frames, _, _ = render_sequence(n_frames=2, n_points=120, noise=0.004)
    fr = frames[0]
    back = parse_dat(frame_to_raw(fr), smooth=False)
    # xyz round-trips exactly (modulo float64→float32); intensity is
    # re-normalized by the per-frame max on load
    np.testing.assert_allclose(
        np.nan_to_num(back.xyz), np.nan_to_num(fr.xyz), atol=1e-5
    )
    scale = np.nanmax(fr.intensity)
    np.testing.assert_allclose(
        back.intensity * scale, fr.intensity, atol=1e-4
    )
    np.testing.assert_allclose(back.confidence, fr.confidence, atol=1e-4)
    assert back.timestamp == pytest.approx(fr.timestamp, abs=1e-4)


@pytest.mark.slow
def test_dat_end_to_end(tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_dat_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "run_dat_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    run = mod.run

    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    ate, ate_ba = run(data_dir, out_dir, n_frames=10)
    assert ate is not None and ate < 0.08, f"e2e .dat ATE {ate}"
    assert ate_ba is not None
    # artifacts written
    import os

    assert os.path.exists(os.path.join(out_dir, "trajectory.npz"))
    assert os.path.exists(os.path.join(out_dir, "trajectory.png"))
    # the dataset on disk is reference-layout
    paths = list_sequence(data_dir)
    assert len(paths) == 10
    fr = read_sequence_native(paths[:1])[0]
    assert fr.intensity.shape == (144, 176)


def test_export_sequence_numbering(tmp_path):
    frames, _, _ = render_sequence(n_frames=3, n_points=120, noise=0.004)
    paths = export_dat_sequence(frames, str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == [
        "d1_0001.dat", "d1_0002.dat", "d1_0003.dat"
    ]
    assert list_sequence(str(tmp_path)) == paths
