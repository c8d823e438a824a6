"""On-disk dataset fixtures: tiny fake EuRoC / TUM / KITTI trees with
the reference's exact layouts (reference: src/DataSetUtil.cc,
README.md:100-135), so the real-format loaders and the CLI dataset-
config resolution are exercised without the real datasets — the first
run on real hardware should need zero code changes."""
import os
import types

import numpy as np
import pytest

from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import DatasetConfig, Settings

cv2 = pytest.importorskip("cv2")

HW = (120, 160)
N_FRAMES = 5


@pytest.fixture(scope="module")
def frames():
    w = datasets.make_world(n_points=120, n_frames=N_FRAMES, hw=HW, seed=3)
    return [datasets.render_frame(w, i) for i in range(N_FRAMES)]


def _euroc_tree(root, frames):
    """EuRoC: cam dir of <ns>.png + nanosecond-stamp times file."""
    cam = root / "mav0" / "cam0" / "data"
    cam.mkdir(parents=True)
    stamps_ns = [1403636579763555584 + int(5e7) * i for i in range(len(frames))]
    for ns, img in zip(stamps_ns, frames):
        cv2.imwrite(str(cam / f"{ns}.png"), img)
    times = root / "times.txt"
    times.write_text("\n".join(str(ns) for ns in stamps_ns) + "\n")
    return cam, times, stamps_ns


def _tum_tree(root, frames):
    """TUM: dataset dir with rgb.txt / depth.txt ('ts path' lines)."""
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines = ["# color images"]
    depth_lines = ["# depth maps"]
    for i, img in enumerate(frames):
        ts = 1311868164.363181 + 0.033 * i
        cv2.imwrite(str(root / "rgb" / f"{ts:.6f}.png"), img)
        depth = np.full(img.shape, 5000 + 100 * i, np.uint16)  # ~1 m
        # depth stamps slightly offset, as in the real dataset
        dts = ts + 0.011
        cv2.imwrite(str(root / "depth" / f"{dts:.6f}.png"), depth)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{dts:.6f} depth/{dts:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")


def _kitti_tree(root, frames):
    """KITTI: sequence dir with times.txt + image_0/%06d.png (+image_1)."""
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    for i, img in enumerate(frames):
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"), img)
        cv2.imwrite(str(root / "image_1" / f"{i:06d}.png"), img)
    (root / "times.txt").write_text(
        "\n".join(f"{0.1 * i:.6e}" for i in range(len(frames))) + "\n")


def test_euroc_fixture_loader(tmp_path, frames):
    cam, times, stamps_ns = _euroc_tree(tmp_path, frames)
    # with TIMES file (the reference's config/mh123.yaml carries TIMES)
    seq = datasets.load_euroc(str(cam), str(times))
    assert len(seq) == N_FRAMES
    np.testing.assert_allclose(seq.timestamps,
                               np.asarray(stamps_ns) / 1e9, rtol=1e-9)
    np.testing.assert_array_equal(seq.read(0), frames[0])
    # without TIMES: stamps from the filenames
    seq2 = datasets.load_euroc(str(cam))
    assert len(seq2) == N_FRAMES
    np.testing.assert_allclose(seq2.timestamps, seq.timestamps)


def test_tum_fixture_loader(tmp_path, frames):
    _tum_tree(tmp_path, frames)
    seq = datasets.load_tum(str(tmp_path))
    assert len(seq) == N_FRAMES
    np.testing.assert_array_equal(seq.read(2), frames[2])
    # rgbd mode: nearest-timestamp association + depth scaling
    seqd = datasets.load_tum(str(tmp_path), with_depth=True)
    assert len(seqd) == N_FRAMES
    d = seqd.read_depth(0)
    assert d.shape == HW
    np.testing.assert_allclose(d, 1.0, atol=0.01)


def test_kitti_fixture_loader(tmp_path, frames):
    _kitti_tree(tmp_path, frames)
    seq = datasets.load_kitti(str(tmp_path))
    assert len(seq) == N_FRAMES
    assert abs(seq.timestamps[3] - 0.3) < 1e-6
    np.testing.assert_array_equal(seq.read(1), frames[1])
    seq2 = datasets.load_kitti(str(tmp_path), with_right=True)
    np.testing.assert_array_equal(seq2.read_right(4), frames[4])


def _write_settings(path):
    path.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 115.0\nCamera.fy: 115.0\n"
        "Camera.cx: 80.0\nCamera.cy: 60.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "Camera.fps: 20.0\nCamera.width: 160\nCamera.height: 120\n"
        "ORBextractor.nFeatures: 200\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 2\n"
        "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n"
    )


def test_dataset_config_resolution(tmp_path, frames, monkeypatch):
    """The CLI path: a dataset config yaml (TYPE/SETTING/IMAGES/TIMES,
    resolved against $SWARMMAP_DATA) through cli.common.load_world."""
    from swarmmap_tpu.cli import common

    data = tmp_path / "data"
    cam, times, _ = _euroc_tree(data / "euroc_seq", frames)
    _write_settings(tmp_path / "mini.yaml")
    cfg = tmp_path / "ds.yaml"
    cfg.write_text(
        "%YAML:1.0\n"
        "TYPE: 'euroc'\n"
        f"SETTING: '{tmp_path / 'mini.yaml'}'\n"
        f"IMAGES: ['/{cam.relative_to(data)}']\n"
        f"TIMES: ['/{times.relative_to(data)}']\n"
        "HOST: '127.0.0.1'\nPORT: 2327\n"
    )
    monkeypatch.setenv("SWARMMAP_DATA", str(data))
    dc = DatasetConfig.load(str(cfg))
    assert dc.type == "euroc" and dc.port == 2327
    settings = Settings.load(dc.setting)
    assert abs(settings.camera.fx - 115.0) < 1e-6
    assert settings.orb.n_features == 200
    args = types.SimpleNamespace(synthetic=False, dataset=str(cfg),
                                 frames=0, features=0, log="warning")
    got_settings, seqs = common.load_world(args, 1)
    assert len(seqs) == 1 and len(seqs[0]) == N_FRAMES
    assert abs(got_settings.camera.fx - 115.0) < 1e-6


def test_mono_cli_on_fixture(tmp_path, frames, monkeypatch):
    """End-to-end CLI smoke on an on-disk TUM tree: config resolution,
    loader, extraction, and trajectory output run without error (5
    frames won't initialize a monocular map — that's fine)."""
    from swarmmap_tpu.cli import mono

    data = tmp_path / "data"
    tum = data / "fr_mini"
    _tum_tree(tum, frames)
    _write_settings(tmp_path / "mini.yaml")
    cfg = tmp_path / "ds.yaml"
    cfg.write_text(
        "%YAML:1.0\nTYPE: 'tum'\n"
        f"SETTING: '{tmp_path / 'mini.yaml'}'\n"
        "IMAGES: ['/fr_mini']\n"
    )
    monkeypatch.setenv("SWARMMAP_DATA", str(data))
    out = tmp_path / "out"
    mono.main(["-d", str(cfg), "-o", str(out), "-l", "warning"])
    assert (out / "KeyFrameTrajectory.txt").exists()
    assert (out / "FrameTrajectory.txt").exists()
