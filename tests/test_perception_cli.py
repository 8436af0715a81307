"""Standalone perception CLI (reference yolo_opencv.py file/stream modes)."""
from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mere_fusion_tpu.perception.__main__ import iter_frames, main  # noqa: E402


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        cv2.imwrite(str(tmp_path / f"f{i:03d}.png"),
                    rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    return tmp_path


def test_iter_frames_image_dir_with_start_and_limit(image_dir):
    frames = list(iter_frames(str(image_dir), framestart=2, framelimit=3))
    assert len(frames) == 3
    assert frames[0].shape == (48, 64, 3)


def test_iter_frames_video_file(tmp_path):
    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (64, 48))
    if not w.isOpened():
        pytest.skip("no MJPG encoder in this cv2 build")
    rng = np.random.default_rng(1)
    for _ in range(8):
        w.write(rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    w.release()
    frames = list(iter_frames(path, framelimit=5))
    assert len(frames) == 5


def test_cli_stub_backend_prints_summaries(image_dir, capsys):
    main([str(image_dir), "--backend", "stub", "--fpsthrottle", "2"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("frame ")]
    assert len(lines) == 3  # 6 frames / throttle 2
    assert "scene" in lines[0]


def test_rtp_mode_gated_without_ffmpeg(monkeypatch):
    import shutil

    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        list(iter_frames("rtp://0.0.0.0:19292"))


def test_parse_perception_spec():
    from mere_fusion_tpu.perception import parse_perception_spec

    assert parse_perception_spec("") is None
    assert parse_perception_spec("random") == "random"
    assert parse_perception_spec("craft=a.pth,crnn=b.pth") == {
        "craft": "a.pth", "crnn": "b.pth"}
    with pytest.raises(ValueError, match="key=path"):
        parse_perception_spec("justapath.pth")
    with pytest.raises(ValueError, match="key=path"):
        parse_perception_spec("craft=,crnn=b")


def test_cli_specs_reach_the_backend(image_dir, monkeypatch):
    """--face-attrs/--ocr strings arrive parsed at TPUYoloPerception."""
    import mere_fusion_tpu.perception as P

    seen = {}

    class FakePerception:
        def __init__(self, **kw):
            seen.update(kw)

        def process_frame(self, frame):
            return None

    monkeypatch.setattr(P, "TPUYoloPerception", FakePerception)
    main([str(image_dir), "--backend", "yolo-tpu", "--face-attrs", "random",
          "--ocr", "craft=a.pth,crnn=b.pth", "--framelimit", "1"])
    assert seen["face_attrs"] == "random"
    assert seen["ocr"] == {"craft": "a.pth", "crnn": "b.pth"}


def test_server_cli_maps_perception_specs():
    from mere_fusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--perception", "yolo-tpu", "--face_attrs", "random",
         "--ocr", "craft=a.pth,crnn=b.pth"])
    cfg = config_from_args(args)
    assert cfg.perception.face_attrs == "random"
    assert cfg.perception.ocr == "craft=a.pth,crnn=b.pth"
