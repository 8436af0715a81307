import os

import numpy as np
import pytest

from mere_fusion_tpu.engines.avatar import load_lip_avatar
from mere_fusion_tpu.engines.muse import MuseModels, load_muse_avatar
from mere_fusion_tpu.tools.genavatar import (
    FixedBoxDetector,
    create_lip_avatar,
    create_muse_avatar,
    smooth_boxes,
)
from tests.test_musetalk import TINY_UNET, TINY_VAE


def synth_frames(n=5, h=120, w=160):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8)
            for _ in range(n)]


def test_smooth_boxes_window():
    boxes = np.asarray([[0, 10, 0, 10]] * 3 + [[10, 20, 10, 20]] * 3)
    sm = smooth_boxes(boxes, T=3)
    assert sm[0][0] == pytest.approx(boxes[:3, 0].mean())


def test_lip_avatar_roundtrip(tmp_path):
    frames = synth_frames()
    det = FixedBoxDetector((40, 30, 120, 100))
    out = create_lip_avatar(frames, str(tmp_path / "av1"), det)
    avatar = load_lip_avatar(out, face_size=96)
    assert len(avatar) == 5
    assert avatar.face_cycle[0].shape == (96, 96, 3)
    y1, y2, x1, x2 = avatar.coords[0]
    assert y2 > y1 and x2 > x1


def test_muse_avatar_roundtrip(tmp_path):
    frames = synth_frames()
    det = FixedBoxDetector((40, 30, 104, 94))
    models = MuseModels(TINY_VAE, TINY_UNET, face_size=64)
    out = create_muse_avatar(frames, str(tmp_path / "av2"), det, models)
    avatar = load_muse_avatar(out)
    assert len(avatar) == 5
    assert avatar.latent_cycle.shape == (5, 32, 32, 8)
    assert avatar.mask_cycle[0].ndim == 3
    x1, y1, x2, y2 = avatar.coords[0]
    xs, ys, xe, ye = avatar.mask_coords[0]
    assert xs <= x1 and ys <= y1 and xe >= x2 and ye >= y2


def test_get_landmark_and_bbox_fusion():
    """Landmark-refined boxes match the reference formula
    (musetalk/utils/preprocessing.py:113-132); degenerate landmark boxes
    fall back to the detector bbox."""
    from mere_fusion_tpu.tools.genavatar import get_landmark_and_bbox

    H = W = 100
    frames = [np.full((H, W, 3), 128, np.uint8)]

    class StubDet:
        def detect_batch(self, imgs, **kw):
            # asymmetric box so (x, y) order mistakes can't cancel out
            return [np.array([[20, 10, 80, 90, 0.99]], np.float32)
                    for _ in imgs]

    class StubLms:
        def __init__(self, lm):
            self.lm = lm

        def landmarks_from_boxes(self, img, boxes):
            return [self.lm for _ in boxes]

    lm = np.zeros((68, 2), np.float32)
    lm[:, 0] = np.linspace(25, 75, 68)          # x range 25..75
    lm[:, 1] = np.linspace(30, 90, 68)          # y max 90
    lm[28] = [50, 40]
    lm[29] = [50, 50]
    lm[30] = [50, 57]
    coords = get_landmark_and_bbox(frames, StubDet(), StubLms(lm))
    # half_face y=50, dist = 90-50 = 40 → upper_bond 10
    assert coords == [(25, 10, 75, 90)]

    # bbox_shift moves the half-face anchor down
    coords = get_landmark_and_bbox(frames, StubDet(), StubLms(lm),
                                   upperbondrange=10)
    # half_face y=60, dist=30 → upper 30
    assert coords == [(25, 30, 75, 90)]

    # degenerate (x1<0) → detector bbox fallback
    bad = lm.copy()
    bad[:, 0] = np.linspace(-5, 75, 68)
    coords = get_landmark_and_bbox(frames, StubDet(), StubLms(bad))
    assert coords == [(20, 10, 80, 90)]

    # no landmark detector → raw boxes pass through (x1, y1, x2, y2)
    coords = get_landmark_and_bbox(frames, StubDet(), None)
    assert coords == [(20, 10, 80, 90)]


def test_genavatar_cli_wav2lip(tmp_path):
    """The avatar-prep CLI builds a wav2lip bundle from a synthetic video."""
    import cv2

    from mere_fusion_tpu.tools import genavatar

    video = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    for _ in range(4):
        w.write(np.full((64, 64, 3), 128, np.uint8))
    w.release()

    out = str(tmp_path / "avatar")
    # patch in a deterministic detector (random S3FD finds nothing useful)
    orig = genavatar.FaceDetector if hasattr(genavatar, "FaceDetector") else None
    import mere_fusion_tpu.models.s3fd as s3fd_mod

    class Fixed(s3fd_mod.FaceDetector):
        def __init__(self, *a, **kw):
            pass

        def detect_batch(self, imgs, **kw):
            return [np.array([[10, 10, 50, 50, 0.9]], np.float32)
                    for _ in imgs]

    real = s3fd_mod.FaceDetector
    s3fd_mod.FaceDetector = Fixed
    try:
        genavatar.main([video, "--kind", "wav2lip", "--out", out])
    finally:
        s3fd_mod.FaceDetector = real
    assert os.path.exists(os.path.join(out, "coords.pkl"))
    assert os.path.exists(os.path.join(out, "face_imgs", "0.png"))
