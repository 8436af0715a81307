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
