import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.fan import (
    FAN,
    LandmarkDetector,
    crop_face,
    heatmaps_to_landmarks,
    transform_point,
)

REFERENCE = "/root/reference"


def test_forward_shapes():
    model = FAN(num_modules=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16, 16, 68)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REFERENCE, "wav2lip"))
    try:
        from face_detection.models import FAN as TorchFAN
    finally:
        sys.path.pop(0)

    from mere_fusion_tpu.utils.torch_convert import convert_fan

    tmodel = TorchFAN(num_modules=2).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.05)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    variables = convert_fan(tmodel.state_dict())
    got = FAN(num_modules=2).apply(variables, jnp.asarray(img))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )


def test_heatmap_decode_recovers_peak():
    # identity transform: scale such that 200*scale == heatmap res, centered
    h = w = 64
    scale = h / 200.0
    center = (h / 2.0, w / 2.0)
    hm = np.zeros((1, h, w, 68), np.float32)
    true_xy = []
    rng = np.random.default_rng(1)
    for n in range(68):
        x, y = rng.integers(2, w - 2), rng.integers(2, h - 2)
        hm[0, y, x, n] = 1.0
        hm[0, y, x + 1, n] = 0.5  # gradient pulls +0.25 in x
        true_xy.append((x, y))
    pts = heatmaps_to_landmarks(hm, [center], [scale])
    for n, (x, y) in enumerate(true_xy):
        # 1-indexed +1, sub-pixel +0.25 in x, then -0.5; identity maps back
        np.testing.assert_allclose(pts[0, n, 0], x + 0.75, atol=1e-5)
        np.testing.assert_allclose(pts[0, n, 1], y + 0.5, atol=1e-5)


def test_transform_point_roundtrip():
    center, scale, res = (120.0, 90.0), 1.1, 256
    p = transform_point([64, 32], center, scale, res, invert=True)
    q = transform_point(p, center, scale, res, invert=False)
    # truncation-to-int on both legs (face_alignment semantics) costs ≤2 px
    assert abs(q[0] - 64) <= 2 and abs(q[1] - 32) <= 2


def test_crop_face_shape_and_padding():
    img = np.full((100, 80, 3), 200, np.uint8)
    out = crop_face(img, (40.0, 50.0), 0.9, 256)
    assert out.shape == (256, 256, 3)
    # crop window extends past the image → zero padding present
    assert (out == 0).any() and (out > 0).any()


def test_landmark_detector_random_weights_runs(tmp_path):
    det = LandmarkDetector(num_modules=1)
    img = np.full((128, 128, 3), 128, np.uint8)
    res = det.get_landmarks(img)
    for pts in res:
        assert pts.shape == (68, 2)

    # pipeline task: writes .lms files next to frames
    import cv2

    from mere_fusion_tpu.tools import nerf_data

    cv2.imwrite(str(tmp_path / "0.jpg"), img)
    written = nerf_data.landmarks(str(tmp_path), detector=det)
    if written:  # random weights may or may not "detect" a face
        lms = np.loadtxt(written[0])
        assert lms.shape == (68, 2)
