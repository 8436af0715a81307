import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.s3fd import FaceDetector, S3FD, decode_detections, nms
from mere_fusion_tpu.utils.torch_convert import convert_s3fd

REFERENCE = "/root/reference"


def test_forward_shapes():
    model = S3FD()
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 6
    cls0, reg0 = outs[0]
    assert cls0.shape == (1, 32, 32, 2) and reg0.shape == (1, 32, 32, 4)
    dets = decode_detections(outs)
    total = sum(c.shape[1] * c.shape[2] for c, _ in outs)
    assert dets.shape == (1, total, 5)


def test_nms_suppresses_overlaps():
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]],
        np.float32,
    )
    keep = nms(dets, 0.3)
    assert keep == [0, 2]


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REFERENCE, "wav2lip"))
    try:
        from face_detection.detection.sfd.net_s3fd import s3fd as TorchS3FD
    finally:
        sys.path.pop(0)

    tmodel = TorchS3FD().eval()
    # the reference initializes L2Norm weights via in-place ops; randomize all
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.02)

    rng = np.random.default_rng(0)
    img = rng.uniform(-120, 130, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    variables = convert_s3fd(tmodel.state_dict())
    got = S3FD().apply(variables, jnp.asarray(img))
    for i, (cls, reg) in enumerate(got):
        np.testing.assert_allclose(
            np.asarray(cls), want[2 * i].numpy().transpose(0, 2, 3, 1), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(reg), want[2 * i + 1].numpy().transpose(0, 2, 3, 1), atol=3e-4
        )


def test_face_detector_random_weights_runs():
    det = FaceDetector()
    imgs = np.full((2, 96, 96, 3), 128, np.uint8)
    results = det.detect_batch(imgs)
    assert len(results) == 2
    for r in results:
        assert r.ndim == 2 and r.shape[1] == 5
