"""S3FD face detector in flax (NHWC).

Architecture twin of the reference's VGG-based S3FD
(reference: wav2lip/face_detection/detection/sfd/net_s3fd.py:22-129, also
duplicated under musetalk/utils/face_detection/): six detection scales with
L2Norm-scaled shallow heads and max-out background on the first scale.
Decoding is vectorized over all anchors on device (the reference loops over
positions above threshold on host, sfd/detect.py:32-55); thresholding and
NMS stay on host.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_VGG = (
    ("conv1_1", 64, 1), ("conv1_2", 64, 1), ("pool",),
    ("conv2_1", 128, 1), ("conv2_2", 128, 1), ("pool",),
    ("conv3_1", 256, 1), ("conv3_2", 256, 1), ("conv3_3", 256, 1, "f3_3"), ("pool",),
    ("conv4_1", 512, 1), ("conv4_2", 512, 1), ("conv4_3", 512, 1, "f4_3"), ("pool",),
    ("conv5_1", 512, 1), ("conv5_2", 512, 1), ("conv5_3", 512, 1, "f5_3"), ("pool",),
)


class L2Norm(nn.Module):
    channels: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k: jnp.full((self.channels,), self.scale))
        norm = jnp.sqrt((x**2).sum(axis=-1, keepdims=True)) + 1e-10
        return x / norm * w


class S3FD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] BGR float, mean-subtracted (104, 117, 123).

        Returns [(cls [B,h,w,2], reg [B,h,w,4])] for the 6 scales."""
        conv = lambda c, k, s, p, name: nn.Conv(
            c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            dtype=self.dtype, name=name,
        )
        feats = {}
        h = x.astype(self.dtype)
        for spec in _VGG:
            if spec[0] == "pool":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            name, c, s = spec[0], spec[1], spec[2]
            h = nn.relu(conv(c, 3, s, 1, name)(h))
            if len(spec) > 3:
                feats[spec[3]] = h

        h = nn.relu(conv(1024, 3, 1, 3, "fc6")(h))
        h = nn.relu(conv(1024, 1, 1, 0, "fc7")(h))
        feats["fc7"] = h
        h = nn.relu(conv(256, 1, 1, 0, "conv6_1")(h))
        h = nn.relu(conv(512, 3, 2, 1, "conv6_2")(h))
        feats["f6_2"] = h
        h = nn.relu(conv(128, 1, 1, 0, "conv7_1")(h))
        h = nn.relu(conv(256, 3, 2, 1, "conv7_2")(h))
        feats["f7_2"] = h

        f3 = L2Norm(256, 10.0, name="conv3_3_norm")(feats["f3_3"])
        f4 = L2Norm(512, 8.0, name="conv4_3_norm")(feats["f4_3"])
        f5 = L2Norm(512, 5.0, name="conv5_3_norm")(feats["f5_3"])

        out = []
        heads = [
            (f3, "conv3_3_norm_mbox", 4),
            (f4, "conv4_3_norm_mbox", 2),
            (f5, "conv5_3_norm_mbox", 2),
            (feats["fc7"], "fc7_mbox", 2),
            (feats["f6_2"], "conv6_2_mbox", 2),
            (feats["f7_2"], "conv7_2_mbox", 2),
        ]
        for feat, base, ncls in heads:
            cls = conv(ncls, 3, 1, 1, f"{base}_conf")(feat)
            reg = conv(4, 3, 1, 1, f"{base}_loc")(feat)
            if ncls == 4:  # max-out background (net_s3fd.py:124-127)
                bmax = jnp.max(cls[..., :3], axis=-1, keepdims=True)
                cls = jnp.concatenate([bmax, cls[..., 3:]], axis=-1)
            out.append((cls, reg))
        return out


def decode_detections(outputs, variances=(0.1, 0.2)) -> jnp.ndarray:
    """All-anchor box decode → [B, A, 5] (x1, y1, x2, y2, score)."""
    boxes_all, scores_all = [], []
    for i, (cls, reg) in enumerate(outputs):
        b, fh, fw, _ = cls.shape
        stride = 2 ** (i + 2)
        score = jax.nn.softmax(cls, axis=-1)[..., 1]
        cx = stride / 2 + jnp.arange(fw) * stride
        cy = stride / 2 + jnp.arange(fh) * stride
        prior_xy = jnp.stack(jnp.meshgrid(cx, cy, indexing="xy"), axis=-1)  # [fh,fw,2]
        prior_wh = jnp.full((fh, fw, 2), stride * 4.0)
        xy = prior_xy + reg[..., :2] * variances[0] * prior_wh
        wh = prior_wh * jnp.exp(reg[..., 2:] * variances[1])
        x1y1 = xy - wh / 2
        x2y2 = x1y1 + wh
        boxes = jnp.concatenate([x1y1, x2y2], axis=-1).reshape(b, -1, 4)
        boxes_all.append(boxes)
        scores_all.append(score.reshape(b, -1))
    return jnp.concatenate(
        [jnp.concatenate(boxes_all, 1), jnp.concatenate(scores_all, 1)[..., None]],
        axis=-1,
    )


def nms(dets: np.ndarray, thresh: float = 0.3) -> list[int]:
    """Greedy IoU NMS (reference sfd/bbox.py:44-64)."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


class FaceDetector:
    """Batched face detection: device forward + decode, host filter + NMS."""

    MEAN_BGR = np.array([104.0, 117.0, 123.0], np.float32)

    def __init__(self, variables=None, dtype=jnp.float32):
        self.model = S3FD(dtype=dtype)
        self.variables = variables
        self._fn = None
        self._shape = None

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "FaceDetector":
        from mere_fusion_tpu.utils.torch_convert import (
            convert_s3fd,
            load_torch_checkpoint,
        )

        return cls(variables=convert_s3fd(load_torch_checkpoint(path)), **kw)

    def _compile(self, shape):
        if self.variables is None:
            self.variables = jax.jit(self.model.init)(
                jax.random.key(0), jnp.zeros((1, *shape[1:]), jnp.float32)
            )
        self.variables = jax.device_put(self.variables)
        model, variables = self.model, self.variables

        @jax.jit
        def fn(variables, imgs):
            return decode_detections(model.apply(variables, imgs))

        self._fn = lambda imgs: fn(variables, imgs)
        self._shape = shape

    def detect_batch(self, imgs_bgr: np.ndarray, score_thresh: float = 0.5,
                     nms_thresh: float = 0.3) -> list[np.ndarray]:
        """imgs_bgr: [B, H, W, 3] uint8. Returns per-image [K, 5] arrays."""
        x = imgs_bgr.astype(np.float32) - self.MEAN_BGR
        if self._fn is None or self._shape != x.shape:
            self._compile(x.shape)
        dets = np.asarray(self._fn(jnp.asarray(x)))
        results = []
        for b in range(dets.shape[0]):
            d = dets[b]
            d = d[d[:, 4] > 0.05]
            keep = nms(d, nms_thresh)
            d = d[keep] if keep else np.zeros((0, 5), np.float32)
            results.append(d[d[:, 4] > score_thresh])
        return results
