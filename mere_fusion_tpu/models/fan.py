"""FAN (Face Alignment Network) 68-point landmark detector in flax (NHWC).

Architecture twin of the stacked-hourglass landmark net the reference uses
for data prep: the ``face_alignment`` package's 2DFAN-4 invoked by
`ernerf/data_utils/process.py:46-60` (task 7), whose module definition is
vendored in the reference at `wav2lip/face_detection/models.py:13-200`
(ConvBlock/HourGlass/FAN). The crop / heatmap-decode math replicates
face_alignment's ``transform`` / ``crop`` / ``get_preds_fromhm``
(vendored flavor: `wav2lip/face_detection/utils.py:57-140`).

Pipeline (``LandmarkDetector``): S3FD box -> center/scale -> 256x256 crop
-> FAN heatmaps (64x64x68) -> sub-pixel argmax decode -> original-image
coordinates. The FAN forward is a single jitted NHWC conv stack — batches
of crops go through the MXU in one dispatch.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBlock(nn.Module):
    """Three-branch dense conv block (reference models.py:13-55): outputs
    concat([out/2, out/4, out/4]) + (1x1-projected) residual, pre-activation
    BN-ReLU ordering."""

    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9,
            dtype=self.dtype, name=name,
        )
        conv = lambda c, name: nn.Conv(
            c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name=name,
        )
        out1 = conv(self.out_planes // 2, "conv1")(nn.relu(bn("bn1")(x)))
        out2 = conv(self.out_planes // 4, "conv2")(nn.relu(bn("bn2")(out1)))
        out3 = conv(self.out_planes // 4, "conv3")(nn.relu(bn("bn3")(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        residual = x
        if x.shape[-1] != self.out_planes:
            residual = nn.Conv(
                self.out_planes, (1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(nn.relu(bn("downsample_bn")(x)))
        return out + residual


class HourGlass(nn.Module):
    """Recursive hourglass (reference models.py:97-141): avg-pool down,
    ConvBlocks at every level, nearest x2 up, skip add."""

    depth: int = 4
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def rec(level, inp):
            up1 = ConvBlock(self.features, self.dtype, name=f"b1_{level}")(inp)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(self.features, self.dtype, name=f"b2_{level}")(low1)
            if level > 1:
                low2 = rec(level - 1, low1)
            else:
                low2 = ConvBlock(
                    self.features, self.dtype, name=f"b2_plus_{level}"
                )(low1)
            low3 = ConvBlock(self.features, self.dtype, name=f"b3_{level}")(low2)
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return rec(self.depth, x)


class FAN(nn.Module):
    """Stacked-hourglass landmark net (reference models.py:144-200).

    Input [B, H, W, 3] in [0, 1]; returns a list of num_modules heatmap
    tensors [B, H/4, W/4, 68] — the last one is used for decoding.
    """

    num_modules: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9,
            dtype=self.dtype, name=name,
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = ConvBlock(128, self.dtype, name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, self.dtype, name="conv3")(x)
        x = ConvBlock(256, self.dtype, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(4, 256, self.dtype, name=f"m{i}")(previous)
            ll = ConvBlock(256, self.dtype, name=f"top_m_{i}")(hg)
            ll = nn.relu(bn(f"bn_end{i}")(
                nn.Conv(256, (1, 1), dtype=self.dtype, name=f"conv_last{i}")(ll)
            ))
            tmp_out = nn.Conv(68, (1, 1), dtype=self.dtype, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), dtype=self.dtype, name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), dtype=self.dtype,
                                   name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


# ---------------------------------------------------------------------------
# face_alignment geometry (crop + heatmap decode), host-side numpy
# ---------------------------------------------------------------------------

def transform_point(point, center, scale, resolution, invert=False):
    """face_alignment's affine point transform (vendored at reference
    wav2lip/face_detection/utils.py:57-91), including its trailing
    truncation-to-int semantics."""
    h = 200.0 * scale
    t = np.eye(3)
    t[0, 0] = resolution / h
    t[1, 1] = resolution / h
    t[0, 2] = resolution * (-center[0] / h + 0.5)
    t[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        t = np.linalg.inv(t)
    pt = t @ np.array([point[0], point[1], 1.0])
    return pt[:2].astype(np.int64)


def crop_face(image: np.ndarray, center, scale, resolution: int = 256):
    """Center crop + resize, reference utils.py:94-140 semantics (1-indexed
    box arithmetic, zero padding outside the frame, bilinear resize)."""
    import cv2

    ul = transform_point([1, 1], center, scale, resolution, invert=True)
    br = transform_point([resolution, resolution], center, scale, resolution,
                         invert=True)
    if image.ndim > 2:
        new_img = np.zeros((br[1] - ul[1], br[0] - ul[0], image.shape[2]),
                           dtype=np.uint8)
    else:
        new_img = np.zeros((br[1] - ul[1], br[0] - ul[0]), dtype=np.uint8)
    ht, wd = image.shape[0], image.shape[1]
    new_x = [max(1, -ul[0] + 1), min(br[0], wd) - ul[0]]
    new_y = [max(1, -ul[1] + 1), min(br[1], ht) - ul[1]]
    old_x = [max(1, ul[0] + 1), min(br[0], wd)]
    old_y = [max(1, ul[1] + 1), min(br[1], ht)]
    new_img[new_y[0] - 1:new_y[1], new_x[0] - 1:new_x[1]] = \
        image[old_y[0] - 1:old_y[1], old_x[0] - 1:old_x[1]]
    return cv2.resize(new_img, (resolution, resolution),
                      interpolation=cv2.INTER_LINEAR)


def heatmaps_to_landmarks(hm: np.ndarray, centers, scales) -> np.ndarray:
    """Vectorized get_preds_fromhm (reference utils.py get_preds_fromhm):
    per-map argmax (1-indexed), quarter-pixel shift toward the larger
    neighbor, -0.5, then inverse-transform to original image coordinates.

    hm: [B, H, W, N] (NHWC); centers [B, 2]; scales [B]. Returns [B, N, 2]
    float pixel coordinates in the original image.
    """
    b, h, w, n = hm.shape
    maps = np.transpose(hm, (0, 3, 1, 2))  # [B, N, H, W]
    flat = maps.reshape(b, n, h * w)
    idx = flat.argmax(-1)
    px = (idx % w).astype(np.int64)
    py = (idx // w).astype(np.int64)
    preds = np.stack([px, py], -1).astype(np.float64) + 1.0  # 1-indexed

    inner = (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
    pxc = np.clip(px, 1, w - 2)
    pyc = np.clip(py, 1, h - 2)
    bi = np.arange(b)[:, None]
    ni = np.arange(n)[None, :]
    dx = maps[bi, ni, pyc, pxc + 1] - maps[bi, ni, pyc, pxc - 1]
    dy = maps[bi, ni, pyc + 1, pxc] - maps[bi, ni, pyc - 1, pxc]
    preds[..., 0] += np.sign(dx) * 0.25 * inner
    preds[..., 1] += np.sign(dy) * 0.25 * inner
    preds -= 0.5

    # inverse transform: x_orig = x * h200/res + center - h200/2
    out = np.empty_like(preds)
    for i in range(b):
        h200 = 200.0 * scales[i]
        out[i, :, 0] = preds[i, :, 0] * h200 / h + centers[i][0] - h200 / 2
        out[i, :, 1] = preds[i, :, 1] * h200 / h + centers[i][1] - h200 / 2
    return out


class LandmarkDetector:
    """face_alignment.FaceAlignment(_2D) equivalent: S3FD detect ->
    center/scale (reference_scale 195, 12% upward center shift) -> 256 crop
    -> FAN -> 68 landmarks in image coordinates."""

    RESOLUTION = 256
    REFERENCE_SCALE = 195.0

    def __init__(self, fan_variables=None, face_detector=None,
                 num_modules: int = 4, dtype: Any = jnp.float32):
        from mere_fusion_tpu.models.s3fd import FaceDetector

        self.model = FAN(num_modules=num_modules, dtype=dtype)
        self.variables = fan_variables
        self.detector = face_detector or FaceDetector(dtype=dtype)
        self._fn = None

    @classmethod
    def from_checkpoints(cls, fan_path: str, s3fd_path: Optional[str] = None,
                         **kw) -> "LandmarkDetector":
        from mere_fusion_tpu.models.s3fd import FaceDetector
        from mere_fusion_tpu.utils.torch_convert import (
            convert_fan,
            load_torch_checkpoint,
        )

        det = (FaceDetector.from_checkpoint(s3fd_path) if s3fd_path
               else FaceDetector())
        return cls(fan_variables=convert_fan(load_torch_checkpoint(fan_path)),
                   face_detector=det, **kw)

    def _compile(self):
        if self.variables is None:
            self.variables = jax.jit(self.model.init)(
                jax.random.key(0),
                jnp.zeros((1, self.RESOLUTION, self.RESOLUTION, 3)),
            )
        self.variables = jax.device_put(self.variables)
        model = self.model

        @jax.jit
        def fn(variables, crops):
            return model.apply(variables, crops)[-1]

        self._fn = fn

    def heatmaps(self, crops01: np.ndarray) -> np.ndarray:
        """[B, 256, 256, 3] float in [0,1] -> [B, 64, 64, 68]."""
        if self._fn is None:
            self._compile()
        return np.asarray(self._fn(self.variables, jnp.asarray(crops01)))

    @staticmethod
    def box_to_center_scale(d) -> tuple[np.ndarray, float]:
        center = np.array([(d[0] + d[2]) / 2.0, (d[1] + d[3]) / 2.0])
        center[1] -= (d[3] - d[1]) * 0.12
        scale = (d[2] - d[0] + d[3] - d[1]) / LandmarkDetector.REFERENCE_SCALE
        return center, float(scale)

    def landmarks_from_boxes(self, image_rgb: np.ndarray,
                             boxes) -> list[np.ndarray]:
        """[68, 2] landmarks for each given (x1, y1, x2, y2) face box —
        skips detection when boxes are already known (e.g. the avatar-prep
        pipeline has its own smoothed S3FD pass)."""
        results = []
        for d in boxes:
            d = np.clip(np.asarray(d, np.float32), 0, None)
            center, scale = self.box_to_center_scale(d)
            crop = crop_face(image_rgb, center, scale, self.RESOLUTION)
            hm = self.heatmaps(crop[None].astype(np.float32) / 255.0)
            pts = heatmaps_to_landmarks(hm, [center], [scale])
            results.append(pts[0].astype(np.float32))
        return results

    def get_landmarks(self, image_rgb: np.ndarray) -> list[np.ndarray]:
        """One RGB uint8 image -> list of [68, 2] arrays (one per face)."""
        dets = self.detector.detect_batch(
            image_rgb[None, :, :, ::-1].copy()  # S3FD wants BGR
        )[0]
        return self.landmarks_from_boxes(image_rgb, dets)
