"""RTMPose / DWPose wholebody landmarker in flax (NHWC) — the MuseTalk
avatar-prep keypoint model.

The reference prepares MuseTalk avatars with mmpose's DWPose
(rtmpose-l wholebody 384x288): reference
musetalk/utils/preprocessing.py:17-18 loads
``rtmpose-l_8xb32-270e_coco-ubody-wholebody-384x288.py`` +
``models/dwpose/dw-ll_ucoco_384.pth``, and
musetalk/mere_musetalk.py:63-66 takes wholebody keypoints [23:91] as the
68-point face used for the crop-box rule. mmpose/mmdet are absent here, so
this is a ground-up flax implementation of the architecture that config
declares:

  backbone  CSPNeXt-l (arch P5, deepen 1.0, widen 1.0, expand 0.5,
            channel attention, SiLU), out stage 4 (stride 32)
  head      RTMCCHead: 7x7 conv -> per-keypoint token flatten -> ScaleNorm +
            Linear(108->256) -> one GAU block (self-attn, s=128, expansion 2)
            -> SimCC x/y classification branches (split ratio 2)

TPU-first choices: fixed 384x288 top-down crops (axis-aligned affine — the
inference pipeline never rotates), the whole batch of face crops runs as ONE
dispatch including the SimCC argmax decode, and conv weights ride bf16 on
the MXU while the decode stays fp32.

Checkpoint compatibility: module names mirror the mmpose torch tree
(``stem_0``, ``stage1_0``, ``blocks_0`` …) so
``utils/torch_convert.convert_rtmpose`` maps ``dw-ll_ucoco_384.pth``
mechanically; any layout disagreement fails loudly at conversion.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# CSPNeXt P5 arch rows: (in_c, out_c, num_blocks, add_identity, use_spp)
# (mmdet CSPNeXt.arch_settings['P5'], scaled by deepen/widen factors).
P5_ARCH = (
    (64, 128, 3, True, False),
    (128, 256, 6, True, False),
    (256, 512, 6, True, False),
    (512, 1024, 3, False, True),
)

INPUT_W, INPUT_H = 288, 384           # codec input_size (W, H)
SIMCC_RATIO = 2.0
NUM_KEYPOINTS = 133                    # COCO-WholeBody
FACE_SLICE = slice(23, 91)             # 68-point face (mere_musetalk.py:65)
# PoseDataPreprocessor mean/std (RGB order after bgr_to_rgb)
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class ConvBN(nn.Module):
    """mmcv ConvModule: Conv2d(bias=False) + BN(eps 1e-5) + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class ChannelAttention(nn.Module):
    """mmdet ChannelAttention: GAP -> 1x1 conv (bias) -> hardsigmoid gate."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc")(g)
        return x * jax.nn.hard_sigmoid(g.astype(jnp.float32)).astype(x.dtype)


class CSPNeXtBlock(nn.Module):
    """3x3 ConvModule -> 5x5 depthwise-separable ConvModule (+identity)."""

    c2: int
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.c2, 3, dtype=self.dtype, name="conv1")(x)
        # DepthwiseSeparableConvModule = depthwise 5x5 + BN + SiLU, then
        # pointwise 1x1 + BN + SiLU (module names depthwise_conv /
        # pointwise_conv in the torch tree)
        y = ConvBN(self.c2, 5, g=self.c2, dtype=self.dtype,
                   name="conv2_depthwise_conv")(y)
        y = ConvBN(self.c2, 1, dtype=self.dtype,
                   name="conv2_pointwise_conv")(y)
        return x + y if self.add_identity and x.shape[-1] == self.c2 else y


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling over kernel sizes (5, 9, 13)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, dtype=self.dtype, name="conv1")(x)
        ys = [y]
        for k in (5, 9, 13):
            p = k // 2
            ys.append(nn.max_pool(y, (k, k), strides=(1, 1),
                                  padding=((p, p), (p, p))))
        return ConvBN(self.c2, 1, dtype=self.dtype,
                      name="conv2")(jnp.concatenate(ys, -1))


class CSPLayer(nn.Module):
    """mmdet CSPLayer with use_cspnext_block=True + channel attention."""

    c2: int
    n: int = 1
    add_identity: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.c2 * self.expand_ratio)
        main = ConvBN(mid, 1, dtype=self.dtype, name="main_conv")(x)
        short = ConvBN(mid, 1, dtype=self.dtype, name="short_conv")(x)
        for j in range(self.n):
            main = CSPNeXtBlock(mid, self.add_identity, dtype=self.dtype,
                                name=f"blocks_{j}")(main)
        y = jnp.concatenate([main, short], axis=-1)
        y = ChannelAttention(dtype=self.dtype, name="attention")(y)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="final_conv")(y)


class CSPNeXt(nn.Module):
    """CSPNeXt backbone (arch P5), returning the stage-4 stride-32 map."""

    deepen: float = 1.0
    widen: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stem_c = int(P5_ARCH[0][0] * self.widen)
        x = ConvBN(stem_c // 2, 3, 2, dtype=self.dtype, name="stem_0")(x)
        x = ConvBN(stem_c // 2, 3, 1, dtype=self.dtype, name="stem_1")(x)
        x = ConvBN(stem_c, 3, 1, dtype=self.dtype, name="stem_2")(x)
        for i, (_, out_c, n, add_id, use_spp) in enumerate(P5_ARCH):
            c = int(out_c * self.widen)
            n = max(round(n * self.deepen), 1)
            x = ConvBN(c, 3, 2, dtype=self.dtype, name=f"stage{i+1}_0")(x)
            idx = 1
            if use_spp:
                x = SPPBottleneck(c, dtype=self.dtype,
                                  name=f"stage{i+1}_{idx}")(x)
                idx += 1
            x = CSPLayer(c, n, add_id, dtype=self.dtype,
                         name=f"stage{i+1}_{idx}")(x)
        return x


class ScaleNorm(nn.Module):
    """x / (||x||_2 * dim^-0.5) * g (mmpose rtmcc_block.ScaleNorm)."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        norm = norm * (x.shape[-1] ** -0.5)
        return (x / jnp.maximum(norm, 1e-5) * g).astype(x.dtype)


class GAU(nn.Module):
    """Gated Attention Unit, self-attn flavor (mmpose RTMCCBlock):

      x' = ScaleNorm(x); uv = SiLU(Linear(x'));  u, v, base = split(uv)
      q = base*gamma0+beta0; k = base*gamma1+beta1
      out = res_scale*x + Linear(u * (relu(q k^T / sqrt(s))^2 @ v))

    no relative bias, no positional encoding (gau_cfg in the reference
    config), bias-free linears.
    """

    hidden: int = 256
    s: int = 128
    expansion: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        e = self.hidden * self.expansion
        gamma = self.param("gamma", nn.initializers.uniform(1.0), (2, self.s))
        beta = self.param("beta", nn.initializers.uniform(1.0), (2, self.s))
        res_scale = self.param("res_scale",
                               nn.initializers.ones, (self.hidden,))
        y = ScaleNorm(name="ln")(x)
        uv = nn.Dense(2 * e + self.s, use_bias=False, dtype=self.dtype,
                      name="uv")(y)
        uv = nn.silu(uv)
        u, v, base = jnp.split(uv, [e, 2 * e], axis=-1)
        q = base * gamma[0] + beta[0]
        k = base * gamma[1] + beta[1]
        qk = jnp.einsum("bts,bus->btu", q.astype(jnp.float32),
                        k.astype(jnp.float32))
        kernel = jnp.square(jax.nn.relu(qk / math.sqrt(self.s)))
        y = u * jnp.einsum("btu,bue->bte", kernel.astype(v.dtype), v)
        y = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="o")(y)
        return x * res_scale + y


class RTMCCHead(nn.Module):
    """7x7 conv -> token flatten -> mlp -> GAU -> SimCC x/y bins."""

    num_keypoints: int = NUM_KEYPOINTS
    input_w: int = INPUT_W
    input_h: int = INPUT_H
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        b = feats.shape[0]
        x = nn.Conv(self.num_keypoints, (7, 7), padding=((3, 3), (3, 3)),
                    use_bias=True, dtype=self.dtype, name="final_layer")(feats)
        # torch flattens [B, K, H, W] row-major -> [B, K, H*W]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, self.num_keypoints, -1)
        x = ScaleNorm(name="mlp_ln")(x)
        x = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="mlp")(x)
        x = GAU(self.hidden, dtype=self.dtype, name="gau")(x)
        pred_x = nn.Dense(int(self.input_w * SIMCC_RATIO), use_bias=False,
                          dtype=self.dtype, name="cls_x")(x)
        pred_y = nn.Dense(int(self.input_h * SIMCC_RATIO), use_bias=False,
                          dtype=self.dtype, name="cls_y")(x)
        return pred_x, pred_y


class RTMPose(nn.Module):
    """Full top-down wholebody pose model on 384x288 crops.

    __call__ takes preprocessed crops [B, 384, 288, 3] (RGB,
    mean/std-normalized) and returns (keypoints [B, 133, 2] in crop pixel
    coords, scores [B, 133]).
    """

    deepen: float = 1.0
    widen: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = CSPNeXt(self.deepen, self.widen, dtype=self.dtype,
                        name="backbone")(x)
        pred_x, pred_y = RTMCCHead(dtype=self.dtype, name="head")(feats)
        # SimCC decode (mmpose get_simcc_maximum, use_dark=False): plain
        # argmax over bins / split ratio; score = min of the two peak values.
        px = pred_x.astype(jnp.float32)
        py = pred_y.astype(jnp.float32)
        loc_x = jnp.argmax(px, axis=-1).astype(jnp.float32) / SIMCC_RATIO
        loc_y = jnp.argmax(py, axis=-1).astype(jnp.float32) / SIMCC_RATIO
        score = jnp.minimum(jnp.max(px, axis=-1), jnp.max(py, axis=-1))
        return jnp.stack([loc_x, loc_y], axis=-1), score


# ---- top-down crop pipeline --------------------------------------------------

def bbox_center_scale(boxes: np.ndarray, padding: float = 1.25) -> tuple:
    """GetBBoxCenterScale: xyxy -> (center, scale) with 1.25 padding, then
    TopdownAffine's fix_aspect_ratio to the 288/384 input box."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    center = (boxes[:, :2] + boxes[:, 2:]) * 0.5
    scale = (boxes[:, 2:] - boxes[:, :2]) * padding
    ratio = INPUT_W / INPUT_H
    w, h = scale[:, 0], scale[:, 1]
    new_w = np.where(w > h * ratio, w, h * ratio)
    return center, np.stack([new_w, new_w / ratio], axis=-1)


def crop_affine(frames: jnp.ndarray, center: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bilinear crop+resize of [B, H, W, 3] frames to
    [B, 384, 288, 3] (TopdownAffine without rotation: the source box
    center/scale maps linearly onto the model input)."""
    b, h, w = frames.shape[:3]
    # destination pixel grid -> source coords:
    # src = center - scale/2 + (dst + 0.5) * scale/input - 0.5
    dx = (jnp.arange(INPUT_W, dtype=jnp.float32) + 0.5) / INPUT_W
    dy = (jnp.arange(INPUT_H, dtype=jnp.float32) + 0.5) / INPUT_H
    sx = (center[:, 0, None] - scale[:, 0, None] / 2
          + dx[None] * scale[:, 0, None] - 0.5)          # [B, 288]
    sy = (center[:, 1, None] - scale[:, 1, None] / 2
          + dy[None] * scale[:, 1, None] - 0.5)          # [B, 384]

    def sample_one(img, sx1, sy1):
        x0 = jnp.clip(jnp.floor(sx1).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(sy1).astype(jnp.int32), 0, h - 2)
        fx = jnp.clip(sx1 - x0, 0.0, 1.0)
        fy = jnp.clip(sy1 - y0, 0.0, 1.0)
        rows0 = img[y0]                                   # [384, W, 3]
        rows1 = img[y0 + 1]
        def lerp_rows(rows):
            a = jnp.take(rows, x0, axis=1)                # [384, 288, 3]
            bb = jnp.take(rows, x0 + 1, axis=1)
            return a + (bb - a) * fx[None, :, None]
        top, bot = lerp_rows(rows0), lerp_rows(rows1)
        return top + (bot - top) * fy[:, None, None]

    return jax.vmap(sample_one)(frames.astype(jnp.float32), sx, sy)


def make_wholebody_fn(variables, dtype=jnp.bfloat16, deepen=1.0, widen=1.0):
    """Build a jitted fn(frames_rgb [B,H,W,3], centers, scales) ->
    (keypoints [B,133,2] in frame coords, scores [B,133]). One dispatch:
    crop + normalize + backbone + head + SimCC decode + unmap."""
    model = RTMPose(deepen=deepen, widen=widen, dtype=dtype)
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)

    @jax.jit
    def run(variables, frames_rgb, center, scale):
        crops = crop_affine(frames_rgb, center, scale)
        x = ((crops - mean) / std).astype(dtype)
        kpts, score = model.apply(variables, x)
        # crop coords -> frame coords
        origin = center - scale / 2.0
        factor = scale / jnp.asarray([INPUT_W, INPUT_H], jnp.float32)
        kpts = kpts * factor[:, None, :] + origin[:, None, :]
        return kpts, score

    return lambda frames, center, scale: run(variables, frames, center, scale)


class WholebodyLandmarker:
    """DWPose-compatible 68-point face landmarker for MuseTalk avatar prep.

    Drop-in alternative to models/fan.LandmarkDetector in
    tools/genavatar.get_landmark_and_bbox (same
    ``landmarks_from_boxes(image_rgb, boxes) -> list of [68, 2]``
    interface). Like the reference — which calls
    ``inference_topdown(model, frame)`` with no detector boxes
    (musetalk/utils/preprocessing.py:56), i.e. the whole frame is the
    top-down crop — the detector boxes are ignored and the full frame is
    posed; keypoints [23:91] are the 68-point face
    (mere_musetalk.py:63-66)."""

    def __init__(self, variables, dtype=jnp.bfloat16, deepen=1.0, widen=1.0):
        self._fn = make_wholebody_fn(variables, dtype=dtype,
                                     deepen=deepen, widen=widen)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "WholebodyLandmarker":
        from mere_fusion_tpu.utils.torch_convert import convert_rtmpose

        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt)
        return cls(convert_rtmpose(state), **kw)

    def wholebody(self, frames_rgb: np.ndarray,
                  boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched raw API: [B,H,W,3] frames + [B,4] xyxy crop boxes ->
        ([B,133,2] keypoints in frame coords, [B,133] scores)."""
        center, scale = bbox_center_scale(boxes)
        kpts, score = self._fn(jnp.asarray(frames_rgb), jnp.asarray(center),
                               jnp.asarray(scale))
        return np.asarray(kpts), np.asarray(score)

    def landmarks_from_boxes(self, image_rgb: np.ndarray,
                             boxes) -> list[np.ndarray]:
        h, w = image_rgb.shape[:2]
        full = np.array([[0.0, 0.0, w, h]], np.float32)
        kpts, _ = self.wholebody(image_rgb[None], full)
        return [kpts[0, FACE_SLICE].astype(np.float32)] * max(len(boxes), 1)
