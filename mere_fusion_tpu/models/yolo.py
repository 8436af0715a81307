"""YOLOv10 object detector in flax (NHWC) — the perception-plane detector.

The reference's video-understanding path runs ultralytics YOLOv10x per camera
frame (reference: yolo_opencv.py:42, 152-158 — ``model = YOLO("yolov10x.pt")``
then ``results[0].boxes.xyxy/conf/cls``). ultralytics is absent in this
environment, so this is a ground-up flax implementation of the v10
architecture driven by the same layer spec the upstream yaml encodes:

  backbone  Conv ×2 → C2f → Conv → C2f → SCDown → C2fCIB → SCDown → C2fCIB
            → SPPF → PSA
  head      PAN (upsample/concat + C2f/C2fCIB + Conv/SCDown downsample legs)
            → v10Detect (NMS-free dual-assignment head; inference uses the
            one-to-one branch only, so no NMS pass is needed)

TPU-first choices: everything is static-shape (fixed 640×640 letterbox, fixed
8400-anchor decode, fixed ``max_det`` top-k inside the jitted program), the
whole forward including DFL decode + top-k selection is ONE dispatch, and
weights ride bf16 on the MXU while box arithmetic stays fp32.

Checkpoint compatibility: submodule names mirror the torch module tree
(``cv1``, ``m_0``, ``one2one_cv2_0_1`` for ``one2one_cv2.0.1`` …), so
``utils/yolo_convert.convert_yolo`` maps an ultralytics state dict onto the
flax tree mechanically. The per-scale layer specs below follow the public
yolov10 configs; a checkpoint whose block layout disagrees fails loudly at
conversion (shape/key mismatch), never silently.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (depth, width, max_channels) — ultralytics compound-scaling table.
SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "b": (0.67, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}

# Layer spec, (from, repeats, module, args) exactly like the upstream yaml.
# args carry yaml-scale channel counts; `scale_channels` applies width/depth.
YOLOV10_SPEC: tuple = (
    # backbone
    (-1, 1, "Conv", (64, 3, 2)),        # 0  P1/2
    (-1, 1, "Conv", (128, 3, 2)),       # 1  P2/4
    (-1, 3, "C2f", (128, True)),        # 2
    (-1, 1, "Conv", (256, 3, 2)),       # 3  P3/8
    (-1, 6, "C2f", (256, True)),        # 4
    (-1, 1, "SCDown", (512, 3, 2)),     # 5  P4/16
    (-1, 6, "C2fCIB", (512, True)),     # 6
    (-1, 1, "SCDown", (1024, 3, 2)),    # 7  P5/32
    (-1, 3, "C2fCIB", (1024, True)),    # 8
    (-1, 1, "SPPF", (1024, 5)),         # 9
    (-1, 1, "PSA", (1024,)),            # 10
    # head (PAN)
    (-1, 1, "Upsample", ()),            # 11
    ((-1, 6), 1, "Concat", ()),         # 12  cat backbone P4
    (-1, 3, "C2fCIB", (512, True)),     # 13
    (-1, 1, "Upsample", ()),            # 14
    ((-1, 4), 1, "Concat", ()),         # 15  cat backbone P3
    (-1, 3, "C2f", (256,)),             # 16  P3/8 small
    (-1, 1, "Conv", (256, 3, 2)),       # 17
    ((-1, 13), 1, "Concat", ()),        # 18  cat head P4
    (-1, 3, "C2fCIB", (512, True)),     # 19  P4/16 medium
    (-1, 1, "SCDown", (512, 3, 2)),     # 20
    ((-1, 10), 1, "Concat", ()),        # 21  cat head P5
    (-1, 3, "C2fCIB", (1024, True)),    # 22  P5/32 large
    ((16, 19, 22), 1, "Detect", ()),    # 23  v10Detect (one-to-one branch)
)

STRIDES = (8, 16, 32)
REG_MAX = 16

COCO_NAMES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)


def scale_channels(c: int, width: float, max_channels: int) -> int:
    """yaml channels → real channels (ultralytics make_divisible by 8)."""
    return int(math.ceil(min(c, max_channels) * width / 8) * 8)


def scale_depth(n: int, depth: float) -> int:
    return max(round(n * depth), 1) if n > 1 else n


class ConvBN(nn.Module):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm(eps 1e-3) + SiLU."""

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
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.97, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], dtype=self.dtype, name="cv1")(x)
        y = ConvBN(self.c2, self.k[1], dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f(nn.Module):
    """Cross-stage partial block: split, n bottlenecks, concat, fuse."""

    c2: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.c2 // 2
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        ys = [y[..., :c], y[..., c:]]
        for j in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, (3, 3), 1.0,
                                 dtype=self.dtype, name=f"m_{j}")(ys[-1]))
        return ConvBN(self.c2, 1, dtype=self.dtype,
                      name="cv2")(jnp.concatenate(ys, -1))


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 maxpools."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, dtype=self.dtype, name="cv1")(x)
        p = self.k // 2
        ys = [y]
        for _ in range(3):
            ys.append(nn.max_pool(ys[-1], (self.k, self.k), strides=(1, 1),
                                  padding=((p, p), (p, p))))
        return ConvBN(self.c2, 1, dtype=self.dtype,
                      name="cv2")(jnp.concatenate(ys, -1))


class SCDown(nn.Module):
    """Spatial-channel decoupled downsample: 1×1 pointwise then k×k dw."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, act=False,
                      dtype=self.dtype, name="cv2")(x)


class RepVGGDW(nn.Module):
    """7×7 + 3×3 depthwise branches summed (unfused training-form weights)."""

    ed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = ConvBN(self.ed, 7, 1, g=self.ed, act=False, dtype=self.dtype,
                   name="conv")(x)
        b = ConvBN(self.ed, 3, 1, g=self.ed, act=False, dtype=self.dtype,
                   name="conv1")(x)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (dw-pw-dw/lk-pw-dw) with residual add."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x)
        y = ConvBN(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y)
        else:
            y = ConvBN(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y)
        y = ConvBN(self.c2, 1, dtype=self.dtype, name="cv1_3")(y)
        y = ConvBN(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.c2 // 2
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        ys = [y[..., :c], y[..., c:]]
        for j in range(self.n):
            ys.append(CIB(c, self.shortcut, 1.0, self.lk,
                          dtype=self.dtype, name=f"m_{j}")(ys[-1]))
        return ConvBN(self.c2, 1, dtype=self.dtype,
                      name="cv2")(jnp.concatenate(ys, -1))


class Attention(nn.Module):
    """v10 PSA attention: per-head qkv from a 1×1 conv + dw positional conv.

    Math follows the torch layout exactly: channels are head-major, attention
    is softmax((qᵀk)·key_dim^-0.5) over keys, plus pe(v) residual.
    """

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        inner = key_dim * 2 + head_dim
        qkv = ConvBN(inner * self.num_heads, 1, act=False, dtype=self.dtype,
                     name="qkv")(x)
        qkv = qkv.reshape(b, n, self.num_heads, inner).astype(jnp.float32)
        q, k, v = (qkv[..., :key_dim], qkv[..., key_dim:2 * key_dim],
                   qkv[..., 2 * key_dim:])
        attn = jnp.einsum("bihd,bjhd->bhij", q, k) * (key_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bjhe,bhij->bihe", v, attn)
        out = out.reshape(b, h, w, self.dim).astype(x.dtype)
        pe = ConvBN(self.dim, 3, g=self.dim, act=False, dtype=self.dtype,
                    name="pe")(v.astype(x.dtype).reshape(b, h, w, self.dim))
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype,
                      name="proj")(out + pe)


class PSA(nn.Module):
    """Partial self-attention: attention + conv-FFN on half the channels."""

    c: int  # c1 == c2
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = int(self.c * self.e)
        y = ConvBN(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=max(c // 64, 1), dtype=self.dtype,
                          name="attn")(b)
        f = ConvBN(c * 2, 1, dtype=self.dtype, name="ffn_0")(b)
        b = b + ConvBN(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f)
        return ConvBN(self.c, 1, dtype=self.dtype,
                      name="cv2")(jnp.concatenate([a, b], -1))


def make_anchors(imgsz: int) -> tuple[np.ndarray, np.ndarray]:
    """Anchor centers (grid units, +0.5) and per-anchor strides, all levels
    flattened row-major (y, x) — matching torch make_anchors ordering."""
    pts, strides = [], []
    for s in STRIDES:
        hw = imgsz // s
        sx = np.arange(hw, dtype=np.float32) + 0.5
        gy, gx = np.meshgrid(sx, sx, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        strides.append(np.full((hw * hw, 1), s, np.float32))
    return np.concatenate(pts, 0), np.concatenate(strides, 0)


class V10Detect(nn.Module):
    """v10Detect's one-to-one branch (the inference path — NMS-free).

    The training-time one-to-many branch (cv2/cv3) exists in checkpoints but
    is dead weight at inference; the converter skips it.
    """

    nc: int
    ch: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        boxes, scores = [], []
        for i, x in enumerate(feats):
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"one2one_cv2_{i}_0")(x)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"one2one_cv2_{i}_1")(b)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype,
                        name=f"one2one_cv2_{i}_2")(b)
            c = ConvBN(x.shape[-1], 3, g=x.shape[-1], dtype=self.dtype,
                       name=f"one2one_cv3_{i}_0_0")(x)
            c = ConvBN(c3, 1, dtype=self.dtype, name=f"one2one_cv3_{i}_0_1")(c)
            c = ConvBN(c3, 3, g=c3, dtype=self.dtype,
                       name=f"one2one_cv3_{i}_1_0")(c)
            c = ConvBN(c3, 1, dtype=self.dtype, name=f"one2one_cv3_{i}_1_1")(c)
            c = nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                        name=f"one2one_cv3_{i}_2")(c)
            n = x.shape[0]
            boxes.append(b.reshape(n, -1, 4 * REG_MAX))
            scores.append(c.reshape(n, -1, self.nc))
        return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)


def dfl_decode(box_logits: jnp.ndarray, anchors: jnp.ndarray,
               strides: jnp.ndarray) -> jnp.ndarray:
    """DFL bins → (l,t,r,b) distances → xyxy in input pixels.

    Matches torch DFL (softmax over 16 bins, expectation) + dist2bbox."""
    b, n, _ = box_logits.shape
    p = jax.nn.softmax(box_logits.astype(jnp.float32).reshape(b, n, 4, REG_MAX),
                       axis=-1)
    dist = jnp.sum(p * jnp.arange(REG_MAX, dtype=jnp.float32), axis=-1)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors - lt
    x2y2 = anchors + rb
    return jnp.concatenate([x1y1, x2y2], -1) * strides


class YoloV10(nn.Module):
    """Spec-driven YOLOv10. Returns (boxes_xyxy, scores, classes) for the
    top ``max_det`` (anchor, class) pairs — the v10 NMS-free selection
    (topk anchors by max class score, then topk over their class scores)."""

    scale: str = "x"
    nc: int = 80
    imgsz: int = 640
    max_det: int = 300
    spec: tuple = YOLOV10_SPEC
    return_raw: bool = False  # (boxes, scores) for every anchor — for tests
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, imgsz, imgsz, 3) float32 in [0, 1]."""
        depth, width, max_ch = SCALES[self.scale]
        cc = lambda c: scale_channels(c, width, max_ch)
        ys: list = []
        x = images.astype(self.dtype)
        detect_feats = None
        for i, (frm, n, mod, args) in enumerate(self.spec):
            name = f"model_{i}"
            if isinstance(frm, tuple) and mod == "Concat":
                x = jnp.concatenate([ys[j] if j != -1 else x for j in frm], -1)
            elif mod == "Detect":
                detect_feats = [ys[j] for j in frm]
            elif mod == "Upsample":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            elif mod == "Conv":
                x = ConvBN(cc(args[0]), args[1], args[2], dtype=self.dtype,
                           name=name)(x)
            elif mod == "SCDown":
                x = SCDown(cc(args[0]), args[1], args[2], dtype=self.dtype,
                           name=name)(x)
            elif mod == "C2f":
                x = C2f(cc(args[0]), scale_depth(n, depth),
                        shortcut=bool(args[1]) if len(args) > 1 else False,
                        dtype=self.dtype, name=name)(x)
            elif mod == "C2fCIB":
                x = C2fCIB(cc(args[0]), scale_depth(n, depth),
                           shortcut=bool(args[1]) if len(args) > 1 else False,
                           lk=bool(args[2]) if len(args) > 2 else False,
                           dtype=self.dtype, name=name)(x)
            elif mod == "SPPF":
                x = SPPF(cc(args[0]), args[1], dtype=self.dtype, name=name)(x)
            elif mod == "PSA":
                x = PSA(cc(args[0]), dtype=self.dtype, name=name)(x)
            else:
                raise ValueError(f"unknown module {mod!r} in spec")
            ys.append(x)

        ch = tuple(f.shape[-1] for f in detect_feats)
        box_logits, cls_logits = V10Detect(
            self.nc, ch, dtype=self.dtype,
            name=f"model_{len(self.spec) - 1}")(detect_feats)

        anchors, strides = make_anchors(self.imgsz)
        boxes = dfl_decode(box_logits, jnp.asarray(anchors),
                           jnp.asarray(strides))
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        if self.return_raw:
            return boxes, scores

        # v10 postprocess: top max_det anchors by best class score, then top
        # max_det (anchor, class) pairs among them (torch Detect.postprocess).
        k = min(self.max_det, scores.shape[1])
        best, idx = jax.lax.top_k(jnp.max(scores, -1), k)  # (B, k)
        boxes_k = jnp.take_along_axis(boxes, idx[..., None], axis=1)
        scores_k = jnp.take_along_axis(scores, idx[..., None], axis=1)
        flat, fidx = jax.lax.top_k(scores_k.reshape(scores.shape[0], -1), k)
        anchor_i = fidx // self.nc
        cls_i = fidx % self.nc
        out_boxes = jnp.take_along_axis(boxes_k, anchor_i[..., None], axis=1)
        return out_boxes, flat, cls_i


def letterbox(img: np.ndarray, imgsz: int = 640,
              pad_value: int = 114) -> tuple[np.ndarray, float, tuple]:
    """Resize keeping aspect to (imgsz, imgsz) with gray padding
    (ultralytics LetterBox semantics, centered). Returns (canvas, gain,
    (pad_x, pad_y)) for mapping boxes back to source coordinates."""
    h, w = img.shape[:2]
    gain = min(imgsz / h, imgsz / w)
    nh, nw = round(h * gain), round(w * gain)
    try:
        import cv2

        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # nearest fallback keeps the path dependency-free
        iy = (np.arange(nh) * h / nh).astype(np.int64).clip(0, h - 1)
        ix = (np.arange(nw) * w / nw).astype(np.int64).clip(0, w - 1)
        resized = img[iy][:, ix]
    canvas = np.full((imgsz, imgsz, 3), pad_value, img.dtype)
    top = (imgsz - nh) // 2
    left = (imgsz - nw) // 2
    canvas[top:top + nh, left:left + nw] = resized
    return canvas, gain, (left, top)


class YoloDetector:
    """Host-side wrapper: letterbox → jitted forward → boxes in source
    pixel coordinates. The drop-in for the reference's ``model(image)`` +
    ``results[0].boxes`` usage (yolo_opencv.py:152-158)."""

    def __init__(self, variables, scale: str = "x", nc: int = 80,
                 imgsz: int = 640, max_det: int = 300,
                 names: Sequence[str] = COCO_NAMES, dtype=jnp.bfloat16,
                 spec: tuple = YOLOV10_SPEC, device=None):
        self.model = YoloV10(scale=scale, nc=nc, imgsz=imgsz, max_det=max_det,
                             spec=spec, dtype=dtype)
        if device is not None:
            variables = jax.device_put(variables, device)
        self.variables = variables
        self.names = list(names)
        self.imgsz = imgsz
        # take uint8 RGB and normalize on device: the host→device image
        # transfer is 4× smaller, which dominates per-frame cost on a
        # remote-tunneled chip (CLAUDE.md measurement gotchas)
        self._fwd = jax.jit(lambda v, u8: self.model.apply(
            v, u8.astype(jnp.float32) / 255.0))

    @classmethod
    def init_random(cls, rng_key=None, **kw):
        model = YoloV10(scale=kw.get("scale", "x"), nc=kw.get("nc", 80),
                        imgsz=kw.get("imgsz", 640),
                        max_det=kw.get("max_det", 300),
                        spec=kw.get("spec", YOLOV10_SPEC))
        rng_key = rng_key if rng_key is not None else jax.random.key(0)
        variables = model.init(
            rng_key, jnp.zeros((1, model.imgsz, model.imgsz, 3)))
        return cls(variables, **kw)

    def detect(self, image_bgr: np.ndarray, conf: float = 0.25):
        """→ list of (xyxy np.ndarray[4], confidence, class_name)."""
        canvas, gain, (px, py) = letterbox(image_bgr, self.imgsz)
        rgb = np.ascontiguousarray(canvas[..., ::-1])
        boxes, scores, classes = jax.device_get(
            self._fwd(self.variables, jnp.asarray(rgb[None])))
        out = []
        h, w = image_bgr.shape[:2]
        for b, s, c in zip(boxes[0], scores[0], classes[0]):
            if s < conf:
                break  # top_k output is sorted descending
            xyxy = (b - np.array([px, py, px, py])) / gain
            xyxy = np.clip(xyxy, 0, [w, h, w, h]).astype(np.float32)
            out.append((xyxy, float(s), self.names[int(c)]))
        return out
