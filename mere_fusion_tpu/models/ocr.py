"""Scene-text OCR in flax: CRAFT-style detector + CRNN recognizer.

The reference reads on-screen text with EasyOCR (``easyocr.Reader(['en',
'ch_sim']).readtext(frame)``, reference: yolo_opencv.py:189-199) and folds it
into the LLM scene summary. easyocr is absent in this environment, so this
module rebuilds its two-network pipeline ground-up for TPU:

- ``CRAFT`` — the public CRAFT text detector topology (Baek et al.,
  CVPR'19, the net behind EasyOCR's ``craft_mlt_25k.pth``): a VGG16-BN
  backbone whose stage outputs feed a U-Net decoder of ``double_conv``
  blocks, ending in a 2-channel half-resolution map (character region
  score, inter-character affinity score).
- ``CRNN`` — EasyOCR's recognizer topology ("None-VGG-BiLSTM-CTC" from the
  deep-text-recognition-benchmark family, e.g. ``english_g2.pth``): VGG
  feature extractor, height collapse, two bidirectional LSTMs, linear CTC
  head. The LSTMs are ``lax.scan`` cells with torch nn.LSTM gate semantics
  (gate order i,f,g,o) so converted weights reproduce torch numerics.

TPU-first choices: detection runs at a small set of static input sizes
(bucketed resize keeps the jit cache warm); recognition pads crops into
width buckets and a fixed batch so every dispatch has static shapes; CTC
argmax runs on device, repeat-collapse on host. Map thresholding and
connected-component grouping are host-side cv2 (cheap, and data-dependent
component counts don't belong under jit).

Converters for the torch checkpoints live in utils/torch_convert.py
(``convert_craft`` / ``convert_crnn``); parity vs inline torch twins is
tested in tests/test_ocr.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# EasyOCR english_g2 alphabet: blank (CTC index 0) + these characters.
DEFAULT_CHARSET = (
    "0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)

# recognizer input height and static width buckets (multiples keep the
# compile cache small; crops wider than the last bucket are squeezed)
REC_HEIGHT = 64
REC_WIDTH_BUCKETS = (64, 128, 256, 512)
REC_BATCH = 8

# detector static input buckets (long side), multiples of 32
DET_SIZES = (320, 640, 960)


def _bn(name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9, name=name)


class _ConvBN(nn.Module):
    """3x3 conv + batchnorm + relu (VGG16-BN building block)."""

    features: int
    kernel: int = 3
    padding: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.padding,
                    kernel_dilation=(self.dilation, self.dilation),
                    name="conv")(x)
        return nn.relu(_bn("bn")(x))


class _DoubleConv(nn.Module):
    """CRAFT decoder block: 1x1 conv to mid, 3x3 conv to out, BN+relu each."""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_bn("bn_0")(nn.Conv(self.mid, (1, 1), name="conv_0")(x)))
        x = nn.relu(_bn("bn_1")(nn.Conv(self.out, (3, 3), padding=1,
                                        name="conv_1")(x)))
        return x


def _pool(x, window=2, stride=2, pad="VALID"):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=pad)


class CRAFT(nn.Module):
    """Region+affinity text detector. Input (N, H, W, 3) float32 normalized
    (ImageNet mean/std); output (N, H/2, W/2, 2) scores in [0, 1] after the
    caller's sigmoid — raw logits are returned.

    ``width`` scales channels for narrow parity twins (tests).
    """

    width: float = 1.0

    @nn.compact
    def __call__(self, x):
        c = lambda n: max(int(round(n * self.width)), 4)
        # VGG16-BN stages; sources tap each stage end like CRAFT's basenet
        f = {}
        stages = ((64, 2, "s1"), (128, 2, "s2"), (256, 3, "s3"),
                  (512, 3, "s4"), (512, 3, "s5"))
        for ch, reps, name in stages:
            for i in range(reps):
                x = _ConvBN(c(ch), name=f"{name}_{i}")(x)
            f[name] = x
            if name in ("s1", "s2", "s3"):
                x = _pool(x)            # /2 /4 /8
            elif name == "s4":
                x = _pool(x)            # /16
        # fc6/fc7 head at /16: stride-1 pool, dilated 3x3, 1x1 (no BN —
        # CRAFT's slice5 is plain convs)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.relu(nn.Conv(c(1024), (3, 3), padding=6,
                            kernel_dilation=(6, 6), name="fc6")(x))
        x = nn.relu(nn.Conv(c(1024), (1, 1), name="fc7")(x))

        def up_to(y, like):
            return jax.image.resize(
                y, (y.shape[0], like.shape[1], like.shape[2], y.shape[3]),
                method="bilinear")

        y = _DoubleConv(c(512), c(256), name="up_0")(
            jnp.concatenate([x, f["s5"]], -1))
        y = _DoubleConv(c(256), c(128), name="up_1")(
            jnp.concatenate([up_to(y, f["s4"]), f["s4"]], -1))
        y = _DoubleConv(c(128), c(64), name="up_2")(
            jnp.concatenate([up_to(y, f["s3"]), f["s3"]], -1))
        y = _DoubleConv(c(64), c(32), name="up_3")(
            jnp.concatenate([up_to(y, f["s2"]), f["s2"]], -1))
        # classification head (CRAFT conv_cls): 3x3,3x3,3x3,1x1,1x1 → 2ch
        y = nn.relu(nn.Conv(c(32), (3, 3), padding=1, name="cls_0")(y))
        y = nn.relu(nn.Conv(c(32), (3, 3), padding=1, name="cls_1")(y))
        y = nn.relu(nn.Conv(c(16), (3, 3), padding=1, name="cls_2")(y))
        y = nn.relu(nn.Conv(c(16), (1, 1), name="cls_3")(y))
        return nn.Conv(2, (1, 1), name="cls_4")(y)


def _torch_lstm_scan(p, xs, reverse: bool = False):
    """One direction of torch nn.LSTM over xs (T, N, I).

    Torch packs gates (i, f, g, o) rowwise in w_ih (4H, I) / w_hh (4H, H)
    with two bias vectors that simply add. h0 = c0 = 0.
    """
    wi, wh = p["w_ih"], p["w_hh"]           # (4H, I), (4H, H)
    b = p["b_ih"] + p["b_hh"]               # (4H,)
    hidden = wh.shape[1]
    pre_x = jnp.einsum("tni,gi->tng", xs, wi) + b  # hoisted input matmul

    def cell(carry, px):
        h, c_ = carry
        z = px + h @ wh.T
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_ = jax.nn.sigmoid(f) * c_ + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c_)
        return (h, c_), h

    n = xs.shape[1]
    init = (jnp.zeros((n, hidden), xs.dtype), jnp.zeros((n, hidden), xs.dtype))
    _, hs = jax.lax.scan(cell, init, pre_x, reverse=reverse)
    return hs


class BiLSTM(nn.Module):
    """Bidirectional torch-LSTM + linear projection (deep-text-recognition
    BidirectionalLSTM: LSTM(in, hidden, bidirectional) → Linear(2h, out))."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, xs):  # (T, N, I)
        i = xs.shape[-1]
        shapes = {"w_ih": (4 * self.hidden, i),
                  "w_hh": (4 * self.hidden, self.hidden),
                  "b_ih": (4 * self.hidden,), "b_hh": (4 * self.hidden,)}
        mk = lambda d: {k: self.param(f"{k}_{d}", nn.initializers.uniform(0.1),
                                      s) for k, s in shapes.items()}
        fw = _torch_lstm_scan(mk("fw"), xs)
        bw = _torch_lstm_scan(mk("bw"), xs, reverse=True)
        return nn.Dense(self.out, name="proj")(jnp.concatenate([fw, bw], -1))


class CRNN(nn.Module):
    """VGG–BiLSTM–CTC text recognizer (EasyOCR english_g2 topology).

    Input (N, H, W, 1) float32 in [-1, 1] (EasyOCR normalizes (x-0.5)/0.5);
    output (N, T, n_classes) CTC logits, T = W/4 - 1. Class 0 is blank.
    """

    n_classes: int = 1 + len(DEFAULT_CHARSET)
    output_channel: int = 256
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        oc = self.output_channel
        chans = (oc // 8, oc // 4, oc // 2, oc)
        conv = lambda n, ch, **kw: nn.Conv(ch, (3, 3), padding=1, name=n, **kw)
        x = nn.relu(conv("conv_0", chans[0])(x))
        x = _pool(x)                                     # H/2, W/2
        x = nn.relu(conv("conv_1", chans[1])(x))
        x = _pool(x)                                     # H/4, W/4
        x = nn.relu(conv("conv_2", chans[2])(x))
        x = nn.relu(conv("conv_3", chans[2])(x))
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                # H/8, W/4
        x = nn.relu(_bn("bn_4")(conv("conv_4", chans[3], use_bias=False)(x)))
        x = nn.relu(_bn("bn_5")(conv("conv_5", chans[3], use_bias=False)(x)))
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                # H/16
        x = nn.relu(nn.Conv(chans[3], (2, 2), padding="VALID",
                            name="conv_6")(x))
        x = jnp.mean(x, axis=1)                          # AdaptiveAvgPool H→1
        xs = jnp.transpose(x, (1, 0, 2))                 # (T, N, C)
        xs = BiLSTM(self.hidden, self.hidden, name="rnn_0")(xs)
        xs = BiLSTM(self.hidden, self.hidden, name="rnn_1")(xs)
        logits = nn.Dense(self.n_classes, name="head")(xs)
        return jnp.transpose(logits, (1, 0, 2))          # (N, T, classes)


def ctc_greedy(ids: np.ndarray, charset: str = DEFAULT_CHARSET) -> str:
    """Collapse repeats then drop blanks (index 0)."""
    out, prev = [], 0
    for t in np.asarray(ids).tolist():
        if t != prev and t != 0:
            out.append(charset[t - 1])
        prev = t
    return "".join(out)


# ImageNet normalization used by CRAFT/EasyOCR detection preprocessing
_DET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_DET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class TextReader:
    """Host wrapper with EasyOCR's ``readtext`` contract: BGR frame →
    ``[(quad_box, text, confidence), ...]`` (reference consumption takes
    ``t[1]``, yolo_opencv.py:195-199).

    ``det_variables``/``rec_variables`` are flax trees (convert real
    checkpoints with ``tools/convert_ckpt.py craft|crnn``); ``width`` scales
    the detector for tests. Detection/recognition each run as ONE static-
    shape dispatch per size/width bucket.
    """

    def __init__(self, det_variables=None, rec_variables=None,
                 charset: str = DEFAULT_CHARSET, width: float = 1.0,
                 text_threshold: float = 0.7, link_threshold: float = 0.4,
                 low_text: float = 0.4, seed: int = 0):
        self.charset = charset
        self.text_threshold = text_threshold
        self.link_threshold = link_threshold
        self.low_text = low_text
        det = CRAFT(width=width)
        rec = CRNN(n_classes=1 + len(charset))
        key = jax.random.key(seed)
        if det_variables is None:
            det_variables = det.init(key, jnp.zeros((1, 64, 64, 3)))
        if rec_variables is None:
            rec_variables = rec.init(key, jnp.zeros((1, REC_HEIGHT, 64, 1)))
        self._det = jax.jit(lambda v, x: jax.nn.sigmoid(det.apply(v, x)))
        self._rec = jax.jit(
            lambda v, x: jnp.argmax(rec.apply(v, x), axis=-1))
        self._rec_conf = jax.jit(
            lambda v, x: jnp.max(jax.nn.softmax(rec.apply(v, x), -1), -1))
        self.det_variables = det_variables
        self.rec_variables = rec_variables

    # -- detection ---------------------------------------------------------
    def detect(self, frame_bgr: np.ndarray) -> list[np.ndarray]:
        """Quad boxes (4, 2) float32 in original-image pixels."""
        import cv2

        h, w = frame_bgr.shape[:2]
        long_side = max(h, w)
        size = next((s for s in DET_SIZES if s >= long_side), DET_SIZES[-1])
        scale = size / long_side
        rh, rw = int(round(h * scale)), int(round(w * scale))
        canvas = np.zeros((size, size, 3), np.float32)
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB).astype(np.float32)
        canvas[:rh, :rw] = cv2.resize(rgb, (rw, rh)) / 255.0
        canvas = (canvas - _DET_MEAN) / _DET_STD

        maps = np.asarray(self._det(self.det_variables,
                                    jnp.asarray(canvas[None])))[0]
        region, affinity = maps[..., 0], maps[..., 1]
        # EasyOCR getDetBoxes core: components of (region>low | aff>link),
        # kept when their peak region score clears text_threshold
        mask = ((region > self.low_text) |
                (affinity > self.link_threshold)).astype(np.uint8)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, 4)
        boxes = []
        for k in range(1, n):
            comp = labels == k
            if stats[k, cv2.CC_STAT_AREA] < 6:
                continue
            if float(region[comp].max()) < self.text_threshold:
                continue
            ys, xs = np.nonzero(comp)
            pts = np.stack([xs, ys], 1).astype(np.float32)
            rect = cv2.minAreaRect(pts)
            quad = cv2.boxPoints(
                (rect[0], (rect[1][0] + 4, rect[1][1] + 4), rect[2]))
            boxes.append(quad * 2.0 / scale)  # map is half-res
        return boxes

    # -- recognition -------------------------------------------------------
    def _prep_crop(self, gray: np.ndarray) -> tuple[np.ndarray, int]:
        import cv2

        h, w = gray.shape[:2]
        tw = max(int(round(w * REC_HEIGHT / max(h, 1))), 8)
        bucket = next((b for b in REC_WIDTH_BUCKETS if b >= tw),
                      REC_WIDTH_BUCKETS[-1])
        tw = min(tw, bucket)
        img = cv2.resize(gray, (tw, REC_HEIGHT)).astype(np.float32)
        out = np.zeros((REC_HEIGHT, bucket), np.float32)
        out[:, :tw] = (img / 255.0 - 0.5) / 0.5
        return out, bucket

    def recognize(self, crops: Sequence[np.ndarray]) -> list[tuple[str, float]]:
        """Grayscale crops → (text, mean-token-confidence) each; crops are
        grouped by width bucket and dispatched in static REC_BATCH batches."""
        results: dict[int, tuple[str, float]] = {}
        by_bucket: dict[int, list[tuple[int, np.ndarray]]] = {}
        for i, g in enumerate(crops):
            img, bucket = self._prep_crop(g)
            by_bucket.setdefault(bucket, []).append((i, img))
        for bucket, items in by_bucket.items():
            for start in range(0, len(items), REC_BATCH):
                chunk = items[start:start + REC_BATCH]
                batch = np.zeros((REC_BATCH, REC_HEIGHT, bucket, 1),
                                 np.float32)
                for j, (_, img) in enumerate(chunk):
                    batch[j, ..., 0] = img
                x = jnp.asarray(batch)
                ids = np.asarray(self._rec(self.rec_variables, x))
                conf = np.asarray(self._rec_conf(self.rec_variables, x))
                for j, (i, _) in enumerate(chunk):
                    results[i] = (ctc_greedy(ids[j], self.charset),
                                  float(conf[j].mean()))
        return [results[i] for i in range(len(crops))]

    def readtext(self, frame_bgr: np.ndarray) -> list[tuple]:
        """EasyOCR contract: [(4-point box, text, confidence), ...]."""
        import cv2

        boxes = self.detect(frame_bgr)
        if not boxes:
            return []
        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        h, w = gray.shape
        crops, kept = [], []
        for quad in boxes:
            x1 = int(max(quad[:, 0].min(), 0))
            y1 = int(max(quad[:, 1].min(), 0))
            x2 = int(min(quad[:, 0].max(), w))
            y2 = int(min(quad[:, 1].max(), h))
            if x2 - x1 < 4 or y2 - y1 < 4:
                continue
            crops.append(gray[y1:y2, x1:x2])
            kept.append(quad)
        texts = self.recognize(crops)
        return [(q.tolist(), t, c)
                for q, (t, c) in zip(kept, texts) if t]
