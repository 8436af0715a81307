"""RTMPose/DWPose wholebody landmarker: torch parity + crop pipeline.

The reference preps MuseTalk avatars with mmpose DWPose (rtmpose-l
wholebody 384x288, reference musetalk/utils/preprocessing.py:17-18,
mere_musetalk.py:63-66). mmpose/mmdet are absent here, so per the repo
parity convention this file rebuilds the architecture the reference config
declares as an inline torch twin (CSPNeXt-P5 backbone + RTMCCHead with one
GAU block + SimCC) at random weights, converts its state dict with
utils/torch_convert.convert_rtmpose, and asserts the flax model matches:

- SimCC x/y logits (the raw head output) to deep-stack tolerance;
- decoded keypoints + scores (argmax decode, mmpose get_simcc_maximum);
- the top-down crop: bbox_center_scale's 1.25 padding + aspect fix and
  crop_affine's half-pixel bilinear resampling vs cv2;
- the WholebodyLandmarker drop-in contract used by tools/genavatar.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mere_fusion_tpu.models.rtmpose import (  # noqa: E402
    FACE_SLICE,
    INPUT_H,
    INPUT_W,
    NUM_KEYPOINTS,
    P5_ARCH,
    SIMCC_RATIO,
    RTMPose,
    WholebodyLandmarker,
    bbox_center_scale,
    crop_affine,
)
from mere_fusion_tpu.utils.torch_convert import convert_rtmpose  # noqa: E402

DEEPEN, WIDEN = 1.0 / 3.0, 0.25  # rtmpose-s-ish scale keeps CPU runs fast


def conv_module(cin, cout, k, s=1, g=1):
    m = tnn.Sequential()
    m.conv = tnn.Conv2d(cin, cout, k, s, k // 2, groups=g, bias=False)
    m.bn = tnn.BatchNorm2d(cout, eps=1e-5)
    m.activate = tnn.SiLU()
    return m


def run_cm(m, x):
    return m.activate(m.bn(m.conv(x)))


class TorchCSPNeXtBlock(tnn.Module):
    def __init__(self, c, add_identity):
        super().__init__()
        self.add_identity = add_identity
        self.conv1 = conv_module(c, c, 3)
        self.conv2 = tnn.Module()
        self.conv2.depthwise_conv = conv_module(c, c, 5, g=c)
        self.conv2.pointwise_conv = conv_module(c, c, 1)

    def forward(self, x):
        y = run_cm(self.conv1, x)
        y = run_cm(self.conv2.depthwise_conv, y)
        y = run_cm(self.conv2.pointwise_conv, y)
        return x + y if self.add_identity else y


class TorchCSPLayer(tnn.Module):
    def __init__(self, c, n, add_identity):
        super().__init__()
        mid = c // 2
        self.main_conv = conv_module(c, mid, 1)
        self.short_conv = conv_module(c, mid, 1)
        self.final_conv = conv_module(2 * mid, c, 1)
        self.blocks = tnn.Sequential(
            *[TorchCSPNeXtBlock(mid, add_identity) for _ in range(n)])
        self.attention = tnn.Module()
        self.attention.fc = tnn.Conv2d(2 * mid, 2 * mid, 1, bias=True)

    def forward(self, x):
        main = self.blocks(run_cm(self.main_conv, x))
        short = run_cm(self.short_conv, x)
        y = torch.cat([main, short], dim=1)
        gate = tF.hardsigmoid(self.attention.fc(y.mean((2, 3), keepdim=True)))
        return run_cm(self.final_conv, y * gate)


class TorchSPP(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = conv_module(c, c // 2, 1)
        self.conv2 = conv_module(c // 2 * 4, c, 1)

    def forward(self, x):
        y = run_cm(self.conv1, x)
        outs = [y] + [tF.max_pool2d(y, k, 1, k // 2) for k in (5, 9, 13)]
        return run_cm(self.conv2, torch.cat(outs, dim=1))


class TorchScaleNorm(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** -0.5
        self.g = tnn.Parameter(torch.rand(1))

    def forward(self, x):
        norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / norm.clamp(min=1e-5) * self.g


class TorchGAU(tnn.Module):
    def __init__(self, hidden=256, s=128, expansion=2):
        super().__init__()
        self.s, self.e = s, hidden * expansion
        self.ln = TorchScaleNorm(hidden)
        self.uv = tnn.Linear(hidden, 2 * self.e + s, bias=False)
        self.gamma = tnn.Parameter(torch.rand(2, s))
        self.beta = tnn.Parameter(torch.rand(2, s))
        self.o = tnn.Linear(self.e, hidden, bias=False)
        self.res_scale = tnn.Module()
        self.res_scale.scale = tnn.Parameter(torch.ones(hidden))

    def forward(self, x):
        y = tF.silu(self.uv(self.ln(x)))
        u, v, base = torch.split(y, [self.e, self.e, self.s], dim=-1)
        q = base * self.gamma[0] + self.beta[0]
        k = base * self.gamma[1] + self.beta[1]
        kernel = torch.square(
            tF.relu(torch.bmm(q, k.transpose(1, 2)) / math.sqrt(self.s)))
        out = self.o(u * torch.bmm(kernel, v))
        return x * self.res_scale.scale + out


class TorchRTMPose(tnn.Module):
    """mmpose-named twin: backbone.stem/stage1..4 + head.*."""

    def __init__(self):
        super().__init__()
        w = lambda c: int(c * WIDEN)
        self.backbone = tnn.Module()
        self.backbone.stem = tnn.Sequential(
            conv_module(3, w(64) // 2, 3, 2),
            conv_module(w(64) // 2, w(64) // 2, 3, 1),
            conv_module(w(64) // 2, w(64), 3, 1))
        for i, (cin, cout, n, add_id, use_spp) in enumerate(P5_ARCH):
            n = max(round(n * DEEPEN), 1)
            mods = [conv_module(w(cin), w(cout), 3, 2)]
            if use_spp:
                mods.append(TorchSPP(w(cout)))
            mods.append(TorchCSPLayer(w(cout), n, add_id))
            setattr(self.backbone, f"stage{i + 1}", tnn.Sequential(*mods))
        self.head = tnn.Module()
        self.head.final_layer = tnn.Conv2d(w(1024), NUM_KEYPOINTS, 7,
                                           padding=3, bias=True)
        flat = (INPUT_H // 32) * (INPUT_W // 32)
        self.head.mlp = tnn.Sequential(
            TorchScaleNorm(flat), tnn.Linear(flat, 256, bias=False))
        self.head.gau = TorchGAU()
        self.head.cls_x = tnn.Linear(256, int(INPUT_W * SIMCC_RATIO),
                                     bias=False)
        self.head.cls_y = tnn.Linear(256, int(INPUT_H * SIMCC_RATIO),
                                     bias=False)

    def forward(self, x):
        x = run_cm(self.backbone.stem[2], run_cm(
            self.backbone.stem[1], run_cm(self.backbone.stem[0], x)))
        for i in range(4):
            stage = getattr(self.backbone, f"stage{i + 1}")
            x = run_cm(stage[0], x)
            for m in stage[1:]:
                x = m(x)
        x = self.head.final_layer(x).flatten(2)     # [B, K, H*W]
        x = self.head.gau(self.head.mlp(x))
        return self.head.cls_x(x), self.head.cls_y(x)


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(7)
    tm = TorchRTMPose().eval()
    # randomize BN stats so parity exercises the running-stat path
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
    variables = convert_rtmpose(tm.state_dict(), deepen=DEEPEN, widen=WIDEN)
    return tm, variables


def test_simcc_logit_parity(twins):
    tm, variables = twins
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, INPUT_H, INPUT_W, 3)).astype(np.float32)
    with torch.no_grad():
        tx, ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    import flax.linen as fnn

    class Logits(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            from mere_fusion_tpu.models.rtmpose import CSPNeXt, RTMCCHead
            feats = CSPNeXt(DEEPEN, WIDEN, dtype=jnp.float32,
                            name="backbone")(x)
            return RTMCCHead(dtype=jnp.float32, name="head")(feats)

    jx, jy = Logits().apply(variables, jnp.asarray(x))
    dx = float(np.abs(np.asarray(jx) - tx.numpy()).max())
    dy = float(np.abs(np.asarray(jy) - ty.numpy()).max())
    assert dx < 3e-4 and dy < 3e-4, (dx, dy)


def test_keypoint_decode_parity(twins):
    tm, variables = twins
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, INPUT_H, INPUT_W, 3)).astype(np.float32)
    with torch.no_grad():
        tx, ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # mmpose get_simcc_maximum (use_dark=False)
    want_x = tx.numpy().argmax(-1) / SIMCC_RATIO
    want_y = ty.numpy().argmax(-1) / SIMCC_RATIO
    want_s = np.minimum(tx.numpy().max(-1), ty.numpy().max(-1))
    model = RTMPose(deepen=DEEPEN, widen=WIDEN, dtype=jnp.float32)
    kpts, score = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(kpts)[..., 0], want_x, atol=0.51)
    np.testing.assert_allclose(np.asarray(kpts)[..., 1], want_y, atol=0.51)
    np.testing.assert_allclose(np.asarray(score), want_s, atol=3e-4)


def test_bbox_center_scale():
    # square 100px box at (50..150): padded 125, aspect-fixed to 288/384
    c, s = bbox_center_scale(np.array([[50.0, 50.0, 150.0, 150.0]]))
    np.testing.assert_allclose(c[0], [100.0, 100.0])
    # h*ratio = 125*0.75 = 93.75 < w=125 -> w kept, h = 125/0.75
    np.testing.assert_allclose(s[0], [125.0, 125.0 / (288.0 / 384.0)])
    # wide box: w < h*ratio -> w lifted
    c2, s2 = bbox_center_scale(np.array([[0.0, 0.0, 30.0, 400.0]]))
    np.testing.assert_allclose(s2[0], [500.0 * 0.75, 500.0])


def test_crop_affine_matches_cv2_resize():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (200, 160, 3)).astype(np.float32)
    # full-frame box without padding == plain bilinear resize
    center = np.array([[80.0, 100.0]], np.float32)
    scale = np.array([[160.0, 200.0]], np.float32)
    got = np.asarray(crop_affine(jnp.asarray(img[None]),
                                 jnp.asarray(center), jnp.asarray(scale)))[0]
    want = cv2.resize(img, (INPUT_W, INPUT_H), interpolation=cv2.INTER_LINEAR)
    # interiors match to float rounding on the 0-255 scale (a half-pixel
    # convention mismatch would show O(1) errors; borders differ by
    # clamp-vs-replicate policy)
    assert np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2]).max() < 1e-2


def test_landmarker_contract(twins):
    _, variables = twins
    lm = WholebodyLandmarker(variables, dtype=jnp.float32,
                             deepen=DEEPEN, widen=WIDEN)
    img = np.zeros((240, 320, 3), np.float32)
    out = lm.landmarks_from_boxes(img, [np.array([10, 10, 60, 60])])
    assert len(out) == 1 and out[0].shape == (68, 2)
    assert FACE_SLICE == slice(23, 91)
    kpts, score = lm.wholebody(img[None],
                               np.array([[0, 0, 320, 240]], np.float32))
    assert kpts.shape == (1, NUM_KEYPOINTS, 2)
    assert score.shape == (1, NUM_KEYPOINTS)
