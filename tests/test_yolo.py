"""YOLOv10 flax twin: numerical parity vs an inline-torch rebuild, the
checkpoint converter, the tolerant ultralytics unpickler, and the v10
NMS-free top-k selection.

ultralytics is absent in this environment; as with MuseTalk
(tests/test_musetalk_parity.py), the torch side is rebuilt inline from the
architecture the reference depends on (reference: yolo_opencv.py:42,
152-158), using the same attribute names ultralytics uses so the converter
exercises the real checkpoint key layout.
"""
from __future__ import annotations

import os
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mere_fusion_tpu.models.yolo import (  # noqa: E402
    REG_MAX,
    YoloDetector,
    YoloV10,
    letterbox,
    make_anchors,
)
from mere_fusion_tpu.utils.yolo_convert import (  # noqa: E402
    convert_yolo,
    load_ultralytics_state_dict,
)

# Small-but-complete spec: exercises every block type incl. RepVGGDW (lk)
# and the PSA attention. Channels keep PSA's half-width ≥64 (one head).
TINY_SPEC = (
    (-1, 1, "Conv", (16, 3, 2)),
    (-1, 1, "Conv", (32, 3, 2)),
    (-1, 1, "C2f", (32, True)),
    (-1, 1, "Conv", (48, 3, 2)),        # P3/8
    (-1, 2, "C2f", (48, True)),
    (-1, 1, "SCDown", (64, 3, 2)),      # P4/16
    (-1, 1, "C2fCIB", (64, True)),
    (-1, 1, "SCDown", (128, 3, 2)),     # P5/32
    (-1, 1, "C2fCIB", (128, True, True)),
    (-1, 1, "SPPF", (128, 5)),
    (-1, 1, "PSA", (128,)),
    (-1, 1, "Upsample", ()),
    ((-1, 6), 1, "Concat", ()),
    (-1, 1, "C2fCIB", (64, True)),
    (-1, 1, "Upsample", ()),
    ((-1, 4), 1, "Concat", ()),
    (-1, 1, "C2f", (48,)),
    (-1, 1, "Conv", (48, 3, 2)),
    ((-1, 13), 1, "Concat", ()),
    (-1, 1, "C2fCIB", (64, True)),
    (-1, 1, "SCDown", (64, 3, 2)),
    ((-1, 10), 1, "Concat", ()),
    (-1, 1, "C2fCIB", (128, True)),
    ((16, 19, 22), 1, "Detect", ()),
)
NC = 8
IMGSZ = 64


# ---- inline torch twin (ultralytics attribute names, scale "l": w=d=1) ----

def autopad(k):
    return k // 2


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU() if act else tnn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c1, c2, shortcut=True, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0], 1)
        self.cv2 = TConv(c_, c2, k[1], 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TBottleneck(self.c, self.c, shortcut, (3, 3), 1.0)
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TSCDown(tnn.Module):
    def __init__(self, c1, c2, k, s):
        super().__init__()
        self.cv1 = TConv(c1, c2, 1, 1)
        self.cv2 = TConv(c2, c2, k, s, g=c2, act=False)

    def forward(self, x):
        return self.cv2(self.cv1(x))


class TRepVGGDW(tnn.Module):
    def __init__(self, ed):
        super().__init__()
        self.conv = TConv(ed, ed, 7, 1, g=ed, act=False)
        self.conv1 = TConv(ed, ed, 3, 1, g=ed, act=False)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.conv(x) + self.conv1(x))


class TCIB(tnn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = tnn.Sequential(
            TConv(c1, c1, 3, g=c1),
            TConv(c1, 2 * c_, 1),
            TRepVGGDW(2 * c_) if lk else TConv(2 * c_, 2 * c_, 3, g=2 * c_),
            TConv(2 * c_, c2, 1),
            TConv(c2, c2, 3, g=c2),
        )
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv1(x) if self.add else self.cv1(x)


class TC2fCIB(TC2f):
    def __init__(self, c1, c2, n=1, shortcut=False, lk=False):
        super().__init__(c1, c2, n, shortcut)
        self.m = tnn.ModuleList(
            TCIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n))


class TAttention(tnn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W))
        return self.proj(x)


class TPSA(tnn.Module):
    def __init__(self, c1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv(2 * self.c, c1, 1)
        self.attn = TAttention(self.c, attn_ratio=0.5,
                               num_heads=max(self.c // 64, 1))
        self.ffn = tnn.Sequential(TConv(self.c, self.c * 2, 1),
                                  TConv(self.c * 2, self.c, 1, act=False))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = b + self.attn(b)
        b = b + self.ffn(b)
        return self.cv2(torch.cat((a, b), 1))


class TV10Detect(tnn.Module):
    """one2one branch of v10Detect + ultralytics decode (DFL + dist2bbox)."""

    def __init__(self, nc, ch):
        super().__init__()
        self.nc = nc
        c2 = max(16, ch[0] // 4, REG_MAX * 4)
        c3 = max(ch[0], min(nc, 100))
        self.one2one_cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * REG_MAX, 1)) for x in ch)
        self.one2one_cv3 = tnn.ModuleList(
            tnn.Sequential(
                tnn.Sequential(TConv(x, x, 3, g=x), TConv(x, c3, 1)),
                tnn.Sequential(TConv(c3, c3, 3, g=c3), TConv(c3, c3, 1)),
                tnn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats, strides):
        boxes, scores, anchors, strs = [], [], [], []
        for i, x in enumerate(feats):
            b = self.one2one_cv2[i](x)
            c = self.one2one_cv3[i](x)
            n = x.shape[0]
            boxes.append(b.view(n, 4 * REG_MAX, -1))
            scores.append(c.view(n, self.nc, -1))
            h, w = x.shape[2:]
            sy, sx = torch.meshgrid(torch.arange(h, dtype=torch.float32) + 0.5,
                                    torch.arange(w, dtype=torch.float32) + 0.5,
                                    indexing="ij")
            anchors.append(torch.stack((sx, sy), -1).view(-1, 2))
            strs.append(torch.full((h * w, 1), strides[i],
                                   dtype=torch.float32))
        box = torch.cat(boxes, 2)
        cls = torch.cat(scores, 2)
        anc = torch.cat(anchors, 0)
        st = torch.cat(strs, 0)
        # DFL: softmax over 16 bins → expectation (the constant conv)
        b, _, a = box.shape
        p = box.view(b, 4, REG_MAX, a).transpose(2, 1).softmax(1)
        dist = (p * torch.arange(REG_MAX, dtype=torch.float32)
                .view(1, REG_MAX, 1, 1)).sum(1)  # (b, 4, a)
        lt, rb = dist.split(2, dim=1)
        anc_t = anc.t().unsqueeze(0)
        xyxy = torch.cat([anc_t - lt, anc_t + rb], 1) * st.t().unsqueeze(0)
        return xyxy.permute(0, 2, 1), cls.sigmoid().permute(0, 2, 1)


class TorchYoloTiny(tnn.Module):
    def __init__(self, spec=TINY_SPEC, nc=NC):
        super().__init__()
        layers = []
        chans: list[int] = []
        c_in = 3
        self.detect_from = None
        for i, (frm, n, mod, args) in enumerate(spec):
            if mod == "Conv":
                layers.append(TConv(c_in, args[0], args[1], args[2]))
                c_in = args[0]
            elif mod == "C2f":
                layers.append(TC2f(c_in, args[0], n,
                                   bool(args[1]) if len(args) > 1 else False))
                c_in = args[0]
            elif mod == "C2fCIB":
                layers.append(TC2fCIB(
                    c_in, args[0], n,
                    bool(args[1]) if len(args) > 1 else False,
                    bool(args[2]) if len(args) > 2 else False))
                c_in = args[0]
            elif mod == "SCDown":
                layers.append(TSCDown(c_in, args[0], args[1], args[2]))
                c_in = args[0]
            elif mod == "SPPF":
                layers.append(TSPPF(c_in, args[0], args[1]))
                c_in = args[0]
            elif mod == "PSA":
                layers.append(TPSA(args[0]))
                c_in = args[0]
            elif mod == "Upsample":
                layers.append(tnn.Upsample(scale_factor=2, mode="nearest"))
            elif mod == "Concat":
                layers.append(tnn.Identity())
                chans.append(0)  # placeholder, fixed below
            elif mod == "Detect":
                self.detect_from = frm
                ch = tuple(chans[j] for j in frm)
                layers.append(TV10Detect(nc, ch))
            if mod == "Concat":
                c_in = sum(chans[j] if j != -1 else c_in for j in frm)
                chans[-1] = c_in
            elif mod != "Detect":
                chans.append(c_in)
        self.model = tnn.ModuleList(layers)
        self.spec = spec

    def forward(self, x):
        ys = []
        for i, (frm, n, mod, args) in enumerate(self.spec):
            if mod == "Concat":
                x = torch.cat([ys[j] if j != -1 else x for j in frm], 1)
            elif mod == "Detect":
                feats = [ys[j] for j in frm]
                return self.model[i](feats, (8, 16, 32))
            else:
                x = self.model[i](x)
            ys.append(x)


def _randomize(model: tnn.Module, seed: int = 0) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (tnn.Conv2d,)):
            tnn.init.normal_(m.weight, std=0.05, generator=g)
            if m.bias is not None:
                tnn.init.normal_(m.bias, std=0.05, generator=g)
        elif isinstance(m, tnn.BatchNorm2d):
            tnn.init.normal_(m.weight, mean=1.0, std=0.1, generator=g)
            tnn.init.normal_(m.bias, std=0.1, generator=g)
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()


@pytest.fixture(scope="module")
def twin():
    t = TorchYoloTiny()
    _randomize(t)
    variables = convert_yolo(t.state_dict())
    return t, variables


def test_parity_vs_inline_torch(twin):
    t, variables = twin
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, IMGSZ, IMGSZ, 3)).astype(np.float32)
    model = YoloV10(scale="l", nc=NC, imgsz=IMGSZ, spec=TINY_SPEC,
                    return_raw=True)
    boxes_j, scores_j = jax.jit(model.apply)(variables, jnp.asarray(img))
    with torch.no_grad():
        boxes_t, scores_t = t(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(scores_j), scores_t.numpy(),
                               atol=3e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(boxes_j), boxes_t.numpy(),
                               atol=3e-3, rtol=0)


def test_topk_selection_matches_torch_postprocess(twin):
    """Our in-graph top-k = torch v10 postprocess (top anchors by max class
    score, then top (anchor, class) pairs)."""
    t, variables = twin
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, IMGSZ, IMGSZ, 3)).astype(np.float32)
    max_det = 17
    model = YoloV10(scale="l", nc=NC, imgsz=IMGSZ, spec=TINY_SPEC,
                    max_det=max_det)
    b_j, s_j, c_j = jax.jit(model.apply)(variables, jnp.asarray(img))
    with torch.no_grad():
        boxes_t, scores_t = t(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    idx = scores_t.amax(-1).topk(max_det, dim=-1)[1].unsqueeze(-1)
    boxes_k = boxes_t.gather(1, idx.repeat(1, 1, 4))
    scores_k = scores_t.gather(1, idx.repeat(1, 1, NC))
    sc, fi = scores_k.flatten(1).topk(max_det, dim=-1)
    np.testing.assert_allclose(np.asarray(s_j), sc.numpy(), atol=3e-4)
    np.testing.assert_array_equal(np.asarray(c_j), (fi % NC).numpy())
    np.testing.assert_allclose(
        np.asarray(b_j), boxes_k.gather(
            1, (fi // NC).unsqueeze(-1).repeat(1, 1, 4)).numpy(), atol=3e-3)


def test_tolerant_unpickler_without_package(tmp_path):
    """A checkpoint pickled with classes from an uninstalled package still
    yields its tensors (the real yolov10x.pt case: ultralytics classes)."""
    modfile = tmp_path / "fake_ultra.py"
    modfile.write_text(textwrap.dedent("""
        import torch.nn as nn

        class FancyModel(nn.Module):
            def __init__(self):
                super().__init__()
                self.model = nn.Sequential(
                    nn.Conv2d(3, 4, 3, bias=False), nn.BatchNorm2d(4))
            custom_attr = "not a tensor"
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        import fake_ultra

        m = fake_ultra.FancyModel()
        want = {k: v.clone() for k, v in m.state_dict().items()}
        ckpt = tmp_path / "fake.pt"
        torch.save({"model": m, "train_args": fake_ultra.FancyModel}, ckpt)
    finally:
        sys.path.remove(str(tmp_path))
        del sys.modules["fake_ultra"]
    os.remove(modfile)  # now the class is unimportable — stubs must kick in

    sd = load_ultralytics_state_dict(str(ckpt))
    assert set(sd) == {k for k in want if "num_batches" not in k} | {
        k for k in want if k.endswith("num_batches_tracked")}
    for k, v in want.items():
        np.testing.assert_array_equal(sd[k].detach().numpy(), v.numpy())


def test_detector_wrapper_end_to_end(twin):
    t, variables = twin
    det = YoloDetector(variables, scale="l", nc=NC, imgsz=IMGSZ,
                       max_det=10, names=[f"c{i}" for i in range(NC)],
                       dtype=jnp.float32, spec=TINY_SPEC)
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    out = det.detect(frame, conf=0.0)
    assert 0 < len(out) <= 10
    for xyxy, score, name in out:
        assert xyxy.shape == (4,)
        assert 0.0 <= score <= 1.0
        assert (xyxy >= -1e-3).all() and (xyxy[2] <= 128.0 + 1e-3) \
            and (xyxy[3] <= 96.0 + 1e-3)
        assert name.startswith("c")
    # scores sorted descending (top_k contract the conf cutoff relies on)
    scores = [s for _, s, _ in out]
    assert scores == sorted(scores, reverse=True)


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    canvas, gain, (px, py) = letterbox(img, 64)
    assert canvas.shape == (64, 64, 3)
    assert gain == pytest.approx(64 / 200)
    assert px == 0 and py == (64 - round(100 * gain)) // 2
    # padding is gray 114 outside the image area
    assert (canvas[0] == 114).all() and (canvas[-1] == 114).all()


def test_make_anchors_layout():
    pts, strides = make_anchors(64)
    assert pts.shape == (8 * 8 + 4 * 4 + 2 * 2, 2)
    assert strides[0, 0] == 8 and strides[-1, 0] == 32
    # row-major (y, x): second anchor moves in x
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    np.testing.assert_allclose(pts[1], [1.5, 0.5])


def test_tpu_yolo_perception_summary(twin):
    """Same summary contract as the reference summarizer
    (yolo_opencv.py:159-221): throttled, object counts, 'nothing notable'."""
    from mere_fusion_tpu.perception import TPUYoloPerception

    t, variables = twin
    det = YoloDetector(variables, scale="l", nc=NC, imgsz=IMGSZ,
                       max_det=10, names=["person"] + [f"c{i}" for i in
                                                       range(1, NC)],
                       dtype=jnp.float32, spec=TINY_SPEC)
    p = TPUYoloPerception(detector=det, fps_throttle=3, conf=0.0,
                          use_deepface=False, use_ocr=False)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    assert p.process_frame(frame) is None  # throttled
    assert p.process_frame(frame) is None
    summary = p.process_frame(frame)
    assert summary is not None and summary.startswith("scene contains ")
    # conf=1.1 → no detections → the reference's empty-scene phrasing
    p2 = TPUYoloPerception(detector=det, fps_throttle=1, conf=1.1,
                           use_deepface=False, use_ocr=False)
    assert p2.process_frame(frame) == "scene contains nothing notable"


def test_session_builds_perception_from_config(twin):
    """Session._build_perception maps PerceptionConfig → backend."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.perception import StubPerception
    from mere_fusion_tpu.server.sessions import Session

    cfg = Config().override(**{"perception.backend": "stub",
                               "perception.fps_throttle": 4})
    s = Session("sid", engine=object(), cfg=cfg)
    p = s._build_perception()
    assert isinstance(p, StubPerception) and p.fps_throttle == 4


def test_convert_ckpt_cli_and_serving_tree(tmp_path, twin):
    """family=yolo through the converter CLI → orbax dir → serving loader:
    the tree round-trips bit-exactly and commits once per (ckpt, device)."""
    t, variables = twin
    ckpt = tmp_path / "yolov10_tiny.pt"
    torch.save({"model": t}, str(ckpt))

    out = tmp_path / "orbax"
    from mere_fusion_tpu.tools.convert_ckpt import main as convert_main

    convert_main(["yolo", str(ckpt), str(out)])

    from mere_fusion_tpu.engines import shared_device_tree

    tree = shared_device_tree("yolo", str(out))
    again = shared_device_tree("yolo", str(out))
    assert tree is again  # per-(ckpt, chip) cache
    want = jax.tree.leaves(variables)
    got = jax.tree.leaves(tree)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # the tree drives the detector end-to-end
    det = YoloDetector(tree, scale="l", nc=NC, imgsz=IMGSZ, max_det=5,
                       names=[f"c{i}" for i in range(NC)],
                       dtype=jnp.float32, spec=TINY_SPEC)
    frame = np.random.default_rng(4).integers(
        0, 255, (80, 80, 3)).astype(np.uint8)
    assert len(det.detect(frame, conf=0.0)) == 5
