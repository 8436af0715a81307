"""OCR pair (CRAFT detector + CRNN recognizer): torch parity, converters,
CTC decode, box extraction, reader + perception contracts.

The reference reads scene text with easyocr (yolo_opencv.py:189-199);
models/ocr.py rebuilds the CRAFT + "None-VGG-BiLSTM-CTC" topologies in
flax. The torch side here is rebuilt inline (easyocr absent), exercising
utils/torch_convert.convert_craft / convert_crnn on the real state-dict
key layout ordering.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mere_fusion_tpu.models.ocr import (  # noqa: E402
    CRAFT,
    CRNN,
    DEFAULT_CHARSET,
    TextReader,
    ctc_greedy,
)
from mere_fusion_tpu.utils.torch_convert import (  # noqa: E402
    convert_craft,
    convert_crnn,
)

WIDTH = 0.125
_c = lambda n: max(int(round(n * WIDTH)), 4)


def _randomize_bn(module):
    """Non-trivial running stats so conversion of mean/var is exercised."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


class TDouble(tnn.Module):
    def __init__(self, cin, mid, out):
        super().__init__()
        self.conv_0 = tnn.Conv2d(cin, mid, 1)
        self.bn_0 = tnn.BatchNorm2d(mid)
        self.conv_1 = tnn.Conv2d(mid, out, 3, padding=1)
        self.bn_1 = tnn.BatchNorm2d(out)

    def forward(self, x):
        x = torch.relu(self.bn_0(self.conv_0(x)))
        return torch.relu(self.bn_1(self.conv_1(x)))


class TorchCRAFT(tnn.Module):
    """Inline twin of models/ocr.py::CRAFT at width=WIDTH."""

    def __init__(self):
        super().__init__()
        convs, bns, cin = [], [], 3
        for ch, reps in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
            for _ in range(reps):
                convs.append(tnn.Conv2d(cin, _c(ch), 3, padding=1))
                bns.append(tnn.BatchNorm2d(_c(ch)))
                cin = _c(ch)
        self.convs = tnn.ModuleList(convs)
        self.bns = tnn.ModuleList(bns)
        self.fc6 = tnn.Conv2d(cin, _c(1024), 3, padding=6, dilation=6)
        self.fc7 = tnn.Conv2d(_c(1024), _c(1024), 1)
        self.up_0 = TDouble(_c(1024) + _c(512), _c(512), _c(256))
        self.up_1 = TDouble(_c(256) + _c(512), _c(256), _c(128))
        self.up_2 = TDouble(_c(128) + _c(256), _c(128), _c(64))
        self.up_3 = TDouble(_c(64) + _c(128), _c(64), _c(32))
        self.cls_0 = tnn.Conv2d(_c(32), _c(32), 3, padding=1)
        self.cls_1 = tnn.Conv2d(_c(32), _c(32), 3, padding=1)
        self.cls_2 = tnn.Conv2d(_c(32), _c(16), 3, padding=1)
        self.cls_3 = tnn.Conv2d(_c(16), _c(16), 1)
        self.cls_4 = tnn.Conv2d(_c(16), 2, 1)

    def forward(self, x):
        f, i = [], 0
        for si, (ch, reps) in enumerate(
                ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))):
            for _ in range(reps):
                x = torch.relu(self.bns[i](self.convs[i](x)))
                i += 1
            f.append(x)
            if si < 4:
                x = torch.max_pool2d(x, 2, 2)
        x = torch.max_pool2d(x, 3, 1, padding=1)
        x = torch.relu(self.fc6(x))
        x = torch.relu(self.fc7(x))
        up = lambda y, like: F.interpolate(
            y, size=like.shape[2:], mode="bilinear", align_corners=False)
        y = self.up_0(torch.cat([x, f[4]], 1))
        y = self.up_1(torch.cat([up(y, f[3]), f[3]], 1))
        y = self.up_2(torch.cat([up(y, f[2]), f[2]], 1))
        y = self.up_3(torch.cat([up(y, f[1]), f[1]], 1))
        y = torch.relu(self.cls_0(y))
        y = torch.relu(self.cls_1(y))
        y = torch.relu(self.cls_2(y))
        y = torch.relu(self.cls_3(y))
        return self.cls_4(y)


class TorchCRNN(tnn.Module):
    """Inline twin of models/ocr.py::CRNN (torch LSTM gate semantics)."""

    def __init__(self, n_classes, oc, hidden):
        super().__init__()
        ch = (oc // 8, oc // 4, oc // 2, oc)
        self.conv_0 = tnn.Conv2d(1, ch[0], 3, padding=1)
        self.conv_1 = tnn.Conv2d(ch[0], ch[1], 3, padding=1)
        self.conv_2 = tnn.Conv2d(ch[1], ch[2], 3, padding=1)
        self.conv_3 = tnn.Conv2d(ch[2], ch[2], 3, padding=1)
        self.conv_4 = tnn.Conv2d(ch[2], ch[3], 3, padding=1, bias=False)
        self.bn_4 = tnn.BatchNorm2d(ch[3])
        self.conv_5 = tnn.Conv2d(ch[3], ch[3], 3, padding=1, bias=False)
        self.bn_5 = tnn.BatchNorm2d(ch[3])
        self.conv_6 = tnn.Conv2d(ch[3], ch[3], 2)
        self.lstm_0 = tnn.LSTM(ch[3], hidden, bidirectional=True)
        self.proj_0 = tnn.Linear(2 * hidden, hidden)
        self.lstm_1 = tnn.LSTM(hidden, hidden, bidirectional=True)
        self.proj_1 = tnn.Linear(2 * hidden, hidden)
        self.head = tnn.Linear(hidden, n_classes)

    def forward(self, x):
        x = torch.max_pool2d(torch.relu(self.conv_0(x)), 2, 2)
        x = torch.max_pool2d(torch.relu(self.conv_1(x)), 2, 2)
        x = torch.relu(self.conv_2(x))
        x = torch.max_pool2d(torch.relu(self.conv_3(x)), (2, 1), (2, 1))
        x = torch.relu(self.bn_4(self.conv_4(x)))
        x = torch.max_pool2d(torch.relu(self.bn_5(self.conv_5(x))),
                             (2, 1), (2, 1))
        x = torch.relu(self.conv_6(x))
        x = x.mean(dim=2)                       # collapse H (AdaptiveAvgPool)
        x = x.permute(2, 0, 1)                  # (T, N, C)
        x = self.proj_0(self.lstm_0(x)[0])
        x = self.proj_1(self.lstm_1(x)[0])
        return self.head(x).permute(1, 0, 2)    # (N, T, classes)


def test_craft_parity():
    torch.manual_seed(0)
    tm = TorchCRAFT().eval()
    _randomize_bn(tm)
    variables = convert_craft(tm.state_dict())
    x = np.random.default_rng(1).random((1, 64, 96, 3), np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(CRAFT(width=WIDTH).apply(variables, jnp.asarray(x)))
    assert got.shape == (1, 32, 48, 2)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=3e-4)


def test_craft_converter_rejects_wrong_layout():
    with pytest.raises(ValueError, match="CRAFT checkpoint"):
        convert_craft({"a.weight": torch.zeros(4, 3, 3, 3),
                       "a.bias": torch.zeros(4)})


def test_crnn_parity():
    torch.manual_seed(2)
    n_cls = 1 + len(DEFAULT_CHARSET)
    tm = TorchCRNN(n_cls, oc=32, hidden=16).eval()
    _randomize_bn(tm)
    variables = convert_crnn(tm.state_dict())
    x = np.random.default_rng(3).random((2, 64, 32, 1), np.float32) * 2 - 1
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(CRNN(n_classes=n_cls, output_channel=32, hidden=16)
                     .apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 7, n_cls)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ctc_greedy_collapse():
    # blank=0; "ab" from 0,a,a,0,b,b; repeats collapse, blanks split repeats
    a = DEFAULT_CHARSET.index("a") + 1
    b = DEFAULT_CHARSET.index("b") + 1
    assert ctc_greedy(np.array([0, a, a, 0, b, b])) == "ab"
    assert ctc_greedy(np.array([a, 0, a])) == "aa"
    assert ctc_greedy(np.array([0, 0, 0])) == ""


@pytest.fixture(scope="module")
def _shared_reader():
    # One TextReader for all contract tests: init + jit compiles dominate
    # the module's runtime, and the tests only differ in the fabricated
    # detection maps they inject.
    return TextReader(width=WIDTH)


@pytest.fixture()
def reader(_shared_reader):
    orig = _shared_reader._det
    yield _shared_reader
    _shared_reader._det = orig


def test_detect_box_extraction(reader):
    """Component grouping + thresholds on fabricated score maps."""
    maps = np.zeros((1, 160, 160, 2), np.float32)
    maps[0, 10:14, 10:30, 0] = 0.9          # strong word
    maps[0, 40:44, 10:30, 0] = 0.5          # above low_text, below text_thr
    maps[0, 60:62, 10:12, 0] = 0.9          # tiny blob: area-filtered
    reader._det = lambda v, x: jnp.asarray(maps)
    frame = np.zeros((320, 320, 3), np.uint8)
    boxes = reader.detect(frame)
    assert len(boxes) == 1
    quad = np.asarray(boxes[0])
    assert quad.shape == (4, 2)
    # map coords scale ×2 back to the 320px frame
    assert 10 <= quad[:, 0].min() <= 24 and 48 <= quad[:, 0].max() <= 70
    assert 12 <= quad[:, 1].min() <= 32


def test_reader_end_to_end_contract(reader):
    """readtext returns [(quad, text, conf)] and recognition batches by
    width bucket; random weights, so only the contract is asserted."""
    maps = np.zeros((1, 160, 160, 2), np.float32)
    maps[0, 20:26, 10:40, 0] = 0.9
    maps[0, 50:56, 20:90, 0] = 0.9
    reader._det = lambda v, x: jnp.asarray(maps)
    frame = np.random.default_rng(4).integers(0, 255, (320, 320, 3), np.uint8)
    out = reader.readtext(frame)
    assert isinstance(out, list)
    for quad, text, conf in out:
        assert np.asarray(quad).shape == (4, 2)
        assert isinstance(text, str) and text
        assert 0.0 <= conf <= 1.0
    texts = reader.recognize([np.random.default_rng(5).integers(
        0, 255, (20, w), np.uint8).astype(np.uint8) for w in (30, 300, 900)])
    assert len(texts) == 3


def test_perception_ocr_wiring(reader):
    from mere_fusion_tpu.perception import TPUYoloPerception

    class NoPerson:
        def detect(self, frame, conf):
            return []

    maps = np.zeros((1, 160, 160, 2), np.float32)
    maps[0, 20:26, 10:60, 0] = 0.9
    reader._det = lambda v, x: jnp.asarray(maps)
    p = TPUYoloPerception(detector=NoPerson(), fps_throttle=1,
                          use_deepface=False, ocr=reader)
    frame = np.random.default_rng(6).integers(0, 255, (320, 320, 3), np.uint8)
    summary = p.process_frame(frame)
    assert summary.startswith("scene contains")
    # random weights may decode to empty text; when text survives, it must
    # be folded into the sentence with the easyocr wording
    if "visible text" in summary:
        assert "; visible text: " in summary
