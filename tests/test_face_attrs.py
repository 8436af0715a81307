"""Face-attribute nets: torch parity, Keras-h5 converter, analyzer contract.

The reference folds DeepFace.analyze(age/gender/race/emotion) into its scene
summary (reference: yolo_opencv.py:202-217). deepface is absent here, so
models/face_attrs.py rebuilds the public DeepFace topologies in flax; this
file checks them three ways, per the repo parity convention:

- inline torch twins at random weights through utils/torch_convert
  (convert_vggface_attr / convert_emotion_net), max |Δ| on output probs;
- a synthetic Keras-format .h5 weight file through utils/keras_convert,
  asserting identical numerics and loud shape-mismatch errors;
- FaceAttributeAnalyzer.analyze output-dict contract (DeepFace key layout).
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mere_fusion_tpu.models.face_attrs import (  # noqa: E402
    EMOTION_LABELS,
    GENDER_LABELS,
    EmotionNet,
    FaceAttributeAnalyzer,
    VGGFaceAttr,
    apparent_age,
)
from mere_fusion_tpu.utils.torch_convert import (  # noqa: E402
    convert_emotion_net,
    convert_vggface_attr,
)

WIDTH = 0.125  # narrow twins keep CPU parity runs fast
_c = lambda n: max(int(round(n * WIDTH)), 4)


class TorchVGGAttr(tnn.Module):
    """Torch twin of VGGFaceAttr (13 convs + conv-fc pair + 1x1 head)."""

    def __init__(self, n_classes: int):
        super().__init__()
        layers, cin = [], 3
        for ch, reps in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
            for _ in range(reps):
                layers.append(tnn.Conv2d(cin, _c(ch), 3, padding=1))
                cin = _c(ch)
        self.convs = tnn.ModuleList(layers)
        self.fc_0 = tnn.Conv2d(cin, _c(4096), 7)
        self.fc_1 = tnn.Conv2d(_c(4096), _c(4096), 1)
        self.head = tnn.Conv2d(_c(4096), n_classes, 1)

    def forward(self, x):
        i = 0
        for ch, reps in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
            for _ in range(reps):
                x = torch.relu(self.convs[i](x))
                i += 1
            x = torch.max_pool2d(x, 2, 2)
        x = torch.relu(self.fc_0(x))
        x = torch.relu(self.fc_1(x))
        x = self.head(x).flatten(1)
        return torch.softmax(x, dim=-1)


class TorchEmotion(tnn.Module):
    """Torch twin of EmotionNet, flattening NHWC like Keras Flatten()."""

    def __init__(self):
        super().__init__()
        self.conv_0 = tnn.Conv2d(1, _c(64), 5)
        self.conv_1 = tnn.Conv2d(_c(64), _c(64), 3)
        self.conv_2 = tnn.Conv2d(_c(64), _c(64), 3)
        self.conv_3 = tnn.Conv2d(_c(64), _c(128), 3)
        self.conv_4 = tnn.Conv2d(_c(128), _c(128), 3)
        self.dense_0 = tnn.Linear(_c(128), _c(1024))
        self.dense_1 = tnn.Linear(_c(1024), _c(1024))
        self.dense_2 = tnn.Linear(_c(1024), 7)

    def forward(self, x):
        x = torch.relu(self.conv_0(x))
        x = torch.max_pool2d(x, 5, 2)
        x = torch.relu(self.conv_1(x))
        x = torch.relu(self.conv_2(x))
        x = torch.nn.functional.avg_pool2d(x, 3, 2)
        x = torch.relu(self.conv_3(x))
        x = torch.relu(self.conv_4(x))
        x = torch.nn.functional.avg_pool2d(x, 3, 2)
        x = x.permute(0, 2, 3, 1).flatten(1)  # NHWC flatten (Keras order)
        x = torch.relu(self.dense_0(x))
        x = torch.relu(self.dense_1(x))
        return torch.softmax(self.dense_2(x), dim=-1)


def test_vggface_attr_parity():
    torch.manual_seed(0)
    tm = TorchVGGAttr(n_classes=6).eval()
    variables = convert_vggface_attr(tm.state_dict())
    x = np.random.default_rng(1).random((2, 224, 224, 3), np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(VGGFaceAttr(n_classes=6, width=WIDTH).apply(
        variables, jnp.asarray(x)))
    assert got.shape == (2, 6)
    np.testing.assert_allclose(got, want, atol=3e-4)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_emotion_net_parity():
    torch.manual_seed(2)
    tm = TorchEmotion().eval()
    variables = convert_emotion_net(tm.state_dict())
    x = np.random.default_rng(3).random((3, 48, 48, 1), np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(EmotionNet(width=WIDTH).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _write_keras_h5(path, named_arrays):
    """Minimal Keras weight file: layer_names attr + nested kernel/bias:0."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n, _ in named_arrays])
        for name, arrays in named_arrays:
            g = f.create_group(name)
            if arrays is None:  # weightless layer (pooling etc.)
                g.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            wn = [f"{name}/kernel:0", f"{name}/bias:0"]
            g.attrs["weight_names"] = np.array([s.encode() for s in wn])
            for s, a in zip(wn, arrays):
                g.create_dataset(s, data=a)


def test_keras_h5_roundtrip(tmp_path):
    """h5 file written with the torch twin's converted weights reproduces
    the torch output exactly through convert_emotion_h5."""
    from mere_fusion_tpu.utils.keras_convert import convert_emotion_h5

    torch.manual_seed(4)
    tm = TorchEmotion().eval()
    params = convert_emotion_net(tm.state_dict())["params"]
    order = [f"conv_{i}" for i in range(5)] + [f"dense_{i}" for i in range(3)]
    named = [("input_1", None)]  # weightless layer exercises the skip path
    named += [(n, [params[n]["kernel"], params[n]["bias"]]) for n in order]
    path = str(tmp_path / "emotion.h5")
    _write_keras_h5(path, named)

    variables = convert_emotion_h5(path, width=WIDTH)
    x = np.random.default_rng(5).random((2, 48, 48, 1), np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(EmotionNet(width=WIDTH).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_keras_h5_shape_mismatch_is_loud(tmp_path):
    from mere_fusion_tpu.utils.keras_convert import convert_emotion_h5

    named = [("conv2d", [np.zeros((9, 9, 1, 4), np.float32),
                         np.zeros((4,), np.float32)])]
    path = str(tmp_path / "bad.h5")
    _write_keras_h5(path, named)
    with pytest.raises(ValueError, match="weighted layers"):
        convert_emotion_h5(path, width=WIDTH)


def test_apparent_age_expectation():
    probs = np.zeros((1, 101), np.float32)
    probs[0, 30], probs[0, 40] = 0.5, 0.5
    assert float(apparent_age(jnp.asarray(probs))[0]) == pytest.approx(35.0)


def test_analyzer_contract():
    """analyze() emits the DeepFace key layout the reference consumes
    (yolo_opencv.py:203-216): age int, distributions in percent,
    dominant_* labels, region boxes per detected face."""
    analyzer = FaceAttributeAnalyzer.init_random(
        tasks=("age", "gender", "emotion"), width=WIDTH, seed=1,
        detector=lambda frame: [(10, 10, 90, 110), (120, 20, 200, 100)])
    frame = np.random.default_rng(6).integers(
        0, 255, (240, 320, 3), np.uint8)
    faces = analyzer.analyze(frame)
    assert len(faces) == 2
    for f in faces:
        assert isinstance(f["age"], int) and 0 <= f["age"] <= 100
        assert f["dominant_gender"] in GENDER_LABELS
        assert f["dominant_emotion"] in EMOTION_LABELS
        assert sum(f["gender"].values()) == pytest.approx(100.0, abs=1e-2)
        assert sum(f["emotion"].values()) == pytest.approx(100.0, abs=1e-2)
        assert set(f["region"]) == {"x", "y", "w", "h"}
    assert faces[0]["region"] == {"x": 10, "y": 10, "w": 80, "h": 100}
    # no detector → whole frame analyzed once (enforce_detection=False path)
    whole = FaceAttributeAnalyzer.init_random(
        tasks=("emotion",), width=WIDTH, seed=1)
    assert len(whole.analyze(frame)) == 1


def test_perception_wiring():
    """TPUYoloPerception folds our analyzer into the summary sentence."""
    from mere_fusion_tpu.perception import TPUYoloPerception

    class OnePerson:
        def detect(self, frame, conf):
            return [((0, 0, 50, 50), 0.9, "person")]

    analyzer = FaceAttributeAnalyzer.init_random(
        tasks=("age", "gender", "emotion"), width=WIDTH, seed=2)
    p = TPUYoloPerception(detector=OnePerson(), fps_throttle=1,
                          use_ocr=False, face_attrs=analyzer)
    frame = np.random.default_rng(7).integers(
        0, 255, (120, 160, 3), np.uint8)
    summary = p.process_frame(frame)
    assert "1 person(s)" in summary
    assert "person appears" in summary and "years old" in summary
