"""Face-attribute models (age / gender / race / emotion) in flax.

The reference's perception plane calls ``DeepFace.analyze(..., actions=
['age', 'gender', 'race', 'emotion'], enforce_detection=False)`` on the
caller's camera frame whenever a person is detected, and folds the result
into the scene summary fed to the LLM (reference: yolo_opencv.py:202-217).
deepface is absent in this environment, so these are ground-up flax
implementations of the public DeepFace model topologies:

- ``VGGFaceAttr`` — the VGG-Face backbone (Parkhi et al., BMVC'15: 13 conv
  layers in 5 blocks + two 4096-wide convolutional "fc" layers) with a 1x1
  conv task head. DeepFace's age (101-way), gender (2-way) and race (6-way)
  classifiers all share this topology and differ only in fine-tuned weights,
  so one module serves all three tasks.
- ``EmotionNet`` — DeepFace's small facial-expression CNN: 48x48 grayscale,
  five VALID convs with max/avg pooling, three dense layers, 7-way softmax.

TPU-first choices: every detected face in a frame is batched into ONE
dispatch per network at a fixed ``MAX_FACES`` batch (static shapes; unused
slots are masked on host), softmax and the apparent-age expectation run on
device, and weights can ride bf16 while the class-probability arithmetic
stays fp32.

Weights: DeepFace distributes Keras ``.h5`` weight files
(age_model_weights.h5 etc.); ``utils/keras_convert.py`` maps them onto these
trees order-based with loud shape checks. Numerics are parity-tested against
inline torch twins at random weights (tests/test_face_attrs.py), the same
pattern as the other model families.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

GENDER_LABELS = ("Woman", "Man")
RACE_LABELS = ("asian", "indian", "black", "white",
               "middle eastern", "latino hispanic")
EMOTION_LABELS = ("angry", "disgust", "fear", "happy",
                  "sad", "surprise", "neutral")

# fixed per-dispatch face batch: static shape for the jitted programs
MAX_FACES = 4

# (channels, repeats) for the five VGG-Face conv blocks
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGGFaceAttr(nn.Module):
    """VGG-Face backbone + n-way 1x1-conv head, softmax output.

    Input: (N, 224, 224, 3) float32 in [0, 1], BGR channel order (DeepFace
    feeds OpenCV frames unconverted). Output: (N, n_classes) probabilities.

    ``width`` scales every channel count (tests run narrow twins; real
    checkpoints use width=1.0).
    """

    n_classes: int
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = lambda n: max(int(round(n * self.width)), 4)
        x = x.astype(self.dtype)
        i = 0
        for channels, reps in _VGG_BLOCKS:
            for _ in range(reps):
                x = nn.Conv(c(channels), (3, 3), padding=1,
                            dtype=self.dtype, name=f"conv_{i}")(x)
                x = nn.relu(x)
                i += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # "fc" layers kept convolutional like the original: 7x7 VALID over
        # the final 7x7 map, then 1x1. Dropout is inference-identity.
        x = nn.relu(nn.Conv(c(4096), (7, 7), padding="VALID",
                            dtype=self.dtype, name="fc_0")(x))
        x = nn.relu(nn.Conv(c(4096), (1, 1), dtype=self.dtype,
                            name="fc_1")(x))
        x = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="head")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return jax.nn.softmax(x, axis=-1)


class EmotionNet(nn.Module):
    """DeepFace's facial-expression CNN (48x48 grayscale → 7-way softmax)."""

    n_classes: int = 7
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = lambda n: max(int(round(n * self.width)), 4)
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(c(64), (5, 5), padding="VALID",
                            dtype=self.dtype, name="conv_0")(x))
        x = nn.max_pool(x, (5, 5), strides=(2, 2))
        x = nn.relu(nn.Conv(c(64), (3, 3), padding="VALID",
                            dtype=self.dtype, name="conv_1")(x))
        x = nn.relu(nn.Conv(c(64), (3, 3), padding="VALID",
                            dtype=self.dtype, name="conv_2")(x))
        x = nn.avg_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(c(128), (3, 3), padding="VALID",
                            dtype=self.dtype, name="conv_3")(x))
        x = nn.relu(nn.Conv(c(128), (3, 3), padding="VALID",
                            dtype=self.dtype, name="conv_4")(x))
        x = nn.avg_pool(x, (3, 3), strides=(2, 2))
        # NHWC flatten — matches Keras Flatten() on channels-last tensors,
        # so converted dense kernels need no permutation.
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(c(1024), dtype=self.dtype, name="dense_0")(x))
        x = nn.relu(nn.Dense(c(1024), dtype=self.dtype, name="dense_1")(x))
        x = nn.Dense(self.n_classes, dtype=self.dtype, name="dense_2")(x)
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def apparent_age(age_probs: jnp.ndarray) -> jnp.ndarray:
    """Expected value over the 101 age bins (DeepFace findApparentAge)."""
    bins = jnp.arange(age_probs.shape[-1], dtype=jnp.float32)
    return jnp.sum(age_probs * bins, axis=-1)


class FaceAttributeAnalyzer:
    """Host wrapper: crop faces, batch them, run the attribute nets on TPU.

    Produces per-face dicts with the DeepFace.analyze key contract
    (reference consumption: yolo_opencv.py:203-216): ``age``,
    ``gender``/``dominant_gender``, ``race``/``dominant_race``,
    ``emotion``/``dominant_emotion``, ``region``. Distributions are percent
    scaled like DeepFace's output.

    Any subset of task params may be supplied; tasks without params are
    omitted from the result dicts. ``detector`` is an optional callable
    ``frame_bgr -> [(x1, y1, x2, y2), ...]`` (e.g. our S3FD wrapper); when
    absent the whole frame is analyzed as one face, which is DeepFace's
    ``enforce_detection=False`` fallback.
    """

    def __init__(self, age=None, gender=None, race=None, emotion=None,
                 width: float = 1.0, dtype=jnp.float32, detector=None,
                 max_faces: int = MAX_FACES):
        self.detector = detector
        self.max_faces = max_faces
        self._vgg_apply = {}
        self._vgg_params = {}
        for task, n_cls, params in (("age", 101, age), ("gender", 2, gender),
                                    ("race", 6, race)):
            if params is None:
                continue
            model = VGGFaceAttr(n_classes=n_cls, width=width, dtype=dtype)
            self._vgg_apply[task] = jax.jit(model.apply)
            self._vgg_params[task] = params
        self._emotion_params = emotion
        if emotion is not None:
            model = EmotionNet(width=width, dtype=dtype)
            self._emotion_apply = jax.jit(model.apply)

    @classmethod
    def from_h5(cls, age: Optional[str] = None, gender: Optional[str] = None,
                race: Optional[str] = None, emotion: Optional[str] = None,
                **kw) -> "FaceAttributeAnalyzer":
        """Load DeepFace's published Keras weight files (any subset).

        E.g. ``FaceAttributeAnalyzer.from_h5(age="age_model_weights.h5",
        emotion="facial_expression_model_weights.h5")``.
        """
        from mere_fusion_tpu.utils.keras_convert import (
            convert_emotion_h5,
            convert_vggface_h5,
        )

        params = {}
        for task, n_cls, path in (("age", 101, age), ("gender", 2, gender),
                                  ("race", 6, race)):
            if path is not None:
                params[task] = convert_vggface_h5(path, n_classes=n_cls)
        if emotion is not None:
            params["emotion"] = convert_emotion_h5(emotion)
        return cls(**params, **kw)

    @classmethod
    def init_random(cls, tasks=("age", "gender", "race", "emotion"),
                    width: float = 0.25, seed: int = 0, **kw):
        """Random-weight analyzer so the pipeline runs without checkpoints."""
        key = jax.random.key(seed)
        params = {}
        for task, n_cls in (("age", 101), ("gender", 2), ("race", 6)):
            if task in tasks:
                m = VGGFaceAttr(n_classes=n_cls, width=width)
                params[task] = jax.jit(m.init)(key, jnp.zeros((1, 224, 224, 3)))
        if "emotion" in tasks:
            m = EmotionNet(width=width)
            params["emotion"] = jax.jit(m.init)(key, jnp.zeros((1, 48, 48, 1)))
        return cls(width=width, **params, **kw)

    def _faces(self, frame_bgr: np.ndarray):
        if self.detector is None:
            h, w = frame_bgr.shape[:2]
            return [(0, 0, w, h)]
        boxes = self.detector(frame_bgr)
        return [tuple(int(v) for v in b[:4]) for b in boxes][: self.max_faces]

    def analyze(self, frame_bgr: np.ndarray) -> list[dict]:
        import cv2

        regions = self._faces(frame_bgr)
        if not regions:
            return []
        n = len(regions)
        rgb224 = np.zeros((self.max_faces, 224, 224, 3), np.float32)
        gray48 = np.zeros((self.max_faces, 48, 48, 1), np.float32)
        for i, (x1, y1, x2, y2) in enumerate(regions):
            crop = frame_bgr[max(y1, 0):max(y2, y1 + 1),
                             max(x1, 0):max(x2, x1 + 1)]
            if crop.size == 0:
                crop = frame_bgr
            rgb224[i] = cv2.resize(crop, (224, 224)).astype(np.float32) / 255.0
            g = cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY)
            gray48[i, ..., 0] = cv2.resize(g, (48, 48)).astype(np.float32) / 255.0

        probs = {
            task: np.asarray(self._vgg_apply[task](self._vgg_params[task],
                                                   jnp.asarray(rgb224)))
            for task in self._vgg_apply
        }
        if self._emotion_params is not None:
            probs["emotion"] = np.asarray(
                self._emotion_apply(self._emotion_params, jnp.asarray(gray48)))

        out = []
        for i, (x1, y1, x2, y2) in enumerate(regions[:n]):
            face = {"region": {"x": x1, "y": y1, "w": x2 - x1, "h": y2 - y1}}
            if "age" in probs:
                face["age"] = int(round(float(
                    np.sum(probs["age"][i] * np.arange(probs["age"].shape[-1])))))
            for task, labels in (("gender", GENDER_LABELS),
                                 ("race", RACE_LABELS),
                                 ("emotion", EMOTION_LABELS)):
                if task in probs:
                    dist = {lab: float(p) * 100.0
                            for lab, p in zip(labels, probs[task][i])}
                    face[task] = dist
                    face[f"dominant_{task}"] = max(dist, key=dist.get)
            out.append(face)
        return out
