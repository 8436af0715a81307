"""Video understanding: object/face/text analysis of the caller's camera.

Equivalent of the reference's yolo_opencv.py (YOLOv10 detection with
frame-rate throttling, DeepFace attributes when a person is present, EasyOCR
text — reference: yolo_opencv.py:136-221). The heavy detectors are optional;
``StubPerception`` provides the same summary contract with basic image
statistics so the full-duplex pipeline runs anywhere.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class StubPerception:
    """Dependency-free scene summarizer (shape/brightness/motion)."""

    def __init__(self, fps_throttle: int = 10):
        self.fps_throttle = fps_throttle
        self._count = 0
        self._prev: Optional[np.ndarray] = None

    def process_frame(self, frame_bgr: np.ndarray) -> Optional[str]:
        self._count += 1
        if self._count % self.fps_throttle != 0:
            return None
        small = frame_bgr[::8, ::8].astype(np.float32)
        brightness = float(small.mean())
        motion = 0.0
        if self._prev is not None and self._prev.shape == small.shape:
            motion = float(np.abs(small - self._prev).mean())
        self._prev = small
        h, w = frame_bgr.shape[:2]
        light = "bright" if brightness > 128 else "dim"
        moving = "movement detected" if motion > 8 else "static scene"
        return f"{w}x{h} {light} scene, {moving}"


class YoloPerception:
    """YOLO + DeepFace + EasyOCR summarizer (needs ultralytics etc.)."""

    def __init__(self, model_path: str = "yolov10x.pt", fps_throttle: int = 10,
                 use_deepface: bool = True, use_ocr: bool = True):
        from ultralytics import YOLO

        self.model = YOLO(model_path)
        self.fps_throttle = fps_throttle
        self.use_deepface = use_deepface
        self.use_ocr = use_ocr
        self._count = 0
        self._reader = None

    def process_frame(self, frame_bgr: np.ndarray) -> Optional[str]:
        self._count += 1
        if self._count % self.fps_throttle != 0:
            return None
        results = self.model(frame_bgr, verbose=False)[0]
        names = results.names
        counts: dict[str, int] = {}
        person_seen = False
        for cls in results.boxes.cls.tolist():
            label = names[int(cls)]
            counts[label] = counts.get(label, 0) + 1
            person_seen |= label == "person"
        parts = [f"{n} {label}(s)" for label, n in sorted(counts.items())]
        summary = "scene contains " + (", ".join(parts) if parts else "nothing notable")

        if person_seen and self.use_deepface:
            summary += _deepface_summary(frame_bgr)
        if self.use_ocr:
            try:
                if self._reader is None:
                    import easyocr

                    self._reader = easyocr.Reader(["en", "ch_sim"])
                texts = [t[1] for t in self._reader.readtext(frame_bgr)]
                if texts:
                    summary += "; visible text: " + " | ".join(texts[:5])
            except Exception:
                pass
        return summary


class TPUYoloPerception:
    """On-device YOLOv10 scene summarizer — the ultralytics-free path.

    Runs our flax YOLOv10 (models/yolo.py) on the TPU instead of the torch
    ultralytics model the reference uses (yolo_opencv.py:42, 152-221), with
    the same summary contract: throttled object-count text, DeepFace
    attributes when a person is present (if deepface is importable), EasyOCR
    text (if easyocr is importable).

    ``ckpt`` is an ultralytics ``yolov10*.pt`` — the tolerant unpickler in
    utils/yolo_convert.py extracts its tensors without the ultralytics
    package — or an .npz of already-converted flax leaves.
    """

    def __init__(self, ckpt: Optional[str] = None, scale: str = "x",
                 fps_throttle: int = 10, conf: float = 0.25,
                 use_deepface: bool = True, use_ocr: bool = True,
                 detector=None, device=None, face_attrs=None, ocr=None):
        from mere_fusion_tpu.models.yolo import YoloDetector

        if detector is not None:
            self.detector = detector
        elif ckpt is not None:
            # serving-tree loader: .pt converted on the fly or an orbax dir
            # from tools/convert_ckpt; ONE committed copy per (ckpt, chip)
            # shared by all sessions placed there (engines/__init__.py)
            from mere_fusion_tpu.engines import shared_device_tree

            variables = shared_device_tree("yolo", ckpt, device)
            self.detector = YoloDetector(variables, scale=scale)
        else:
            # random weights keep the pipeline exercisable without a ckpt
            self.detector = YoloDetector.init_random(scale=scale)
        self.fps_throttle = fps_throttle
        self.conf = conf
        self.use_deepface = use_deepface
        self.use_ocr = use_ocr
        self.face_attrs = make_face_attrs(face_attrs)
        self.ocr = make_ocr(ocr)
        self._count = 0
        self._reader = None

    def process_frame(self, frame_bgr: np.ndarray) -> Optional[str]:
        self._count += 1
        if self._count % self.fps_throttle != 0:
            return None
        detections = self.detector.detect(frame_bgr, conf=self.conf)
        counts: dict[str, int] = {}
        person_seen = False
        for _xyxy, _score, label in detections:
            counts[label] = counts.get(label, 0) + 1
            person_seen |= label == "person"
        parts = [f"{n} {label}(s)" for label, n in sorted(counts.items())]
        summary = "scene contains " + (
            ", ".join(parts) if parts else "nothing notable")
        if person_seen and self.face_attrs is not None:
            summary += _face_attr_summary(frame_bgr, self.face_attrs)
        elif person_seen and self.use_deepface:
            summary += _deepface_summary(frame_bgr)
        if self.use_ocr:
            summary += self._ocr_summary(frame_bgr)
        return summary

    def _ocr_summary(self, frame_bgr: np.ndarray) -> str:
        if self.ocr is not None:
            # our TPU CRAFT+CRNN reader (models/ocr.py) — same consumption
            # as the reference's easyocr call (yolo_opencv.py:195-199)
            texts = [t[1] for t in self.ocr.readtext(frame_bgr)]
            return ("; visible text: " + " | ".join(texts[:5])
                    if texts else "")
        try:
            if self._reader is None:
                import easyocr

                self._reader = easyocr.Reader(["en", "ch_sim"])
            texts = [t[1] for t in self._reader.readtext(frame_bgr)]
            if texts:
                return "; visible text: " + " | ".join(texts[:5])
        except Exception:
            pass
        return ""


def parse_perception_spec(s: str):
    """CLI/config string → make_face_attrs / make_ocr spec.

    ``""`` → None (disabled / import-fallback), ``"random"`` → random
    weights, ``"key=path,key2=path2"`` → kwargs dict (e.g.
    ``age=age.h5,gender=gender.h5`` or ``craft=craft_mlt_25k.pth,
    crnn=english_g2.pth``).
    """
    if not s:
        return None
    if s == "random":
        return "random"
    out = {}
    for part in s.split(","):
        k, eq, v = part.partition("=")
        if not eq or not k.strip() or not v.strip():
            raise ValueError(
                f"perception spec {s!r}: expected 'random' or "
                "comma-separated key=path pairs")
        out[k.strip()] = v.strip()
    return out


def make_face_attrs(spec):
    """Resolve a face-attrs spec into a FaceAttributeAnalyzer (or None).

    ``spec``: None → disabled (deepface fallback applies); "random" →
    narrow random-weight nets so the pipeline runs without checkpoints;
    a dict of DeepFace .h5 paths (keys age/gender/race/emotion) → real
    weights via utils/keras_convert.py; or an already-built analyzer.
    """
    if spec is None or spec is False:
        return None
    from mere_fusion_tpu.models.face_attrs import FaceAttributeAnalyzer

    if isinstance(spec, FaceAttributeAnalyzer):
        return spec
    if spec == "random":
        return FaceAttributeAnalyzer.init_random(
            tasks=("age", "gender", "emotion"))
    if isinstance(spec, dict):
        return FaceAttributeAnalyzer.from_h5(**spec)
    raise ValueError(f"unknown face_attrs spec {spec!r}")


def make_ocr(spec):
    """Resolve an OCR spec into a TextReader (or None → easyocr fallback).

    ``spec``: None/False → disabled; "random" → random-weight reader (narrow
    detector) so the pipeline runs without checkpoints; a dict of kwargs
    with ``craft``/``crnn`` checkpoint paths (torch .pth, converted on the
    fly) or prebuilt trees; or an already-built TextReader.
    """
    if spec is None or spec is False:
        return None
    from mere_fusion_tpu.models.ocr import TextReader

    if isinstance(spec, TextReader):
        return spec
    if spec == "random":
        return TextReader(width=0.25)
    if isinstance(spec, dict):
        kw = dict(spec)
        if isinstance(kw.get("craft"), str):
            from mere_fusion_tpu.utils.torch_convert import (
                convert_craft, load_torch_checkpoint)

            kw["det_variables"] = convert_craft(
                load_torch_checkpoint(kw.pop("craft")))
        if isinstance(kw.get("crnn"), str):
            from mere_fusion_tpu.utils.torch_convert import (
                convert_crnn, load_torch_checkpoint)

            kw["rec_variables"] = convert_crnn(
                load_torch_checkpoint(kw.pop("crnn")))
        return TextReader(**kw)
    raise ValueError(f"unknown ocr spec {spec!r}")


def _face_attr_summary(frame_bgr: np.ndarray, analyzer) -> str:
    """Same sentence contract as _deepface_summary, on our TPU nets."""
    faces = analyzer.analyze(frame_bgr)
    if not faces:
        return ""
    f = faces[0]
    return (f"; person appears {f.get('age', '?')} years old, "
            f"{f.get('dominant_gender', '?')}, "
            f"{f.get('dominant_emotion', '?')}")


def _deepface_summary(frame_bgr: np.ndarray) -> str:
    try:
        from deepface import DeepFace

        faces = DeepFace.analyze(
            frame_bgr, actions=("age", "gender", "emotion"),
            enforce_detection=False, silent=True,
        )
        if faces:
            f = faces[0]
            return (f"; person appears {f.get('age', '?')} years old, "
                    f"{f.get('dominant_gender', '?')}, "
                    f"{f.get('dominant_emotion', '?')}")
    except Exception:
        pass
    return ""


def make_perception(kind: str = "stub", **kw):
    if kind == "stub":
        return StubPerception(**kw)
    if kind == "yolo":
        return YoloPerception(**kw)
    if kind in ("yolo-tpu", "yolo_tpu"):
        return TPUYoloPerception(**kw)
    raise ValueError(f"unknown perception backend {kind!r}")
