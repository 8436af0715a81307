"""Keras ``.h5`` weight files → flax param trees.

DeepFace distributes its attribute models as Keras weight files
(age_model_weights.h5, gender_model_weights.h5, race_model_single_batch.h5,
facial_expression_model_weights.h5 — consumed by the reference via
``DeepFace.analyze``, yolo_opencv.py:202-217). Keras layer names in those
files are auto-generated and vary across saves, so conversion is
**order-based**: weighted layers are read in the file's recorded layer order
and assigned onto our module tree in definition order, with loud shape
checks — a mismatched file fails with names and shapes, never silently.

Keras conv kernels are stored (kh, kw, cin, cout) and dense kernels
(in, out) — both exactly flax's layout, so no transposes are needed.
"""
from __future__ import annotations

import numpy as np


def _decode(name) -> str:
    return name.decode() if isinstance(name, bytes) else str(name)


def h5_weight_arrays(path: str) -> list[tuple[str, list[np.ndarray]]]:
    """Read (layer_name, [arrays...]) for every weighted layer, in the
    file's layer order. Handles both weights-only files and full model
    saves (which nest everything under ``model_weights``)."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [_decode(n) for n in root.attrs["layer_names"]]
        for ln in layer_names:
            group = root[ln]
            weight_names = [_decode(n)
                            for n in group.attrs.get("weight_names", [])]
            arrays = [np.asarray(group[wn], dtype=np.float32)
                      for wn in weight_names]
            if arrays:
                out.append((ln, arrays))
    return out


def _assign(pairs, slots, what: str) -> dict:
    """Zip ordered (kernel, bias) layer weights onto named module slots."""
    if len(pairs) != len(slots):
        raise ValueError(
            f"{what}: file has {len(pairs)} weighted layers "
            f"({[n for n, _ in pairs]}), model expects {len(slots)} "
            f"({[s for s, _ in slots]})")
    params = {}
    for (layer_name, arrays), (slot, kernel_shape) in zip(pairs, slots):
        if len(arrays) != 2:
            raise ValueError(
                f"{what}: layer {layer_name!r} has {len(arrays)} arrays, "
                f"expected kernel+bias for slot {slot!r}")
        kernel, bias = arrays
        if tuple(kernel.shape) != tuple(kernel_shape):
            raise ValueError(
                f"{what}: layer {layer_name!r} kernel {kernel.shape} does "
                f"not match slot {slot!r} {kernel_shape}")
        params[slot] = {"kernel": kernel, "bias": bias}
    return {"params": params}


def convert_vggface_h5(path: str, n_classes: int, width: float = 1.0) -> dict:
    """age/gender/race weight file → VGGFaceAttr variables."""
    from mere_fusion_tpu.models.face_attrs import _VGG_BLOCKS

    c = lambda n: max(int(round(n * width)), 4)
    slots = []
    cin, i = 3, 0
    for channels, reps in _VGG_BLOCKS:
        for _ in range(reps):
            slots.append((f"conv_{i}", (3, 3, cin, c(channels))))
            cin = c(channels)
            i += 1
    slots.append(("fc_0", (7, 7, cin, c(4096))))
    slots.append(("fc_1", (1, 1, c(4096), c(4096))))
    slots.append(("head", (1, 1, c(4096), n_classes)))
    return _assign(h5_weight_arrays(path), slots,
                   f"VGGFaceAttr(n_classes={n_classes})")


def convert_emotion_h5(path: str, width: float = 1.0) -> dict:
    """facial_expression_model_weights.h5 → EmotionNet variables."""
    c = lambda n: max(int(round(n * width)), 4)
    slots = [
        ("conv_0", (5, 5, 1, c(64))),
        ("conv_1", (3, 3, c(64), c(64))),
        ("conv_2", (3, 3, c(64), c(64))),
        ("conv_3", (3, 3, c(64), c(128))),
        ("conv_4", (3, 3, c(128), c(128))),
        ("dense_0", (c(128), c(1024))),
        ("dense_1", (c(1024), c(1024))),
        ("dense_2", (c(1024), 7)),
    ]
    return _assign(h5_weight_arrays(path), slots, "EmotionNet")
