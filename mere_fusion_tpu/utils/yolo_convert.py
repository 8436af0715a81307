"""ultralytics YOLOv10 checkpoint → flax param tree, without ultralytics.

The reference loads ``yolov10x.pt`` through the ultralytics package
(reference: yolo_opencv.py:42). Those ``.pt`` files pickle the whole
ultralytics model object, so a plain ``torch.load`` fails without the
package installed. ``load_ultralytics_state_dict`` recovers the tensors
anyway: a tolerant unpickler substitutes a stub class for any import it
cannot resolve, the pickled ``nn.Module`` graph then lands as stub objects
whose ``__dict__`` still carries torch's ``_parameters`` / ``_buffers`` /
``_modules``, and a recursive walk rebuilds the flat state dict.

``convert_yolo`` maps that state dict onto the flax ``models/yolo.YoloV10``
tree mechanically: torch module paths translate 1:1 (integer components are
merged into their parent name with ``_``, mirroring how the flax modules are
named), conv kernels go OIHW→HWIO, batch-norm splits into params/stats. The
one-to-many training head (``cv2``/``cv3`` module lists) and the constant
DFL conv are skipped — inference uses the one-to-one branch only.
"""
from __future__ import annotations

import io
import pickle
import re
import types
from typing import Any, Mapping

import numpy as np

# Detect-layer one-to-many heads look like "model.23.cv2.0. ..." (a digit
# right after cv2/cv3) — C2f's plain cv2 conv ("model.2.cv2.conv.weight")
# must NOT match.
_SKIP_RE = re.compile(r"\.(cv2|cv3)\.\d+\.|\.dfl\.")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


class _Stub:
    """Placeholder instance for any class the unpickler cannot import."""

    def __init__(self, *args, **kwargs):  # swallow REDUCE args
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)
        else:
            self.__dict__["_stub_state"] = state


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(name, (_Stub,), {"__module__": module})


def load_torch_object(path: str) -> Any:
    """torch.load with the tolerant unpickler (cpu map, full graph)."""
    import torch

    shim = types.ModuleType("mf_tolerant_pickle")
    shim.Unpickler = _TolerantUnpickler
    shim.load = lambda f, **kw: _TolerantUnpickler(f, **kw).load()
    shim.loads = lambda b, **kw: _TolerantUnpickler(io.BytesIO(b), **kw).load()
    shim.dump = pickle.dump
    shim.dumps = pickle.dumps
    return torch.load(path, map_location="cpu", pickle_module=shim,
                      weights_only=False)


def _walk_module(obj: Any, prefix: str = "") -> dict:
    """Rebuild a state dict from a pickled nn.Module graph (real or stub)."""
    out: dict = {}
    d = getattr(obj, "__dict__", None)
    if d is None:
        return out
    for slot in ("_parameters", "_buffers"):
        for name, t in (d.get(slot) or {}).items():
            if t is not None and hasattr(t, "shape"):
                out[prefix + name] = t
    for name, sub in (d.get("_modules") or {}).items():
        if sub is not None:
            out.update(_walk_module(sub, prefix + name + "."))
    return out


def load_ultralytics_state_dict(path: str) -> dict:
    """→ flat {torch_key: tensor} with keys like "model.0.conv.weight"."""
    obj = load_torch_object(path)
    if isinstance(obj, Mapping):
        for key in ("model", "ema"):
            cand = obj.get(key)
            if cand is not None:
                obj = cand
                break
    if isinstance(obj, Mapping):  # already a plain state dict
        return {k: v for k, v in obj.items() if hasattr(v, "shape")}
    sd = _walk_module(obj)
    if not sd:
        raise ValueError(f"no tensors found in {path!r}")
    return sd


def _merged_path(key: str) -> list[str]:
    """torch dotted path → flax name components: digits merge into the
    previous component ("m.0" → "m_0", "one2one_cv2.0.1" → "one2one_cv2_0_1")."""
    parts: list[str] = []
    for comp in key.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return parts


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for comp in path[:-1]:
        node = node.setdefault(comp, {})
    node[path[-1]] = value


def convert_yolo(state_dict: Mapping[str, Any]) -> dict:
    """ultralytics YOLOv10 state dict → flax variables for YoloV10."""
    params: dict = {}
    stats: dict = {}
    for key, tensor in state_dict.items():
        if _SKIP_RE.search(f".{key}") or key.endswith("num_batches_tracked"):
            continue
        parts = _merged_path(key)
        leaf = parts[-1]
        if len(parts) >= 2 and parts[-2] == "bn":
            base = parts[:-1]
            if leaf == "weight":
                _set(params, base + ["scale"], _np(tensor))
            elif leaf == "bias":
                _set(params, base + ["bias"], _np(tensor))
            elif leaf == "running_mean":
                _set(stats, base + ["mean"], _np(tensor))
            elif leaf == "running_var":
                _set(stats, base + ["var"], _np(tensor))
            continue
        w = _np(tensor)
        if leaf == "weight" and w.ndim == 4:
            _set(params, parts[:-1] + ["kernel"], w.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _set(params, parts[:-1] + ["bias"], w)
        else:
            raise ValueError(f"unmapped checkpoint key {key!r} "
                             f"(shape {tuple(w.shape)}) — the layer spec in "
                             "models/yolo.py likely disagrees with this "
                             "checkpoint's block layout")
    return {"params": params, "batch_stats": stats}


def convert_yolo_file(path: str) -> dict:
    return convert_yolo(load_ultralytics_state_dict(path))
