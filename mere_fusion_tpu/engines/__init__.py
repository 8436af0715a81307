"""Real-time avatar engines (the reference's L3 "*Real" layer).

Each engine owns: a TTS adapter feeding 20 ms PCM chunks, an ASR feeder that
featurizes audio for its model, a device inference stage (jit-compiled — the
reference's mp.Process GPU worker becomes an in-process thread dispatching
async XLA computations), and a frame-assembly stage pasting generated crops
into full frames for the output tracks.
"""
from __future__ import annotations

import os
import threading

from mere_fusion_tpu.config import Config

# serving-weight caches. Host trees are cached per file so N sessions pay one
# torch-load/convert; device trees are cached per (file, device, dtype) and
# COMMITTED there, so same-chip sessions share one HBM copy of the weights —
# engines device_put committed arrays as a no-op (the reference loads a
# separate copy per session's GPU subprocess, lipreal.py:75-80). Entries live
# for the process (serving weights are expected to stay resident). The lock
# serializes loads: concurrent session starts run make_engine on executor
# threads, and two racing misses would otherwise each convert + commit a
# full private copy of the weights.
_HOST_TREES: dict = {}
_DEVICE_TREES: dict = {}
_TREE_LOCK = threading.RLock()

_TORCH_SUFFIXES = (".pth", ".pt", ".bin")


def load_serving_tree(family: str, path: str, unet_config: str | None = None,
                      loader=None):
    """(host param tree, metadata) for serving: a reference torch checkpoint
    converted on the fly (tools/convert_ckpt families), an orbax dir (with
    its family.json metadata when present), or a custom ``loader(path)``.
    Cached per path."""
    key = (family, os.path.abspath(path))
    with _TREE_LOCK:
        hit = _HOST_TREES.get(key)
        if hit is not None:
            return hit
        meta: dict = {}
        if loader is not None:
            tree = loader(path)
        elif os.path.isdir(path):
            from mere_fusion_tpu.utils.checkpoint import Checkpointer

            ckpt = Checkpointer(path)
            try:
                tree = ckpt.restore_raw()
            finally:
                ckpt.close()
            fam_json = os.path.join(path, "family.json")
            if os.path.exists(fam_json):
                import json

                with open(fam_json) as f:
                    meta = json.load(f)
        elif path.endswith(_TORCH_SUFFIXES):
            from mere_fusion_tpu.tools.convert_ckpt import convert_with_meta

            tree, meta = convert_with_meta(family, path, unet_config)
        else:
            raise ValueError(
                f"serving checkpoint {path!r} is neither an orbax dir nor a "
                f"torch file ({'/'.join(_TORCH_SUFFIXES)})"
            )
        _HOST_TREES[key] = (tree, meta)
        return tree, meta


def shared_device_tree(family: str, path: str, device=None, dtype=None,
                       unet_config: str | None = None, loader=None):
    """Param tree committed to ``device`` (optionally cast: float32 leaves →
    ``dtype``), shared across all sessions placed on that device."""
    import jax
    import jax.numpy as jnp

    key = (family, os.path.abspath(path), repr(device), repr(dtype))
    with _TREE_LOCK:
        tree = _DEVICE_TREES.get(key)
        if tree is not None:
            return tree
        tree, _ = load_serving_tree(family, path, unet_config, loader=loader)
        if dtype is not None:
            tree = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                tree,
            )
        tree = jax.device_put(tree, device)
        _DEVICE_TREES[key] = tree
        return tree


def make_nerf_featurizer(asr_model: str, device=None):
    """(logits_fn, device_logits_fn_or_None) for the ER-NeRF live audio
    featurizer named by ``asr_model`` (reference --asr_model, app.py:596):
    a DeepSpeech frozen-graph .pb, or a transformers CTC model name."""
    if asr_model.endswith(".pb"):
        from mere_fusion_tpu.audio import deepspeech

        # one committed copy per (graph, chip), shared by both featurizer
        # forms and by every same-chip session — deepspeech_logits_fn's
        # internal device_put of committed arrays is a no-op
        ds_params = shared_device_tree(
            "deepspeech", asr_model, device,
            loader=lambda p: deepspeech.params_from_graph(
                deepspeech.read_graph_constants(p)))
        # device-resident twin: NerfASR keeps logits on-chip, feeding its
        # feature ring without a host round-trip per window. Both live
        # forms run bf16 (the BiLSTM scan is HBM-bound on its recurrent
        # kernel) so the feature ring never mixes precisions; offline
        # training-feature extraction (tools/nerf_data) stays f32.
        return (deepspeech.deepspeech_logits_fn(params=ds_params,
                                                compute_dtype="bfloat16"),
                deepspeech.deepspeech_logits_fn(params=ds_params,
                                                return_device=True))
    from mere_fusion_tpu.engines.nerf import wav2vec_logits_fn

    return wav2vec_logits_fn(asr_model), None


def make_engine(cfg: Config, **kw):
    """Engine factory keyed by cfg.avatar.kind (reference: app.py:330-343).

    ``device=`` (threaded in by SessionManager placement) is forwarded to the
    engine and used to commit serving weights to the session's chip.
    """
    kind = cfg.avatar.kind
    ac = cfg.avatar
    device = kw.get("device")
    if kind == "wav2lip":
        from mere_fusion_tpu.engines.lip import LipReal

        if ac.ckpt and "variables" not in kw:
            kw["variables"] = shared_device_tree("wav2lip", ac.ckpt, device)
        return LipReal(cfg, **kw)
    if kind == "musetalk":
        import jax.numpy as jnp

        from mere_fusion_tpu.engines.muse import MuseModels, MuseReal

        dtype = jnp.bfloat16 if ac.dtype == "bfloat16" else jnp.float32
        cast = dtype if dtype == jnp.bfloat16 else None
        if "models" not in kw and (ac.vae_ckpt or ac.unet_ckpt):
            if not (ac.vae_ckpt and ac.unet_ckpt):
                raise ValueError(
                    "musetalk serving needs BOTH avatar.vae_ckpt and "
                    "avatar.unet_ckpt (reference loads the sd-vae and UNet "
                    "together, musetalk/utils/utils.py:18-24)"
                )
            from mere_fusion_tpu.models.musetalk import UNetConfig

            unet_cfg = (UNetConfig.from_json(ac.unet_config)
                        if ac.unet_config else None)
            kw["models"] = MuseModels(
                # vae_cfg/face_size default to the reference's fixed
                # sd-vae-ft-mse @256; injectable for reduced-scale tests
                vae_cfg=kw.pop("vae_cfg", None),
                unet_cfg=unet_cfg,
                vae_vars=shared_device_tree(
                    "vae", ac.vae_ckpt, device, dtype=cast),
                unet_vars=shared_device_tree(
                    "musetalk-unet", ac.unet_ckpt, device, dtype=cast,
                    unet_config=ac.unet_config or None),
                face_size=kw.pop("face_size", 256),
                dtype=dtype, device=device, vae_int8=ac.vae_int8,
            )
        if "feature_extractor" not in kw and ac.whisper_ckpt:
            from mere_fusion_tpu.audio.features import WhisperFeatureExtractor
            from mere_fusion_tpu.models.whisper import TINY, WhisperDims

            # dims ride in the .pt header / the converted dir's family.json
            # (written by tools/convert_ckpt); absent → whisper-tiny
            _, meta = load_serving_tree("whisper", ac.whisper_ckpt)
            fields = WhisperDims.__dataclass_fields__
            dims = (WhisperDims(**{k: v for k, v in meta["dims"].items()
                                   if k in fields})
                    if meta.get("dims") else TINY)
            kw["feature_extractor"] = WhisperFeatureExtractor(
                shared_device_tree("whisper", ac.whisper_ckpt, device), dims)
        return MuseReal(cfg, **kw)
    if kind == "ernerf":
        from mere_fusion_tpu.data.provider import NeRFTestDataset
        from mere_fusion_tpu.engines.nerf import NeRFReal

        if "dataset" not in kw:
            kw["dataset"] = NeRFTestDataset.load(
                cfg.nerf.pose_path, cfg.nerf.au_path, bg_img=cfg.nerf.bg_img,
                scale=cfg.nerf.scale, offset=tuple(cfg.nerf.offset),
                smooth_path=cfg.nerf.smooth_path,
                smooth_path_window=cfg.nerf.smooth_path_window,
                smooth_eye=cfg.nerf.smooth_eye,
                data_range=tuple(cfg.nerf.data_range),
            )
        if cfg.nerf.fix_eye >= 0:
            kw["dataset"].eye_area[:] = cfg.nerf.fix_eye
        if "logits_fn" not in kw and cfg.nerf.asr_model:
            logits_fn, device_logits_fn = make_nerf_featurizer(
                cfg.nerf.asr_model, device)
            kw["logits_fn"] = logits_fn
            if device_logits_fn is not None:
                kw["device_logits_fn"] = device_logits_fn
        if cfg.nerf.ckpt and "variables" not in kw:
            from mere_fusion_tpu.engines.nerf import load_nerf_checkpoint

            variables, density = load_nerf_checkpoint(cfg)
            kw["variables"] = variables
            if density is not None:
                kw["density"] = density
        if cfg.nerf.fullbody_imgs and "fullbody_frames" not in kw:
            from mere_fusion_tpu.engines.base import _sorted_imgs, read_imgs

            kw["fullbody_frames"] = read_imgs(
                _sorted_imgs(cfg.nerf.fullbody_imgs))
            kw["fullbody_offset"] = tuple(cfg.nerf.fullbody_offset)
        return NeRFReal(cfg, **kw)
    raise ValueError(f"unknown avatar kind {kind!r}")
