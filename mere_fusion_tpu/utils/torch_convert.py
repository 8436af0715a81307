"""Torch-checkpoint → flax param-tree converters.

The reference ships torch checkpoints (wav2lip.pth, whisper tiny, sd-vae,
musetalk UNet, ngp_kf.pth — reference: lipreal.py:76,
musetalk/utils/utils.py:18-24). These converters map their state dicts onto
our flax module trees. Conversion happens offline/startup on host; numerics
parity is covered by tests that run the reference torch model side by side.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from mere_fusion_tpu.models.wav2lip import (
    AUDIO_ENCODER,
    DISC_ENCODER,
    FACE_DECODER,
    FACE_ENCODER,
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def strip_prefix(state_dict: Mapping[str, Any], prefix: str = "module.") -> dict:
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def _convert_conv_bn(sd: Mapping, torch_base: str, is_transpose: bool):
    """One reference Conv2d/Conv2dTranspose block (conv + BN) → flax leaves."""
    w = _np(sd[f"{torch_base}.conv_block.0.weight"])
    b = _np(sd[f"{torch_base}.conv_block.0.bias"])
    if is_transpose:
        conv_params = {"kernel": w, "bias": b}  # torch (cin,cout,kh,kw) kept
    else:
        conv_params = {"conv": {"kernel": w.transpose(2, 3, 1, 0), "bias": b}}
    params = {
        **conv_params,
        "bn": {
            "scale": _np(sd[f"{torch_base}.conv_block.1.weight"]),
            "bias": _np(sd[f"{torch_base}.conv_block.1.bias"]),
        },
    }
    stats = {
        "bn": {
            "mean": _np(sd[f"{torch_base}.conv_block.1.running_mean"]),
            "var": _np(sd[f"{torch_base}.conv_block.1.running_var"]),
        }
    }
    return params, stats


def convert_wav2lip(state_dict: Mapping[str, Any]) -> dict:
    """Map a reference wav2lip.pth state dict onto the flax Wav2Lip tree.

    Returns flax variables: {"params": ..., "batch_stats": ...}.
    """
    sd = strip_prefix(state_dict)
    params: dict = {}
    stats: dict = {}

    def put(name: str, torch_base: str, is_transpose: bool):
        p, s = _convert_conv_bn(sd, torch_base, is_transpose)
        params[name] = p
        stats[name] = s

    for j, _ in enumerate(AUDIO_ENCODER):
        put(f"ae_{j}", f"audio_encoder.{j}", False)
    for i, block in enumerate(FACE_ENCODER):
        for j, _ in enumerate(block):
            put(f"fe_{i}_{j}", f"face_encoder_blocks.{i}.{j}", False)
    for i, block in enumerate(FACE_DECODER):
        for j, spec in enumerate(block):
            put(f"fd_{i}_{j}", f"face_decoder_blocks.{i}.{j}", spec[0] == "t")
    put("out_0", "output_block.0", False)
    params["out_1"] = {
        "kernel": _np(sd["output_block.1.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["output_block.1.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def convert_wav2lip_disc(state_dict: Mapping[str, Any]) -> dict:
    """Map the reference Wav2Lip_disc_qual state dict onto Wav2LipDisc."""
    sd = strip_prefix(state_dict)
    params: dict = {}
    for i, block in enumerate(DISC_ENCODER):
        for j, _ in enumerate(block):
            base = f"face_encoder_blocks.{i}.{j}"
            params[f"de_{i}_{j}"] = {
                "conv": {
                    "kernel": _np(sd[f"{base}.conv_block.0.weight"]).transpose(2, 3, 1, 0),
                    "bias": _np(sd[f"{base}.conv_block.0.bias"]),
                }
            }
    params["pred"] = {
        "kernel": _np(sd["binary_pred.0.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["binary_pred.0.bias"]),
    }
    return {"params": params}


def _linear(sd: Mapping, base: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{base}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{base}.bias"])
    return out


def _layernorm(sd: Mapping, base: str) -> dict:
    return {"scale": _np(sd[f"{base}.weight"]), "bias": _np(sd[f"{base}.bias"])}


def _whisper_block(sd: Mapping, base: str, cross: bool) -> dict:
    block = {
        "attn": {
            "query": _linear(sd, f"{base}.attn.query"),
            "key": _linear(sd, f"{base}.attn.key", bias=False),
            "value": _linear(sd, f"{base}.attn.value"),
            "out": _linear(sd, f"{base}.attn.out"),
        },
        "attn_ln": _layernorm(sd, f"{base}.attn_ln"),
        "mlp_fc1": _linear(sd, f"{base}.mlp.0"),
        "mlp_fc2": _linear(sd, f"{base}.mlp.2"),
        "mlp_ln": _layernorm(sd, f"{base}.mlp_ln"),
    }
    if cross:
        block["cross_attn"] = {
            "query": _linear(sd, f"{base}.cross_attn.query"),
            "key": _linear(sd, f"{base}.cross_attn.key", bias=False),
            "value": _linear(sd, f"{base}.cross_attn.value"),
            "out": _linear(sd, f"{base}.cross_attn.out"),
        }
        block["cross_attn_ln"] = _layernorm(sd, f"{base}.cross_attn_ln")
    return block


def convert_whisper(state_dict: Mapping[str, Any], dims) -> dict:
    """Map an OpenAI-format Whisper state dict (reference tiny.pt layout,
    musetalk/whisper/whisper/__init__.py:71-116) onto our flax Whisper."""
    sd = strip_prefix(state_dict)
    enc: dict = {
        "conv1": {
            "kernel": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "kernel": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "bias": _np(sd["encoder.conv2.bias"]),
        },
        "ln_post": _layernorm(sd, "encoder.ln_post"),
    }
    for i in range(dims.n_audio_layer):
        enc[f"blocks_{i}"] = _whisper_block(sd, f"encoder.blocks.{i}", cross=False)

    dec: dict = {
        "token_embedding": {"embedding": _np(sd["decoder.token_embedding.weight"])},
        "positional_embedding": _np(sd["decoder.positional_embedding"]),
        "ln": _layernorm(sd, "decoder.ln"),
    }
    for i in range(dims.n_text_layer):
        dec[f"blocks_{i}"] = _whisper_block(sd, f"decoder.blocks.{i}", cross=True)

    return {"params": {"encoder": enc, "decoder": dec}}


def convert_s3fd(state_dict: Mapping[str, Any]) -> dict:
    """Map the reference S3FD state dict (sfd/net_s3fd.py:22-70) onto our
    flax S3FD — module names match 1:1."""
    sd = strip_prefix(state_dict)
    params: dict = {}
    for key in sd:
        name, leaf = key.rsplit(".", 1)
        w = _np(sd[key])
        entry = params.setdefault(name, {})
        if leaf == "weight" and w.ndim == 4:
            entry["kernel"] = w.transpose(2, 3, 1, 0)
        elif leaf == "weight":  # L2Norm scale vector
            entry["weight"] = w
        elif leaf == "bias":
            entry["bias"] = w
    return {"params": params}


def convert_bisenet(state_dict: Mapping[str, Any]) -> dict:
    """Map a BiSeNet face-parsing .pth (face_parsing/model.py layout) onto
    our flax BiSeNet by name translation."""
    sd = strip_prefix(state_dict)
    bn_modules = {
        k.rsplit(".", 1)[0] for k in sd if k.endswith("running_mean")
    }
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: list[str], leaf_name: str, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf_name] = value

    for key, value in sd.items():
        if "num_batches_tracked" in key or key.startswith("fc."):
            continue
        module, leaf = key.rsplit(".", 1)
        # name translation: layerX.Y → layerX_Y, downsample.{0,1} → named
        module = module.replace("downsample.0", "downsample_conv")
        module = module.replace("downsample.1", "downsample_bn")
        import re as _re

        module = _re.sub(r"(layer\d)\.(\d)", r"\1_\2", module)
        path = module.split(".")
        w = _np(value)
        if module in {m.replace("downsample.0", "downsample_conv")
                       .replace("downsample.1", "downsample_bn")
                      for m in bn_modules} or any(
            module.endswith(s) for s in ("bn", "bn1", "bn2", "bn_atten",
                                         "downsample_bn")
        ):
            if leaf == "weight":
                put(params, path, "scale", w)
            elif leaf == "bias":
                put(params, path, "bias", w)
            elif leaf == "running_mean":
                put(stats, path, "mean", w)
            elif leaf == "running_var":
                put(stats, path, "var", w)
        else:  # conv
            if leaf == "weight":
                put(params, path, "kernel", w.transpose(2, 3, 1, 0))
            else:
                put(params, path, "bias", w)
    return {"params": params, "batch_stats": stats}


def convert_fan(state_dict: Mapping[str, Any]) -> dict:
    """Map a FAN (2DFAN-4 face_alignment / reference
    wav2lip/face_detection/models.py:144-200) state dict onto our flax FAN.

    Module names are kept 1:1 (conv1/bn1/conv2..4, m{i}.b1_4.., top_m_{i},
    conv_last{i}, bn_end{i}, l{i}, bl{i}, al{i}); the ConvBlock downsample
    Sequential(BN, ReLU, Conv) becomes downsample_bn / downsample_conv.
    """
    sd = strip_prefix(state_dict)
    bn_modules = {k.rsplit(".", 1)[0] for k in sd if k.endswith("running_mean")}
    params: dict = {}
    stats: dict = {}

    def put(tree: dict, path: list[str], leaf_name: str, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf_name] = value

    for key, value in sd.items():
        if "num_batches_tracked" in key:
            continue
        module, leaf = key.rsplit(".", 1)
        is_bn = module in bn_modules
        module = module.replace("downsample.0", "downsample_bn")
        module = module.replace("downsample.2", "downsample_conv")
        path = module.split(".")
        w = _np(value)
        if is_bn:
            if leaf == "weight":
                put(params, path, "scale", w)
            elif leaf == "bias":
                put(params, path, "bias", w)
            elif leaf == "running_mean":
                put(stats, path, "mean", w)
            elif leaf == "running_var":
                put(stats, path, "var", w)
        else:  # conv
            if leaf == "weight":
                put(params, path, "kernel", w.transpose(2, 3, 1, 0))
            else:
                put(params, path, "bias", w)
    return {"params": params, "batch_stats": stats}


def _linear_nobias(sd: Mapping, key: str) -> dict:
    return {"kernel": _np(sd[key]).T}


def _mlp(sd: Mapping, base: str, num_layers: int) -> dict:
    """Reference MLP (network.py:70-91): bias-free Linear net.{l} →
    our MLP net_{l}."""
    return {f"net_{l}": _linear_nobias(sd, f"{base}.net.{l}.weight")
            for l in range(num_layers)}


def _conv1d(sd: Mapping, base: str) -> dict:
    # torch conv1d [out, in, k] → flax [k, in, out]
    return {"kernel": _np(sd[f"{base}.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"{base}.bias"])}


def convert_ernerf(state_dict: Mapping[str, Any]) -> dict:
    """Map a trained reference ER-NeRF checkpoint (the ``ngp_kf.pth`` /
    Trainer ``ckpt['model']`` state dict, ernerf/nerf_triplane/network.py)
    onto our flax NeRFNetwork params.

    Hash tables convert 1:1 — our level offset/size math replicates the
    CUDA gridencoder layout ([total_params, level_dim], grid.py:24-31) —
    and the MLP / audio-net weights transpose into flax conventions.
    Training-only modules (reference 'embedding' audio id-emb) are skipped.
    """
    sd = strip_prefix(state_dict)
    params: dict = {}

    for plane in ("xy", "yz", "xz"):
        params[f"plane_{plane}"] = _np(sd[f"encoder_{plane}.embeddings"])

    an = {}
    for i, j in enumerate((0, 2, 4, 6)):
        an[f"conv_{i}"] = _conv1d(sd, f"audio_net.encoder_conv.{j}")
    an["fc_0"] = {"kernel": _np(sd["audio_net.encoder_fc1.0.weight"]).T,
                  "bias": _np(sd["audio_net.encoder_fc1.0.bias"])}
    an["fc_1"] = {"kernel": _np(sd["audio_net.encoder_fc1.2.weight"]).T,
                  "bias": _np(sd["audio_net.encoder_fc1.2.bias"])}
    params["audio_net"] = an

    if any(k.startswith("audio_att_net.") for k in sd):
        att = {}
        for i, j in enumerate((0, 2, 4, 6, 8)):
            att[f"conv_{i}"] = _conv1d(
                sd, f"audio_att_net.attentionConvNet.{j}")
        att["att"] = {
            "kernel": _np(sd["audio_att_net.attentionNet.0.weight"]).T,
            "bias": _np(sd["audio_att_net.attentionNet.0.bias"]),
        }
        params["audio_att_net"] = att

    params["eye_att_net"] = _mlp(sd, "eye_att_net", 2)
    params["sigma_net"] = _mlp(sd, "sigma_net", 3)
    params["color_net"] = _mlp(sd, "color_net", 2)
    params["unc_net"] = _mlp(sd, "unc_net", 2)
    params["aud_ch_att_net"] = _mlp(sd, "aud_ch_att_net", 2)

    if "individual_codes" in sd:
        params["individual_codes"] = _np(sd["individual_codes"])
    if "anchor_points" in sd:  # torso stage
        params["anchor_points"] = _np(sd["anchor_points"])
        params["torso_grid"] = _np(sd["torso_encoder.embeddings"])
        params["torso_deform_net"] = _mlp(sd, "torso_deform_net", 3)
        params["torso_net"] = _mlp(sd, "torso_net", 3)
        if "individual_codes_torso" in sd:
            params["individual_codes_torso"] = _np(
                sd["individual_codes_torso"])
    return {"params": params}


def _morton3d(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """CUDA __morton3D (raymarching.cu:56-71): interleave bits, x lowest."""

    def expand(v):
        v = v.astype(np.uint32)
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    return expand(x) | (expand(y) << np.uint32(1)) | (expand(z) << np.uint32(2))


def density_from_ernerf(ckpt: Mapping[str, Any], grid_size: int = 128,
                        density_thresh: float = 10.0,
                        mean_density: float | None = None):
    """Build our raster-order DensityGrid from a reference Trainer
    checkpoint: density_grid is [CAS, H^3] in Morton order
    (renderer.py:112, update_extra_state packs by morton3D indices);
    cascade 0 is the bound=1 grid our renderer uses."""
    import jax.numpy as jnp

    from mere_fusion_tpu.models.ernerf.renderer import DensityGrid

    dg = _np(ckpt["density_grid"])
    if dg.ndim == 2:
        dg = dg[0]
    g = grid_size
    assert dg.size == g ** 3, f"density_grid has {dg.size} cells, want {g**3}"
    idx = np.arange(g ** 3)
    x, y, z = idx // (g * g), (idx // g) % g, idx % g
    raster = dg[_morton3d(x, y, z)]
    if mean_density is None:
        # the Trainer stores mean_density at the checkpoint top level, a
        # sibling of 'model' (utils.py:1431) — callers should pass it; the
        # recompute fallback covers bare state dicts
        mean_density = float(ckpt.get("mean_density",
                                      np.maximum(raster, 0).mean()))
    mean_density = float(mean_density)
    thresh = min(mean_density, density_thresh)
    return DensityGrid(
        grid=jnp.asarray(raster, jnp.float32),
        occupancy=jnp.asarray(raster > thresh),
        mean_density=jnp.asarray(mean_density, jnp.float32),
    )


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file on host (CPU) and return its state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return ckpt


def _ordered_conv_dense(sd: Mapping[str, Any]):
    """(kind, flax_kernel, bias) per weighted layer, in state-dict order.

    Used by the face-attribute converters: torch preserves module insertion
    order in state dicts, so a plain sequential twin maps positionally.
    Dense kernels assume the twin flattens in NHWC order (Keras Flatten
    semantics) — see tests/test_face_attrs.py.
    """
    out = []
    for k in sd:
        if not k.endswith(".weight"):
            continue
        w = _np(sd[k])
        b = _np(sd[k[: -len(".weight")] + ".bias"])
        if w.ndim == 4:
            out.append(("conv", w.transpose(2, 3, 1, 0), b))
        elif w.ndim == 2:
            out.append(("dense", w.transpose(1, 0), b))
    return out


def convert_vggface_attr(state_dict: Mapping[str, Any]) -> dict:
    """Torch VGG-Face attribute twin → VGGFaceAttr variables (13 convs +
    fc_0/fc_1 + head, models/face_attrs.py)."""
    layers = _ordered_conv_dense(state_dict)
    names = [f"conv_{i}" for i in range(13)] + ["fc_0", "fc_1", "head"]
    if len(layers) != len(names):
        raise ValueError(f"expected {len(names)} weighted layers, "
                         f"got {len(layers)}")
    return {"params": {n: {"kernel": k, "bias": b}
                       for n, (_, k, b) in zip(names, layers)}}


def convert_emotion_net(state_dict: Mapping[str, Any]) -> dict:
    """Torch emotion-CNN twin → EmotionNet variables."""
    layers = _ordered_conv_dense(state_dict)
    names = [f"conv_{i}" for i in range(5)] + [f"dense_{i}" for i in range(3)]
    if len(layers) != len(names):
        raise ValueError(f"expected {len(names)} weighted layers, "
                         f"got {len(layers)}")
    return {"params": {n: {"kernel": k, "bias": b}
                       for n, (_, k, b) in zip(names, layers)}}


def _grouped_torch_layers(sd: Mapping[str, Any]):
    """(module_path, {leaf: array}) per weighted module, in state-dict
    order, with num_batches_tracked dropped. Torch preserves module
    insertion order, so sequential twins map positionally (used by the OCR
    converters below)."""
    groups: dict = {}
    order: list = []
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        mod, leaf = k.rsplit(".", 1) if "." in k else ("", k)
        if mod not in groups:
            groups[mod] = {}
            order.append(mod)
        groups[mod][leaf] = _np(sd[k])
    return [(m, groups[m]) for m in order]


def _classify_layer(leaves: Mapping[str, np.ndarray]) -> str:
    if "running_mean" in leaves:
        return "bn"
    if "weight_ih_l0" in leaves:
        return "lstm"
    w = leaves.get("weight")
    if w is not None and w.ndim == 4:
        return "conv"
    if w is not None and w.ndim == 2:
        return "linear"
    return "other"


def _conv_slot(leaves) -> dict:
    out = {"kernel": leaves["weight"].transpose(2, 3, 1, 0)}
    if "bias" in leaves:
        out["bias"] = leaves["bias"]
    return out


def _bn_slot(leaves) -> tuple[dict, dict]:
    return ({"scale": leaves["weight"], "bias": leaves["bias"]},
            {"mean": leaves["running_mean"], "var": leaves["running_var"]})


def convert_craft(state_dict: Mapping[str, Any]) -> dict:
    """CRAFT detector .pth (e.g. EasyOCR craft_mlt_25k.pth, consumed by the
    reference via easyocr.Reader — yolo_opencv.py:189-199) → our flax CRAFT
    (models/ocr.py). Order-based: 13 VGG conv+bn pairs, fc6/fc7 plain convs,
    4 double_conv decoder blocks (conv+bn ×2 each), 5-conv cls head."""
    layers = _grouped_torch_layers(strip_prefix(state_dict))
    stage_names = [f"s{i+1}_{j}" for i, reps in enumerate((2, 2, 3, 3, 3))
                   for j in range(reps)]
    params: dict = {}
    stats: dict = {}
    convs = [(m, lv) for m, lv in layers if _classify_layer(lv) == "conv"]
    bns = [(m, lv) for m, lv in layers if _classify_layer(lv) == "bn"]
    n_conv_want = 13 + 2 + 8 + 5
    n_bn_want = 13 + 8
    if len(convs) != n_conv_want or len(bns) != n_bn_want:
        raise ValueError(
            f"CRAFT checkpoint shape: want {n_conv_want} convs/"
            f"{n_bn_want} bns, got {len(convs)}/{len(bns)} "
            f"({[m for m, _ in layers][:8]}...)")
    ci = bi = 0
    for name in stage_names:
        params[name] = {"conv": _conv_slot(convs[ci][1])}
        p, s = _bn_slot(bns[bi][1])
        params[name]["bn"], stats[name] = p, {"bn": s}
        ci += 1
        bi += 1
    params["fc6"] = _conv_slot(convs[ci][1]); ci += 1
    params["fc7"] = _conv_slot(convs[ci][1]); ci += 1
    for k in range(4):
        blk: dict = {}
        sblk: dict = {}
        for j in range(2):
            blk[f"conv_{j}"] = _conv_slot(convs[ci][1]); ci += 1
            p, s = _bn_slot(bns[bi][1]); bi += 1
            blk[f"bn_{j}"], sblk[f"bn_{j}"] = p, s
        params[f"up_{k}"], stats[f"up_{k}"] = blk, sblk
    for j in range(5):
        params[f"cls_{j}"] = _conv_slot(convs[ci][1]); ci += 1
    return {"params": params, "batch_stats": stats}


def _lstm_slots(leaves) -> dict:
    out = {}
    for d, suf in (("fw", ""), ("bw", "_reverse")):
        for ours, theirs in (("w_ih", "weight_ih_l0"), ("w_hh", "weight_hh_l0"),
                             ("b_ih", "bias_ih_l0"), ("b_hh", "bias_hh_l0")):
            out[f"{ours}_{d}"] = leaves[theirs + suf]
    return out


def convert_crnn(state_dict: Mapping[str, Any]) -> dict:
    """CRNN recognizer .pth (EasyOCR english_g2 "None-VGG-BiLSTM-CTC"
    family) → our flax CRNN (models/ocr.py). Order-based: 7 extractor convs
    (+bn on conv_4/conv_5), two torch bi-LSTMs + projections, CTC head."""
    layers = _grouped_torch_layers(strip_prefix(state_dict))
    convs, bns, lstms, linears = [], [], [], []
    for m, lv in layers:
        kind = _classify_layer(lv)
        if kind == "conv":
            convs.append(lv)
        elif kind == "bn":
            bns.append(lv)
        elif kind == "lstm":
            lstms.append(lv)
        elif kind == "linear":
            linears.append(lv)
    if (len(convs), len(bns), len(lstms), len(linears)) != (7, 2, 2, 3):
        raise ValueError(
            "CRNN checkpoint shape: want 7 convs / 2 bns / 2 lstms / "
            f"3 linears, got {len(convs)}/{len(bns)}/{len(lstms)}/"
            f"{len(linears)}")
    params: dict = {f"conv_{i}": _conv_slot(lv) for i, lv in enumerate(convs)}
    stats: dict = {}
    for i, lv in zip((4, 5), bns):
        params[f"bn_{i}"], stats[f"bn_{i}"] = _bn_slot(lv)
    lin = [{"kernel": lv["weight"].transpose(1, 0), "bias": lv["bias"]}
           for lv in linears]
    for i in range(2):
        params[f"rnn_{i}"] = {**_lstm_slots(lstms[i]), "proj": lin[i]}
    params["head"] = lin[2]
    return {"params": params, "batch_stats": stats}


def _convmodule(sd: Mapping, base: str) -> tuple[dict, dict]:
    """mmcv ConvModule (conv bias-free + BN) → ConvBN leaves. Depthwise
    convs (groups == out channels, in/groups == 1) transpose to flax's
    (kh, kw, 1, cout) layout like any other conv."""
    w = _np(sd[f"{base}.conv.weight"]).transpose(2, 3, 1, 0)
    params = {
        "conv": {"kernel": w},
        "bn": {"scale": _np(sd[f"{base}.bn.weight"]),
               "bias": _np(sd[f"{base}.bn.bias"])},
    }
    stats = {"bn": {"mean": _np(sd[f"{base}.bn.running_mean"]),
                    "var": _np(sd[f"{base}.bn.running_var"])}}
    return params, stats


def convert_rtmpose(state_dict: Mapping[str, Any], deepen: float = 1.0,
                    widen: float = 1.0) -> dict:
    """DWPose/RTMPose wholebody .pth (mmpose `dw-ll_ucoco_384.pth`,
    reference musetalk/utils/preprocessing.py:17-18) → flax RTMPose
    variables.

    Walks the same module structure mmdet's CSPNeXt + mmpose's RTMCCHead
    declare for the reference config (arch P5, out stage 4, channel
    attention, GAU head): stem convs, per-stage downsample conv +
    (SPP) + CSPLayer, then final_layer/mlp/gau/cls_x/cls_y. Missing keys
    raise KeyError — layout disagreements fail loudly, never silently."""
    from mere_fusion_tpu.models.rtmpose import P5_ARCH

    sd = strip_prefix(state_dict)
    params: dict = {"backbone": {}, "head": {}}
    stats: dict = {"backbone": {}}
    bk_p, bk_s = params["backbone"], stats["backbone"]

    def put(name: str, base: str):
        bk_p[name], bk_s[name] = _convmodule(sd, base)

    for i in range(3):
        put(f"stem_{i}", f"backbone.stem.{i}")
    for i, (_, _, n, _, use_spp) in enumerate(P5_ARCH):
        stage = f"backbone.stage{i + 1}"
        put(f"stage{i + 1}_0", f"{stage}.0")
        idx = 1
        if use_spp:
            spp_p, spp_s = {}, {}
            for c in ("conv1", "conv2"):
                spp_p[c], spp_s[c] = _convmodule(sd, f"{stage}.{idx}.{c}")
            bk_p[f"stage{i + 1}_{idx}"] = spp_p
            bk_s[f"stage{i + 1}_{idx}"] = spp_s
            idx += 1
        csp = f"{stage}.{idx}"
        csp_p, csp_s = {}, {}
        for c in ("main_conv", "short_conv", "final_conv"):
            csp_p[c], csp_s[c] = _convmodule(sd, f"{csp}.{c}")
        for b in range(max(round(n * deepen), 1)):
            blk_p, blk_s = {}, {}
            blk_p["conv1"], blk_s["conv1"] = _convmodule(
                sd, f"{csp}.blocks.{b}.conv1")
            for part in ("depthwise_conv", "pointwise_conv"):
                blk_p[f"conv2_{part}"], blk_s[f"conv2_{part}"] = _convmodule(
                    sd, f"{csp}.blocks.{b}.conv2.{part}")
            csp_p[f"blocks_{b}"] = blk_p
            csp_s[f"blocks_{b}"] = blk_s
        csp_p["attention"] = {"fc": {
            "kernel": _np(sd[f"{csp}.attention.fc.weight"]
                          ).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{csp}.attention.fc.bias"])}}
        bk_p[f"stage{i + 1}_{idx}"] = csp_p
        bk_s[f"stage{i + 1}_{idx}"] = csp_s

    hd = params["head"]
    hd["final_layer"] = {
        "kernel": _np(sd["head.final_layer.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd["head.final_layer.bias"])}
    hd["mlp_ln"] = {"g": _np(sd["head.mlp.0.g"])}
    hd["mlp"] = {"kernel": _np(sd["head.mlp.1.weight"]).T}
    hd["gau"] = {
        "gamma": _np(sd["head.gau.gamma"]),
        "beta": _np(sd["head.gau.beta"]),
        "res_scale": _np(sd["head.gau.res_scale.scale"]),
        "ln": {"g": _np(sd["head.gau.ln.g"])},
        "uv": {"kernel": _np(sd["head.gau.uv.weight"]).T},
        "o": {"kernel": _np(sd["head.gau.o.weight"]).T},
    }
    hd["cls_x"] = {"kernel": _np(sd["head.cls_x.weight"]).T}
    hd["cls_y"] = {"kernel": _np(sd["head.cls_y.weight"]).T}
    return {"params": params, "batch_stats": stats}
