"""diffusers-format checkpoint → flax param-tree converters.

The reference loads sd-vae-ft-mse via diffusers.AutoencoderKL and the
MuseTalk UNet via diffusers.UNet2DConditionModel
(reference: musetalk/models/vae.py:25-27, unet.py:36-41). These converters
map those torch state dicts onto our NHWC flax modules.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping, base: str) -> dict:
    return {
        "kernel": _np(sd[f"{base}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{base}.bias"]),
    }


def _dense(sd: Mapping, base: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{base}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{base}.bias"])
    return out


def _norm(sd: Mapping, base: str) -> dict:
    return {"scale": _np(sd[f"{base}.weight"]), "bias": _np(sd[f"{base}.bias"])}


def _resnet(sd: Mapping, base: str, with_time: bool) -> dict:
    p = {
        "norm1": _norm(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "norm2": _norm(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if with_time:
        p["time_emb_proj"] = _dense(sd, f"{base}.time_emb_proj")
    if f"{base}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return p


def _vae_attn(sd: Mapping, base: str) -> dict:
    # modern diffusers naming (to_q/...) with legacy (query/...) fallback
    names = (
        ("to_q", "to_k", "to_v", "to_out.0", "group_norm")
        if f"{base}.to_q.weight" in sd
        else ("query", "key", "value", "proj_attn", "group_norm")
    )
    q, k, v, o, gn = names
    return {
        "group_norm": _norm(sd, f"{base}.{gn}"),
        "to_q": _dense(sd, f"{base}.{q}"),
        "to_k": _dense(sd, f"{base}.{k}"),
        "to_v": _dense(sd, f"{base}.{v}"),
        "proj_out": _dense(sd, f"{base}.{o}"),
    }


def convert_vae(state_dict: Mapping[str, Any], n_down: int = 4, layers: int = 2) -> dict:
    sd = dict(state_dict)
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0", False),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1", False),
    }
    for i in range(n_down):
        for j in range(layers):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", False
            )
        if i < n_down - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0", False),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1", False),
    }
    for i in range(n_down):
        for j in range(layers + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", False
            )
        if i < n_down - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _conv(sd, "quant_conv"),
            "post_quant_conv": _conv(sd, "post_quant_conv"),
        }
    }


def _transformer(sd: Mapping, base: str) -> dict:
    tb = f"{base}.transformer_blocks.0"

    def attn(b: str) -> dict:
        return {
            "to_q": _dense(sd, f"{b}.to_q", bias=False),
            "to_k": _dense(sd, f"{b}.to_k", bias=False),
            "to_v": _dense(sd, f"{b}.to_v", bias=False),
            "to_out": _dense(sd, f"{b}.to_out.0"),
        }

    return {
        "norm": _norm(sd, f"{base}.norm"),
        "proj_in": _conv(sd, f"{base}.proj_in"),
        "proj_out": _conv(sd, f"{base}.proj_out"),
        "block_0": {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": attn(f"{tb}.attn1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": attn(f"{tb}.attn2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff": {
                "geglu_proj": _dense(sd, f"{tb}.ff.net.0.proj"),
                "proj_out": _dense(sd, f"{tb}.ff.net.2"),
            },
        },
    }


def convert_musetalk_unet(state_dict: Mapping[str, Any], cfg) -> dict:
    """cfg: UNetConfig (block types drive which attn entries exist)."""
    sd = dict(state_dict)
    p: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_linear_1": _dense(sd, "time_embedding.linear_1"),
        "time_linear_2": _dense(sd, "time_embedding.linear_2"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0", True),
        "mid_attn": _transformer(sd, "mid_block.attentions.0"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1", True),
    }
    n = len(cfg.block_out_channels)
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}", True)
            if btype == "CrossAttnDownBlock2D":
                p[f"down_{i}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            p[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    for i, btype in enumerate(cfg.up_block_types):
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}", True)
            if btype == "CrossAttnUpBlock2D":
                p[f"up_{i}_attn_{j}"] = _transformer(sd, f"up_blocks.{i}.attentions.{j}")
        if i < n - 1:
            p[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return {"params": p}
