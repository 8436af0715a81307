"""Audio-conditioned UNet (stable-diffusion family) in flax, NHWC.

Architecture twin of the diffusers UNet2DConditionModel the reference builds
from musetalk.json (reference: musetalk/models/unet.py:29-44): SD-1.5 block
layout with in_channels=8 (masked + reference latents), out_channels=4, and
cross-attention over 384-d whisper features. MuseTalk runs it as a one-step
regressor at timestep 0 (reference: musereal.py:91-118) — no sampler loop —
so the whole generator is a single fused forward.

``positional_encoding`` reproduces the reference's PositionalEncoding on the
audio feature sequence (musetalk/models/unet.py:12-27).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn

from mere_fusion_tpu.ops.quant import QConv
import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.models.musetalk.vae import upsample2x_nearest


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    down_block_types: tuple = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: tuple = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 8      # = number of heads (SD-1.5 convention)
    cross_attention_dim: int = 384
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @classmethod
    def from_json(cls, path: str) -> "UNetConfig":
        import json

        with open(path) as f:
            raw = json.load(f)
        keys = {f for f in cls.__dataclass_fields__}
        kw = {k: (tuple(v) if isinstance(v, list) else v) for k, v in raw.items() if k in keys}
        return cls(**kw)


MUSETALK_UNET = UNetConfig()


def positional_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """Sinusoidal PE added to the audio feature sequence [B, L, D]."""
    seq_len, d_model = x.shape[1], x.shape[2]
    position = np.arange(seq_len)[:, None].astype(np.float32)
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float32)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((seq_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return x + jnp.asarray(pe)[None]


def timestep_embedding(t: jnp.ndarray, dim: int, flip: bool, shift: float) -> jnp.ndarray:
    """diffusers get_timestep_embedding semantics. t: [B] float."""
    half = dim // 2
    exponent = -math.log(10000.0) * np.arange(half, dtype=np.float32) / (half - shift)
    freqs = jnp.asarray(np.exp(exponent))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip else [sin, cos], axis=-1)


class ResnetBlockT(nn.Module):
    """ResnetBlock2D with timestep conditioning."""

    out_channels: int
    dtype: Any = jnp.float32
    groups: int = 32
    eps: float = 1e-5
    quant: bool = False      # int8 conv arithmetic (ops/quant.py)

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.groups, epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, quant=self.quant, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, quant=self.quant, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                      quant=self.quant, name="conv_shortcut")(x)
        return x + h


# Attention implementation switch (profiling + serving):
#   "auto"  — "fused" on TPU, "xla" elsewhere (pallas needs interpret mode
#             off-TPU), resolved at trace time
#   "xla"   — einsum QK^T → softmax → AV (materializes the [B,h,Lq,Lk]
#             score matrix in HBM; the parity-test reference path)
#   "fused" — Pallas in-VMEM attention for the large self-attn seqs
#   "skip"  — out = to_out(q): removes the attention matmuls but keeps every
#             parameter and activation shape (time-attribution probes only)
ATTN_IMPL = "auto"


def _resolve_attn_impl() -> str:
    if ATTN_IMPL == "auto":
        return "fused" if jax.default_backend() == "tpu" else "xla"
    return ATTN_IMPL


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, lq, _ = q.shape
        lk = k.shape[1]
        impl = _resolve_attn_impl()
        if impl == "skip":
            return nn.Dense(inner, dtype=self.dtype, name="to_out")(q)
        q = q.reshape(b, lq, self.heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.heads, head_dim).transpose(0, 2, 1, 3)
        # only the long self-attn seqs win: measured on v5e at batch 16,
        # L=1024/d=40 runs 1.45 ms fused vs 2.15 ms einsum, while L=256/d=80
        # is faster on the einsum path (0.64 vs 0.71 ms) — the score matrix
        # there is small enough that HBM traffic no longer dominates
        if impl == "fused" and is_self and lq >= 512:
            from mere_fusion_tpu.ops.attention import self_attention_fused

            out = self_attention_fused(q, k, v)
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
                / math.sqrt(head_dim),
                axis=-1,
            ).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = CrossAttention(self.dim, self.heads, self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        ) + x
        x = CrossAttention(self.dim, self.heads, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context
        ) + x
        x = FeedForwardGEGLU(self.dim, self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        ) + x
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN → conv1x1 in → 1 block → conv1x1 out + residual."""

    channels: int
    heads: int
    dtype: Any = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        y = TransformerBlock(c, self.heads, self.dtype, name="block_0")(y, context)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + res


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = MUSETALK_UNET
    dtype: Any = jnp.float32
    # int8 conv arithmetic on the resnet/resample convs (attention, time
    # embedding, conv_in/out stay in the float path). Same parameters as
    # the float model — the PSNR gate in engines.muse decides whether the
    # tier serves (no reference analogue; TPU-native speed tier).
    int8: bool = False

    @nn.compact
    def __call__(self, latents, timesteps, context):
        """latents [B,H,W,in_ch]; timesteps [B] or scalar; context [B,L,384]."""
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (latents.shape[0],))
        heads = cfg.attention_head_dim
        time_dim = cfg.block_out_channels[0] * 4

        temb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_linear_1")(temb)
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_linear_2")(nn.silu(temb))

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(latents)

        skips = [h]
        for i, (btype, ch) in enumerate(zip(cfg.down_block_types, cfg.block_out_channels)):
            for j in range(cfg.layers_per_block):
                h = ResnetBlockT(ch, self.dtype, cfg.norm_num_groups, cfg.norm_eps,
                                 quant=self.int8,
                                 name=f"down_{i}_res_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = SpatialTransformer(ch, heads, self.dtype, cfg.norm_num_groups,
                                           name=f"down_{i}_attn_{j}")(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = QConv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, quant=self.int8,
                          name=f"down_{i}_downsample")(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlockT(mid_ch, self.dtype, cfg.norm_num_groups, cfg.norm_eps,
                         quant=self.int8, name="mid_res_0")(h, temb)
        h = SpatialTransformer(mid_ch, heads, self.dtype, cfg.norm_num_groups,
                               name="mid_attn")(h, context)
        h = ResnetBlockT(mid_ch, self.dtype, cfg.norm_num_groups, cfg.norm_eps,
                         quant=self.int8, name="mid_res_1")(h, temb)

        up_channels = list(reversed(cfg.block_out_channels))
        for i, (btype, ch) in enumerate(zip(cfg.up_block_types, up_channels)):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlockT(ch, self.dtype, cfg.norm_num_groups, cfg.norm_eps,
                                 quant=self.int8,
                                 name=f"up_{i}_res_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = SpatialTransformer(ch, heads, self.dtype, cfg.norm_num_groups,
                                           name=f"up_{i}_attn_{j}")(h, context)
            if i < len(up_channels) - 1:
                h = upsample2x_nearest(h)
                h = QConv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                          quant=self.int8, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)
