"""AutoencoderKL (stable-diffusion VAE) in flax, NHWC.

Same architecture family as the sd-vae-ft-mse checkpoint the reference loads
through diffusers (reference: musetalk/models/vae.py:25-122). Encoder:
4 down blocks [128,256,512,512] × 2 resnets + mid(resnet, attn, resnet) →
8-channel moments; decoder mirrors it with 3-resnet up blocks. The MuseTalk
wrapper semantics (half-mask preprocessing, ×0.18215 scaling,
[−1,1] normalization) live in mere_fusion_tpu/engines/muse.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mere_fusion_tpu.ops.quant import QConv


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact nearest-neighbor 2x upsample via broadcast+reshape.

    Equivalent to jax.image.resize(..., method='nearest') at integer scale,
    but lowers to a copy instead of per-pixel gathers — on TPU the gather
    form was the single hottest op in the VAE decoder.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    groups: int = 32
    eps: float = 1e-6
    quant: bool = False      # int8 conv arithmetic (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, quant=self.quant, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                  dtype=self.dtype, quant=self.quant, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype,
                      quant=self.quant, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid)."""

    channels: int
    dtype: Any = jnp.float32
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=self.eps, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(c).astype(jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return x + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers uses asymmetric (0,1) padding on stride-2 downsample
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups, name="mid_res_0")(h)
        h = AttnBlock(ch, self.dtype, cfg.norm_num_groups, name="mid_attn")(h)
        h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups, name="mid_res_1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32
    int8: bool = False       # int8 conv arithmetic on the decode hot path
    # keep the top N (highest-resolution) up blocks in the float path when
    # int8 is on: their convs feed pixels through only conv_norm_out +
    # conv_out, so their quantization error is the most visible, while the
    # upsampled input means earlier (quantized) blocks carry most of the
    # receptive field. A quality/speed ladder evaluated by the load-time
    # PSNR gate (engines.muse). Accepts a bool for the common 1-block case.
    int8_fp_up_blocks: int = 0

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        q = self.int8
        ch = cfg.block_out_channels[-1]
        h = QConv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                  quant=q, name="conv_in")(z)
        h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups, quant=q,
                        name="mid_res_0")(h)
        h = AttnBlock(ch, self.dtype, cfg.norm_num_groups, name="mid_attn")(h)
        h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups, quant=q,
                        name="mid_res_1")(h)
        up_channels = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(up_channels):
            qi = q and i < len(up_channels) - int(self.int8_fp_up_blocks)
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, self.dtype, cfg.norm_num_groups, quant=qi,
                                name=f"up_{i}_res_{j}")(h)
            if i < len(up_channels) - 1:
                h = upsample2x_nearest(h)
                h = QConv(ch, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, quant=qi,
                          name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        # the output projection stays in the float path: it maps straight to
        # pixel space, where quantization error is visible 1:1
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = field(default_factory=VAEConfig)
    dtype: Any = jnp.float32
    int8_decode: bool = False
    int8_fp_up_blocks: int = 0

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, self.dtype, int8=self.int8_decode,
                               int8_fp_up_blocks=int(self.int8_fp_up_blocks),
                               name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def moments(self, x):
        """x [B,H,W,3] in [-1,1] → (mean, logvar) each [B,H/8,W/8,4]."""
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Latent sample (rng given) or mode (deterministic)."""
        mean, logvar = self.moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
