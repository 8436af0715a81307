"""Numerical parity for the MuseTalk model family.

diffusers is absent in this environment, so we rebuild the exact diffusers
module semantics inline in torch (state-dict key names included) at random
weights — the same pattern the other parity tests use when the reference file
cannot be imported directly. The torch twins mirror:

- diffusers AutoencoderKL as loaded by the reference
  (reference: musetalk/models/vae.py:25-122): encoder/decoder resnet stacks,
  single-head mid attention, asymmetric (0,1) downsample padding,
  quant/post-quant convs, clamped-logvar moments.
- diffusers UNet2DConditionModel built from musetalk.json
  (reference: musetalk/models/unet.py:29-44): SD-1.5 block layout,
  timestep embedding (flip_sin_to_cos, shift 0), Transformer2DModel with
  conv 1x1 projections and GEGLU feed-forward, cross-attention over
  384-d (here 64-d) whisper features.

Weights round-trip through utils/diffusers_convert.py, so a key-mapping bug
anywhere in the converter fails these tests.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from mere_fusion_tpu.models.musetalk import (  # noqa: E402
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from mere_fusion_tpu.utils.diffusers_convert import (  # noqa: E402
    convert_musetalk_unet,
    convert_vae,
)

TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=2,
                     norm_num_groups=8)
TINY_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    attention_head_dim=4,
    cross_attention_dim=64,
    norm_num_groups=8,
)


# ---------------------------------------------------------------------------
# torch twins of the diffusers modules (exact key names + forward semantics)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    def __init__(self, cin, cout, groups, eps, temb_dim=None):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TVAEAttn(tnn.Module):
    """Single-head spatial self-attention (VAE mid block)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).permute(0, 2, 1)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        y = self.to_out[0](attn @ v)
        return x + y.permute(0, 2, 1).reshape(b, c, h, w)


class TDownsample(tnn.Module):
    def __init__(self, c, asymmetric: bool):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = tnn.Conv2d(c, c, 3, stride=2,
                               padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Blocks(tnn.Module):
    """Bare container so state-dict paths read like diffusers'."""


class TVAE(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        g = cfg.norm_num_groups
        chans = cfg.block_out_channels
        n = len(chans)

        enc = _Blocks()
        enc.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList()
        c = chans[0]
        for i, ch in enumerate(chans):
            blk = _Blocks()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TResnet(c, ch, g, 1e-6))
                c = ch
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(ch, True)])
            enc.down_blocks.append(blk)
        enc.mid_block = _Blocks()
        enc.mid_block.resnets = tnn.ModuleList(
            [TResnet(c, c, g, 1e-6), TResnet(c, c, g, 1e-6)])
        enc.mid_block.attentions = tnn.ModuleList([TVAEAttn(c, g)])
        enc.conv_norm_out = tnn.GroupNorm(g, c, eps=1e-6)
        enc.conv_out = tnn.Conv2d(c, 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)

        dec = _Blocks()
        dec.conv_in = tnn.Conv2d(cfg.latent_channels, chans[-1], 3, padding=1)
        dec.mid_block = _Blocks()
        dec.mid_block.resnets = tnn.ModuleList(
            [TResnet(chans[-1], chans[-1], g, 1e-6),
             TResnet(chans[-1], chans[-1], g, 1e-6)])
        dec.mid_block.attentions = tnn.ModuleList([TVAEAttn(chans[-1], g)])
        dec.up_blocks = tnn.ModuleList()
        c = chans[-1]
        for i, ch in enumerate(reversed(chans)):
            blk = _Blocks()
            blk.resnets = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TResnet(c, ch, g, 1e-6))
                c = ch
            if i < n - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(ch)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = tnn.GroupNorm(g, c, eps=1e-6)
        dec.conv_out = tnn.Conv2d(c, cfg.in_channels, 3, padding=1)
        self.decoder = dec

    def encode_mode(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, _logvar = moments.chunk(2, dim=1)
        return mean

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TXAttn(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, lq, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).reshape(b, lq, self.heads, hd).permute(0, 2, 1, 3)
        k = self.to_k(ctx).reshape(b, -1, self.heads, hd).permute(0, 2, 1, 3)
        v = self.to_v(ctx).reshape(b, -1, self.heads, hd).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        y = (attn @ v).permute(0, 2, 1, 3).reshape(b, lq, d)
        return self.to_out[0](y)


class TTransformerBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TXAttn(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TXAttn(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = _Blocks()
        self.ff.net = tnn.ModuleList(
            [TGEGLU(dim, dim * 4), tnn.Identity(), tnn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), ctx) + x
        return self.ff.net[2](self.ff.net[0](self.norm3(x))) + x


class TTransformer2D(tnn.Module):
    def __init__(self, c, ctx_dim, heads, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlock(c, ctx_dim, heads)])
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


def t_timestep_embedding(t, dim, flip=True, shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    args = t.float()[:, None] * torch.exp(exponent)[None]
    sin, cos = torch.sin(args), torch.cos(args)
    return torch.cat([cos, sin] if flip else [sin, cos], dim=-1)


class TUNet(tnn.Module):
    def __init__(self, cfg: UNetConfig):
        super().__init__()
        g, eps = cfg.norm_num_groups, cfg.norm_eps
        heads = cfg.attention_head_dim
        ctx = cfg.cross_attention_dim
        chans = cfg.block_out_channels
        n = len(chans)
        tdim = chans[0] * 4
        self.cfg = cfg

        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = _Blocks()
        self.time_embedding.linear_1 = tnn.Linear(chans[0], tdim)
        self.time_embedding.linear_2 = tnn.Linear(tdim, tdim)

        skip_c = [chans[0]]
        self.down_blocks = tnn.ModuleList()
        c = chans[0]
        for i, (btype, ch) in enumerate(zip(cfg.down_block_types, chans)):
            blk = _Blocks()
            blk.resnets = tnn.ModuleList()
            blk.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TResnet(c, ch, g, eps, tdim))
                c = ch
                if btype == "CrossAttnDownBlock2D":
                    blk.attentions.append(TTransformer2D(ch, ctx, heads, g))
                skip_c.append(ch)
            if i < n - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(ch, False)])
                skip_c.append(ch)
            self.down_blocks.append(blk)

        mid = _Blocks()
        mid.resnets = tnn.ModuleList(
            [TResnet(c, c, g, eps, tdim), TResnet(c, c, g, eps, tdim)])
        mid.attentions = tnn.ModuleList([TTransformer2D(c, ctx, heads, g)])
        self.mid_block = mid

        self.up_blocks = tnn.ModuleList()
        for i, (btype, ch) in enumerate(
                zip(cfg.up_block_types, reversed(chans))):
            blk = _Blocks()
            blk.resnets = tnn.ModuleList()
            blk.attentions = tnn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TResnet(c + skip_c.pop(), ch, g, eps, tdim))
                c = ch
                if btype == "CrossAttnUpBlock2D":
                    blk.attentions.append(TTransformer2D(ch, ctx, heads, g))
            if i < n - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = tnn.GroupNorm(g, c, eps=eps)
        self.conv_out = tnn.Conv2d(c, cfg.out_channels, 3, padding=1)

    def forward(self, latents, timesteps, context):
        cfg = self.cfg
        temb = t_timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(latents)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if len(blk.attentions):
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(torch.cat([h, skips.pop()], dim=1), temb)
                if len(blk.attentions):
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def _randomize(module: tnn.Module, seed: int) -> None:
    """Random weights everywhere, INCLUDING norm scales/biases, so an
    identity-initialized norm cannot mask a converter key-mapping bug."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim == 1:  # biases + norm scales
                p.copy_(torch.empty_like(p).uniform_(-0.2, 0.2, generator=gen)
                        + (1.0 if name.endswith("weight") else 0.0))
            else:
                fan_in = p.shape[1] * (p.shape[2] * p.shape[3]
                                       if p.ndim == 4 else 1)
                std = 1.0 / math.sqrt(fan_in)
                p.copy_(torch.empty_like(p).normal_(0, std, generator=gen))


def _max_rel(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a - b).max() / max(1e-6, float(np.abs(b).max())))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_vae_parity_torch():
    tvae = TVAE(TINY_VAE).eval()
    _randomize(tvae, 0)
    variables = convert_vae(tvae.state_dict(), n_down=2)
    fvae = AutoencoderKL(TINY_VAE)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        mean_t = tvae.encode_mode(torch.from_numpy(x)).numpy()
        dec_t = tvae.decode(torch.from_numpy(mean_t)).numpy()

    mean_f = np.asarray(
        fvae.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   method=AutoencoderKL.encode)
    ).transpose(0, 3, 1, 2)
    dec_f = np.asarray(
        fvae.apply(variables, jnp.asarray(mean_t.transpose(0, 2, 3, 1)),
                   method=AutoencoderKL.decode)
    ).transpose(0, 3, 1, 2)

    assert _max_rel(mean_f, mean_t) < 3e-4, _max_rel(mean_f, mean_t)
    assert _max_rel(dec_f, dec_t) < 3e-4, _max_rel(dec_f, dec_t)


def test_vae_logvar_clamp():
    """moments() clamps logvar to [-30, 20] like diffusers
    DiagonalGaussianDistribution (reference loads this via
    musetalk/models/vae.py:25-27)."""
    tvae = TVAE(TINY_VAE).eval()
    _randomize(tvae, 1)
    variables = convert_vae(tvae.state_dict(), n_down=2)
    fvae = AutoencoderKL(TINY_VAE)
    x = np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 3)) \
        .astype(np.float32)
    _, logvar = fvae.apply(variables, jnp.asarray(x),
                           method=AutoencoderKL.moments)
    lv = np.asarray(logvar)
    assert lv.min() >= -30.0 and lv.max() <= 20.0


def test_unet_parity_torch():
    tunet = TUNet(TINY_UNET).eval()
    _randomize(tunet, 2)
    variables = convert_musetalk_unet(tunet.state_dict(), TINY_UNET)
    funet = UNet2DCondition(TINY_UNET)

    rng = np.random.default_rng(2)
    lat = rng.standard_normal((2, 8, 32, 32)).astype(np.float32)
    ctx = rng.standard_normal((2, 50, 64)).astype(np.float32)
    # t=0 is the MuseTalk serving point (reference musereal.py:91-118);
    # t=7 additionally exercises the sinusoidal embedding path.
    for tval in (0.0, 7.0):
        t = np.full((2,), tval, np.float32)
        with torch.no_grad():
            out_t = tunet(torch.from_numpy(lat), torch.from_numpy(t),
                          torch.from_numpy(ctx)).numpy()
        out_f = np.asarray(
            funet.apply(variables, jnp.asarray(lat.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(ctx))
        ).transpose(0, 3, 1, 2)
        assert _max_rel(out_f, out_t) < 3e-4, (tval, _max_rel(out_f, out_t))


def test_converter_rejects_wrong_keys():
    """A truncated/renamed state dict must fail loudly, not silently skip."""
    tvae = TVAE(TINY_VAE)
    sd = tvae.state_dict()
    sd.pop("encoder.conv_in.weight")
    with pytest.raises(KeyError):
        convert_vae(sd)
