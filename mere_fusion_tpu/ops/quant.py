"""Dynamic int8 quantized convolution for inference hot paths.

TPU v5e executes int8×int8→int32 matmul/conv at 2× the bf16 MXU rate
(measured on-chip: 189 vs 123 TFLOP/s on a VAE-decoder-shaped 3×3 conv).
The stable-diffusion VAE decode is ~72% of the MuseTalk serving step and
runs at 86% bf16 MFU — compute-bound, so the only way down is fewer or
cheaper MACs. This module provides the cheaper-MAC path:

- activations: dynamic symmetric per-tensor scale (amax/127), recomputed
  every call — no calibration data needed, robust across inputs;
- weights: symmetric per-output-channel scales (the standard recipe for
  conv nets — per-tensor weight scales lose ~10 dB on channels with small
  dynamic range);
- int8×int8 conv accumulating in int32, dequantized to the compute dtype
  with the fused (s_x · s_w[o]) factor, bias added in float.

Quantizing the *weights* at call time costs one elementwise pass over the
kernels (~70 MFLOP for the whole decoder — noise next to its 9.8 TFLOP);
doing it dynamically keeps checkpoints and converters byte-identical to the
float path.

Reference context: the reference serves the diffusers sd-vae in fp16
(musetalk/models/vae.py:25-122); an int8 decode has no reference analogue —
it is an opt-in TPU-native speed tier gated by a PSNR test.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_per_tensor(x: jnp.ndarray):
    """→ (int8 tensor, f32 scale): symmetric dynamic per-tensor scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_per_out_channel(kernel: jnp.ndarray):
    """[kh, kw, cin, cout] → (int8 kernel, f32 scale[cout])."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
              strides: Sequence[int] = (1, 1), padding="SAME",
              out_dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    """NHWC conv computed in int8 with int32 accumulation.

    x, kernel arrive in float; both are quantized here (dynamic per-tensor
    activation scale, per-output-channel weight scales) after a dynamic
    per-INPUT-channel equalization (the SmoothQuant recipe, computed per
    call from the live amax instead of calibration data):
    conv(x·s⁻¹, s·K) == conv(x, K) exactly, and choosing
    s_j = amax_x[j]^α / amax_K[j]^(1−α) migrates activation-channel
    outliers into the per-channel-scaled weights, where they are
    representable. Measured +1.3 dB (α=0.5) to +1.6 dB (α=0.7)
    int8-vs-float decode PSNR on the VAE probe for one extra amax
    reduction + two elementwise scalings."""
    # amax reduced over x IN ITS OWN DTYPE (bf16 activations at serving):
    # an x.astype(f32) feeding two consumers materializes a full f32 copy
    # of the 0.5 GB top-level batch-16 activations — the amax sweep + copy
    # measured +6 ms across the decode. bf16 amax is exact for gating
    # purposes (amax only sets the clip point).
    kf = kernel.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x), axis=(0, 1, 2)).astype(jnp.float32)  # [cin]
    ak = jnp.max(jnp.abs(kf), axis=(0, 1, 3))            # [cin]
    ok = (ax > 0) & (ak > 0)
    # α=0.7 (s = ax^α / ak^(1-α)): probed best on the VAE gate among
    # α ∈ {0.4..0.8} (39.57→39.84 dB full-int8, 40.45→40.71 keep-top at
    # 0.5→0.7); higher α pushes outlier burden toward the per-channel-
    # scaled weights, which absorb it better than the per-tensor acts
    s = jnp.where(ok, jnp.maximum(ax, 1e-8) ** 0.7
                  / jnp.maximum(ak, 1e-8) ** 0.3, 1.0)
    # per-tensor scale of x/s derived analytically from the per-channel
    # amax (amax_j of ax_j/s_j) — the equalized activations are never
    # materialized: quantization stays ONE fused scale+round+clip pass
    sx = jnp.max(jnp.where(ok, ax / s, ax)) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / (s * sx))),
                  -127, 127).astype(jnp.int8)
    kq, sw = quantize_per_out_channel(kf * s[None, None, :, None])
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kq, tuple(strides), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QConv(nn.Module):
    """Drop-in nn.Conv twin with an int8 fast path.

    Owns the SAME parameters as flax ``nn.Conv`` — names ("kernel", "bias"),
    shapes ([kh, kw, cin, cout], [cout]) — so checkpoints and converters are
    byte-identical between the float and int8 paths; ``quant`` only switches
    the arithmetic."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.quant:
            return int8_conv(x, kernel, bias, self.strides, self.padding,
                             out_dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            tuple(self.strides), self.padding, dimension_numbers=dn)
        return y + bias.astype(self.dtype)
