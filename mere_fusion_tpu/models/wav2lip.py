"""Wav2Lip lip-sync generator in flax (NHWC, TPU-first).

Same architecture family as the reference torch model
(reference: wav2lip/models/wav2lip.py:12-125, conv.py:5-44): a 7-stage
6-channel face encoder (96→1 px), a mel audio encoder to a 512-d embedding,
and a skip-connected transposed-conv decoder with a sigmoid RGB head — but
expressed as a declarative layer spec shared by the model and the
torch-checkpoint converter, in NHWC layout so XLA tiles convs onto the MXU.

The GAN quality discriminator (wav2lip.py:127-184) is `Wav2LipDisc` below;
SyncNet lives in syncnet.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Layer spec entries:
#   ("c", cout, kernel, stride, pad, residual)   conv + BN + relu
#   ("t", cout, kernel, stride, pad, out_pad)    convT + BN + relu
Conv = tuple
FACE_ENCODER: Sequence[Sequence[Conv]] = (
    (("c", 16, 7, 1, 3, False),),                                     # 96
    (("c", 32, 3, 2, 1, False), ("c", 32, 3, 1, 1, True), ("c", 32, 3, 1, 1, True)),   # 48
    (("c", 64, 3, 2, 1, False),) + (("c", 64, 3, 1, 1, True),) * 3,   # 24
    (("c", 128, 3, 2, 1, False),) + (("c", 128, 3, 1, 1, True),) * 2, # 12
    (("c", 256, 3, 2, 1, False),) + (("c", 256, 3, 1, 1, True),) * 2, # 6
    (("c", 512, 3, 2, 1, False), ("c", 512, 3, 1, 1, True)),          # 3
    (("c", 512, 3, 1, 0, False), ("c", 512, 1, 1, 0, False)),         # 1
)

AUDIO_ENCODER: Sequence[Conv] = (
    ("c", 32, 3, 1, 1, False), ("c", 32, 3, 1, 1, True), ("c", 32, 3, 1, 1, True),
    ("c", 64, 3, (3, 1), 1, False), ("c", 64, 3, 1, 1, True), ("c", 64, 3, 1, 1, True),
    ("c", 128, 3, 3, 1, False), ("c", 128, 3, 1, 1, True), ("c", 128, 3, 1, 1, True),
    ("c", 256, 3, (3, 2), 1, False), ("c", 256, 3, 1, 1, True),
    ("c", 512, 3, 1, 0, False), ("c", 512, 1, 1, 0, False),
)

FACE_DECODER: Sequence[Sequence[Conv]] = (
    (("c", 512, 1, 1, 0, False),),
    (("t", 512, 3, 1, 0, 0), ("c", 512, 3, 1, 1, True)),              # 3
    (("t", 512, 3, 2, 1, 1), ("c", 512, 3, 1, 1, True), ("c", 512, 3, 1, 1, True)),    # 6
    (("t", 384, 3, 2, 1, 1), ("c", 384, 3, 1, 1, True), ("c", 384, 3, 1, 1, True)),    # 12
    (("t", 256, 3, 2, 1, 1), ("c", 256, 3, 1, 1, True), ("c", 256, 3, 1, 1, True)),    # 24
    (("t", 128, 3, 2, 1, 1), ("c", 128, 3, 1, 1, True), ("c", 128, 3, 1, 1, True)),    # 48
    (("t", 64, 3, 2, 1, 1), ("c", 64, 3, 1, 1, True), ("c", 64, 3, 1, 1, True)),       # 96
)


def _pair(v):
    return v if isinstance(v, tuple) else (v, v)


class ConvBNRelu(nn.Module):
    """Conv → BatchNorm → ReLU with optional pre-activation residual."""

    cout: int
    kernel: Any = 3
    stride: Any = 1
    pad: Any = 1
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = _pair(self.kernel), _pair(self.stride), _pair(self.pad)
        y = nn.Conv(
            self.cout, k, strides=s, padding=(p, p), dtype=self.dtype,
            name="conv",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        if self.residual:
            y = y + x
        return nn.relu(y)


class ConvTransposeBNRelu(nn.Module):
    """Exact torch ConvTranspose2d semantics via input dilation + conv.

    out = (in-1)*s - 2p + k + op, implemented as lhs_dilation=s with padding
    (k-1-p, k-1-p+op) and a spatially-flipped kernel — one conv_general call
    XLA maps straight onto the MXU.
    """

    cout: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    out_pad: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p, op = self.kernel, self.stride, self.pad, self.out_pad
        cin = x.shape[-1]
        # kernel stored in torch layout (cin, cout, kh, kw) so the converter
        # can copy checkpoint weights verbatim.
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, self.cout, k, k),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
        w_hwio = jnp.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))  # HWIO, flipped
        lo, hi = k - 1 - p, k - 1 - p + op
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_hwio.astype(self.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + b.astype(self.dtype)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        return nn.relu(y)


def _apply_spec(spec: Conv, x, *, name: str, dtype, train: bool):
    if spec[0] == "c":
        _, cout, k, s, p, res = spec
        return ConvBNRelu(cout, k, s, p, res, dtype=dtype, name=name)(x, train)
    _, cout, k, s, p, op = spec
    return ConvTransposeBNRelu(cout, k, s, p, op, dtype=dtype, name=name)(x, train)


class Wav2Lip(nn.Module):
    """mel window + masked/reference face pair → lip-synced face crop.

    Inputs (NHWC):
      mel:   [B, 80, 16] or [B, 80, 16, 1] normalized mel window
      faces: [B, H, W, 6] = concat(lower-half-masked current frame, reference
             frame) in [0, 1]
    Output: [B, H, W, 3] in [0, 1].
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, faces, train: bool = False):
        if mel.ndim == 3:
            mel = mel[..., None]
        a = mel.astype(self.dtype)
        for j, spec in enumerate(AUDIO_ENCODER):
            a = _apply_spec(spec, a, name=f"ae_{j}", dtype=self.dtype, train=train)

        feats = []
        x = faces.astype(self.dtype)
        for i, block in enumerate(FACE_ENCODER):
            for j, spec in enumerate(block):
                x = _apply_spec(spec, x, name=f"fe_{i}_{j}", dtype=self.dtype, train=train)
            feats.append(x)

        x = a
        for i, block in enumerate(FACE_DECODER):
            for j, spec in enumerate(block):
                x = _apply_spec(spec, x, name=f"fd_{i}_{j}", dtype=self.dtype, train=train)
            x = jnp.concatenate([x, feats.pop()], axis=-1)

        x = ConvBNRelu(32, 3, 1, 1, dtype=self.dtype, name="out_0")(x, train)
        x = nn.Conv(3, (1, 1), padding=((0, 0), (0, 0)), dtype=self.dtype, name="out_1")(x)
        return nn.sigmoid(x.astype(jnp.float32))


DISC_ENCODER: Sequence[Sequence[Conv]] = (
    (("c", 32, 7, 1, 3, False),),
    (("c", 64, 5, (1, 2), 2, False), ("c", 64, 5, 1, 2, False)),
    (("c", 128, 5, 2, 2, False), ("c", 128, 5, 1, 2, False)),
    (("c", 256, 5, 2, 2, False), ("c", 256, 5, 1, 2, False)),
    (("c", 512, 3, 2, 1, False), ("c", 512, 3, 1, 1, False)),
    (("c", 512, 3, 2, 1, False), ("c", 512, 3, 1, 1, False)),
    (("c", 512, 3, 1, 0, False), ("c", 512, 1, 1, 0, False)),
)


class ConvLeaky(nn.Module):
    """Conv → LeakyReLU(0.01), no norm (discriminator blocks)."""

    cout: int
    kernel: Any = 3
    stride: Any = 1
    pad: Any = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = _pair(self.kernel), _pair(self.stride), _pair(self.pad)
        y = nn.Conv(self.cout, k, strides=s, padding=(p, p), dtype=self.dtype, name="conv")(x)
        return nn.leaky_relu(y, negative_slope=0.01)


class Wav2LipDisc(nn.Module):
    """GAN quality discriminator over the lower half of generated faces.

    Reference behavior: wav2lip/models/wav2lip.py:127-184.
    Input [B, H, W, 3]; scores the lower half, returns [B, 1] in (0, 1).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, faces):
        x = faces[:, faces.shape[1] // 2 :, :, :].astype(self.dtype)
        for i, block in enumerate(DISC_ENCODER):
            for j, spec in enumerate(block):
                _, cout, k, s, p, _ = spec
                x = ConvLeaky(cout, k, s, p, dtype=self.dtype, name=f"de_{i}_{j}")(x)
        x = nn.Conv(1, (1, 1), padding=((0, 0), (0, 0)), dtype=self.dtype, name="pred")(x)
        return nn.sigmoid(x.reshape(x.shape[0], -1).astype(jnp.float32))
