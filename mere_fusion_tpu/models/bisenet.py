"""BiSeNet face parsing in flax (NHWC).

Architecture twin of the reference's face-parsing network
(reference: musetalk/utils/face_parsing/model.py:14-260, resnet.py:20-78;
duplicated at ernerf/data_utils/face_parsing/): ResNet18 backbone, context
path with attention-refinement modules, feature fusion, and three output
heads upsampled to the input size. Interpolation helpers replicate torch's
nearest (floor) and bilinear align_corners=True semantics exactly so
converted checkpoints are pixel-faithful.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest_torch(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest'): src index = floor(dst * in/out)."""
    b, h, w, c = x.shape
    oh, ow = size
    iy = (np.arange(oh) * h // oh).astype(np.int32)
    ix = (np.arange(ow) * w // ow).astype(np.int32)
    return x[:, iy][:, :, ix]


def upsample_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    oh, ow = size

    def coords(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return np.zeros(out_n, np.float32)
        return np.arange(out_n, dtype=np.float32) * (in_n - 1) / (out_n - 1)

    fy, fx = coords(oh, h), coords(ow, w)
    y0 = np.floor(fy).astype(np.int32)
    x0 = np.floor(fx).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = jnp.asarray((fy - y0)[None, :, None, None])
    wx = jnp.asarray((fx - x0)[None, None, :, None])
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ConvBNReLU(nn.Module):
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chan, (self.ks, self.ks), strides=(self.stride,) * 2,
                    padding=((self.padding,) * 2,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                       momentum=0.9, dtype=self.dtype, name=name)
        r = nn.Conv(self.out_chan, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        r = nn.relu(bn("bn1")(r))
        r = nn.Conv(self.out_chan, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(r)
        r = bn("bn2")(r)
        shortcut = x
        if x.shape[-1] != self.out_chan or self.stride != 1:
            shortcut = nn.Conv(self.out_chan, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = bn("downsample_bn")(shortcut)
        return nn.relu(shortcut + r)


class Resnet18(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, (ch, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for j in range(2):
                x = BasicBlock(ch, stride if j == 0 else 1, self.dtype,
                               name=f"layer{i + 1}_{j}")(x)
            if i == 1:
                feat8 = x
            elif i == 2:
                feat16 = x
        return feat8, feat16, x


class AttentionRefinement(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, 3, 1, 1, self.dtype, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9,
                             dtype=self.dtype, name="bn_atten")(atten)
        return feat * nn.sigmoid(atten)


class ContextPath(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = Resnet18(self.dtype, name="resnet")(x)
        h16, w16 = feat16.shape[1:3]
        h8, w8 = feat8.shape[1:3]

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, 1, 0, self.dtype, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, (avg.shape[0], *feat32.shape[1:3], 128))

        f32 = AttentionRefinement(128, self.dtype, name="arm32")(feat32) + avg_up
        f32_up = upsample_nearest_torch(f32, (h16, w16))
        f32_up = ConvBNReLU(128, 3, 1, 1, self.dtype, name="conv_head32")(f32_up)

        f16 = AttentionRefinement(128, self.dtype, name="arm16")(feat16) + f32_up
        f16_up = upsample_nearest_torch(f16, (h8, w8))
        f16_up = ConvBNReLU(128, 3, 1, 1, self.dtype, name="conv_head16")(f16_up)

        return feat8, f16_up, f32_up


class FeatureFusion(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_chan, 1, 1, 0, self.dtype, name="convblk")(fcat)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv2")(atten)
        atten = nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_chan: int
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, 3, 1, 1, self.dtype, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, dtype=self.dtype,
                       name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = 19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] imagenet-normalized RGB. Returns the three class
        maps upsampled to [B, H, W, n_classes]."""
        h, w = x.shape[1:3]
        feat_res8, feat_cp8, feat_cp16 = ContextPath(self.dtype, name="cp")(x)
        feat_fuse = FeatureFusion(256, self.dtype, name="ffm")(feat_res8, feat_cp8)
        out = BiSeNetOutput(256, self.n_classes, self.dtype, name="conv_out")(feat_fuse)
        out16 = BiSeNetOutput(64, self.n_classes, self.dtype, name="conv_out16")(feat_cp8)
        out32 = BiSeNetOutput(64, self.n_classes, self.dtype, name="conv_out32")(feat_cp16)
        up = lambda o: upsample_bilinear_align_corners(o, (h, w))
        return up(out), up(out16), up(out32)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FaceParsing:
    """Face-region mask extraction (reference: face_parsing/__init__.py:10-51):
    512×512 bilinear resize, imagenet normalization, argmax over classes,
    classes >13 → background, rest → 255."""

    def __init__(self, variables=None, dtype=jnp.float32):
        self.model = BiSeNet(dtype=dtype)
        if variables is None:
            variables = jax.jit(self.model.init)(
                jax.random.key(0), jnp.zeros((1, 64, 64, 3))
            )
        self.variables = jax.device_put(variables)
        model = self.model

        @jax.jit
        def fn(variables, img):
            out, _, _ = model.apply(variables, img)
            return jnp.argmax(out, axis=-1)

        self._fn = lambda img: fn(self.variables, img)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "FaceParsing":
        from mere_fusion_tpu.utils.torch_convert import (
            convert_bisenet,
            load_torch_checkpoint,
        )

        return cls(variables=convert_bisenet(load_torch_checkpoint(path)), **kw)

    def _classes(self, image_bgr: np.ndarray, size=(512, 512)) -> np.ndarray:
        import cv2

        img = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)
        x = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return np.array(self._fn(jnp.asarray(x[None])))[0].astype(np.uint8)

    def __call__(self, image_bgr: np.ndarray, size=(512, 512)) -> np.ndarray:
        parsing = self._classes(image_bgr, size)
        parsing[parsing > 13] = 0
        parsing[parsing >= 1] = 255
        return parsing.astype(np.uint8)

    def semantic_map(self, image_bgr: np.ndarray) -> np.ndarray:
        """Color-coded semantics at the input resolution, the ER-NeRF data
        pipeline's parsing format (reference data_utils/face_parsing/
        test.py:27-48): head (classes 1-13, 17+) BGR (255,0,0), neck
        (14-15) (0,255,0), torso (16) (0,0,255), background white."""
        import cv2

        h, w = image_bgr.shape[:2]
        parsing = self._classes(image_bgr)
        parsing = cv2.resize(parsing, (w, h), interpolation=cv2.INTER_NEAREST)
        out = np.full((h, w, 3), 255, np.uint8)
        head = ((parsing >= 1) & (parsing <= 13)) | (parsing >= 17)
        out[head] = (255, 0, 0)
        out[(parsing >= 14) & (parsing <= 15)] = (0, 255, 0)
        out[parsing == 16] = (0, 0, 255)
        return out
