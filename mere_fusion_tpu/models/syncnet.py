"""SyncNet lip-sync scorer in flax (NHWC).

Architecture twin of the reference's SyncNet_color
(reference: wav2lip/models/syncnet.py:7-66): a 5-frame lower-half face
window (15 input channels) and a mel window are embedded to L2-normalized
512-d vectors; cosine similarity scores sync. Used by the wav2lip training
recipe (hparams syncnet_wt, wav2lip/hparams.py:90-95).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mere_fusion_tpu.models.wav2lip import ConvBNRelu

Conv = tuple
SYNC_FACE: Sequence[Conv] = (
    ("c", 32, 7, 1, 3, False),
    ("c", 64, 5, (1, 2), 1, False), ("c", 64, 3, 1, 1, True), ("c", 64, 3, 1, 1, True),
    ("c", 128, 3, 2, 1, False), ("c", 128, 3, 1, 1, True),
    ("c", 128, 3, 1, 1, True), ("c", 128, 3, 1, 1, True),
    ("c", 256, 3, 2, 1, False), ("c", 256, 3, 1, 1, True), ("c", 256, 3, 1, 1, True),
    ("c", 512, 3, 2, 1, False), ("c", 512, 3, 1, 1, True), ("c", 512, 3, 1, 1, True),
    ("c", 512, 3, 2, 1, False), ("c", 512, 3, 1, 0, False), ("c", 512, 1, 1, 0, False),
)
SYNC_AUDIO: Sequence[Conv] = (
    ("c", 32, 3, 1, 1, False), ("c", 32, 3, 1, 1, True), ("c", 32, 3, 1, 1, True),
    ("c", 64, 3, (3, 1), 1, False), ("c", 64, 3, 1, 1, True), ("c", 64, 3, 1, 1, True),
    ("c", 128, 3, 3, 1, False), ("c", 128, 3, 1, 1, True), ("c", 128, 3, 1, 1, True),
    ("c", 256, 3, (3, 2), 1, False), ("c", 256, 3, 1, 1, True), ("c", 256, 3, 1, 1, True),
    ("c", 512, 3, 1, 0, False), ("c", 512, 1, 1, 0, False),
)


class SyncNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, faces, train: bool = False):
        """mel [B, 80, 16] (or [B,80,16,1]); faces [B, H/2, W, 15]
        (5 stacked lower-half RGB frames). Returns (audio_emb, face_emb),
        both L2-normalized [B, 512]."""
        if mel.ndim == 3:
            mel = mel[..., None]
        a = mel.astype(self.dtype)
        for j, spec in enumerate(SYNC_AUDIO):
            _, c, k, s, p, res = spec
            a = ConvBNRelu(c, k, s, p, res, dtype=self.dtype, name=f"ae_{j}")(a, train)
        f = faces.astype(self.dtype)
        for j, spec in enumerate(SYNC_FACE):
            _, c, k, s, p, res = spec
            f = ConvBNRelu(c, k, s, p, res, dtype=self.dtype, name=f"fe_{j}")(f, train)
        a = a.reshape(a.shape[0], -1)
        f = f.reshape(f.shape[0], -1)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        return a, f


def cosine_sync_loss(audio_emb, face_emb, labels):
    """BCE on cosine similarity (the published syncnet recipe)."""
    import jax

    sim = (audio_emb * face_emb).sum(-1)
    prob = jnp.clip((sim + 1) / 2, 1e-7, 1 - 1e-7)
    return -(labels * jnp.log(prob) + (1 - labels) * jnp.log(1 - prob)).mean()


def convert_syncnet(state_dict) -> dict:
    """Map the reference syncnet .pth onto this module."""
    from mere_fusion_tpu.utils.torch_convert import _convert_conv_bn, strip_prefix

    sd = strip_prefix(state_dict)
    params: dict = {}
    stats: dict = {}
    for j, _ in enumerate(SYNC_AUDIO):
        p, s = _convert_conv_bn(sd, f"audio_encoder.{j}", False)
        params[f"ae_{j}"] = p
        stats[f"ae_{j}"] = s
    for j, _ in enumerate(SYNC_FACE):
        p, s = _convert_conv_bn(sd, f"face_encoder.{j}", False)
        params[f"fe_{j}"] = p
        stats[f"fe_{j}"] = s
    return {"params": params, "batch_stats": stats}
