"""Whisper-encoder audio features for MuseTalk.

Equivalent of the reference's Audio2Feature
(reference: musetalk/whisper/audio2feature.py:16-112): the whisper-tiny
encoder's per-layer embeddings at 50 Hz are sliced into [2,2]-context windows
of shape (50, 384) per video frame. Here the encoder is our flax Whisper and
the whole 30 s window runs as one fused TPU dispatch.
"""
from __future__ import annotations

import math

import numpy as np

SAMPLE_RATE = 16000
FEATURE_HZ = 50          # whisper encoder frames per second
N_SAMPLES_30S = 30 * SAMPLE_RATE


class WhisperFeatureExtractor:
    def __init__(self, variables=None, dims=None):
        import jax
        import jax.numpy as jnp

        from mere_fusion_tpu.models.whisper import TINY, Whisper

        self.jnp = jnp
        self.dims = dims or TINY
        self.model = Whisper(self.dims)
        if variables is None:
            variables = jax.jit(self.model.init)(
                jax.random.key(0),
                jnp.zeros((1, self.dims.n_mels, 2 * self.dims.n_audio_ctx)),
                jnp.zeros((1, 4), jnp.int32),
            )
        self.variables = jax.device_put(variables)
        # encoder context window in samples: n_audio_ctx 50 Hz frames
        self.window_samples = self.dims.n_audio_ctx * 2 * 160

        model = self.model

        @jax.jit
        def embed(variables, mel):
            from mere_fusion_tpu.models.whisper import Whisper as W

            _, emb = model.apply(variables, mel, True, method=W.encode)
            return emb  # [1, L+1, T', D]

        self._embed = lambda mel: embed(self.variables, mel)

    @classmethod
    def from_checkpoint(cls, path: str) -> "WhisperFeatureExtractor":
        import torch

        from mere_fusion_tpu.models.whisper import WhisperDims
        from mere_fusion_tpu.utils.torch_convert import convert_whisper

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        dims = WhisperDims(**ckpt["dims"])
        return cls(convert_whisper(ckpt["model_state_dict"], dims), dims)

    def audio2feat(self, audio: np.ndarray) -> np.ndarray:
        """float32 PCM @16 kHz → per-layer embeddings [T50, L+1, 384],
        trimmed to the actual audio duration at 50 Hz."""
        from mere_fusion_tpu.ops import melspectrogram, whisper_mel_config

        n = len(audio)
        padded = np.zeros(self.window_samples, dtype=np.float32)
        padded[: min(n, self.window_samples)] = audio[: self.window_samples]
        mel = melspectrogram(self.jnp.asarray(padded),
                             whisper_mel_config(self.dims.n_mels))[None]
        emb = np.asarray(self._embed(mel))[0]          # [L+1, T', D]
        emb = emb.transpose(1, 0, 2)                   # [T', L+1, D]
        n_frames = int(math.ceil(n / SAMPLE_RATE * FEATURE_HZ))
        return emb[:n_frames]

    @staticmethod
    def get_sliced_feature(
        feature_array: np.ndarray,
        vid_idx: int,
        audio_feat_length=(2, 2),
        fps: float = 25,
    ) -> np.ndarray:
        """Window of 2*(l+r+1) 50 Hz embedding frames around the video frame,
        flattened to (-1, 384) — (50, 384) for the default [2,2] context."""
        length = len(feature_array)
        center = int(vid_idx * FEATURE_HZ / fps)
        left = center - audio_feat_length[0] * 2
        right = center + (audio_feat_length[1] + 1) * 2
        idx = np.clip(np.arange(left, right), 0, length - 1)
        sel = feature_array[idx]                       # [10, L+1, 384]
        return sel.reshape(-1, feature_array.shape[-1])

    def feature2chunks(
        self,
        feature_array: np.ndarray,
        fps: float,
        batch_size: int,
        audio_feat_length=(2, 2),
        start: float = 0.0,
    ) -> list[np.ndarray]:
        return [
            self.get_sliced_feature(feature_array, i + start, audio_feat_length, fps)
            for i in range(batch_size)
        ]
