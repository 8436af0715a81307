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

        @jax.jit
        def embed_raw(variables, audio):
            """Raw PCM → [T', L+1, D] embeddings, fully on device: pad to
            the 30 s window, mel, encode, transpose — so the live path
            uploads ~100 KB of PCM instead of a 1.9 MB padded window and
            reads back NOTHING (the 0.66 MB embedding readback plus the
            padded upload measured ~660 ms/step through the ~8 MB/s axon
            tunnel — the whole real-time budget)."""
            from mere_fusion_tpu.models.whisper import Whisper as W
            from mere_fusion_tpu.ops import melspectrogram, whisper_mel_config

            padded = jnp.zeros((self.window_samples,), jnp.float32)
            padded = jax.lax.dynamic_update_slice(padded, audio, (0,))
            mel = melspectrogram(padded, whisper_mel_config(self.dims.n_mels))
            _, emb = model.apply(variables, mel[None], True, method=W.encode)
            return jnp.transpose(emb[0], (1, 0, 2))   # [T', L+1, D]

        self._embed_raw = lambda a: embed_raw(self.variables, a)
        self._gathers: dict = {}

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

    # ---- device-resident live path -----------------------------------------
    def audio2feat_device(self, audio: np.ndarray):
        """Live-serving twin of audio2feat that never crosses back to the
        host: uploads the raw PCM (one compiled shape — the engine's
        accumulated window is constant at steady state) and returns
        (embeddings [T', L+1, D] ON DEVICE, n_frames). The embeddings stay
        in HBM until chunks_device gathers per-frame windows, which feed
        the generator directly — zero feature bytes cross the tunnel."""
        n = min(len(audio), self.window_samples)
        emb = self._embed_raw(self.jnp.asarray(audio[:n]))
        return emb, int(math.ceil(n / SAMPLE_RATE * FEATURE_HZ))

    def chunks_device(self, emb_dev, n_frames: int, fps: float,
                      batch_size: int, audio_feat_length=(2, 2),
                      start: float = 0.0):
        """Device twin of feature2chunks: one batched gather → [B, W, D]
        jax array (W = 2·(l+r+1)·(L+1)), same windows as
        get_sliced_feature."""
        l, r = audio_feat_length
        idx = []
        for i in range(batch_size):
            center = int((i + start) * FEATURE_HZ / fps)
            idx.append(np.clip(np.arange(center - l * 2, center + (r + 1) * 2),
                               0, max(n_frames - 1, 0)))
        idx = np.stack(idx)                       # [B, 2(l+r+1)]
        gather = self._gathers.get(idx.shape)
        if gather is None:
            import jax

            @jax.jit
            def gather(emb, ix):
                sel = emb[ix]                     # [B, w, L+1, D]
                return sel.reshape(ix.shape[0], -1, emb.shape[-1])

            self._gathers[idx.shape] = gather
        return gather(emb_dev, self.jnp.asarray(idx))
