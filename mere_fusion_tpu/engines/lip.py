"""Wav2Lip real-time engine.

Pipeline twin of the reference's lipreal.py/lipasr.py with the GPU subprocess
replaced by an in-process jitted device step:

    TTS thread ─▶ BaseASR queue ─▶ render loop: LipASR.run_step (device mel)
    ─▶ feat_queue ─▶ inference thread: batch-16 jit Wav2Lip step (TPU)
    ─▶ res_frame_queue ─▶ assembly thread: bbox paste ─▶ output tracks

Silence frames bypass the device entirely (reference: lipreal.py:102-105).
"""
from __future__ import annotations

import asyncio
import copy
import queue
import time
from queue import Queue
from threading import Event, Thread

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.avatar import LipAvatar, load_lip_avatar
from mere_fusion_tpu.engines.base import BaseReal, track_put
from mere_fusion_tpu.engines.base_asr import BaseASR
from mere_fusion_tpu.models.wav2lip import Wav2Lip
from mere_fusion_tpu.ops import WAV2LIP_MEL, melspectrogram
from mere_fusion_tpu.ops.mel import num_mel_frames
from mere_fusion_tpu.runtime.metrics import metrics
from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage


def mel_window_starts(
    n_chunks: int, chunk: int, batch: int, fps: int, stride_left: int
) -> list[int]:
    """Static mel-window start columns for one featurization step.

    Reproduces the reference's slicing (lipasr.py:23-36): windows of 16 mel
    columns at 80 Hz, stepped at 2 audio chunks (one video frame) apiece,
    clamped to the spectrogram tail.
    """
    total = num_mel_frames(n_chunks * chunk, WAV2LIP_MEL)
    left = max(0, int(stride_left * 80 / 50))
    mult = 80.0 * 2 / fps
    starts = []
    for i in range(batch):
        s = int(left + i * mult)
        starts.append(min(s, total - 16))
    return starts


def make_lip_feature_fn(cfg: Config):
    """jit: concat audio [n_samples] → stacked mel windows [batch, 80, 16]."""
    n_chunks = cfg.stride.left + cfg.stride.right + 2 * cfg.avatar.batch_size
    starts = np.asarray(
        mel_window_starts(
            n_chunks, cfg.audio.chunk, cfg.avatar.batch_size, cfg.audio.fps,
            cfg.stride.left,
        ),
        dtype=np.int32,
    )
    idx = starts[:, None] + np.arange(16)[None, :]  # [B, 16] static

    @jax.jit
    def features(audio: jnp.ndarray) -> jnp.ndarray:
        mel = melspectrogram(audio, WAV2LIP_MEL)        # [80, T]
        return jnp.transpose(mel[:, idx], (1, 0, 2))     # [B, 80, 16]

    return features, n_chunks


def make_lip_device_step(variables, img_size: int = 96, dtype=jnp.bfloat16,
                         device=None):
    """jit: (mel windows [B,80,16], face crops u8 [B,S,S,3]) → u8 [B,S,S,3].

    Masking, normalization, UNet and quantization fuse into one dispatch
    (reference does mask/concat on host numpy: lipreal.py:115-119).
    A non-None ``device`` COMMITS the weights there (multi-session placement)
    so dispatch follows them from any thread.
    """
    model = Wav2Lip(dtype=dtype)
    variables = jax.device_put(variables, device)  # runtime input, not a baked constant

    @jax.jit
    def step(variables, mel: jnp.ndarray, faces_u8: jnp.ndarray) -> jnp.ndarray:
        faces = faces_u8.astype(jnp.float32) / 255.0
        masked = faces.at[:, img_size // 2 :].set(0.0)
        x = jnp.concatenate([masked, faces], axis=-1)
        pred = model.apply(variables, mel, x)
        return jnp.clip(pred * 255.0, 0, 255).astype(jnp.uint8)

    return lambda mel, faces: step(variables, mel, faces)


class LipASR(BaseASR):
    """Accumulates 2×batch 20 ms chunks and emits per-frame mel windows
    (reference: lipasr.py:14-37), with the mel computed on device."""

    def __init__(self, cfg: Config, parent=None):
        super().__init__(cfg, parent)
        self._features, self._n_chunks = make_lip_feature_fn(cfg)

    def run_step(self) -> None:
        for _ in range(self.batch_size * 2):
            frame, ftype = self.get_audio_frame()
            self.frames.append(frame)
            self.output_queue.put((frame, ftype, self.consumed_seq))
        if len(self.frames) <= self.stride_left_size + self.stride_right_size:
            return
        t0 = time.perf_counter()
        audio = np.concatenate(self.frames).astype(np.float32)
        feats = np.asarray(self._features(jnp.asarray(audio)))
        metrics.latency("lip.featurize").observe(time.perf_counter() - t0)
        self.feat_queue.put(feats)
        self.frames = self.frames[-(self.stride_left_size + self.stride_right_size):]


class LipReal(BaseReal):
    def __init__(
        self,
        cfg: Config,
        variables=None,
        avatar: LipAvatar | None = None,
        custom_opts: list[dict] | None = None,
        device=None,
    ):
        super().__init__(cfg, custom_opts, device=device)
        self.batch_size = cfg.avatar.batch_size
        self.img_size = cfg.avatar.img_size
        self.idx = 0
        self.res_frame_queue: Queue = Queue(self.batch_size * 2)

        if avatar is None:
            import os

            avatar = load_lip_avatar(
                os.path.join(cfg.avatar.avatar_dir, cfg.avatar.avatar_id),
                self.img_size,
            )
        self.avatar = avatar

        with self.device_scope():
            # face crops on device once: the per-batch [16, 96, 96, 3] u8
            # upload (~442 KB — tens of ms through the remote tunnel)
            # becomes a 64-byte index vector + an on-device gather
            self._faces_dev = jax.device_put(
                jnp.asarray(np.stack(avatar.face_cycle)), self.device)
            if variables is None:  # weightless mode: random params, silence path still exact
                model = Wav2Lip()
                variables = jax.jit(model.init)(
                    jax.random.key(0),
                    jnp.zeros((1, 80, 16)),
                    jnp.zeros((1, self.img_size, self.img_size, 6)),
                )
            dtype = jnp.bfloat16 if cfg.avatar.dtype == "bfloat16" else jnp.float32
            self._device_step = make_lip_device_step(
                variables, self.img_size, dtype, device=self.device
            )
            # warm the speech-path jit so the first utterance doesn't stall the
            # live pipeline behind a compile. np.asarray BLOCKS on the result:
            # on remote-plugin backends (axon) an un-synced dispatch can defer
            # the actual compile to the first real batch, which puts minutes of
            # remote-compiler latency on the first utterance instead of init
            np.asarray(self._device_step(
                jnp.zeros((self.batch_size, 80, 16)),
                jnp.zeros((self.batch_size, self.img_size, self.img_size, 3),
                          jnp.uint8),
            ))

            self.asr = LipASR(cfg, self)
        self.asr.warm_up()
        self.render_event = Event()

    @classmethod
    def from_checkpoint(cls, cfg: Config, ckpt_path: str, **kw) -> "LipReal":
        from mere_fusion_tpu.utils.torch_convert import (
            convert_wav2lip,
            load_torch_checkpoint,
        )

        variables = convert_wav2lip(load_torch_checkpoint(ckpt_path))
        return cls(cfg, variables=variables, **kw)

    # ---- device inference stage --------------------------------------------
    def _inference_loop(self, quit_event) -> None:
        with self.device_scope():
            self._inference_loop_impl(quit_event)

    def _inference_loop_impl(self, quit_event) -> None:
        length = len(self.avatar)
        index = 0
        # one-deep generated-batch pipeline (engines/muse.py has the same
        # structure and rationale): the 442 KB mouth-crop readback overlaps
        # the next batch's dispatch instead of serializing after it; the
        # pending batch is flushed before any later batch so ordering is
        # FIFO, and immediately on stream pause
        pending = None  # (pred_dev, t0, [(idx, audio_pair) per frame])

        def flush():
            nonlocal pending
            if pending is None:
                return
            pred_dev, t0, metas = pending
            pending = None
            pred = np.asarray(pred_dev)
            metrics.latency("lip.infer_batch").observe(
                time.perf_counter() - t0)
            metrics.rate("lip.infer_fps").tick(self.batch_size)
            for i, (idx, pair) in enumerate(metas):
                self.res_frame_queue.put((pred[i], idx, pair))

        while not quit_event.is_set():
            if not self.render_event.is_set():
                flush()
                time.sleep(0.1)
                continue
            try:
                mel_batch = self.asr.get_next_feat(timeout=0.02 if pending
                                                   else 1)
            except queue.Empty:
                flush()
                continue
            audio_frames = [self.asr.get_audio_out() for _ in range(self.batch_size * 2)]
            is_all_silence = all(f[1] != 0 for f in audio_frames)

            if is_all_silence:
                flush()
                for i in range(self.batch_size):
                    self.res_frame_queue.put(
                        (None, self.mirror_index(length, index),
                         audio_frames[i * 2 : i * 2 + 2])
                    )
                    index += 1
            else:
                t0 = time.perf_counter()
                idxs = np.asarray([self.mirror_index(length, index + i)
                                   for i in range(self.batch_size)])
                # face crops live on device (uploaded once at init); per
                # batch only the mel window + 16 indices go up the wire
                faces = self._faces_dev[jnp.asarray(idxs)]
                pred_dev = self._device_step(jnp.asarray(mel_batch), faces)
                try:
                    pred_dev.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                flush()
                metas = []
                for i in range(self.batch_size):
                    metas.append((int(idxs[i]),
                                  audio_frames[i * 2 : i * 2 + 2]))
                    index += 1
                pending = (pred_dev, t0, metas)
                if self.asr.feat_queue.empty():
                    # nothing queued behind this batch: deliver it now
                    # instead of paying the next poll's 20 ms (the
                    # audio-to-first-frame case is exactly this)
                    flush()
        flush()

    # ---- frame assembly stage ----------------------------------------------
    def process_frames(self, quit_event, loop=None, audio_track=None, video_track=None):
        while not quit_event.is_set():
            try:
                res_frame, idx, audio_frames = self.res_frame_queue.get(
                    block=True, timeout=1
                )
            except queue.Empty:
                continue
            if audio_frames[0][1] != 0 and audio_frames[1][1] != 0:
                if self.asr.is_stale_silence(audio_frames):
                    # speech is queued behind this pre-buffered idle frame:
                    # drop it (video + silent audio) so speech ships sooner
                    continue
                # silence: emit the idle/custom full frame untouched
                audiotype = audio_frames[0][1]
                if self.custom_index.get(audiotype) is not None:
                    mirindex = self.mirror_index(
                        len(self.custom_img_cycle[audiotype]),
                        self.custom_index[audiotype],
                    )
                    combine_frame = self.custom_img_cycle[audiotype][mirindex]
                    self.custom_index[audiotype] += 1
                else:
                    combine_frame = self.avatar.frame_cycle[idx]
            else:
                if self.asr.speech_start_ts is not None:
                    metrics.latency("lip.first_frame").observe(
                        time.monotonic() - self.asr.speech_start_ts
                    )
                    self.asr.speech_start_ts = None
                y1, y2, x1, x2 = self.avatar.coords[idx]
                combine_frame = copy.deepcopy(self.avatar.frame_cycle[idx])
                try:
                    res_frame = cv2.resize(
                        res_frame.astype(np.uint8), (x2 - x1, y2 - y1)
                    )
                except Exception:
                    continue
                combine_frame[y1:y2, x1:x2] = res_frame

            video_frame = VideoImage(image=combine_frame)
            track_put(loop, video_track, video_frame)
            self.record_video_frame(video_frame)

            for frame, _ftype, _seq in audio_frames:
                chunk = AudioChunk.from_float(frame, self.sample_rate)
                track_put(loop, audio_track, chunk)
                self.record_audio_chunk(chunk)

    # ---- render loop ---------------------------------------------------------
    def render(self, quit_event, loop=None, audio_track=None, video_track=None):
        self.tts.render(quit_event)
        self.init_customindex()
        Thread(
            target=self.process_frames,
            args=(quit_event, loop, audio_track, video_track),
            daemon=True,
        ).start()
        Thread(target=self._inference_loop, args=(quit_event,), daemon=True).start()
        self.render_event.set()
        with self.device_scope():  # asr.run_step dispatches the mel jit
            while not quit_event.is_set():
                self.asr.run_step()
                if video_track is not None and video_track._queue.qsize() >= self.cfg.avatar.max_track_queue:
                    time.sleep(0.04 * video_track._queue.qsize() * 0.8)
        self.render_event.clear()
