"""Shared engine state and services.

Behavioral twin of the reference's BaseReal (basereal.py:32-154): 16 kHz /
20 ms audio clocking, TTS construction, custom idle audio/video cycles keyed
by audiotype, ping-pong ``mirror_index`` looping, and session recording.
Recording muxes with PyAV when available, else falls back to cv2 video +
wave audio with an optional ffmpeg merge.
"""
from __future__ import annotations

import glob
import os
import queue
import subprocess
import wave
from queue import Queue
from threading import Thread

import cv2
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage
from mere_fusion_tpu.tts import make_tts


def track_put(loop, track, item) -> bool:
    """Schedule ``track._queue.put(item)`` on the session event loop from an
    engine thread (the reference's thread→asyncio seam, lipreal.py:217-227).

    Assembly threads outlive the loop by up to one queue-poll timeout after
    quit_event fires; scheduling onto a closing/closed loop raises
    RuntimeError in the thread (and pytest's thread-exception gate promotes
    that to a failure). Returns False when the frame was dropped because the
    session is shutting down."""
    import asyncio

    if loop is None or track is None:
        return False
    coro = track._queue.put(item)
    try:
        if loop.is_closed():
            raise RuntimeError("loop closed")
        asyncio.run_coroutine_threadsafe(coro, loop)
        return True
    except RuntimeError:
        coro.close()   # un-awaited coroutine would warn at GC
        return False


def read_imgs(img_list):
    return [cv2.imread(p) for p in img_list]


def _sorted_imgs(dirpath: str) -> list[str]:
    paths = glob.glob(os.path.join(dirpath, "*.[jpJP][pnPN]*[gG]"))
    return sorted(paths, key=lambda x: int(os.path.splitext(os.path.basename(x))[0]))


def _read_wav_f32(path: str) -> np.ndarray:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32767
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483647
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data[:, 0]
    if sr != 16000:
        from mere_fusion_tpu.tts import resample_pcm

        data = resample_pcm(data, sr, 16000)
    return data


class BaseReal:
    def __init__(self, cfg: Config, custom_opts: list[dict] | None = None,
                 device=None):
        self.cfg = cfg
        self.fps = cfg.audio.fps
        self.sample_rate = cfg.audio.sample_rate
        self.chunk = cfg.audio.chunk
        # multi-session placement: the jax.Device this engine's weights and
        # jitted steps live on (reference scales out one engine per GPU
        # process, app.py:42-97; here sessions pack across the chips of one
        # host). None = process default device (single-chip serving).
        self.device = device
        self.tts = make_tts(cfg, self)

        self.recording = False
        self.latest_frame = None         # most recent VideoImage (preview tap)
        self.recordq_video: Queue = Queue()
        self.recordq_audio: Queue = Queue()
        self._record_path: str | None = None

        self.curr_state = 0  # 0 speech/silence-idle, >=2 custom track id
        self.custom_img_cycle: dict[int, list] = {}
        self.custom_audio_cycle: dict[int, np.ndarray] = {}
        self.custom_audio_index: dict[int, int] = {}
        self.custom_index: dict[int, int] = {}
        self.custom_opt: dict[int, dict] = {}
        self._load_custom(custom_opts or [])

    def device_scope(self):
        """Context manager pinning the calling thread's JAX dispatch to this
        session's assigned device. Every engine thread that dispatches device
        work (render loop, inference loop, construction) must run under it so
        uncommitted arrays and weightless jit calls stay on the placed chip
        instead of migrating to device 0. No-op when unplaced."""
        if self.device is None:
            import contextlib

            return contextlib.nullcontext()
        import jax

        return jax.default_device(self.device)

    # ---- engine public API (reference parity) ------------------------------
    def first_video_frame_shape(self) -> tuple[int, int]:
        """(H, W) of the frames this engine emits — fixed-format transports
        (RTMP/recording) size their pipelines from it before frames flow."""
        if getattr(self, "avatar", None) is not None:
            return self.avatar.frame_cycle[0].shape[:2]
        if getattr(self, "fullbody_frames", None):
            return self.fullbody_frames[0].shape[:2]
        if getattr(self, "dataset", None) is not None:
            return (self.dataset.H, self.dataset.W)
        raise RuntimeError("engine has no frame source yet")

    def put_msg_txt(self, msg: str) -> None:
        self.tts.put_msg_txt(msg)

    def put_audio_frame(self, audio_chunk: np.ndarray) -> None:
        self.asr.put_audio_frame(audio_chunk)

    def pause_talk(self) -> None:
        self.tts.pause_talk()
        self.asr.pause_talk()

    def set_curr_state(self, audiotype: int, reinit: bool) -> None:
        self.curr_state = audiotype
        if reinit and audiotype in self.custom_audio_index:
            self.custom_audio_index[audiotype] = 0
            self.custom_index[audiotype] = 0

    # ---- custom idle tracks -------------------------------------------------
    def _load_custom(self, custom_opts: list[dict]) -> None:
        for item in custom_opts:
            atype = item["audiotype"]
            self.custom_img_cycle[atype] = read_imgs(_sorted_imgs(item["imgpath"]))
            self.custom_audio_cycle[atype] = _read_wav_f32(item["audiopath"])
            self.custom_audio_index[atype] = 0
            self.custom_index[atype] = 0
            self.custom_opt[atype] = item

    def init_customindex(self) -> None:
        self.curr_state = 0
        for key in self.custom_audio_index:
            self.custom_audio_index[key] = 0
        for key in self.custom_index:
            self.custom_index[key] = 0

    def get_audio_stream(self, audiotype: int) -> np.ndarray:
        idx = self.custom_audio_index[audiotype]
        stream = self.custom_audio_cycle[audiotype][idx : idx + self.chunk]
        self.custom_audio_index[audiotype] += self.chunk
        if self.custom_audio_index[audiotype] >= self.custom_audio_cycle[audiotype].shape[0]:
            self.curr_state = 1  # custom track exhausted → back to silence
        if stream.shape[0] < self.chunk:
            stream = np.pad(stream, (0, self.chunk - stream.shape[0]))
        return stream

    def mirror_index(self, size: int, index: int) -> int:
        """Ping-pong looping over a frame cycle (basereal.py:133-139)."""
        turn, res = divmod(index, size)
        return res if turn % 2 == 0 else size - res - 1

    # ---- recording ----------------------------------------------------------
    def start_recording(self, path: str) -> None:
        if self.recording:
            return
        self.recording = True
        self.recordq_video.queue.clear()
        self.recordq_audio.queue.clear()
        self._record_path = path
        Thread(target=self._record_loop, daemon=True).start()

    def stop_recording(self) -> None:
        self.recording = False

    def _record_loop(self) -> None:
        path = self._record_path
        if path.endswith(".flv"):
            # dependency-free single-file mux (Screen Video + PCM16,
            # transport/flv) — the no-PyAV/no-ffmpeg alternative to the
            # reference's H.264+AAC MP4 (basereal.py:77-131)
            self._record_flv(path)
            return
        if path.endswith(".split.mp4"):
            self._record_split(path)
            return
        # default: single-file MP4 (MJPEG + PCM16, transport/mp4) — a
        # parseable .mp4 artifact with zero external deps, mirroring the
        # reference's one-file recording contract (basereal.py:77-131)
        from mere_fusion_tpu.transport.mp4 import MP4Writer

        writer = None
        with open(path, "wb") as f:
            while self.recording:
                try:
                    frame: VideoImage = self.recordq_video.get(
                        block=True, timeout=1)
                except queue.Empty:
                    continue
                if writer is None:
                    h, w = frame.image.shape[:2]
                    writer = MP4Writer(f, w, h, fps=self.fps,
                                       sample_rate=self.sample_rate)
                writer.write_video(frame.image)
                for _ in range(2):  # two 20 ms audio chunks per video frame
                    try:
                        chunk: AudioChunk = self.recordq_audio.get(
                            block=True, timeout=1)
                        writer.write_audio(chunk.samples)
                    except queue.Empty:
                        break
            if writer is not None:
                writer.close()

    def _record_split(self, path: str) -> None:
        """cv2.VideoWriter MPEG-4 video + wav, ffmpeg-muxed when present —
        better compression than MJPEG when an encoder stack exists."""
        base = path[: -len(".split.mp4")] + ".mp4"
        vid_path, aud_path = base + ".video.mp4", base + ".audio.wav"
        writer = None
        wav = wave.open(aud_path, "wb")
        wav.setnchannels(1)
        wav.setsampwidth(2)
        wav.setframerate(self.sample_rate)
        try:
            while self.recording:
                try:
                    frame: VideoImage = self.recordq_video.get(block=True, timeout=1)
                except queue.Empty:
                    continue
                if writer is None:
                    h, w = frame.image.shape[:2]
                    writer = cv2.VideoWriter(
                        vid_path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
                    )
                writer.write(frame.image)
                for _ in range(2):  # two 20 ms audio chunks per video frame
                    try:
                        chunk: AudioChunk = self.recordq_audio.get(block=True, timeout=1)
                        wav.writeframes(chunk.samples.tobytes())
                    except queue.Empty:
                        break
        finally:
            if writer is not None:
                writer.release()
            wav.close()
            self._mux(vid_path, aud_path, base)

    def _record_flv(self, path: str) -> None:
        from mere_fusion_tpu.transport.flv import FLVWriter

        writer = None
        with open(path, "wb") as f:
            while self.recording:
                try:
                    frame: VideoImage = self.recordq_video.get(
                        block=True, timeout=1)
                except queue.Empty:
                    continue
                if writer is None:
                    h, w = frame.image.shape[:2]
                    writer = FLVWriter(f, w, h, fps=self.fps,
                                       sample_rate=self.sample_rate)
                writer.write_video(frame.image)
                for _ in range(2):  # two 20 ms audio chunks per video frame
                    try:
                        chunk: AudioChunk = self.recordq_audio.get(
                            block=True, timeout=1)
                        writer.write_audio(
                            chunk.samples.astype(np.float32) / 32768.0)
                    except queue.Empty:
                        break
            if writer is not None:
                writer.close()

    @staticmethod
    def _mux(vid_path: str, aud_path: str, out_path: str) -> None:
        """Merge with ffmpeg when present; else keep the split files."""
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", vid_path, "-i", aud_path,
                 "-c:v", "copy", "-c:a", "aac", out_path],
                check=True, timeout=120,
            )
            os.remove(vid_path)
            os.remove(aud_path)
        except (FileNotFoundError, subprocess.SubprocessError):
            pass

    def record_video_frame(self, frame: VideoImage) -> None:
        # single-slot tap for the HTTP MJPEG preview (the TPU stand-in for
        # the reference's dearpygui viewer, ernerf/nerf_triplane/gui.py)
        self.latest_frame = frame
        if self.recording:
            self.recordq_video.put(frame)

    def record_audio_chunk(self, chunk: AudioChunk) -> None:
        if self.recording:
            self.recordq_audio.put(chunk)
