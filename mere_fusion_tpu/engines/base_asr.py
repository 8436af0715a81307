"""Audio-frame → feature-queue plumbing shared by all avatar engines.

Behavioral twin of the reference's BaseASR (baseasr.py:9-64): a host queue of
20 ms chunks, silence synthesis when upstream is quiet (type 0 = speech,
1 = silence, >=2 = custom idle track), stride-based warm-up, and a bounded
feature queue to the device inference stage. The reference's mp.Queue
cross-process channel becomes a plain bounded Queue — inference runs
in-process as async device dispatches, so frames are never pickled.
"""
from __future__ import annotations

import queue
from queue import Queue

import numpy as np

from mere_fusion_tpu.config import Config


class BaseASR:
    def __init__(self, cfg: Config, parent=None):
        self.cfg = cfg
        self.parent = parent
        self.fps = cfg.audio.fps
        self.sample_rate = cfg.audio.sample_rate
        self.chunk = cfg.audio.chunk
        self.queue: Queue[np.ndarray] = Queue()
        self.output_queue: Queue = Queue()
        self.batch_size = cfg.avatar.batch_size
        self.frames: list[np.ndarray] = []
        self.stride_left_size = cfg.stride.left
        self.stride_right_size = cfg.stride.right
        self.feat_queue: Queue = Queue(2)
        # set on the first speech chunk after silence; engines clear it when
        # the first generated frame ships (audio-to-first-frame latency)
        self.speech_start_ts = None

    def pause_talk(self) -> None:
        self.queue.queue.clear()

    def put_audio_frame(self, audio_chunk: np.ndarray) -> None:
        import time

        if self.speech_start_ts is None:
            self.speech_start_ts = time.monotonic()
        self.queue.put(audio_chunk)

    def get_audio_frame(self) -> tuple[np.ndarray, int]:
        try:
            frame = self.queue.get(block=True, timeout=0.01)
            ftype = 0
        except queue.Empty:
            if self.parent and self.parent.curr_state > 1:
                frame = self.parent.get_audio_stream(self.parent.curr_state)
                ftype = self.parent.curr_state
            else:
                frame = np.zeros(self.chunk, dtype=np.float32)
                ftype = 1
        return frame, ftype

    def get_audio_out(self):
        return self.output_queue.get()

    def warm_up(self) -> None:
        for _ in range(self.stride_left_size + self.stride_right_size):
            frame, ftype = self.get_audio_frame()
            self.frames.append(frame)
            self.output_queue.put((frame, ftype))
        for _ in range(self.stride_left_size):
            self.output_queue.get()

    def run_step(self) -> None:
        raise NotImplementedError

    def get_next_feat(self, block: bool = True, timeout: float | None = None):
        return self.feat_queue.get(block, timeout)
