"""Shared test fakes."""
from __future__ import annotations

import asyncio
import threading
import time

import numpy as np

from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage


class FakeEngine:
    """Implements the engine public API without any model or device work."""

    def __init__(self, cfg=None):
        self.messages: list[str] = []
        self.paused = 0
        self.curr_state = 0
        self.recording = False
        self.latest_frame = None
        self.rendering = threading.Event()

    def put_msg_txt(self, msg):
        self.messages.append(msg)

    def put_audio_frame(self, chunk):
        pass

    def pause_talk(self):
        self.paused += 1

    def set_curr_state(self, audiotype, reinit):
        self.curr_state = audiotype

    def start_recording(self, path):
        self.recording = True

    def stop_recording(self):
        self.recording = False

    def render(self, quit_event, loop=None, audio_track=None, video_track=None):
        self.rendering.set()
        img = np.zeros((32, 32, 3), np.uint8)
        while not quit_event.is_set():
            if loop is not None and video_track is not None:
                asyncio.run_coroutine_threadsafe(
                    video_track._queue.put(VideoImage(image=img)), loop
                )
                for _ in range(2):
                    asyncio.run_coroutine_threadsafe(
                        audio_track._queue.put(
                            AudioChunk(samples=np.zeros(320, np.int16))
                        ),
                        loop,
                    )
            time.sleep(0.04)
