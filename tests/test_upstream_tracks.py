"""attach_upstream_track reader tasks: incoming frames reach the upstream
processors off the event loop (transcription/perception must not stall
track pacing) and strictly in order."""
import asyncio
import threading
from types import SimpleNamespace

import numpy as np

from mere_fusion_tpu.server.upstream import attach_upstream_track


class _FakeAudioFrame:
    sample_rate = 16000

    def __init__(self, value):
        self._v = value

    def to_ndarray(self, **kw):
        return np.full((1, 320), self._v, np.int16)


class _FakeTrack:
    kind = "audio"

    def __init__(self, n):
        self._values = list(range(1, n + 1))

    async def recv(self):
        if not self._values:
            raise ConnectionError("track ended")
        await asyncio.sleep(0)
        return _FakeAudioFrame(self._values.pop(0))


def test_audio_reader_processes_off_loop_in_order():
    seen, threads = [], []

    class Upstream:
        def process_pcm(self, pcm):
            seen.append(int(round(pcm[0] * 32768.0)))
            threads.append(threading.get_ident())

    session = SimpleNamespace(
        ensure_upstream=lambda: None,
        speech_upstream=Upstream(),
        video_upstream=None,
    )

    async def main():
        loop_thread = threading.get_ident()
        attach_upstream_track(session, _FakeTrack(5))
        for _ in range(200):
            if len(seen) == 5:
                break
            await asyncio.sleep(0.02)
        assert seen == [1, 2, 3, 4, 5], "chunks must arrive in order"
        assert all(t != loop_thread for t in threads), \
            "processing must run off the event loop"

    asyncio.run(main())
