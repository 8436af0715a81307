import socket
import threading

import numpy as np
import pytest

from mere_fusion_tpu.asr import FakeBackend, StreamingTranscriber
from mere_fusion_tpu.asr.server import handle_connection
from mere_fusion_tpu.parallel.placement import DevicePlacer
from mere_fusion_tpu.transport.line_packet import receive_one_line


def test_device_placer_round_robin():
    placer = DevicePlacer(max_sessions_per_device=2)
    n = len(placer.devices)
    sids = [f"s{i}" for i in range(min(2 * n, 4))]
    for sid in sids:
        placer.acquire(sid)
    counts = {}
    for sid in sids:
        d = placer.device_of(sid)
        counts[d] = counts.get(d, 0) + 1
    assert max(counts.values()) - min(counts.values()) <= 1
    placer.release(sids[0])
    assert placer.device_of(sids[0]) is None


def test_placer_capacity():
    placer = DevicePlacer(devices=[object()], max_sessions_per_device=1)
    placer.acquire("a")
    with pytest.raises(RuntimeError):
        placer.acquire("b")


def test_asr_socket_server_roundtrip():
    script = [(0.2 + 0.3 * i, 0.45 + 0.3 * i, f"w{i}") for i in range(6)]
    backend = FakeBackend(script, jitter_last=False)
    transcriber = StreamingTranscriber(backend)

    server, client = socket.socketpair()

    def run():
        handle_connection(server, transcriber, min_chunk_seconds=0.5)
        server.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    pcm = np.zeros(16000 * 2, np.int16)  # 2 s of audio
    for i in range(0, len(pcm), 8000):
        client.sendall(pcm[i : i + 8000].tobytes())
    client.shutdown(socket.SHUT_WR)
    lines = []
    while True:
        line = receive_one_line(client)
        if line is None:
            break
        lines.append(line)
    t.join(timeout=5)
    client.close()
    text = " ".join(lines)
    assert "w0" in text, f"expected committed words in {lines!r}"
    parts = lines[0].split()
    assert parts[0].isdigit() and parts[1].isdigit()
