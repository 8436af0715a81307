import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.models.syncnet import SyncNet, cosine_sync_loss
from mere_fusion_tpu.transport.line_packet import (
    PACKET_SIZE,
    receive_lines,
    receive_one_line,
    send_one_line,
)


def test_syncnet_embeddings():
    model = SyncNet()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 16)).astype(np.float32))
    faces = jnp.asarray(rng.uniform(0, 1, (2, 48, 96, 15)).astype(np.float32))
    variables = model.init(jax.random.key(0), mel, faces)
    a, f = model.apply(variables, mel, faces)
    assert a.shape == (2, 512) and f.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)
    loss = cosine_sync_loss(a, f, jnp.ones((2,)))
    assert np.isfinite(float(loss))


def test_line_packet_roundtrip():
    server, client = socket.socketpair()
    results = []

    def reader():
        results.append(receive_one_line(server))
        results.append(receive_lines(server))

    t = threading.Thread(target=reader)
    t.start()
    send_one_line(client, "hello transcription")
    send_one_line(client, "line a\0line b")
    t.join(timeout=5)
    assert results[0] == "hello transcription\n"
    # reference parity: send_one_line transmits only the first line
    assert results[1] == ["line a"]
    server.close()
    client.close()


def test_rtmp_streamer_pipes_video_and_audio(tmp_path):
    """RtmpStreamer drives one ffmpeg process: raw BGR frames on stdin,
    PCM16 through the audio fifo. A recorder script stands in for ffmpeg
    (the binary is absent in CI) and captures both byte streams."""
    import os
    import stat
    import time

    from mere_fusion_tpu.transport.rtmp import RtmpStreamer

    vid_out = tmp_path / "video.bin"
    aud_out = tmp_path / "audio.bin"
    fake = tmp_path / "fake_ffmpeg.py"
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, threading\n"
        "args = sys.argv[1:]\n"
        "fifo = args[args.index('s16le') + 6]\n"  # '-f s16le -ar R -ac 1 -i FIFO'
        "def drain_fifo():\n"
        f"    open({str(aud_out)!r}, 'wb').write(open(fifo, 'rb').read())\n"
        "t = threading.Thread(target=drain_fifo); t.start()\n"
        f"open({str(vid_out)!r}, 'wb').write(sys.stdin.buffer.read())\n"
        "t.join()\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    h, w = 4, 6
    s = RtmpStreamer("rtmp://example/live", width=w, height=h, fps=25,
                     ffmpeg_path=str(fake))
    frame = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    pcm = np.linspace(-1, 1, 320).astype(np.float32)
    s.stream_frame(frame)
    s.stream_frame_audio(pcm)
    s.close()

    assert vid_out.read_bytes() == frame.tobytes()
    got = np.frombuffer(aud_out.read_bytes(), np.int16)
    np.testing.assert_array_equal(got, (pcm * 32767).astype(np.int16))
