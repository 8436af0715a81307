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
