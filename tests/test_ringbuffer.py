import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.ops import ring_new, ring_push, ring_window, ring_last
from mere_fusion_tpu.ops.ringbuffer import HostRingBuffer


def test_push_and_last():
    rb = ring_new(8, (2,))
    items = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    rb = ring_push(rb, items)
    out = ring_last(rb, 3)
    np.testing.assert_array_equal(out, items)


def test_wraparound():
    rb = ring_new(4, ())
    for chunk in [jnp.array([0.0, 1.0, 2.0]), jnp.array([3.0, 4.0, 5.0])]:
        rb = ring_push(rb, chunk)
    np.testing.assert_array_equal(ring_last(rb, 4), [2.0, 3.0, 4.0, 5.0])
    assert int(rb.head) == 6


def test_window_logical_indexing():
    rb = ring_new(4, ())
    rb = ring_push(rb, jnp.arange(7, dtype=jnp.float32))
    np.testing.assert_array_equal(ring_window(rb, jnp.int32(4), 3), [4.0, 5.0, 6.0])


def test_jit_and_scan_compatible():
    rb = ring_new(16, (4,))

    @jax.jit
    def step(rb, x):
        rb = ring_push(rb, x)
        return rb, ring_last(rb, 2)

    xs = jnp.ones((5, 1, 4))
    rb, outs = jax.lax.scan(step, rb, xs)
    assert outs.shape == (5, 2, 4)
    assert int(rb.head) == 5


def test_host_ring_matches_device_ring():
    host = HostRingBuffer(8, (3,))
    dev = ring_new(8, (3,))
    rng = np.random.default_rng(1)
    for _ in range(4):
        items = rng.standard_normal((3, 3)).astype(np.float32)
        host.push(items)
        dev = ring_push(dev, jnp.asarray(items))
    np.testing.assert_allclose(host.last(8), np.asarray(ring_last(dev, 8)), rtol=1e-6)
