"""Static-shape ring buffers for streaming features on device.

The reference keeps a circular on-GPU feature ring with front/tail pointers
(reference: nerfasr.py:50-103) and sliding stride windows (baseasr.py:23-26).
On TPU everything under jit must be static-shape, so the ring is a pytree of
a fixed-capacity array plus a monotonic write counter; reads/writes use
modular index arithmetic compiled to gathers/scatters.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RingBuffer:
    """Fixed-capacity ring. ``head`` counts total items ever pushed."""

    data: jax.Array   # [capacity, *item_shape]
    head: jax.Array   # scalar int32, monotonic

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


def ring_new(capacity: int, item_shape: tuple, dtype=jnp.float32) -> RingBuffer:
    return RingBuffer(
        data=jnp.zeros((capacity, *item_shape), dtype=dtype),
        head=jnp.zeros((), dtype=jnp.int32),
    )


def ring_push(rb: RingBuffer, items: jax.Array) -> RingBuffer:
    """Append ``items`` ([k, *item_shape], k static) with wraparound."""
    k = items.shape[0]
    idx = (rb.head + jnp.arange(k, dtype=jnp.int32)) % rb.capacity
    return RingBuffer(data=rb.data.at[idx].set(items), head=rb.head + k)


def ring_window(rb: RingBuffer, start: jax.Array, size: int) -> jax.Array:
    """Read ``size`` items starting at logical position ``start``.

    ``start`` is a logical index in [head - capacity, head); ``size`` static.
    """
    idx = (start + jnp.arange(size, dtype=jnp.int32)) % rb.capacity
    return rb.data[idx]


def ring_last(rb: RingBuffer, size: int) -> jax.Array:
    """Read the most recent ``size`` items (oldest first)."""
    return ring_window(rb, rb.head - size, size)


class HostRingBuffer:
    """Host-side numpy twin of RingBuffer for the Python feeding threads."""

    def __init__(self, capacity: int, item_shape: tuple, dtype=np.float32):
        self.data = np.zeros((capacity, *item_shape), dtype=dtype)
        self.head = 0
        self.capacity = capacity

    def push(self, items: np.ndarray) -> None:
        k = len(items)
        idx = (self.head + np.arange(k)) % self.capacity
        self.data[idx] = items
        self.head += k

    def window(self, start: int, size: int) -> np.ndarray:
        idx = (start + np.arange(size)) % self.capacity
        return self.data[idx]

    def last(self, size: int) -> np.ndarray:
        return self.window(self.head - size, size)

    def __len__(self) -> int:
        return min(self.head, self.capacity)
