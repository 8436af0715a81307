"""Multi-session device placement.

The reference scales out by running one engine per GPU process
(app.py session cap); the TPU-native analog is packing sessions across
chips of one host: each session's model variables live on an assigned
device and its jitted steps run there. Round-robin with a session count
per device cap.
"""
from __future__ import annotations

import threading
from typing import Optional

import jax


class DevicePlacer:
    def __init__(self, devices=None, max_sessions_per_device: int = 4):
        self.devices = list(devices if devices is not None else jax.devices())
        self.max_per_device = max_sessions_per_device
        self._counts = {d: 0 for d in self.devices}
        self._assignments: dict[str, jax.Device] = {}
        self._lock = threading.Lock()

    def acquire(self, session_id: str) -> jax.Device:
        with self._lock:
            device = min(self.devices, key=lambda d: self._counts[d])
            if self._counts[device] >= self.max_per_device:
                raise RuntimeError("all devices at session capacity")
            self._counts[device] += 1
            self._assignments[session_id] = device
            return device

    def release(self, session_id: str) -> None:
        with self._lock:
            device = self._assignments.pop(session_id, None)
            if device is not None:
                self._counts[device] -= 1

    def device_of(self, session_id: str) -> Optional[jax.Device]:
        return self._assignments.get(session_id)

    def counts(self) -> dict:
        """Snapshot of sessions per device (observability)."""
        with self._lock:
            return dict(self._counts)

    def place(self, session_id: str, variables):
        """Move a variable tree to the session's device."""
        device = self._assignments[session_id]
        return jax.device_put(variables, device)

    @property
    def total_capacity(self) -> int:
        return len(self.devices) * self.max_per_device
