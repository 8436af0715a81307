"""Contract-enforcing fake of aiortc's RTCPeerConnection.

Implements the state machine documented in docs/aiortc_contract.md (C1-C10):
every place the real library would raise, this fake raises too, so session
code that mis-orders aiortc calls fails these tests instead of only failing
in production. Mirrored behaviors cite the contract points.
"""
from __future__ import annotations

import asyncio
from types import SimpleNamespace


class InvalidStateError(Exception):
    """Stands in for aiortc.exceptions.InvalidStateError."""


class InvalidAccessError(Exception):
    """Stands in for aiortc.exceptions.InvalidAccessError."""


class InternalError(Exception):
    """Stands in for aiortc.exceptions.InternalError."""


VALID_DIRECTIONS = ("sendrecv", "sendonly", "recvonly", "inactive")
VALID_SDP_TYPES = ("offer", "pranswer", "answer", "rollback")


class FakeTrack(SimpleNamespace):
    pass


def make_answer(sdp):
    """RTCSessionDescription stand-in (C10: type validated)."""
    return SimpleNamespace(sdp=sdp, type="answer")


class ContractFakePC:
    """RTCPeerConnection fake enforcing the aiortc call-order contract.

    ``connect_after_answer``: mimic ICE — schedule connecting → connected
    transitions (with connectionstatechange events) after the answer is
    applied (C7). Disable to simulate a peer that never connects.
    """

    def __init__(self, connect_after_answer: bool = True):
        self._handlers: dict[str, list] = {}
        self._transceivers: list[tuple[str, str]] = []
        self._senders: list = []
        self._local = None
        self._remote = None
        self.signalingState = "stable"
        self.connectionState = "new"
        self._connect_after_answer = connect_after_answer
        self._pending: list[asyncio.Task] = []

    # ---- events (C5: multi-listener; C6: sync or async handlers) ----------
    def on(self, name, f=None):
        def register(fn):
            self._handlers.setdefault(name, []).append(fn)
            return fn

        return register(f) if f is not None else register

    async def emit(self, name, *args) -> None:
        for fn in list(self._handlers.get(name, ())):
            result = fn(*args)
            if asyncio.iscoroutine(result):
                await result

    # ---- media declaration (C1, C9) ---------------------------------------
    def addTransceiver(self, kind, direction="sendrecv"):
        if self.signalingState == "closed":
            raise InvalidStateError("RTCPeerConnection is closed")
        if direction not in VALID_DIRECTIONS:
            raise ValueError(f"Invalid direction {direction!r}")
        self._transceivers.append((kind, direction))
        return SimpleNamespace(kind=kind, direction=direction)

    def addTrack(self, track):
        if self.signalingState == "closed":
            raise InvalidStateError("RTCPeerConnection is closed")
        if any(t is track for t in self._senders):
            raise InvalidAccessError("Track already has a sender")
        self._senders.append(track)
        return SimpleNamespace(track=track)

    # ---- offer/answer (C1, C2, C3) -----------------------------------------
    async def createOffer(self):
        if self.signalingState == "closed":
            raise InvalidStateError("RTCPeerConnection is closed")
        if not self._transceivers and not self._senders:
            raise InternalError(
                "Cannot create an offer with no media and no data channels"
            )
        # snapshot: media added AFTER this call must not appear (C1)
        media = [f"m={kind}({direction})"
                 for kind, direction in self._transceivers]
        media += [f"m={getattr(t, 'kind', 'track')}(send)"
                  for t in self._senders]
        return SimpleNamespace(sdp="v=0 " + " ".join(media), type="offer")

    async def setLocalDescription(self, desc):
        if self.signalingState == "closed":
            raise InvalidStateError("RTCPeerConnection is closed")
        if desc.type == "offer" and self.signalingState not in (
                "stable", "have-local-offer"):
            raise InvalidStateError(
                f'Cannot handle offer in signaling state "{self.signalingState}"'
            )
        self._local = desc
        self.signalingState = "have-local-offer"

    @property
    def localDescription(self):
        if self._local is None:
            raise AssertionError(
                "localDescription read before setLocalDescription (C3)")
        return self._local

    @property
    def remoteDescription(self):
        return self._remote

    async def setRemoteDescription(self, desc):
        if desc.type not in VALID_SDP_TYPES:
            raise ValueError(f"Invalid SDP type {desc.type!r}")
        if desc.type == "answer" and self.signalingState != "have-local-offer":
            raise InvalidStateError(
                f'Cannot handle answer in signaling state "{self.signalingState}"'
            )
        self._remote = desc
        self.signalingState = "stable"
        # C4: track fires for each recv-capable transceiver DURING this call
        for kind, direction in self._transceivers:
            if direction in ("recvonly", "sendrecv"):
                await self.emit("track", FakeTrack(kind=kind, id=f"{kind}-0"))
        if self._connect_after_answer:
            self._pending.append(
                asyncio.ensure_future(self._ice_connect()))

    async def _ice_connect(self) -> None:
        # C7: connected is reached asynchronously, never inside
        # setRemoteDescription
        for state in ("connecting", "connected"):
            await asyncio.sleep(0)
            if self.connectionState == "closed":
                return
            self.connectionState = state
            await self.emit("connectionstatechange")

    async def close(self):
        # C8: idempotent; fires connectionstatechange once
        if self.signalingState == "closed":
            return
        self.signalingState = "closed"
        self.connectionState = "closed"
        for task in self._pending:
            task.cancel()
        await self.emit("connectionstatechange")

    @property
    def closed(self) -> bool:
        return self.signalingState == "closed"
