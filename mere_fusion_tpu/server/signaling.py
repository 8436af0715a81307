"""SRS WHIP-style HTTP signaling, decoupled from aiortc.

The reference negotiates both peer connections against the SRS HTTP API and
tears sessions down from the connection-state watcher
(reference: app.py:282-291, 406-478, 434-512). aiortc is absent in this
environment, so the protocol logic lives here behind narrow interfaces —
``pc`` is anything with createOffer/setLocalDescription/setRemoteDescription,
and the HTTP POST + answer construction are injectable — making the
offer/answer state machine, retry/backoff, timeout, and teardown paths unit
testable with fakes while production passes real aiortc objects.
"""
from __future__ import annotations

import asyncio
import logging
from typing import Any, Awaitable, Callable, Optional

logger = logging.getLogger(__name__)

PostJson = Callable[[str, dict, float], Awaitable[dict]]


async def default_post_json(url: str, payload: dict, timeout: float) -> dict:
    import aiohttp

    async with aiohttp.ClientSession() as http:
        async with http.post(
            url, json=payload, timeout=aiohttp.ClientTimeout(total=timeout)
        ) as resp:
            return await resp.json()


def default_make_answer(sdp: str):
    from aiortc import RTCSessionDescription

    return RTCSessionDescription(sdp=sdp, type="answer")


class SrsError(ValueError):
    """SRS API returned an error body (code != 0) or a malformed answer."""


async def negotiate(
    pc,
    api_url: str,
    stream_url: str,
    post_json: Optional[PostJson] = None,
    make_answer: Optional[Callable[[str], Any]] = None,
    retries: int = 3,
    timeout: float = 15.0,
    sleep: Callable[[float], Awaitable[None]] = asyncio.sleep,
    action: Optional[str] = None,
) -> None:
    """Create a local offer, POST it to the SRS HTTP API, apply the answer.

    Request body matches the reference exactly (app.py:437-445, 496-504:
    api/streamurl/clientip/sdp/tid/action); the response handling mirrors
    app.py:452-461: a truthy non-zero ``code`` is an SRS-level failure, a
    missing/invalid ``sdp`` is a malformed answer, and any failure inside
    the POST+answer exchange retries with exponential backoff (1 s, 2 s,
    ..., app.py:282-291); each POST is bounded by ``timeout`` seconds.
    Raises ConnectionError after the final attempt, carrying the last
    failure.
    """
    import secrets

    post_json = post_json or default_post_json
    make_answer = make_answer or default_make_answer
    offer = await pc.createOffer()
    await pc.setLocalDescription(offer)
    last: Optional[Exception] = None
    for attempt in range(retries):
        try:
            data = await post_json(
                api_url,
                {
                    "api": api_url,
                    "streamurl": stream_url,
                    "clientip": None,
                    "sdp": pc.localDescription.sdp,
                    "tid": str(10000 + secrets.randbelow(90000)),
                    "action": action or "",
                },
                timeout,
            )
            if not isinstance(data, dict):
                raise SrsError(f"SRS answer is not a JSON object: "
                               f"{type(data).__name__}")
            code = data.get("code")
            if code and code != 0:      # reference truthiness check
                raise SrsError(f"SRS rejected the offer: code={code!r} "
                               f"msg={data.get('msg') or data.get('message')!r}")
            sdp = data.get("sdp")
            if not isinstance(sdp, str) or not sdp:
                raise SrsError(f"SRS answer missing sdp (code={code!r})")
            await pc.setRemoteDescription(make_answer(sdp))
            return
        except Exception as e:
            last = e
            if attempt + 1 < retries:
                await sleep(2**attempt)
    raise ConnectionError(f"SRS signaling failed after {retries} attempts: "
                          f"{last}")


async def wait_connected(pc, timeout: float = 15.0) -> None:
    """Block until ``pc.connectionState`` reaches "connected".

    Reference app.py:471-478: the produce negotiation only starts once the
    consume pc is actually connected, with a 15 s wait_for that tears the
    session down on timeout. aiortc contract (docs/aiortc_contract.md §C7):
    connectionState moves new → connecting → connected asynchronously after
    the answer is applied, signalled via "connectionstatechange"; a pc may
    also already BE connected when this is called (the event will not
    re-fire), so the current state must be checked both before registering
    the listener and inside it. "failed"/"closed" while waiting is terminal.
    """
    loop = asyncio.get_event_loop()
    fut: asyncio.Future = loop.create_future()

    def check() -> None:
        if fut.done():
            return
        state = pc.connectionState
        if state == "connected":
            fut.set_result(None)
        elif state in ("failed", "closed"):
            fut.set_exception(
                ConnectionError(f"pc became {state} while waiting to connect")
            )

    @pc.on("connectionstatechange")
    async def _on_state() -> None:
        check()

    check()  # already connected (or already dead) before we listened
    try:
        await asyncio.wait_for(fut, timeout)
    except asyncio.TimeoutError:
        raise ConnectionError(
            f"pc not connected within {timeout}s (state="
            f"{pc.connectionState!r})"
        ) from None


def attach_state_watcher(
    pc, on_dead: Callable[[str], Any], label: str = "pc"
) -> None:
    """Tear the session down when the connection dies (reference
    app.py:406-478: on 'failed'/'closed' the pc is closed and the session
    discarded). 'disconnected' is NOT terminal — ICE routinely recovers from
    it within seconds after a network blip, and because ``on_dead`` latches,
    firing on it would both kill a recoverable call and leave the watcher
    blind to the real terminal state. ``on_dead`` fires at most once; it may
    be sync or async."""
    fired = {"done": False}

    @pc.on("connectionstatechange")
    async def _on_state() -> None:
        state = pc.connectionState
        if state in ("failed", "closed") and not fired["done"]:
            fired["done"] = True
            logger.warning("%s connection %s — tearing down", label, state)
            result = on_dead(state)
            if asyncio.iscoroutine(result):
                await result
