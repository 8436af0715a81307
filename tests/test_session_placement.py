"""Multi-session device placement: sessions land on distinct chips and their
jitted steps actually run there.

The reference scales out one engine per GPU process capped by MAX_SESSIONS
(reference: app.py:42-97, 705); the TPU-native analog packs sessions across
the host's chips — SessionManager acquires a device from DevicePlacer, the
engine commits its weights there, and every engine thread dispatches under
that device's scope. Runs on the 8-device virtual CPU mesh (conftest).

Placement bookkeeping (rebalance, error paths) is tested with the model-free
FakeEngine; one test builds real LipReal engines to prove committed weights
pin dispatch from unscoped threads.
"""
import asyncio

import jax
import jax.numpy as jnp
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.avatar import synthesize_avatar
from mere_fusion_tpu.engines.lip import LipReal
from mere_fusion_tpu.server.sessions import SessionManager
from tests.fakes import FakeEngine


def _cfg(**extra):
    over = {
        "avatar.batch_size": 2,
        "tts.backend": "procedural",
        "avatar.dtype": "float32",
        "transport.mode": "loopback",
        "server.max_sessions": 16,
    }
    over.update(extra)
    return Config().override(**over)


def test_real_engines_commit_to_distinct_devices(tmp_path):
    avatar = synthesize_avatar(str(tmp_path), n_frames=4)

    def factory(cfg, device=None):
        return LipReal(cfg, avatar=avatar, device=device)

    mgr = SessionManager(_cfg(), factory)

    async def main():
        sessions = [await mgr.start_session() for _ in range(2)]
        try:
            devices = [s.device for s in sessions]
            assert len(set(devices)) == 2, "least-loaded placement must spread"
            assert set(devices) <= set(jax.devices())
            for s in sessions:
                assert s.model.device is s.device
                eng = s.model
                # dispatch from THIS thread, which has no device scope: the
                # committed weights must pin the computation to the assigned
                # device rather than letting it migrate to device 0
                out = eng._device_step(
                    jnp.zeros((eng.batch_size, 80, 16)),
                    jnp.zeros(
                        (eng.batch_size, eng.img_size, eng.img_size, 3),
                        jnp.uint8,
                    ),
                )
                assert out.devices() == {s.device}
        finally:
            await mgr.close_all()
        assert all(v == 0 for v in mgr.placer.counts().values()), \
            "stop_session must release placement slots"

    asyncio.run(main())


def test_released_slot_is_rebalanced():
    # cfg-only factory (no device kwarg): the manager must still record the
    # placement on the session and keep the books balanced
    mgr = SessionManager(_cfg(), lambda c: FakeEngine(c))

    async def main():
        first = await mgr.start_session()
        second = await mgr.start_session()
        assert first.device != second.device
        await mgr.stop_session(first.session_id)
        third = await mgr.start_session()
        # the freed device has count 0 again; least-loaded must avoid
        # stacking on the still-busy one
        assert third.device != second.device
        await mgr.close_all()
        assert all(v == 0 for v in mgr.placer.counts().values())

    asyncio.run(main())


def test_failed_engine_build_releases_slot():
    calls = {"n": 0}

    def flaky(cfg, device=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return FakeEngine(cfg)

    mgr = SessionManager(_cfg(), flaky)

    async def main():
        with pytest.raises(RuntimeError, match="boom"):
            await mgr.start_session()
        assert all(v == 0 for v in mgr.placer.counts().values())
        assert not mgr._starting
        session = await mgr.start_session()  # slot was not leaked
        assert session.device is not None
        await mgr.close_all()

    asyncio.run(main())


def test_concurrent_joins_spread_and_respect_cap():
    # builds run off-loop in the executor; concurrent joins must not deadlock
    # the lock, must spread, and must honor the global max_sessions
    mgr = SessionManager(_cfg(**{"server.max_sessions": 4}),
                         lambda c: FakeEngine(c))

    async def main():
        results = await asyncio.gather(
            *[mgr.start_session() for _ in range(6)], return_exceptions=True
        )
        ok = [r for r in results if not isinstance(r, BaseException)]
        errs = [r for r in results if isinstance(r, BaseException)]
        assert len(ok) == 4 and len(errs) == 2
        assert all("max sessions" in str(e) for e in errs)
        assert len({s.device for s in ok}) == 4
        await mgr.close_all()
        assert all(v == 0 for v in mgr.placer.counts().values())

    asyncio.run(main())
