"""Four concurrent live sessions through the full server stack: placement
across chips, off-loop engine builds, speech through TTS→ASR→device
step→assembly, loopback pacing. CPU-mesh twin of the measured on-chip
"4 concurrent sessions" row (README), reference capacity target
app.py:42-49."""
import asyncio

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.avatar import synthesize_avatar
from mere_fusion_tpu.engines.lip import LipReal
from mere_fusion_tpu.server.sessions import SessionManager


def test_four_concurrent_sessions_stream_speech(tmp_path):
    avatar = synthesize_avatar(str(tmp_path), n_frames=4)
    cfg = Config().override(**{
        "avatar.batch_size": 2,
        "tts.backend": "procedural",
        "avatar.dtype": "float32",
        "transport.mode": "loopback",
        "server.max_sessions": 8,
    })

    def factory(c, device=None):
        return LipReal(c, avatar=avatar, device=device)

    mgr = SessionManager(cfg, factory)

    async def main():
        sessions = await asyncio.gather(*[mgr.start_session()
                                          for _ in range(4)])
        assert len({s.device for s in sessions}) == 4, "sessions must spread"
        for i, s in enumerate(sessions):
            s.model.put_msg_txt(f"hello from session {i}")
        # loopback consumers drain paced tracks; a few seconds covers the
        # TTS synth + batch pipeline depth for every session
        for _ in range(120):
            await asyncio.sleep(0.25)
            if all(s.model.latest_frame is not None for s in sessions):
                break
        for i, s in enumerate(sessions):
            assert s.model.latest_frame is not None, f"session {i} emitted no frames"
        counts = mgr.placer.counts()
        assert sorted(counts.values(), reverse=True)[:4] == [1, 1, 1, 1]
        await mgr.close_all()
        assert all(v == 0 for v in mgr.placer.counts().values())

    asyncio.run(main())
