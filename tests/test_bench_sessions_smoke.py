"""Smoke the bench.py multi-session drive at toy model scale.

bench_sessions runs 4 concurrent MuseTalk sessions on the real chip; its
orchestration (SessionManager admission + placement, counting drains
replacing the loopback discard-drains, feeder pacing matched to the
procedural TTS rate, the one-silent-session a2ff probe) is exactly what
this test executes — only the models are tiny and the windows short, so a
bench bug never burns chip time."""
import jax.numpy as jnp
import pytest

from tests.test_musetalk import SMALL_WHISPER, TINY_UNET, TINY_VAE

from mere_fusion_tpu.audio.features import WhisperFeatureExtractor
from mere_fusion_tpu.engines.muse import MuseModels


@pytest.mark.timeout(600)
def test_bench_sessions_drive_smoke():
    import bench

    models = MuseModels(vae_cfg=TINY_VAE, unet_cfg=TINY_UNET, face_size=64,
                        dtype=jnp.bfloat16, vae_int8="off")
    extractor = WhisperFeatureExtractor(dims=SMALL_WHISPER)
    # batch 2 + short strides so the toy pipeline is real-time on the CPU
    # mesh — phase B's silence probe needs the backlog to drain in seconds
    r = bench.bench_sessions(
        n=2, models=models, extractor=extractor, phase_a_s=8.0, rounds=1,
        extra_cfg={"avatar.batch_size": 2, "stride.left": 4,
                   "stride.right": 4},
        feed_interval_scale=10.0)
    assert {"min_fps", "mean_fps", "a2ff_p50_ms", "a2ff_max_ms",
            "a2ff_samples", "tunnel_mbps", "required_mbps"} <= set(r)
    # sessions must actually deliver frames in phase A
    assert r["min_fps"] > 1.0, r
    # phase B must capture at least one under-load first-frame latency
    assert r["a2ff_samples"] >= 1, r
    assert r["a2ff_p50_ms"] == r["a2ff_p50_ms"]  # not NaN
