"""Headline benchmark: all three avatar engines, per chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}

Headline metric stays Wav2Lip generation throughput; "extra" carries the
binding engines — the ER-NeRF 512 px end-to-end frame rate (render + shade +
the 2-ASR-steps-per-frame budget with real DeepSpeech feature compute,
reference nerfreal.py:129-156 loop granularity) and the MuseTalk batch-16
UNet+VAE step (reference musereal.py:91-118).

Baseline: the reference publishes no numbers (BASELINE.md); its hard design
target is sustained 25 fps real-time generation (reference webrtc.py:12).
vs_baseline is therefore frames/sec ÷ 25.

Measurement style per CLAUDE.md: through the axon tunnel only dependency-
chained device timing is trustworthy — each iteration consumes the previous
iteration's output, with a single host readback at the end.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
# sitecustomize pre-imports jax, freezing env-var config — set the
# persistent compile cache through the live config too (CLAUDE.md)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def bench_wav2lip() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.models.wav2lip import Wav2Lip

    batch = 16
    model = Wav2Lip(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((batch, 80, 16)).astype(np.float32))
    faces = jnp.asarray(
        rng.integers(0, 255, (batch, 96, 96, 3)).astype(np.uint8)
    )
    variables = jax.jit(model.init)(
        jax.random.key(0), mel[:1], jnp.zeros((1, 96, 96, 6))
    )

    @jax.jit
    def _step(variables, mel, faces_u8):
        f = faces_u8.astype(jnp.float32) / 255.0
        masked = f.at[:, 48:].set(0.0)
        pred = model.apply(variables, mel, jnp.concatenate([masked, f], -1))
        return jnp.clip(pred * 255.0, 0, 255).astype(jnp.uint8)

    # iterate ON DEVICE: lax.scan chains each step on the previous output
    # (true data dependency — the runtime cannot skip or overlap work) and
    # the whole epoch is ONE dispatch, so the tunnel's per-dispatch overhead
    # (which drifts 0.3-1 ms between runs) cannot pollute the number
    iters = 100

    @jax.jit
    def epoch(variables, mel, faces):
        return jax.lax.scan(
            lambda c, _: (_step(variables, mel, c), None),
            faces, None, length=iters)[0]

    np.asarray(epoch(variables, mel, faces))  # compile + full sync
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(epoch(variables, mel, faces))
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    return {"fps": batch / best_dt, "ms_per_batch16": best_dt * 1e3}


def bench_musetalk() -> dict:
    """Batch-16 fused UNet(t=0)+VAE-decode step at SD scale, 256 px faces.

    The DEFAULT tier is vae_int8="auto": the int8 VAE decode enables itself
    when its load-time PSNR gate passes on the actual weights (engine
    default, config.avatar.vae_int8) — the headline number. The bf16 parity
    tier (reference serves fp16, musereal.py:54-58) is reported alongside."""
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.engines.muse import MuseModels

    import jax

    batch = 16
    rng = np.random.default_rng(0)
    gate: dict = {}

    def measure(vae_int8) -> float:
        models = MuseModels(dtype=jnp.bfloat16, vae_int8=vae_int8)
        if vae_int8 == "auto":
            gate["int8_enabled"] = models.int8_enabled
            gate["int8_gate_psnr"] = models.int8_gate_psnr
        ls = models.latent_size
        lat0 = jnp.asarray(
            rng.standard_normal((batch, ls, ls, 8)).astype(np.float32))
        feats = jnp.asarray(
            rng.standard_normal((batch, 50, 384)).astype(np.float32))

        # on-device chain (see bench_wav2lip): each step's latents perturbed
        # by a zero derived from the previous image, one dispatch per epoch
        iters = 20

        @jax.jit
        def epoch(unet_vars, vae_vars, lat0, feats):
            def body(carry, _):
                img = models.generate_with_vars(unet_vars, vae_vars,
                                                lat0 + carry, feats)
                # carry a REAL (tiny, but not provably-zero) function of the
                # image: an x*0.0 carry is an algebraic-simplification
                # candidate that would let XLA dead-code the UNet+VAE body
                return img.astype(jnp.float32).sum() * 1e-30, None
            return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=iters)[0]

        args = (models.unet_vars, models.vae_vars, lat0, feats)
        np.asarray(epoch(*args))  # compile + sync
        best_dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(epoch(*args))
            best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
        return best_dt

    dt_auto = measure("auto")      # the serving default (headline)
    dt_bf16 = measure("off")       # parity tier
    return {"fps": batch / dt_auto, "ms_per_batch16": dt_auto * 1e3,
            "bf16_fps": batch / dt_bf16, "bf16_ms_per_batch16": dt_bf16 * 1e3,
            "int8_enabled": bool(gate.get("int8_enabled")),
            "int8_gate_psnr": gate.get("int8_gate_psnr")}


def bench_ernerf() -> dict:
    """End-to-end 512 px frame rate at the reference render-loop granularity
    in the DEPLOYED configuration — torso deformation net ON (a real avatar
    composites the torso every frame, reference renderer.py:294-352; served
    from the pose-keyed torso cache, engines/nerf_pallas.py): 2 NerfASR
    steps (real DeepSpeech MFCC+LSTM compute at random weights — the
    ER-NeRF default audio feature, 29-dim) + attention-window fetch +
    Pallas render/shade + torso-composited background, frames chained
    through a device dependency."""
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.audio.deepspeech import deepspeech_logits_fn, init_params
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.data.provider import (
        NeRFTestDataset,
        synthesize_nerf_dataset,
    )
    from mere_fusion_tpu.engines.nerf import NeRFReal

    cfg = Config().override(
        **{"avatar.kind": "ernerf", "tts.backend": "procedural",
           "nerf.audio_in_dim": 29, "nerf.torso": True}
    )
    with tempfile.TemporaryDirectory() as td:
        d = synthesize_nerf_dataset(td, hw=512)
        dataset = NeRFTestDataset.load(
            f"{d}/transforms.json", f"{d}/au.csv", scale=1.0)
        ds_params = init_params()
        engine = NeRFReal(
            cfg, dataset=dataset,
            logits_fn=deepspeech_logits_fn(params=ds_params, device=None,
                                           compute_dtype="bfloat16"),
            device_logits_fn=deepspeech_logits_fn(params=ds_params,
                                                  return_device=True),
        )

        speech = 0.3 * np.sin(
            np.linspace(0, 440 * 6.28, 320)).astype(np.float32)

        def frame(i, chain):
            for _ in range(2):
                engine.asr.put_audio_frame(speech)
                engine.asr.run_step()
            # device-resident feature ring: the window never leaves HBM
            auds = engine.asr.get_next_feat_device()
            data = dataset.collate(i)
            eye = jnp.asarray(data["eye"]) + chain
            img, n_active, _ = engine._render_step(
                data["pose"], auds, eye, engine.density,
                engine._bg_dev, pose_key=data.get("index"),
            )
            # real (tiny, not provably-zero) dependency on the frame — an
            # x*0.0 chain could be algebraically folded, decoupling frames
            return img, img.astype(jnp.float32).sum() * 1e-30, n_active

        def time_pass(iters=50):
            """Warm a full pose cycle (compiles + span cache), then time
            dependency-chained frames, best of 3 passes (the tunnel's
            per-dispatch latency drifts by whole milliseconds between
            passes; the best pass is the honest device number)."""
            chain = jnp.zeros((), jnp.float32)
            for i in range(2 * len(dataset)):
                img, chain, n_active = frame(i, chain)
            np.asarray(img)
            best_dt = float("inf")
            for _ in range(3):
                chain = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for i in range(iters):
                    img, chain, n_active = frame(i, chain)
                np.asarray(img)
                best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
            return best_dt, n_active

        best_dt, n_active = time_pass()

        # typical-occupancy pass: a head-sized occupancy blob exercises the
        # adaptive tile-budget ladder (sparse poses pick a smaller
        # precompiled variant; the pass above is the all-tiles worst case).
        # Swapping engine.density invalidates the span cache by itself.
        from mere_fusion_tpu.models.ernerf.renderer import DensityGrid

        g = cfg.nerf.grid_size
        occ = np.zeros((g, g, g), bool)
        lo, hi = int(g * 0.45), int(g * 0.55)
        occ[lo:hi, lo:hi, lo:hi] = True
        engine.density = DensityGrid(
            grid=jnp.zeros((g**3,), jnp.float32),
            occupancy=jnp.asarray(occ.reshape(-1)),
            mean_density=jnp.zeros(()))
        sparse_dt, n_sparse = time_pass()

        # tiles_total documents that the dense pass renders EVERY tile:
        # the budget ladder escalates past nerf.tile_budget up to full
        # coverage, so active_tiles == tiles_total means a genuine
        # worst-case frame with zero dropped tiles (reference marches every
        # ray, ernerf/nerf_triplane/renderer.py:229-271). dropped is
        # computed the way the engine computes its metric
        # (engines/nerf.py: max(0, active - ladder_top)), and the dense
        # pass asserts it really did render at full coverage.
        tw = cfg.nerf.pallas_tile_w if 512 % cfg.nerf.pallas_tile_w == 0 else 8
        th = cfg.nerf.pallas_tile_h if 512 % cfg.nerf.pallas_tile_h == 0 else 8
        tiles_total = (512 * 512) // (tw * th)
        ladder_top = engine._render_step.ladder_top
        dropped = max(0, int(n_active) - ladder_top)
        assert int(n_active) == tiles_total == ladder_top, (
            f"dense pass must run at full coverage: active {int(n_active)} "
            f"of {tiles_total}, ladder_top {ladder_top}")
        fps = 1.0 / best_dt
        return {
            "fps": fps,
            "ms_per_frame": best_dt * 1e3,
            "torso": True,            # deployed config: torso net composited
            "torso_fps": fps,         # the round-4 verdict's headline key
            "active_tiles": int(n_active),
            "tiles_total": tiles_total,
            "tile_budget": cfg.nerf.tile_budget,
            "dropped_tiles": dropped,
            "sparse_fps": 1.0 / sparse_dt,
            "sparse_ms_per_frame": sparse_dt * 1e3,
            "sparse_active_tiles": int(n_sparse),
        }


def bench_a2ff() -> dict:
    """Audio-to-first-frame latency through the live wav2lip serving path
    (BASELINE.md north star: < 300 ms p50). Procedural TTS → BaseASR →
    batch-16 device step → track queue; the engine's lip.first_frame meter
    runs from the silence→speech transition to the first generated frame
    handed to the track (reference instrumentation point: lipreal.py's
    per-100-frame fps print has no latency analogue — this is stricter)."""
    import asyncio
    import tempfile
    import threading
    from types import SimpleNamespace

    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.avatar import synthesize_avatar
    from mere_fusion_tpu.engines.lip import LipReal
    from mere_fusion_tpu.runtime.metrics import metrics

    avatar = synthesize_avatar(tempfile.mkdtemp(), n_frames=6)
    cfg = Config().override(**{"tts.backend": "procedural"})
    engine = LipReal(cfg, avatar=avatar)
    meter = metrics.latency("lip.first_frame")
    samples = []

    async def drive():
        loop = asyncio.get_running_loop()
        video_track = SimpleNamespace(_queue=asyncio.Queue())
        audio_track = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render,
            args=(quit_event, loop, audio_track, video_track), daemon=True)
        t.start()
        try:
            # 8 measured utterances: the p50 of 3 samples swung ±10 ms
            # between rounds on tunnel jitter alone
            for u in range(9):
                count0 = meter.count
                engine.put_msg_txt("hello there this is a longer utterance")
                deadline = time.monotonic() + 180
                while meter.count == count0 and time.monotonic() < deadline:
                    await asyncio.wait_for(video_track._queue.get(),
                                           timeout=180)
                if u > 0:      # utterance 0 pays the jit compile — discard
                    samples.append(meter.last)
                # sustained silence so the next utterance re-arms the clock
                for _ in range(3 * cfg.avatar.batch_size):
                    await asyncio.wait_for(video_track._queue.get(),
                                           timeout=180)
        finally:
            quit_event.set()
            t.join(timeout=10)

    asyncio.run(drive())
    ms = sorted(s * 1e3 for s in samples)
    return {"p50_ms": ms[len(ms) // 2], "max_ms": ms[-1]}


def bench_a2ff_musetalk() -> dict:
    """Audio-to-first-frame on the FLAGSHIP full-duplex path (MuseTalk):
    silence→speech transition through whisper-encoder featurization to the
    first UNet+VAE-blended frame handed to the track (BASELINE.md north
    star: < 300 ms p50). Same meter discipline as bench_a2ff, via the
    engine's muse.first_frame meter (engines/muse.py:405-409)."""
    import asyncio
    import threading
    from types import SimpleNamespace

    import jax.numpy as jnp

    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.muse import (
        MuseModels,
        MuseReal,
        synthesize_muse_avatar,
    )
    from mere_fusion_tpu.runtime.metrics import metrics

    cfg = Config().override(**{"avatar.kind": "musetalk",
                               "tts.backend": "procedural"})
    models = MuseModels(dtype=jnp.bfloat16, vae_int8=cfg.avatar.vae_int8)
    avatar = synthesize_muse_avatar(models, n_frames=6)
    engine = MuseReal(cfg, models=models, avatar=avatar)
    meter = metrics.latency("muse.first_frame")
    samples = []

    async def drive():
        loop = asyncio.get_running_loop()
        video_track = SimpleNamespace(_queue=asyncio.Queue())
        audio_track = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render,
            args=(quit_event, loop, audio_track, video_track), daemon=True)
        t.start()
        try:
            for u in range(4):
                count0 = meter.count
                engine.put_msg_txt(
                    "hello there this is a longer utterance for musetalk")
                deadline = time.monotonic() + 240
                while meter.count == count0 and time.monotonic() < deadline:
                    await asyncio.wait_for(video_track._queue.get(),
                                           timeout=240)
                if u > 0:      # utterance 0 pays the jit compile — discard
                    samples.append(meter.last)
                # sustained silence so the next utterance re-arms the clock
                for _ in range(6 * cfg.avatar.batch_size):
                    await asyncio.wait_for(video_track._queue.get(),
                                           timeout=240)
        finally:
            quit_event.set()
            t.join(timeout=10)

    asyncio.run(drive())
    ms = sorted(s * 1e3 for s in samples)
    return {"p50_ms": ms[len(ms) // 2], "max_ms": ms[-1]}


def bench_sessions(n: int = 4, models=None, extractor=None,
                   phase_a_s: float = 16.0, rounds: int = 2,
                   extra_cfg: dict | None = None,
                   feed_interval_scale: float = 1.0) -> dict:
    """4 concurrent MuseTalk full-duplex sessions on the single chip through
    the real SessionManager (placement, admission, per-chip weight sharing):
    per-session sustained delivered fps while all four speak, and
    audio-to-first-frame under load (one session transitions silence→speech
    while the other three keep talking). North star: BASELINE.md "4
    concurrent sessions per server"; reference admission cap app.py:42-49.

    models/extractor are injectable so the suite can smoke the identical
    drive at toy model scale (tests/test_bench_sessions_smoke.py)."""
    import asyncio

    import jax.numpy as jnp

    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.muse import (
        MuseModels,
        MuseReal,
        synthesize_muse_avatar,
    )
    from mere_fusion_tpu.runtime.metrics import metrics
    from mere_fusion_tpu.server.sessions import SessionManager

    cfg = Config().override(**{
        "avatar.kind": "musetalk", "tts.backend": "procedural",
        "transport.mode": "loopback", "server.max_sessions": n,
        **(extra_cfg or {})})
    # per-chip weight sharing: one MuseModels serves every session on the
    # chip (the SessionManager passes device= through; single chip here)
    if models is None:
        models = MuseModels(dtype=jnp.bfloat16, vae_int8=cfg.avatar.vae_int8)
    if extractor is None:
        # ONE extractor shared by every session (per-chip weight sharing —
        # per-session extractors would each recompile and re-init whisper
        # during the measurement window)
        from mere_fusion_tpu.audio.features import WhisperFeatureExtractor
        extractor = WhisperFeatureExtractor()
    avatar = synthesize_muse_avatar(models, n_frames=6)

    def factory(cfg, device=None):
        return MuseReal(cfg, models=models, avatar=avatar, device=device,
                        feature_extractor=extractor)

    mgr = SessionManager(cfg, factory)
    meter = metrics.latency("muse.first_frame")
    text = "keep talking so the generator stays under sustained load"

    async def drive():
        sessions = [await mgr.start_session() for _ in range(n)]
        counts = [0] * n
        stop = asyncio.Event()

        # replace the default discard-drains with counting drains (audio
        # still discarded); recv() paces at the track clock, so delivered
        # fps == 25 exactly when the engine keeps up
        for s in sessions:
            for c in s._consumers:
                c.cancel()
        drains = []
        for i, s in enumerate(sessions):
            async def count_video(i=i, s=s):
                while not stop.is_set():
                    await s.player.video.recv()
                    counts[i] += 1
            async def drain_audio(s=s):
                while not stop.is_set():
                    await s.player.audio.recv()
            drains += [asyncio.create_task(count_video()),
                       asyncio.create_task(drain_audio())]

        # procedural TTS synthesizes 0.05 s/char: feed at ~real-time rate so
        # speech is continuous but no backlog accumulates (a backlog would
        # keep phase B's probed session from ever reaching silence)
        # feed_interval_scale > 1 under-feeds relative to real time — the
        # CPU-mesh smoke test runs the toy pipeline ~8× slower than real
        # time, and feeding at 1× there grows an undrainable backlog
        feed_dt = len(text) * 0.05 * 0.95 * feed_interval_scale

        async def feeder(s, until):
            while time.monotonic() < until and not stop.is_set():
                s.model.put_msg_txt(text)
                await asyncio.sleep(feed_dt)

        try:
            # ---- readiness barrier: phase A must not measure residual
            # compiles/warmups — wait until every session has delivered at
            # least one frame, then run a speaking lead-in
            deadline = time.monotonic() + 180
            dbg = os.environ.get("BENCH_SESSIONS_DEBUG")
            while (any(c == 0 for c in counts)
                   and time.monotonic() < deadline):
                if dbg:
                    print("barrier", counts,
                          [s.model.res_frame_queue.qsize() for s in sessions],
                          [s.player.video._queue.qsize() for s in sessions],
                          [d.done() for d in drains], flush=True)
                await asyncio.sleep(2.0 if dbg else 0.25)
            lead = time.monotonic() + 12
            await asyncio.gather(*[feeder(s, lead) for s in sessions])

            # ---- phase A: sustained fps, all four speaking. One retry:
            # the remote-chip tunnel stalls for tens of seconds at a time,
            # and a stall inside the window reads as a dead session rather
            # than a slow one.
            async def phase_a():
                base = list(counts)
                t0 = time.monotonic()
                await asyncio.gather(
                    *[feeder(s, t0 + phase_a_s) for s in sessions])
                await asyncio.sleep(max(0.0, t0 + phase_a_s
                                        - time.monotonic()))
                dt = time.monotonic() - t0
                return [(counts[i] - base[i]) / dt for i in range(n)]

            fps = await phase_a()
            if min(fps) < 5.0:
                await asyncio.sleep(5.0)
                fps = await phase_a()
            # ---- phase B: a2ff under load — session i goes silent then
            # speaks while the other three keep talking; the only
            # silence→speech transition (and so the only first_frame
            # observation) in the window is session i's
            a2ff = []
            for r in range(rounds):
                for i, s in enumerate(sessions):
                    done = asyncio.Event()

                    async def others_feed(o):
                        while not done.is_set() and not stop.is_set():
                            o.model.put_msg_txt(text)
                            await asyncio.sleep(feed_dt)

                    tasks = [asyncio.create_task(others_feed(o))
                             for j, o in enumerate(sessions) if j != i]
                    # wait for the probed session to actually drain to
                    # silence (asr._in_speech clears after 200 ms of empty
                    # polls) — a fixed sleep under-waits whenever the
                    # pipeline runs below real time
                    asr = s.model.asr
                    deadline = time.monotonic() + 60
                    while ((asr._in_speech or not asr.queue.empty())
                           and time.monotonic() < deadline):
                        await asyncio.sleep(0.1)
                    await asyncio.sleep(1.0)   # a beat of true silence
                    c0 = meter.count
                    s.model.put_msg_txt(text)
                    deadline = time.monotonic() + 30
                    while (meter.count == c0
                           and time.monotonic() < deadline):
                        await asyncio.sleep(0.02)
                    if meter.count > c0:
                        a2ff.append(meter.last)
                    done.set()
                    await asyncio.gather(*tasks)
            return fps, a2ff
        finally:
            stop.set()
            for d in drains:
                d.cancel()
            await mgr.close_all()

    fps, a2ff = asyncio.run(drive())

    # context: serving video IS device→host frame traffic (n sessions ×
    # 3.1 MB per 640 ms batch), and through the remote-chip tunnel the
    # link's day-to-day bandwidth — not compute — caps the aggregate
    # (generate capacity is ~9 sessions/chip). Measure the link at bench
    # time so a low min_fps is attributable: over local PCIe the same
    # traffic is microseconds.
    import numpy as _np

    x = jnp.ones((16, 256, 256, 3), jnp.uint8)
    _np.asarray(x + jnp.uint8(0))
    t0 = time.monotonic()
    for _ in range(3):
        _np.asarray(x + jnp.uint8(1))
    tunnel_mbps = 3 * 3.15 / max(time.monotonic() - t0, 1e-6)

    ms = sorted(s * 1e3 for s in a2ff) or [float("nan")]
    return {"min_fps": min(fps), "mean_fps": sum(fps) / len(fps),
            "a2ff_p50_ms": ms[len(ms) // 2], "a2ff_max_ms": ms[-1],
            "a2ff_samples": len(a2ff),
            "tunnel_mbps": tunnel_mbps,
            "required_mbps": n * 3.15 / 0.64}


def bench_ernerf_train() -> dict:
    """Full ER-NeRF training step at reference scale (4096 rays × 16 steps,
    12 levels→512 triplanes, grid 128, composite loss + EMA; reference
    schedule ernerf/scripts/train_obama.sh). Hash lookups ride the one-hot
    MXU kernel (ops/hash_mxu.py); states chain through the optimizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
    from mere_fusion_tpu.train.ernerf_train import (
        NeRFTrainConfig,
        init_nerf_train,
        make_nerf_train_step,
    )

    net_cfg = NeRFNetConfig(individual_dim=4, num_train_frames=4)
    tcfg = NeRFTrainConfig(grid_size=128, n_candidates=64, n_steps=16,
                           iters=200_000)
    n = 4096
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "rays_o": jnp.asarray(np.zeros((n, 3), np.float32) + [0, 0, -2.0]),
        "rays_d": jnp.asarray(np.abs(d) * [0.2, 0.2, 1.0] / 1.2),
        "rgb": jnp.asarray(rng.uniform(0.4, 0.6, (n, 3)).astype(np.float32)),
        "bg_color": jnp.ones(3),
        "auds": jnp.asarray(
            rng.standard_normal((8, 44, 16)).astype(np.float32) * 0.1),
        "eye": jnp.asarray([[0.25]]),
        "index": jnp.zeros((), jnp.int32),
        "face_mask": jnp.asarray(rng.uniform(size=n) > 0.5),
    }
    network = NeRFNetwork(net_cfg)
    variables = network.init(
        jax.random.key(0), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)),
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init)
    tx, state = init_nerf_train(network, variables, tcfg)
    step = make_nerf_train_step(network, tx, tcfg)
    state, m = step(state, batch, jax.random.key(0))
    float(m["loss"])  # compile + sync
    iters = 20
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        cur = state
        for i in range(iters):
            cur, m = step(cur, batch, jax.random.key(i))
        np.asarray(m["loss"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    return {"ms_per_step": best_dt * 1e3, "it_s": 1.0 / best_dt}


_PROBE_CODE = "import jax; print(jax.default_backend())"


def wait_for_backend(attempts: int = 6, probe_timeout: float = 240.0,
                     probe_code: str = _PROBE_CODE) -> None:
    """Fail fast (with bounded retries) if the device backend cannot
    initialize, instead of hanging the whole bench run.

    The axon TPU plugin initializes through a remote tunnel; during an
    outage `jax.devices()` blocks indefinitely, which would turn a bench
    invocation into a silent hang. Probe backend init in a subprocess with
    a timeout (init is lazy and per-process, so a hung probe does not
    poison this process), retry to ride out a transient tunnel drop, and
    exit non-zero with a clear message if the backend never comes up."""
    import subprocess

    for attempt in range(1, attempts + 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe_code],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if out.returncode == 0:
                return
            err = out.stderr.strip().splitlines()[-1:] or ["(no output)"]
            print(f"bench: backend probe failed (attempt {attempt}): "
                  f"{err[0]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: backend init timed out after {probe_timeout:.0f}s "
                  f"(attempt {attempt})", file=sys.stderr)
        if attempt < attempts:
            # axon tunnel outages routinely last tens of minutes; a ~30 min
            # total window rides out a recovering tunnel without turning a
            # genuinely dead backend into an unbounded hang
            time.sleep(90.0)
    sys.exit("bench: device backend unavailable — aborting instead of hanging")


def main() -> None:
    wait_for_backend()
    wl = bench_wav2lip()
    extra = {"wav2lip_ms_per_batch16": round(wl["ms_per_batch16"], 2)}
    for name, fn in (("musetalk", bench_musetalk), ("ernerf_512", bench_ernerf),
                     ("ernerf_train", bench_ernerf_train),
                     ("a2ff", bench_a2ff),
                     ("a2ff_musetalk", bench_a2ff_musetalk),
                     ("sessions4", bench_sessions)):
        try:
            r = fn()
            for k, v in r.items():
                extra[f"{name}_{k}"] = round(v, 2) if isinstance(v, float) else v
            if "fps" in r:
                extra[f"{name}_vs_baseline"] = round(r["fps"] / 25.0, 2)
        except Exception as e:  # keep the headline alive if one engine breaks
            extra[f"{name}_error"] = f"{type(e).__name__}: {e}"

    print(
        json.dumps(
            {
                "metric": "wav2lip_generation_fps_per_chip",
                "value": round(wl["fps"], 1),
                "unit": "frames/s",
                "vs_baseline": round(wl["fps"] / 25.0, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
