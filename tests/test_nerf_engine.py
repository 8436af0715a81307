import asyncio
import threading
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset, synthesize_nerf_dataset
from mere_fusion_tpu.engines.nerf import NeRFReal, NerfASR, fake_logits_fn
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork

CFG = Config().override(
    **{
        "tts.backend": "procedural",
        "avatar.kind": "ernerf",
        "nerf.grid_size": 16,
        "nerf.num_levels": 4,
        "nerf.base_resolution": 16,
        "nerf.desired_resolution": 64,
        "nerf.log2_hashmap_size": 10,
        "nerf.max_steps": 8,
    }
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = synthesize_nerf_dataset(str(tmp_path_factory.mktemp("nerfdata")), hw=64)
    return NeRFTestDataset.load(f"{d}/transforms.json", f"{d}/au.csv", scale=1.0)


def test_dataset_load(dataset):
    assert dataset.H == dataset.W == 64
    assert len(dataset) == 4
    assert 0.0 <= dataset.eye_area.min() <= dataset.eye_area.max() <= 1.0
    item = dataset.collate(5)  # mirrored: 5 → index 2
    assert item["pose"].shape == (4, 4)
    assert item["bg_color"].shape == (64 * 64, 3)


def test_nerfasr_ring_and_window():
    asr = NerfASR(CFG, None, fake_logits_fn(CFG.nerf.audio_in_dim))
    asr.warm_up()
    feat = asr.get_next_feat()
    assert feat.shape == (8, 44, 16)
    # drive like the render loop: 2 ASR steps per video frame, one window per
    # frame; with speech flowing the attention stack must eventually light up
    saw_nonzero = False
    for _ in range(40):
        for _ in range(2):
            asr.put_audio_frame(0.5 * np.ones(320, np.float32))
            asr.run_step()
        feat = asr.get_next_feat()
        assert feat.shape == (8, 44, 16)
        if np.abs(feat).sum() > 0:
            saw_nonzero = True
    assert saw_nonzero, "speech features must reach the attention window"


def test_nerf_engine_renders_frames(dataset):
    engine = NeRFReal(CFG, dataset=dataset)

    async def main():
        loop = asyncio.get_running_loop()
        vtrack = SimpleNamespace(_queue=asyncio.Queue())
        atrack = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render, args=(quit_event, loop, atrack, vtrack), daemon=True
        )
        t.start()
        engine.put_msg_txt("talking head")
        frames, chunks = [], []
        try:
            while len(frames) < 6:
                frames.append(await asyncio.wait_for(vtrack._queue.get(), timeout=180))
            # warm-up leaves ~28 silence chunks queued ahead of the speech
            while len(chunks) < 80:
                chunks.append(await asyncio.wait_for(atrack._queue.get(), timeout=60))
        finally:
            quit_event.set()
            t.join(timeout=10)
        return frames, chunks

    frames, chunks = asyncio.run(main())
    assert all(f.image.shape == (64, 64, 3) for f in frames)
    pattern = "".join("1" if np.any(c.samples != 0) else "0" for c in chunks)
    assert "1" in pattern, f"speech audio must flow, got {pattern}"
    # untrained NeRF over a white bg composites to a bright, valid frame
    assert all(f.image.dtype == np.uint8 for f in frames)
    assert all(f.image.mean() > 128 for f in frames)


def test_nerf_engine_pallas_mode_matches_xla(dataset):
    """The Pallas sampler pipeline produces frames close to the XLA path
    (exact in-window; LOD only on wide spans) through the full engine."""
    cfg_p = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 64,
        "nerf.pallas_depth_groups": 4,
    })
    net = NeRFNetwork(NeRFNetConfig(
        bound=CFG.nerf.bound, audio_in_dim=CFG.nerf.audio_in_dim,
        audio_dim=CFG.nerf.audio_dim, exp_eye=CFG.nerf.exp_eye,
        num_levels=CFG.nerf.num_levels,
        base_resolution=CFG.nerf.base_resolution,
        log2_hashmap_size=CFG.nerf.log2_hashmap_size,
        desired_resolution=CFG.nerf.desired_resolution,
    ))
    variables = jax.jit(net.init, static_argnames="method")(
        jax.random.key(0), jnp.zeros((8, net.cfg.audio_in_dim, 16)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, net.cfg.individual_dim)) if net.cfg.individual_dim else None,
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init,
    )
    cfg_x = CFG.override(**{"nerf.sample_mode": "nearest"})
    eng_p = NeRFReal(cfg_p, network=net, variables=variables, dataset=dataset)
    eng_x = NeRFReal(cfg_x, network=net, variables=variables, dataset=dataset)
    assert eng_p._pallas_mode and not eng_x._pallas_mode

    data = dataset.collate(0)
    auds = jnp.zeros((8, net.cfg.audio_in_dim, 16))
    img_p, n_act, n_ovf = eng_p._render_step(
        data["pose"], auds, jnp.asarray(data["eye"]), eng_p.density,
        jnp.asarray(data["bg_color"]), pose_key=0,
    )
    img_x = eng_x._render_step(
        data["pose"], auds, jnp.asarray(data["eye"]), eng_x.density,
        jnp.asarray(data["bg_color"]),
    )
    img_p, img_x = np.asarray(img_p), np.asarray(img_x)
    assert img_p.shape == img_x.shape == (64, 64, 3)
    mse = ((img_p.astype(np.float32) - img_x.astype(np.float32)) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    # untrained density → fully occupied grid → wide spans → LOD filtering;
    # the two paths must still broadly agree
    assert psnr > 20, f"pallas vs xla frame PSNR {psnr:.1f} dB"
    # span cache hit on the second call
    img_p2, _, _ = eng_p._render_step(
        data["pose"], auds, jnp.asarray(data["eye"]), eng_p.density,
        jnp.asarray(data["bg_color"]), pose_key=0,
    )
    np.testing.assert_array_equal(np.asarray(img_p2), img_p)


def test_smooth_lips_ema_on_audio_code(dataset):
    """nerf.smooth_lips EMAs the audio code across frames
    (reference renderer.py:190-194, lambda=0.35)."""
    cfg = CFG.override(**{"nerf.smooth_lips": True})
    engine = NeRFReal(cfg, dataset=dataset)
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))
    smoother = frees.get("smooth_enc_a") or frees.get("smooth_baked") \
        or frees.get("smooth_plain")
    state = smoother.state
    assert state["enc_a"] is None

    data = dataset.collate(0)
    rng = np.random.default_rng(0)
    auds_a = rng.normal(0, 0.3, (8, 44, 16)).astype(np.float32)
    auds_b = rng.normal(0, 0.3, (8, 44, 16)).astype(np.float32)

    def call(auds):
        if engine._pallas_mode:
            engine._render_step(data["pose"], jnp.asarray(auds),
                                jnp.asarray(data["eye"]), engine.density,
                                jnp.asarray(data["bg_color"]), pose_key=None)
        else:
            engine._render_step(data["pose"], jnp.asarray(auds),
                                jnp.asarray(data["eye"]), engine.density,
                                jnp.asarray(data["bg_color"]))

    call(auds_a)
    first = np.asarray(state["enc_a"]).copy()
    enc_a_raw = np.asarray(engine.network.apply(
        engine.variables, jnp.asarray(auds_a),
        method=engine.network.encode_audio))
    np.testing.assert_allclose(first, enc_a_raw, atol=1e-6)

    call(auds_b)
    enc_b_raw = np.asarray(engine.network.apply(
        engine.variables, jnp.asarray(auds_b),
        method=engine.network.encode_audio))
    want = 0.35 * first + 0.65 * enc_b_raw
    np.testing.assert_allclose(np.asarray(state["enc_a"]), want, atol=1e-5)


def test_device_feature_ring_matches_host_windows():
    """get_next_feat_device (device-resident ring) returns the exact windows
    the host get_next_feat builds, through warm-up zeros, ring wrap-around,
    and live speech."""
    rng = np.random.default_rng(3)

    def make():
        asr = NerfASR(CFG, None, fake_logits_fn(CFG.nerf.audio_in_dim))
        asr.warm_up()
        return asr

    host, dev = make(), make()
    # force the device mirror alive from the first window
    for step in range(30):
        chunk = rng.uniform(-0.5, 0.5, 320).astype(np.float32)
        for a in (host, dev):
            a.put_audio_frame(chunk.copy())
            a.run_step()
            a.put_audio_frame(chunk.copy())
            a.run_step()
        want = host.get_next_feat()
        got = np.asarray(dev.get_next_feat_device())
        np.testing.assert_array_equal(got, want, err_msg=f"frame {step}")


def test_device_flush_path_matches_host_and_guards_host_reads():
    """With device_logits_fn, post-activation flushes go straight into the
    device ring (no host readback); windows still match the host-path
    instance, and host get_next_feat refuses stale reads."""
    import jax.numpy as jnp

    fake = fake_logits_fn(CFG.nerf.audio_in_dim)
    host = NerfASR(CFG, None, fake)
    dev = NerfASR(CFG, None, fake,
                  device_logits_fn=lambda a: jnp.asarray(fake(a)))
    for a in (host, dev):
        a.warm_up()
    dev.get_next_feat_device()  # activates the device ring
    host.get_next_feat()        # keep the two state machines in lockstep

    rng = np.random.default_rng(5)
    stale_seen = False
    for step in range(20):
        chunk = rng.uniform(-0.5, 0.5, 320).astype(np.float32)
        for a in (host, dev):
            for _ in range(2):
                a.put_audio_frame(chunk.copy())
                a.run_step()
        want = host.get_next_feat()
        got = np.asarray(dev.get_next_feat_device())
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"frame {step}")
        if dev._host_ring_stale:
            stale_seen = True
    assert stale_seen
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="stale"):
        dev.get_next_feat()


def test_nerf_asr_rearms_first_frame_clock_between_utterances():
    """NerfASR (non-blocking get_audio_frame) shares the silence→speech
    transition logic with BaseASR: after an utterance drains, the next
    utterance must arm a fresh speech_start_ts (regression: the old
    get_audio_frame override skipped the _in_speech reset, so the
    audio-to-first-frame metric recorded exactly one sample per process)."""
    asr = NerfASR(CFG, None, fake_logits_fn(CFG.nerf.audio_in_dim))
    speech = np.ones(asr.chunk, np.float32)

    asr.put_audio_frame(speech)
    assert asr.speech_start_ts is not None
    asr.speech_start_ts = None  # engine shipped the first frame
    # utterance still streaming: no re-arm
    asr.put_audio_frame(speech)
    assert asr.speech_start_ts is None
    # drain both queued chunks, then sustained silence (queue empty for
    # silence_rearm_chunks polls — a single empty poll is debounced as a
    # mid-utterance TTS underrun, not end of utterance)
    for want in (0, 0):
        _, ftype = asr.get_audio_frame()
        assert ftype == want
    for _ in range(asr.silence_rearm_chunks):
        _, ftype = asr.get_audio_frame()
        assert ftype == 1
    # next utterance: fresh clock
    asr.put_audio_frame(speech)
    assert asr.speech_start_ts is not None


@pytest.mark.parametrize("tile_shape", [(8, 8), (16, 8)],
                         ids=["tile8x8", "tile16x8"])
def test_adaptive_tile_budget_picks_smaller_variant(dataset, tile_shape):
    """A pose whose cached active-tile count fits a smaller precompiled
    budget renders through that variant, and the frame is identical to the
    full-budget render (every active tile is still covered). Runs at both
    tile shapes so the DEFAULT 16×8 geometry is suite-covered, not
    bench-only."""
    from mere_fusion_tpu.engines.nerf_pallas import ladder_rungs
    from mere_fusion_tpu.models.ernerf.renderer import DensityGrid

    tw, th = tile_shape
    cfg = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 64,
        "nerf.pallas_depth_groups": 4,
        "nerf.pallas_tile_w": tw,
        "nerf.pallas_tile_h": th,
    })
    t_total = (64 * 64) // (tw * th)
    budget = min(cfg.nerf.tile_budget, t_total)
    engine = NeRFReal(cfg, dataset=dataset)
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))
    frame_fns, ladder = frees["frame_fns"], frees["budget_ladder"]
    assert ladder == ladder_rungs(budget, t_total)

    # occupancy only in a small corner of the grid → few active tiles
    g = cfg.nerf.grid_size
    occ = np.zeros((g, g, g), bool)
    occ[: g // 4, : g // 4, : g // 4] = True
    sparse = DensityGrid(grid=jnp.zeros((g**3,), jnp.float32),
                         occupancy=jnp.asarray(occ.reshape(-1)),
                         mean_density=jnp.zeros(()))

    data = dataset.collate(0)
    auds = jnp.zeros((8, engine.network.cfg.audio_in_dim, 16))
    img_small, n_act, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                               sparse, jnp.asarray(data["bg_color"]),
                               pose_key="sparse")
    active = frees["span_cache"]["sparse"][-1]
    assert active < budget, f"scene not sparse: {active} active tiles"
    chosen = [b for b in frame_fns if b < budget]
    assert chosen, f"no smaller-budget variant compiled (have {list(frame_fns)})"
    assert min(frame_fns) >= active

    # same scene forced through the full budget must produce the same frame
    # (±1 uint8 step: the two variants are differently-shaped compiled
    # programs, so XLA may order float reductions differently and flip a
    # pixel sitting exactly on a truncation boundary)
    full = frees["make_frame_fn"](t_total)
    sp, va, _ = frees["span_cache"]["sparse"]
    enc_shape = frees["enc_a_shape"]
    img_full, _, n_act_full, _ = full(
        frees["variables"], frees["planes_major"], data["pose"],
        sp, va, auds, jnp.asarray(data["eye"]), jnp.asarray(data["bg_color"]),
        jnp.zeros(enc_shape.shape, enc_shape.dtype), jnp.asarray(False),
    )
    np.testing.assert_allclose(
        np.asarray(img_small, np.int16), np.asarray(img_full, np.int16),
        atol=1)
    assert int(n_act) == int(n_act_full)


def test_pallas_warmup_prefills_cache_and_ladder(dataset):
    """step.warmup blocks on every budget-ladder compile and prefills the
    span cache for the whole pose track, so a live stream never hits the
    remote compiler or a per-pose host readback mid-stream."""
    cfg = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 64,
        "nerf.pallas_depth_groups": 4,
    })
    engine = NeRFReal(cfg, dataset=dataset)
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))
    step.warmup(engine.density, engine._bg_dev)
    assert set(frees["span_cache"]) == set(range(len(dataset)))
    assert sorted(frees["frame_fns"]) == frees["budget_ladder"]

    data = dataset.collate(0)
    auds = jnp.zeros((8, engine.network.cfg.audio_in_dim, 16))
    img, _, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                     engine.density, engine._bg_dev, pose_key=0)
    assert img.shape == (dataset.H, dataset.W, 3) and img.dtype == jnp.uint8
    assert len(frees["span_cache"]) == len(dataset), "cache must not grow"


def test_density_swap_invalidates_span_cache(dataset):
    """Passing a different DensityGrid object must invalidate the span
    cache: stale spans + a stale (too small) tile budget would silently
    truncate newly-active tiles to background otherwise."""
    from mere_fusion_tpu.models.ernerf.renderer import DensityGrid

    cfg = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 64,
        "nerf.pallas_depth_groups": 4,
    })
    engine = NeRFReal(cfg, dataset=dataset)
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))

    g = cfg.nerf.grid_size

    def grid(occ):
        return DensityGrid(grid=jnp.zeros((g**3,), jnp.float32),
                           occupancy=jnp.asarray(occ.reshape(-1)),
                           mean_density=jnp.zeros(()))

    occ = np.zeros((g, g, g), bool)
    occ[: g // 4, : g // 4, : g // 4] = True
    sparse, dense = grid(occ), grid(np.ones((g, g, g), bool))

    data = dataset.collate(0)
    auds = jnp.zeros((8, engine.network.cfg.audio_in_dim, 16))
    bg = jnp.asarray(data["bg_color"])
    step(data["pose"], auds, jnp.asarray(data["eye"]), sparse, bg, pose_key=0)
    n_sparse = frees["span_cache"][0][-1]
    img, n_act, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                         dense, bg, pose_key=0)
    n_dense = frees["span_cache"][0][-1]
    assert n_dense > n_sparse, (
        f"stale cache survived the density swap ({n_dense} vs {n_sparse})")
    assert int(n_act) == n_dense

    # rebuilding the NamedTuple wrapper around the SAME occupancy buffer
    # must NOT invalidate (per-frame wrapper rebuilds would otherwise pay a
    # full span probe + blocking readback every frame)
    entry_before = frees["span_cache"][0]
    rewrapped = DensityGrid(grid=dense.grid, occupancy=dense.occupancy,
                            mean_density=dense.mean_density)
    step(data["pose"], auds, jnp.asarray(data["eye"]), rewrapped, bg,
         pose_key=0)
    assert frees["span_cache"][0] is entry_before, (
        "wrapper rebuild with identical occupancy cleared the span cache")

    # warmup after a density swap must drop entries under non-track pose
    # keys too — they were probed against the old grid and would otherwise
    # hide behind the refreshed cache marker
    step(data["pose"], auds, jnp.asarray(data["eye"]), dense, bg,
         pose_key="orbit-snapshot")
    assert "orbit-snapshot" in frees["span_cache"]
    step.warmup(sparse, bg)
    assert "orbit-snapshot" not in frees["span_cache"], (
        "stale non-track span entry survived warmup after a density swap")
    assert set(frees["span_cache"]) == set(range(len(dataset)))


def test_span_cache_pose_cap_bounds_prefill_and_growth(dataset):
    """nerf.span_cache_poses bounds both warmup prefill and live growth:
    a multi-thousand-frame track must not stall construction for minutes
    or pin unbounded HBM. Over-cap poses render through the uncached
    full-budget path (no insert, no host readback)."""
    cfg = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 64,
        "nerf.pallas_depth_groups": 4,
        "nerf.span_cache_poses": 2,
    })
    engine = NeRFReal(cfg, dataset=dataset)
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))
    step.warmup(engine.density, engine._bg_dev)
    assert set(frees["span_cache"]) == {0, 1}, "prefill must honor the cap"

    data = dataset.collate(2)
    auds = jnp.zeros((8, engine.network.cfg.audio_in_dim, 16))
    img, _, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                     engine.density, engine._bg_dev, pose_key=2)
    assert img.shape == (dataset.H, dataset.W, 3) and img.dtype == jnp.uint8
    assert set(frees["span_cache"]) == {0, 1}, (
        "over-cap pose must not be inserted into the span cache")

    # cached poses still hit
    d0 = dataset.collate(0)
    step(d0["pose"], auds, jnp.asarray(d0["eye"]), engine.density,
         engine._bg_dev, pose_key=0)
    assert len(frees["span_cache"]) == 2


@pytest.mark.parametrize("tile_shape", [(8, 8), (16, 8)],
                         ids=["tile8x8", "tile16x8"])
def test_over_budget_pose_escalates_to_full_coverage(dataset, tile_shape):
    """A pose with more active tiles than nerf.tile_budget must NOT
    truncate: the budget ladder escalates to a larger precompiled variant
    (up to full coverage), and the frame matches an uncapped render
    exactly. The reference marches every ray regardless of occupancy
    (ernerf/nerf_triplane/renderer.py:229-271). Runs at both tile shapes
    so the DEFAULT 16×8 geometry is suite-covered, not bench-only."""
    from mere_fusion_tpu.engines.nerf_pallas import ladder_rungs

    tw, th = tile_shape
    cfg = CFG.override(**{
        "nerf.sample_mode": "pallas",
        "nerf.tile_budget": 16,       # 64×64 frame → tiles ≫ budget
        "nerf.pallas_depth_groups": 4,
        "nerf.pallas_tile_w": tw,
        "nerf.pallas_tile_h": th,
    })
    t_total = (64 * 64) // (tw * th)
    engine = NeRFReal(cfg, dataset=dataset)   # default density: all occupied
    step = engine._render_step
    frees = dict(zip(step.__code__.co_freevars,
                     [c.cell_contents for c in step.__closure__]))
    assert frees["budget_ladder"] == ladder_rungs(16, t_total)
    assert step.ladder_top == t_total

    data = dataset.collate(0)
    auds = jnp.zeros((8, engine.network.cfg.audio_in_dim, 16))
    bg = jnp.asarray(data["bg_color"])
    img, n_act, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                         engine.density, bg, pose_key=0)
    active = frees["span_cache"][0][-1]
    assert active > cfg.nerf.tile_budget, (
        f"scene not over budget: {active} active tiles")
    # no truncation is possible: the chosen variant covers every active tile
    chosen = min(b for b in frees["frame_fns"] if b >= active)
    assert chosen >= active
    assert max(0, active - step.ladder_top) == 0   # dropped_tiles guard

    # the escalated render must match an uncapped (full-coverage) render
    full = frees["make_frame_fn"](t_total)
    sp, va, _ = frees["span_cache"][0]
    enc_shape = frees["enc_a_shape"]
    img_full, _, n_act_full, _ = full(
        frees["variables"], frees["planes_major"], data["pose"],
        sp, va, auds, jnp.asarray(data["eye"]), bg,
        jnp.zeros(enc_shape.shape, enc_shape.dtype), jnp.asarray(False),
    )
    a = np.asarray(img, np.float32)
    b = np.asarray(img_full, np.float32)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 80, f"escalated vs uncapped render PSNR {psnr:.1f} dB"
    assert int(n_act) == int(n_act_full) == active

    # the uncached path (orbit camera / over-cap pose) must also render at
    # full coverage — the active count is unknown, truncation is never OK
    img_uc, n_uc, _ = step(data["pose"], auds, jnp.asarray(data["eye"]),
                           engine.density, bg, pose_key=None)
    mse = ((np.asarray(img_uc, np.float32) - b) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 80, f"uncached vs uncapped render PSNR {psnr:.1f} dB"
