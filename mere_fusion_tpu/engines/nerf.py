"""ER-NeRF real-time engine.

Pipeline twin of the reference's nerfreal.py/nerfasr.py: a per-frame render
loop that runs two 20 ms ASR steps per video frame, pulls a looped camera
pose, injects live audio features through a circular feature ring with an
8-window attention context (reference: nerfasr.py:29-143, nerfreal.py:70-156),
and renders the talking head with the static-shape occupancy-guided marcher.

The CTC feature extractor is pluggable: wav2vec2/HuBERT via transformers when
the model is available locally, or any callable producing [T, audio_dim]
logits per window (a deterministic fake drives tests).
"""
from __future__ import annotations

import asyncio
import time
from functools import partial
from threading import Thread
from typing import Callable, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset
from mere_fusion_tpu.engines.base import BaseReal, track_put
from mere_fusion_tpu.engines.base_asr import BaseASR
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import (
    DensityGrid,
    get_rays,
    plan_rays,
    render_rays,
    render_torso_background,
    shade,
)
from mere_fusion_tpu.runtime.metrics import metrics
from mere_fusion_tpu.transport.frames import AudioChunk, VideoImage


def fake_logits_fn(audio_dim: int) -> Callable[[np.ndarray], np.ndarray]:
    """Deterministic energy-based CTC-logit stand-in: one row per 20 ms frame."""

    def fn(audio: np.ndarray) -> np.ndarray:
        frames = audio.reshape(-1, 320)
        energy = np.sqrt((frames**2).mean(axis=1, keepdims=True))
        base = np.linspace(0, 1, audio_dim, dtype=np.float32)[None]
        return (energy * base).astype(np.float32)[:-1]  # T-1 rows like wav2vec

    return fn


def wav2vec_logits_fn(model_name: str, device: str = "cpu",
                      backend: str = "flax"):
    """transformers CTC extractor (reference: nerfasr.py:39-45, 128-143).
    Requires the model to be available locally (zero-egress environments
    must pre-download).

    backend="flax" runs the encoder on the TPU (jitted
    FlaxWav2Vec2ForCTC); "torch" is the CPU fallback matching the
    reference's torch path."""
    if backend == "flax":
        import jax

        from transformers import AutoProcessor, FlaxWav2Vec2ForCTC

        processor = AutoProcessor.from_pretrained(model_name)
        model = FlaxWav2Vec2ForCTC.from_pretrained(model_name)
        apply = jax.jit(lambda p, x: model.module.apply(
            {"params": p}, x, deterministic=True).logits)
        params = jax.device_put(model.params)

        def fn(audio: np.ndarray) -> np.ndarray:
            inputs = processor(audio, sampling_rate=16000, return_tensors="np",
                               padding=True)
            return np.asarray(apply(params, inputs.input_values))[0]

        return fn

    import torch
    from transformers import AutoModelForCTC, AutoProcessor

    processor = AutoProcessor.from_pretrained(model_name)
    model = AutoModelForCTC.from_pretrained(model_name).to(device).eval()

    def fn(audio: np.ndarray) -> np.ndarray:
        inputs = processor(audio, sampling_rate=16000, return_tensors="pt", padding=True)
        with torch.no_grad():
            logits = model(inputs.input_values.to(device)).logits
        return logits[0].cpu().numpy()

    return fn


class NerfASR(BaseASR):
    """Sliding-window CTC featurizer with a circular feature ring.

    Feature ring: [4 × context] rows of [audio_dim]; per step one 20 ms frame
    is consumed and, once l+m+r frames accumulate, the middle m logit rows
    are written to the ring. get_next_feat returns an [8, audio_dim, 16]
    attention stack advancing 2 rows (one video frame) per call.
    """

    def __init__(self, cfg: Config, parent, logits_fn: Callable, att: int = 2,
                 device_logits_fn: Optional[Callable] = None):
        super().__init__(cfg, parent)
        self.audio_dim = cfg.nerf.audio_in_dim
        self.context_size = cfg.stride.mid
        self.logits_fn = logits_fn
        # same function as logits_fn but returning a DEVICE [T, dim] array:
        # once the device ring is live, flushes go straight from the CTC
        # net's output into the ring with zero host readback
        self.device_logits_fn = device_logits_fn
        self.att = att
        # pad left
        self.frames.extend(
            [np.zeros(self.chunk, np.float32)] * self.stride_left_size
        )
        self.feat_buffer_size = 4
        self.feat_buffer_idx = 0
        self.feat_ring = np.zeros(
            (self.feat_buffer_size * self.context_size, self.audio_dim), np.float32
        )
        self.front = self.feat_buffer_size * self.context_size - 8
        self.tail = 8
        self.att_feats: list[np.ndarray] = [
            np.zeros((self.audio_dim, 16), np.float32)
        ] * 4
        self.warm_up_steps = (
            self.context_size + self.stride_left_size + self.stride_right_size
        )
        # device-resident mirror of the feature ring (lazy; see
        # get_next_feat_device): per flush only the [context, dim] block
        # (~1 KB) ships to HBM instead of a [8, dim, 16] window (~90 KB)
        # per FRAME — through the remote tunnel that upload was ~7 ms/frame
        self._ring_dev = None
        self._att_idx: Optional[list] = None
        self._window_fn = None
        self._update_fn = None
        self._flush_fn = None
        self._host_ring_stale = False

    # non-blocking pull: NerfASR runs inside the render loop (2 steps per
    # video frame) and must synthesize silence immediately rather than wait
    # (the base get_audio_frame handles the shared silence/_in_speech logic)
    queue_timeout = None

    def run_step(self) -> None:
        frame, ftype = self.get_audio_frame()
        self.frames.append(frame)
        self.output_queue.put((frame, ftype, self.consumed_seq))
        window = self.stride_left_size + self.context_size + self.stride_right_size
        if len(self.frames) < window:
            return
        audio = np.concatenate(self.frames)
        self.frames = self.frames[-(self.stride_left_size + self.stride_right_size):]
        start = self.feat_buffer_idx * self.context_size
        self.feat_buffer_idx = (self.feat_buffer_idx + 1) % self.feat_buffer_size
        if self._ring_dev is not None and self.device_logits_fn is not None:
            # fully device-resident flush: the CTC logits stay in HBM and
            # slide into the ring without ever crossing back to the host
            logits_dev = self.device_logits_fn(audio)
            self._ring_dev = self._flush_fn(
                self._ring_dev, logits_dev, np.int32(start))
            self._host_ring_stale = True
            return
        logits = self.logits_fn(audio)  # [T, audio_dim]
        feats = logits[self.stride_left_size : self.stride_left_size + self.context_size]
        self.feat_ring[start : start + feats.shape[0]] = feats
        if self._ring_dev is not None:
            # mirror the freshly written block (rows [start, start+context) —
            # always un-wrapped: the ring length is a multiple of context)
            block = jnp.asarray(
                self.feat_ring[start : start + self.context_size])
            self._ring_dev = self._update_fn(
                self._ring_dev, block, np.int32(start))

    def _ring_window(self) -> np.ndarray:
        # .copy(): a plain slice would ALIAS the ring, retroactively mutating
        # stored att windows when the writer laps them (the reference's torch
        # slicing has that artifact, nerfasr.py:75-103 — it leaks future
        # audio into past windows, which training-time features never do)
        if self.front < self.tail:
            feat = self.feat_ring[self.front : self.tail].copy()
        else:
            feat = np.concatenate(
                [self.feat_ring[self.front :], self.feat_ring[: self.tail]]
            )
        n = self.feat_ring.shape[0]
        self.front = (self.front + 2) % n
        self.tail = (self.tail + 2) % n
        return feat.T  # [audio_dim, 16]

    def get_next_feat(self) -> np.ndarray:
        """[8, audio_dim, 16] attention stack (nerfasr.py:75-103)."""
        if self._host_ring_stale:
            raise RuntimeError(
                "host feature ring is stale: this NerfASR flushes features "
                "device-side (device_logits_fn) — use get_next_feat_device()")
        if self.att > 0:
            while len(self.att_feats) < 8:
                self.att_feats.append(self._ring_window())
            out = np.stack(self.att_feats)
            self.att_feats = self.att_feats[1:]
            return out
        return self._ring_window()[None]

    # ---- device-resident variant (TPU-native: the window never leaves HBM)

    def _ring_indices(self) -> np.ndarray:
        """Row indices the next _ring_window would read; advances the same
        front/tail counters (use ONE of the host/device paths per engine)."""
        nrows = self.feat_ring.shape[0]
        if self.front < self.tail:
            idx = np.arange(self.front, self.tail)
        else:
            idx = np.concatenate(
                [np.arange(self.front, nrows), np.arange(0, self.tail)])
        self.front = (self.front + 2) % nrows
        self.tail = (self.tail + 2) % nrows
        return idx.astype(np.int32)

    def get_next_feat_device(self) -> jnp.ndarray:
        """get_next_feat computed on device from the mirrored ring: only a
        [16] int index vector ships per window. Each window is SNAPSHOT on
        device at capture time (like the host att_feats list — later ring
        overwrites must not leak into already-captured windows). Returns a
        device [8, audio_dim, 16] array identical to the host stack."""
        if self._ring_dev is None:
            self._ring_dev = jax.device_put(jnp.asarray(self.feat_ring))
            zero = jnp.zeros((self.audio_dim, 16), jnp.float32)
            self._att_idx = [zero] * len(self.att_feats)  # device snapshots
            self._update_fn = jax.jit(
                lambda ring, block, s:
                jax.lax.dynamic_update_slice(ring, block, (s, jnp.int32(0))))
            left, ctx = self.stride_left_size, self.context_size
            self._flush_fn = jax.jit(
                lambda ring, logits, s: jax.lax.dynamic_update_slice(
                    ring,
                    jax.lax.dynamic_slice(
                        logits.astype(jnp.float32), (left, 0),
                        (ctx, ring.shape[1])),
                    (s, jnp.int32(0))))
            self._window_fn = jax.jit(
                lambda ring, idx: jnp.take(ring, idx, axis=0).T)
            self._stack_fn = jax.jit(lambda *ws: jnp.stack(ws))
        while len(self._att_idx) < 8:
            self._att_idx.append(
                self._window_fn(self._ring_dev,
                                jnp.asarray(self._ring_indices())))
        out = self._stack_fn(*self._att_idx)
        self._att_idx = self._att_idx[1:]
        return out

    def warm_up(self) -> None:
        for _ in range(self.warm_up_steps):
            self.run_step()


# audio-code EMA coefficient (reference renderer.py:190-194, lambda=0.35);
# shared by the plain path (make_enc_a_smoother) and the functionalized
# in-jit form in engines/nerf_pallas.frame_fn
ENC_A_EMA = 0.35


def smooth_enc_a_fn(prev, enc_a):
    """One EMA step — pure, usable under jit (prev may be a traced array)."""
    return ENC_A_EMA * prev + (1.0 - ENC_A_EMA) * enc_a


def make_enc_a_smoother(enabled: bool):
    """Per-pipeline audio-code EMA. Returns smooth(enc_a) holding its own
    state; identity when disabled."""
    state = {"enc_a": None}

    def smooth(enc_a):
        if not enabled:
            return enc_a
        prev = state["enc_a"]
        if prev is not None:
            enc_a = smooth_enc_a_fn(prev, enc_a)
        state["enc_a"] = enc_a
        return enc_a

    smooth.state = state
    return smooth


def make_nerf_render_step(network: NeRFNetwork, variables, dataset: NeRFTestDataset,
                          cfg: Config, baked: dict | None = None):
    """(pose, aud_window [8,A,16], eye [1,1], density grid, bg) → RGB u8.

    baked: optional baked triplane textures (ops/triplane_bake) — replaces
    the multi-level hash encode at inference (~12× fewer, wider gathers).

    With baked textures the frame runs as THREE chained device dispatches —
    plan (rays/probe/compaction) → encode (texture gathers) → shade
    (MLPs + composite). The split exists because XLA's layout assignment,
    given one big program, stores the texture channel-major and the row
    gather degrades ~10× (88 ms → 9 ms for a 512px frame's samples);
    as its own program the gather keeps the fast row layout. Intermediates
    stay on device, so the extra dispatch cost is ~0.1 ms."""
    from mere_fusion_tpu.ops.triplane_bake import encode_x_baked

    H, W = dataset.H, dataset.W
    intrinsics = dataset.intrinsics
    nerf_cfg = cfg.nerf
    variables = jax.device_put(variables)  # runtime input, not baked constant
    probe_block = (
        nerf_cfg.probe_block
        if nerf_cfg.probe_block > 0 and H % max(nerf_cfg.probe_block, 1) == 0
        and W % max(nerf_cfg.probe_block, 1) == 0 else 0
    )
    plan_kwargs = dict(
        bound=nerf_cfg.bound, grid_size=nerf_cfg.grid_size,
        n_candidates=nerf_cfg.n_candidates, n_steps=nerf_cfg.max_steps,
        max_active_rays=nerf_cfg.max_active_rays,
        probe_block=probe_block, image_hw=(H, W),
    )

    # head MLPs in bf16 at inference (same speedup as the Pallas path's
    # shade stage; sigma/color are cast back to f32 by the composite math)
    shade_net = (NeRFNetwork(network.cfg, dtype=jnp.bfloat16)
                 if nerf_cfg.shade_dtype == "bfloat16" else network)

    def make_apply_fn(variables, enc_a, ind, eye, baked_mode: bool):
        def apply_fn(pos, dirs, training):
            if baked_mode:
                out = shade_net.apply(
                    variables, pos, dirs, enc_a, ind, eye, training=training,
                    method=NeRFNetwork.forward_with_enc,
                )
            else:
                out = shade_net.apply(variables, pos, dirs, enc_a, ind, eye,
                                      training=training)
            return tuple(o.astype(jnp.float32) if o is not None else o
                         for o in out)
        return apply_fn

    def conditions(variables, auds):
        enc_a = network.apply(variables, auds, method=NeRFNetwork.encode_audio)
        ind = (
            network.apply(variables, 0, method=NeRFNetwork.individual_code)
            if network.cfg.individual_dim > 0
            else None
        )
        return enc_a, ind

    def background(variables, pose, bg_color):
        if not network.cfg.torso:
            return bg_color

        def torso_fn(x, p):
            c = (variables["params"]["individual_codes_torso"][:1]
                 if network.cfg.individual_dim_torso > 0 else None)
            return network.apply(variables, x, p, c,
                                 method=NeRFNetwork.forward_torso)

        bg, _ = render_torso_background(torso_fn, H, W, pose, bg_color)
        return bg

    if baked is None:
        @jax.jit
        def step(variables, pose, enc_a, ind, eye, density: DensityGrid,
                 bg_color):
            pose = jnp.asarray(pose)
            rays_o, rays_d = get_rays(pose, intrinsics, H, W)
            bg_color = background(variables, pose, bg_color)
            out = render_rays(
                make_apply_fn(variables, enc_a, ind, eye, False),
                rays_o, rays_d, density, bg_color=bg_color, **plan_kwargs,
            )
            img = jnp.clip(out["image"].reshape(H, W, 3), 0.0, 1.0)
            return (img * 255).astype(jnp.uint8)

        jit_cond_plain = jax.jit(conditions)
        smooth_plain = make_enc_a_smoother(nerf_cfg.smooth_lips)

        def plain_step(pose, auds, eye, density, bg):
            enc_a, ind = jit_cond_plain(variables, auds)
            enc_a = smooth_plain(enc_a)
            return step(variables, pose, enc_a, ind, eye, density, bg)

        return plain_step

    baked = jax.device_put(baked)

    @jax.jit
    def stage_plan(pose, density: DensityGrid):
        rays_o, rays_d = get_rays(jnp.asarray(pose), intrinsics, H, W)
        return plan_rays(rays_o, rays_d, density, **plan_kwargs)

    @jax.jit
    def stage_encode(baked, xyz):
        return encode_x_baked(baked, xyz.reshape(-1, 3), nerf_cfg.bound,
                              nerf_cfg.sample_mode)

    @jax.jit
    def stage_shade(variables, plan, enc_x, pose, enc_a, ind, eye, bg_color):
        bg_color = background(variables, jnp.asarray(pose), bg_color)
        out = shade(
            make_apply_fn(variables, enc_a, ind, eye, True),
            plan, bg_color, enc_x=enc_x, n_rays=H * W,
        )
        img = jnp.clip(out["image"].reshape(H, W, 3), 0.0, 1.0)
        return (img * 255).astype(jnp.uint8)

    jit_conditions = jax.jit(conditions)
    smooth_baked = make_enc_a_smoother(nerf_cfg.smooth_lips)
    smooth_state = smooth_baked.state  # introspectable for tests

    def step(pose, auds, eye, density, bg):
        plan = stage_plan(pose, density)
        enc_x = stage_encode(baked, plan["xyz"])
        enc_a, ind = jit_conditions(variables, auds)
        enc_a = smooth_baked(enc_a)
        return stage_shade(variables, plan, enc_x, pose, enc_a, ind, eye, bg)

    return step


class NeRFReal(BaseReal):
    def __init__(self, cfg: Config, network: NeRFNetwork | None = None,
                 variables=None, dataset: NeRFTestDataset | None = None,
                 density: DensityGrid | None = None,
                 logits_fn: Callable | None = None,
                 device_logits_fn: Callable | None = None,
                 fullbody_frames: Optional[list] = None,
                 fullbody_offset=(0, 0),
                 custom_opts: list[dict] | None = None,
                 bake_planes: bool = True,
                 device=None):
        super().__init__(cfg, custom_opts, device=device)
        with self.device_scope():
            self._init_device_state(
                cfg, network, variables, dataset, density, logits_fn,
                device_logits_fn, fullbody_frames, fullbody_offset,
                bake_planes,
            )
        # interactive free camera (the reference GUI's orbit viewer,
        # gui.py:12-69); None = follow the dataset's camera path
        self.orbit = None
        # frames until the next active/overflow gauge readback (see test_step)
        self._telemetry_countdown = 0

    def _init_device_state(self, cfg, network, variables, dataset, density,
                           logits_fn, device_logits_fn, fullbody_frames,
                           fullbody_offset, bake_planes):
        nc = cfg.nerf
        if network is None:
            network = NeRFNetwork(NeRFNetConfig(
                bound=nc.bound, audio_in_dim=nc.audio_in_dim,
                audio_dim=nc.audio_dim, exp_eye=nc.exp_eye,
                num_levels=nc.num_levels, base_resolution=nc.base_resolution,
                log2_hashmap_size=nc.log2_hashmap_size,
                desired_resolution=nc.desired_resolution, torso=nc.torso,
                level_dim=nc.level_dim,
            ))
        self.network = network
        if variables is None:
            variables = jax.jit(network.init, static_argnames="method")(
                jax.random.key(0),
                jnp.zeros((8, network.cfg.audio_in_dim, 16)),
                jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0),
                jnp.zeros((1, network.cfg.individual_dim)) if network.cfg.individual_dim else None,
                jnp.zeros((1, 1)),
                method=NeRFNetwork.full_init,
            )
        self.variables = variables
        if dataset is None:
            raise ValueError("NeRFReal requires a NeRFTestDataset")
        self.dataset = dataset
        self.loader = iter(dataset)
        # the background frame is static per dataset — upload it ONCE; a
        # naive per-frame jnp.asarray of the [H*W, 3] float background is a
        # ~3 MB host->device transfer per frame through the tunnel (~100 ms)
        self._bg_dev = jax.device_put(
            jnp.asarray(np.asarray(dataset.bg_img, np.float32).reshape(-1, 3))
        )
        self.density = density or DensityGrid.create(nc.grid_size)
        self.fullbody_frames = fullbody_frames
        self.fullbody_offset = fullbody_offset
        baked = None
        if bake_planes:
            from mere_fusion_tpu.ops.triplane_bake import bake_triplanes

            # 2× the finest hash level keeps the resample filtering mild
            baked = bake_triplanes(
                variables["params"], network.cfg.plane_spec, network.cfg.bound,
                resolution=min(1024, 2 * nc.desired_resolution),
                dtype=jnp.bfloat16 if nc.texture_dtype == "bfloat16" else None,
            )
        self._pallas_mode = bool(baked is not None
                                 and nc.sample_mode == "pallas")
        if self._pallas_mode:
            from mere_fusion_tpu.engines.nerf_pallas import (
                make_pallas_render_step,
            )

            self._render_step = make_pallas_render_step(
                network, variables, dataset, cfg, baked=baked
            )
            # Block on every budget-ladder variant's compile and prefill the
            # span cache for the whole pose track NOW: through the remote
            # compiler a lazy mid-stream compile stalls live video for
            # minutes, and the per-pose active-count readback (~25 ms RTT)
            # would otherwise land on every first visit of a pose during the
            # first lap of the track. Skipped off-TPU: the CPU path (tests,
            # dryrun) compiles cheaply and lazily.
            if jax.default_backend() == "tpu":
                self._render_step.warmup(self.density, self._bg_dev)
        else:
            self._render_step = make_nerf_render_step(
                network, variables, dataset, cfg, baked=baked
            )
        self.asr = NerfASR(cfg, self, logits_fn or fake_logits_fn(nc.audio_in_dim),
                           device_logits_fn=device_logits_fn)
        self.asr.warm_up()

    def set_orbit_camera(self, enable: bool = True):
        """Toggle the interactive orbit camera. Returns the OrbitCamera (or
        None when disabled); mutate it via orbit/scale/pan between frames."""
        if not enable:
            self.orbit = None
            return None
        if self.orbit is None:
            from mere_fusion_tpu.engines.orbit import OrbitCamera

            cam = OrbitCamera(self.dataset.W, self.dataset.H)
            # start from the dataset's current viewpoint
            cam.update_pose(np.asarray(self.dataset.poses[0]))
            self.orbit = cam
        return self.orbit

    def put_msg_txt(self, msg):
        self.tts.put_msg_txt(msg)

    def test_step(self, loop=None, audio_track=None, video_track=None):
        data = next(self.loader)
        if self.orbit is not None:
            # free camera: override the dataset pose; spans must be planned
            # fresh (pose-keyed cache entries are only valid for path poses).
            # data["index"] stays numeric so fullbody compositing keeps a
            # constant output frame size mid-stream.
            data = dict(data)
            data["pose"] = jnp.asarray(self.orbit.pose)
            data["span_key"] = None
        auds = (self.asr.get_next_feat_device()
                if self._pallas_mode and self.asr.att > 0
                else self.asr.get_next_feat())

        audio_frames = [self.asr.get_audio_out() for _ in range(2)]
        if self.asr.is_stale_silence(audio_frames):
            # speech is queued behind this pre-buffered idle output (e.g.
            # the ASR warm-up backlog): drop the frame + silent audio so
            # the first speech frame ships at queue-drain rate
            return False
        audiotypes = []
        for frame, ftype, _seq in audio_frames:
            audiotypes.append(ftype)
            chunk = AudioChunk.from_float(frame, self.sample_rate)
            track_put(loop, audio_track, chunk)
            self.record_audio_chunk(chunk)

        if (audiotypes[0] != 0 and audiotypes[1] != 0
                and self.custom_index.get(audiotypes[0]) is not None):
            atype = audiotypes[0]
            mirindex = self.mirror_index(
                len(self.custom_img_cycle[atype]), self.custom_index[atype]
            )
            image = self.custom_img_cycle[atype][mirindex]
            self.custom_index[atype] += 1
        else:
            if self.asr.speech_start_ts is not None and 0 in audiotypes:
                metrics.latency("nerf.first_frame").observe(
                    time.monotonic() - self.asr.speech_start_ts
                )
                self.asr.speech_start_ts = None
            t0 = time.perf_counter()
            if self._pallas_mode:
                rgb, n_active, n_overflow = self._render_step(
                    data["pose"], jnp.asarray(auds), jnp.asarray(data["eye"]),
                    self.density, self._bg_dev,
                    pose_key=data.get("span_key", data.get("index")),
                )
                rgb = np.asarray(rgb)
                # throttled: each int() is its own device->host round-trip
                # (~20-30 ms through the remote tunnel — more than the whole
                # 28 ms frame budget if paid every frame); 1 Hz telemetry is
                # plenty for a gauge
                self._telemetry_countdown -= 1
                if self._telemetry_countdown <= 0:
                    self._telemetry_countdown = self.fps
                    active = int(n_active)
                    metrics.gauge("nerf.active_tiles", active)
                    # overflow_jobs covers the BUDGETED tiles only (the
                    # planner never sees unselected ones). dropped_tiles is
                    # structurally 0 — the budget ladder escalates to full
                    # coverage — kept as a guard against regressions.
                    metrics.gauge("nerf.overflow_jobs", int(n_overflow))
                    metrics.gauge(
                        "nerf.dropped_tiles",
                        max(0, active - self._render_step.ladder_top))
            else:
                rgb = np.asarray(
                    self._render_step(
                        data["pose"], jnp.asarray(auds),
                        jnp.asarray(data["eye"]),
                        self.density, self._bg_dev,
                    )
                )
            metrics.latency("nerf.render").observe(time.perf_counter() - t0)
            metrics.rate("nerf.render_fps").tick()
            image = cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
            if self.fullbody_frames is not None and data["index"] is not None:
                full = self.fullbody_frames[data["index"] % len(self.fullbody_frames)].copy()
                ox, oy = self.fullbody_offset
                full[oy : oy + image.shape[0], ox : ox + image.shape[1]] = image
                image = full

        vf = VideoImage(image=image)
        track_put(loop, video_track, vf)
        self.record_video_frame(vf)
        return True

    def render(self, quit_event, loop=None, audio_track=None, video_track=None):
        self.init_customindex()
        self.tts.render(quit_event)
        with self.device_scope():  # ASR logits + frame render dispatch here
            while not quit_event.is_set():
                for _ in range(2):
                    self.asr.run_step()
                self.test_step(loop, audio_track, video_track)
                if video_track is not None and video_track._queue.qsize() >= self.cfg.avatar.max_track_queue:
                    time.sleep(0.04 * video_track._queue.qsize() * 0.8)


def load_nerf_checkpoint(cfg: Config):
    """Load serving weights named by cfg.nerf.ckpt.

    ``*.pth``: a reference Trainer checkpoint (ngp_kf.pth) converted on the
    fly (torch_convert.convert_ernerf + the morton density grid).
    Otherwise: an orbax checkpoint dir — either a converted tree written by
    tools/convert_ckpt or our own training workspace (NeRFTrainState, whose
    EMA params + density grid are used, like the reference's EMA-aware
    load_checkpoint, utils.py:1479-1538).

    Returns (variables, density_or_None).
    """
    path = cfg.nerf.ckpt
    nc = cfg.nerf
    if path.endswith(".pth"):
        from mere_fusion_tpu.utils.torch_convert import (
            convert_ernerf,
            density_from_ernerf,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(path)
        model_sd = ckpt.get("model", ckpt)
        variables = convert_ernerf(model_sd)
        density = (density_from_ernerf(
                       model_sd, nc.grid_size, nc.density_thresh,
                       mean_density=ckpt.get("mean_density"))
                   if "density_grid" in model_sd else None)
        return variables, density

    from mere_fusion_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(path)
    try:
        raw = ckpt.restore_raw()
    finally:
        ckpt.close()
    params, density = split_checkpoint_tree(raw)

    # restore_raw skips orbax's template shape check — validate the restored
    # tree against the serving config so mismatches fail loudly at load time
    spec = NeRFNetConfig(
        num_levels=nc.num_levels, level_dim=nc.level_dim,
        base_resolution=nc.base_resolution,
        log2_hashmap_size=nc.log2_hashmap_size,
        desired_resolution=nc.desired_resolution, bound=nc.bound,
    ).plane_spec
    got = tuple(np.asarray(params["plane_xy"]).shape)
    want = (spec.total_params, nc.level_dim)
    if got != want:
        raise ValueError(
            f"checkpoint hash tables are {got} but the serving config "
            f"expects {want} — pass the training run's --num_levels/"
            f"--base_resolution/--desired_resolution/--log2_hashmap_size "
            f"via the matching nerf.* fields"
        )
    aud_in = np.asarray(params["audio_net"]["conv_0"]["kernel"]).shape[1]
    if aud_in != nc.audio_in_dim:
        raise ValueError(
            f"checkpoint audio_in_dim {aud_in} != nerf.audio_in_dim "
            f"{nc.audio_in_dim}")
    if density is not None and int(np.asarray(density.grid).size) != nc.grid_size ** 3:
        raise ValueError(
            f"checkpoint density grid has {np.asarray(density.grid).size} "
            f"cells but nerf.grid_size={nc.grid_size} expects "
            f"{nc.grid_size ** 3}")
    return {"params": params}, density


def split_checkpoint_tree(raw):
    """(params, DensityGrid|None) from a template-free restored tree —
    either a NeRFTrainState workspace (EMA params are served, like the
    reference's EMA-aware load, utils.py:1479-1538) or a converted
    variables dir (tools/convert_ckpt)."""

    def as_density(d) -> DensityGrid:
        return DensityGrid(
            grid=jnp.asarray(d["grid"], jnp.float32),
            occupancy=jnp.asarray(d["occupancy"]),
            mean_density=jnp.asarray(d["mean_density"], jnp.float32),
        )

    if isinstance(raw, dict) and "ema_params" in raw:
        return raw["ema_params"], as_density(raw["density"])
    if isinstance(raw, dict) and "params" in raw:
        density = as_density(raw["density"]) if "density" in raw else None
        return raw["params"], density
    raise ValueError(
        f"unrecognized checkpoint layout: top-level "
        f"{list(raw) if isinstance(raw, dict) else type(raw)}"
    )
