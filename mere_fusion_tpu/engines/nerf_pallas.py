"""ER-NeRF inference pipeline built on the Pallas triplane sampler.

Replaces the XLA-gather texture path (engines/nerf.make_nerf_render_step)
with the windowed two-hot MXU sampler (ops/pallas_sampler) plus two design
changes measured to matter:

1. **Per-ray spans from a pose-keyed cache.** Block-shared occupancy probes
   (probe_block=8) cost ~7 dB PSNR on the synthetic learn-check scene —
   the block's center ray misses geometry the edge rays hit, and the span
   width sets the quadrature the trained density expects. Per-ray probing
   is exact but costs ~70 ms at 512² (8.4M occupancy gathers). Since the
   test-time pose track is a fixed loop (reference provider.py:276-283) and
   the density grid is static at inference, per-ray spans are computed once
   per pose and cached on device as f16 (~1.3 MB/pose: f16 span ends +
   ray validity; rays themselves are recomputed in-program from the pose —
   one small matmul — rather than pinning 6 MB/pose of f32 in HBM). The
   cache is keyed per pose and invalidated whenever a different occupancy
   buffer is passed (the only DensityGrid field spans depend on — wrapper
   rebuilds around the same arrays stay cached), so a density swap can
   never serve stale spans or a stale tile budget. `step.warmup(density, bg)`
   prefills the pose track up to `nerf.span_cache_poses` poses (the cap
   bounds construction time and pinned HBM on multi-thousand-frame tracks;
   over-cap poses render through the uncached full-budget path with no
   host sync) with a single batched count readback, and blocks on every
   budget-ladder variant's compile, so the live loop never pays a remote
   compile or a per-pose host sync (the lip-engine convention,
   engines/lip.py:152-156).

2. **Tile-level compaction.** Rays are reordered into 8×8 pixel tiles (a
   constant permutation); tiles whose probes hit nothing are dropped and
   the survivors compacted to a fixed budget, bounding the sampler and MLP
   work exactly like the reference's alive-ray compaction
   (ernerf/nerf_triplane/renderer.py:246-270) but at the granularity the
   kernel wants.

Samples that leave their texture window clamp to its edge; the planner
reports the overflow-job fraction through runtime metrics so the
degradation is observable rather than silent. Since tiles are compacted
BEFORE sample planning, n_overflow covers the budgeted tiles only. The
budget ladder extends up to FULL tile coverage: a pose whose active count
exceeds nerf.tile_budget escalates to a larger precompiled variant instead
of truncating, so every active tile always renders (matching the
reference, which marches every ray — renderer.py:229-271) and the
nerf.dropped_tiles metric is structurally zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.models.ernerf.network import NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import (
    DensityGrid,
    get_rays,
    intersect_aabb,
    render_torso_background,
    select_occupied_depths,
)
from mere_fusion_tpu.ops.encoders import sh_encode
from mere_fusion_tpu.ops.pallas_sampler import (
    SamplerSpec,
    from_tiles,
    pack_planes_major,
    plan_jobs_span,
    sample_shade_comp_tiles,
    to_tiles,
)


def ladder_rungs(budget: int, t: int) -> list[int]:
    """Precompiled tile-budget rungs for a frame of t total tiles.

    Down-ladder: from `budget` in ~25-33% steps (each halving plus its 3/4
    intermediate) to a floor of budget/16 — a typical talking-head pose
    occupies a small fraction of the worst-case tile count (bench sparse
    scenario: 66 of 2048 tiles at 512²), and a coarse floor wastes most of
    the smallest variant's sampler+shade work on empty tiles (the round-4
    sparse regression: a 256-tile floor rendered 4× the active rays).
    Up-ladder: doubling to FULL coverage, so an over-budget pose escalates
    instead of truncating (the reference marches every ray,
    ernerf/nerf_triplane/renderer.py:229-271)."""
    floor = max(1, budget // 16)
    rungs = {budget}
    b = budget
    while b > floor:
        rungs.add(max(1, 3 * b // 4))
        b = max(1, b // 2)
        rungs.add(b)
    b_up = budget
    while b_up < t:
        b_up = min(2 * b_up, t)
        rungs.add(b_up)
    return sorted(r for r in rungs if r <= t)


def _expand_enc_rows(w, spec: SamplerSpec, dtype):
    """Lift a [3·C, n] weight block onto the kernel's padded plane-minor
    feature basis [3·CP, n]: row p·C + c moves to p·cp + c, pad rows are
    zero. Exact (a pure row permutation), so feats·W' == enc_x·W while the
    [N, 3C] enc_x tensor never materializes."""
    c, cp = spec.channels, spec.cp
    idx = np.concatenate([np.arange(c) + p * cp for p in range(3)])
    out = jnp.zeros((3 * cp, w.shape[-1]), dtype)
    return out.at[jnp.asarray(idx)].set(w.astype(dtype))


def shade_weights(params, spec: SamplerSpec, enc_a, ind, eye, dtype) -> dict:
    """Pack the NeRF head weights into the fused sample+shade kernel's
    operand layout (ops.pallas_sampler.SHADE_WEIGHTS).

    Per-frame conditions are folded into the operands so the kernel sees
    only matmul weights: enc_a into w_aud_sig (enc_w @ W == aud_ch @
    (diag(enc_a) W)), the eye scalar into w_sig_e, the individual code into
    col_bias. First-layer concats of forward_with_enc
    (models/ernerf/network.py:231-247) become matmul adds — exact up to fp
    summation order. Enc-consuming weights are lifted onto the padded
    plane-minor 3·cp basis (_expand_enc_rows), so the sampler's register
    rows feed the MXU directly."""
    c3 = 3 * spec.channels
    kern = lambda net, i: params[net][f"net_{i}"]["kernel"]
    sw0 = kern("sigma_net", 0)
    adim = enc_a.shape[-1]
    hid = sw0.shape[1]
    w = {
        "wx_aud": _expand_enc_rows(kern("aud_ch_att_net", 0), spec, dtype),
        "w_aud1": kern("aud_ch_att_net", 1).astype(dtype),
        "wx_sig": _expand_enc_rows(sw0[:c3], spec, dtype),
        "w_aud_sig": (enc_a[0][:, None] * sw0[c3:c3 + adim]).astype(dtype),
        "wx_eye": _expand_enc_rows(kern("eye_att_net", 0), spec, dtype),
        "w_eye1": jnp.zeros((16, 8), dtype)
                  .at[:, :1].set(kern("eye_att_net", 1).astype(dtype)),
        "w_sig1": kern("sigma_net", 1).astype(dtype),
    }
    if eye is not None and sw0.shape[0] > c3 + adim:
        se = eye[0, 0] * sw0[c3 + adim]
    else:
        se = jnp.zeros((hid,), sw0.dtype)
    w["w_sig_e"] = jnp.zeros((8, hid), dtype).at[0].set(se.astype(dtype))
    s2 = kern("sigma_net", 2)                      # [hid, 1 + geo]
    w["w_sigcol"] = (jnp.zeros((hid, 16), dtype)
                     .at[:, 0].set(s2[:, 0].astype(dtype)))
    w["w_geo"] = s2[:, 1:65].astype(dtype)
    cw0 = kern("color_net", 0)                     # [16 + 64 (+ di), hid]
    w["w_col_g"] = cw0[16:80].astype(dtype)
    w["w_rgb"] = (jnp.zeros((64, 16), dtype)
                  .at[:, 1:4].set(kern("color_net", 1).astype(dtype)))
    if ind is not None and cw0.shape[0] > 80:
        cb = (ind.astype(cw0.dtype) @ cw0[80:])[0]
    else:
        cb = jnp.zeros((cw0.shape[1],), cw0.dtype)
    w["col_bias"] = jnp.zeros((8, cw0.shape[1]), dtype
                              ).at[0].set(cb.astype(dtype))
    return w


def _composite_grouped(sigma, color, dt_r, valid_g, bg_rays,
                       t_threshold: float = 1e-4):
    """renderer.composite with the depth axis split (kg, ks) so it runs in
    the kernel's group-major layout — the [N, k]/[N, k, 3] ray-major
    transposes (≈8 ms at dense 512²) never happen. Same per-sample math:
    within-group exclusive transmittance × exclusive product of whole-group
    transmittances = the flat exclusive cumprod, up to fp regrouping.
    The engine's hot path now composites inside the Pallas kernel
    (ops.pallas_sampler._shade_comp_kernel); this XLA twin remains the
    equivalence reference for tests.

    sigma/valid_g [B, kg, rpt, ks], color [..., 3], dt_r [B, rpt],
    bg_rays [B, rpt, 3] → (image [B, rpt, 3], weights_sum [B, rpt])."""
    alpha = 1.0 - jnp.exp(-sigma * dt_r[:, None, :, None])
    alpha = jnp.where(valid_g, alpha, 0.0)
    am = 1.0 - alpha + 1e-10
    cg = jnp.cumprod(am, axis=-1)                   # within-group inclusive
    tau = cg[..., -1]                               # [B, kg, rpt]
    cg_ex = jnp.concatenate([jnp.ones_like(cg[..., :1]), cg[..., :-1]], -1)
    tg = jnp.cumprod(tau, axis=1)
    tg_ex = jnp.concatenate([jnp.ones_like(tg[:, :1]), tg[:, :-1]], axis=1)
    trans = tg_ex[..., None] * cg_ex                # [B, kg, rpt, ks]
    weights = jnp.where(trans > t_threshold, alpha * trans, 0.0)
    ws = weights.sum(axis=(1, 3))                   # [B, rpt]
    image = ((weights[..., None] * color).sum(axis=(1, 3))
             + (1.0 - ws)[..., None] * bg_rays)
    return image, ws


def make_pallas_render_step(network: NeRFNetwork, variables, dataset,
                            cfg: Config, baked: dict,
                            interpret: bool | None = None):
    """step(pose, auds, eye, density, bg, pose_key=None) → RGB u8 [H, W, 3].

    pose_key: hashable id of the pose (dataset frame index) for the span
    cache; None disables caching (spans recomputed per call).
    interpret: run the kernel in the Pallas interpreter (auto-enabled off
    TPU so the pipeline stays testable on the CPU mesh)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = dataset.H, dataset.W
    intrinsics = dataset.intrinsics
    nc = cfg.nerf
    k = nc.max_steps
    res = int(round(next(iter(baked.values())).shape[0] ** 0.5)) \
        if next(iter(baked.values())).ndim == 2 \
        else next(iter(baked.values())).shape[0]
    channels = network.cfg.num_levels * network.cfg.plane_spec.level_dim
    # 16×8 tiles halve the kernel's grid-step count (measured 40→36 ms on
    # the dense 512² job set); fall back to 8 when the frame doesn't tile
    tw = nc.pallas_tile_w if W % nc.pallas_tile_w == 0 else 8
    th = nc.pallas_tile_h if H % nc.pallas_tile_h == 0 else 8
    spec = SamplerSpec(resolution=res, channels=channels,
                       tile_w=tw, tile_h=th, k=k, kg=nc.pallas_depth_groups,
                       wu=nc.pallas_window_u, wv=nc.pallas_window_v)
    rpt = spec.rays_per_tile
    n = H * W
    t = n // rpt
    budget = min(nc.tile_budget, t)
    bound = nc.bound

    tile = lambda x: to_tiles(x, H, W, spec.tile_w, spec.tile_h)
    untile = lambda x: from_tiles(x, H, W, spec.tile_w, spec.tile_h)
    variables = jax.device_put(variables)
    planes_major = jax.jit(
        lambda b: pack_planes_major(b, spec)
    )(jax.device_put(baked))

    @jax.jit
    def span_fn(pose, density: DensityGrid):
        """Everything that depends only on (pose, density): per-ray spans,
        validity, and the active-tile count (drives the adaptive budget
        pick). Only the f16 span ends + bool validity are cached — rays are
        one cheap matmul recomputed inside the frame program."""
        rays_o, rays_d = get_rays(jnp.asarray(pose), intrinsics, H, W)
        near, far, ray_valid = intersect_aabb(rays_o, rays_d, bound)
        z, dt, valid = select_occupied_depths(
            rays_o, rays_d, near, far, density, bound, nc.grid_size,
            nc.n_candidates, 2,      # only the span ends are needed
        )
        zmin, zmax = z[:, 0], z[:, -1]
        tile_valid = valid.any(-1) & ray_valid
        va = tile(tile_valid)
        sp = tile(jnp.stack([zmin, zmax], -1).astype(jnp.float16))
        n_active = va.any(axis=1).sum()
        return sp, va, n_active

    from mere_fusion_tpu.engines.nerf import (
        make_enc_a_smoother,
        smooth_enc_a_fn,
    )

    smooth_enabled = bool(getattr(nc, "smooth_lips", False))
    smooth_enc_a = make_enc_a_smoother(smooth_enabled)
    smooth_state = smooth_enc_a.state  # introspectable for tests

    # head MLPs in bf16 at inference (sigma/color are 64-wide matmuls; the
    # fp32 path is identical math at ~2x the MXU cost)
    shade_dtype = (jnp.bfloat16 if nc.shade_dtype == "bfloat16"
                   else jnp.float32)

    # ONE jitted program per frame: plan + Pallas encode + audio conditions
    # (with the EMA smoothing functionalized) + shade + composite. Through
    # the remote-device tunnel every extra dispatch costs host round-trip
    # and transfer latency, so the whole frame ships as a single executable.
    #
    # Compiled per tile budget: sampler + shade cost scales ~linearly with
    # the budget, and a typical talking-head pose occupies well under the
    # worst-case tile count — the step picks the smallest precompiled budget
    # that covers the pose's cached active-tile count (static shapes: a
    # small ladder of variants, not dynamic sizes).
    def make_frame_fn(budget):
      @jax.jit
      def frame_fn(variables, planes_major, pose, sp, va, auds,
                   eye, bg_color, prev_enc_a, have_prev):
        # ---- rays from the pose (constant origin + one [H*W, 3] rotate;
        # trivially fused into this single program, so only the probe-derived
        # spans need caching)
        rays_o, rays_d = get_rays(jnp.asarray(pose), intrinsics, H, W)
        o_t, d_t = tile(rays_o), tile(rays_d)
        # ---- audio conditions (+ reference renderer.py:190-194 EMA)
        enc_a = network.apply(variables, auds, method=NeRFNetwork.encode_audio)
        if smooth_enabled:
            enc_a = jnp.where(have_prev, smooth_enc_a_fn(prev_enc_a, enc_a),
                              enc_a)
        ind = (
            network.apply(variables, 0, method=NeRFNetwork.individual_code)
            if network.cfg.individual_dim > 0 else None
        )

        # ---- plan: compact tiles FIRST (active = any valid ray — knowable
        # before any sample math), then build positions/jobs for only the
        # budgeted tiles: 4x less planning VPU work at full occupancy.
        # o_t/d_t/sp/va arrive tiled from the pose cache (span_fn).
        # At full coverage (budget == t) compaction is the identity — skip
        # the top_k sort and keep raster tile order.
        sp = sp.astype(jnp.float32)
        active = va.any(axis=1)                            # [T]
        n_active = active.sum()

        # at full coverage compaction is the identity: elide the gathers
        # and the scatter-back entirely (sel=arange still lowers to real
        # [T, rpt, ·] gathers plus a full-frame scatter — several ms)
        full = budget == t
        if full:
            sel = None
            va_s, sp_s, act_s = va, sp, active
        else:
            _, sel = jax.lax.top_k(active.astype(jnp.int32), budget)
            va_s, sp_s, act_s = va[sel], sp[sel], active[sel]
        # per-ray spans; an invalid ray carries a zero span so the kernel
        # derives dt = 0 for it (α = 0, no attenuation)
        zmin = sp_s[..., 0]
        span = (sp_s[..., 1] - sp_s[..., 0]) * va_s.astype(jnp.float32)
        zmax = zmin + span
        o_s, d_s = (o_t, d_t) if full else (o_t[sel], d_t[sel])  # [B,rpt,3]
        scalars, uv, overflow = plan_jobs_span(o_s, d_s, zmin, zmax, va_s,
                                               spec, bound)
        n_overflow = (overflow & act_s[:, None]).sum()

        # ---- encode + shade + composite: ONE fused Pallas kernel — the
        # triplane features, MLP activations, and σ/rgb all live and die in
        # VMEM registers, and only per-ray integrals leave the kernel. (The
        # XLA formulation spilled ~10 GB/frame of [4.2M, ≤64] activations
        # at dense 512²; even the per-sample kernel tensors cost ~4 ms of
        # HBM round-trips.) plan_jobs_span feeds it window origins from
        # per-ray endpoint math and a fused-emit uv payload — the
        # alternative fully-in-kernel uv synthesis (render_rays_tiles)
        # measured 3 ms SLOWER at dense 512²: the per-window synthesis ops
        # in lane-padded narrow registers cost more than the uv DMA they
        # save. Per-frame conditions enter as folded weight operands;
        # per-ray dt·valid rides the dtv side input.
        sh_ray = sh_encode(d_s.reshape(-1, 3), 4).reshape(budget, rpt, 16)
        cw0 = variables["params"]["color_net"]["net_0"]["kernel"]
        dproj = (sh_ray.astype(shade_dtype)
                 @ cw0[:16].astype(shade_dtype))           # [B, rpt, 64]
        dtv = jnp.pad((span / k)[..., None], ((0, 0), (0, 0), (0, 7)))
        weights = shade_weights(variables["params"], spec, enc_a, ind,
                                eye, shade_dtype)
        sr = sample_shade_comp_tiles(
            planes_major, scalars.reshape(-1),
            uv.reshape(budget * 3, spec.kg, 2, spec.sg),
            dproj, dtv, weights, spec, interpret=interpret,
        )                                                  # [B, rpt, 16]
        ws = sr[..., 0]                                    # Σ weights
        rgb_acc = sr[..., 1:4]                             # Σ weight·rgb

        # ---- background mix + scatter. When the torso net is configured
        # the torso-composited background arrives PRECOMPUTED in bg_color
        # ([n, 3], from the pose-keyed torso cache or torso_bg_fn): at
        # inference the torso pass is a pure function of (pose, bg) —
        # renderer.py:294-352 conditions it on nothing per-frame but the
        # head pose — and computing its 262k-pixel deform+color MLPs +
        # 2-D hash encode in-frame costs ~126 ms at 512², 3× the whole
        # head render.
        bg_t = tile(jnp.broadcast_to(bg_color, (n, 3)).astype(jnp.float32))
        image = rgb_acc + (1.0 - ws)[..., None] * (bg_t if full
                                                   else bg_t[sel])
        # scatter compacted tiles back over a background-filled frame
        # (identity at full coverage)
        img_t = image if full else bg_t.at[sel].set(image)
        img = jnp.clip(untile(img_t).reshape(H, W, 3), 0.0, 1.0)
        img = (img * 255).astype(jnp.uint8)
        return img, enc_a, n_active, n_overflow

      return frame_fn

    # The ladder spans from budget/16 up to FULL tile coverage (t): a pose
    # whose active count exceeds nerf.tile_budget escalates to a larger
    # precompiled variant instead of truncating — every ray always renders,
    # matching the reference (ernerf/nerf_triplane/renderer.py:229-271,
    # which marches every ray regardless of occupancy). nerf.tile_budget is
    # therefore a *ladder shape* hint, not a coverage cap. See budget_ladder
    # for the rung geometry.
    budget_ladder = ladder_rungs(budget, t)
    frame_fns: dict = {}  # budget → compiled variant

    span_cache: dict = {}
    # spans are valid only for the occupancy bitfield they were probed
    # against; a swapped grid (new checkpoint, bench scenario change) must
    # never serve stale spans or a stale, possibly-truncating tile budget.
    # Keyed on the occupancy *buffer* (the only DensityGrid field spans
    # depend on), so rebuilding the NamedTuple wrapper around the same
    # arrays each frame does not degrade into per-frame cache clears +
    # blocking span probes.
    cache_state: dict = {"occ": None}
    enc_a_shape = jax.eval_shape(
        lambda a: network.apply(variables, a, method=NeRFNetwork.encode_audio),
        jnp.zeros((8, network.cfg.audio_in_dim, 16)),
    )

    # bound the cache: warmup prefill time and pinned HBM scale linearly
    # with the pose-track length (~1.3 MB + one probe per pose at 512²), so
    # a multi-thousand-frame track must not stall construction for minutes
    # or pin gigabytes. Poses beyond the cap take the uncached full-budget
    # path below (spans recomputed in-program, no host sync) — with a
    # sequentially looped track, keeping the first N beats LRU (which would
    # evict every entry exactly before its next use).
    cache_cap = nc.span_cache_poses if nc.span_cache_poses > 0 else None

    # ---- torso background: pose-keyed cache --------------------------------
    # At inference the torso pass depends ONLY on (pose, bg): the reference
    # evaluates its 2-D deform+color nets per frame conditioned on the head
    # pose alone (renderer.py:294-352; the torso individual code is pinned
    # to frame 0 at test time, renderer.py:300). On a fixed pose track the
    # composite is therefore computed once per pose at warmup (exact, full
    # resolution) and cached as bf16 [H·W, 3] (~1.5 MB/pose at 512², under
    # the same span_cache_poses cap) — per-frame cost one HBM read instead
    # of ~126 ms of narrow-MLP + 2-D-hash-gather work. Uncached poses
    # (orbit camera, over-cap tracks) compute it live.
    torso_cache: dict = {}
    torso_state: dict = {"bg": None}
    if network.cfg.torso:
        @jax.jit
        def torso_bg_fn(variables, pose, bg_color):
            def torso_fn(x, p):
                c = (variables["params"]["individual_codes_torso"][:1]
                     if network.cfg.individual_dim_torso > 0 else None)
                return network.apply(variables, x, p, c,
                                     method=NeRFNetwork.forward_torso)

            bg2, _ = render_torso_background(
                torso_fn, H, W, jnp.asarray(pose), bg_color)
            return bg2.astype(jnp.bfloat16)
    else:
        torso_bg_fn = None

    def effective_bg(pose, bg, pose_key):
        """The background the head render composites over: bg itself, or
        the (cached) torso composite when the torso net is configured."""
        if torso_bg_fn is None:
            return bg
        if bg is not torso_state["bg"]:
            torso_cache.clear()
            torso_state["bg"] = bg
        if pose_key is not None:
            hit = torso_cache.get(pose_key)
            if hit is not None:
                return hit
            out = torso_bg_fn(variables, pose, bg)
            if cache_cap is None or len(torso_cache) < cache_cap:
                torso_cache[pose_key] = out
            return out
        return torso_bg_fn(variables, pose, bg)

    def step(pose, auds, eye, density, bg, pose_key=None):
        if density.occupancy is not cache_state["occ"]:
            span_cache.clear()
            cache_state["occ"] = density.occupancy
        active_host = None
        if pose_key is not None:
            hit = span_cache.get(pose_key)
            if hit is not None:
                sp, va, active_host = hit
            elif cache_cap is None or len(span_cache) < cache_cap:
                sp, va, n_active_dev = span_fn(pose, density)
                # one int readback per pose — paid only for poses warmup
                # didn't prefill (e.g. after a live density swap)
                active_host = int(n_active_dev)
                span_cache[pose_key] = (sp, va, active_host)
            else:
                # cache at capacity: render like an uncached pose — no
                # insert, no readback, full coverage
                sp, va, _ = span_fn(pose, density)
        else:
            # uncached path (free orbit camera): no readback; the active
            # count is unknown, so render at full coverage (correctness
            # over speed — truncation is never an option)
            sp, va, _ = span_fn(pose, density)
        b = (t if active_host is None
             else next((c for c in budget_ladder if c >= active_host), t))
        fn = frame_fns.get(b)
        if fn is None:
            fn = frame_fns[b] = make_frame_fn(b)
        prev = smooth_enc_a.state["enc_a"]
        have_prev = prev is not None
        if not have_prev:
            prev = jnp.zeros(enc_a_shape.shape, enc_a_shape.dtype)
        img, enc_a, n_active, n_overflow = fn(
            variables, planes_major, pose, sp, va,
            jnp.asarray(auds), jnp.asarray(eye),
            jnp.asarray(effective_bg(pose, bg, pose_key)), prev,
            jnp.asarray(have_prev),
        )
        if smooth_enabled:
            smooth_enc_a.state["enc_a"] = enc_a
        return img, n_active, n_overflow

    def warmup(density, bg):
        """Prefill the span cache (and, with the torso net configured, the
        torso-background cache) for the dataset's pose track — up to
        nerf.span_cache_poses poses (one batched count readback) — and block
        on every budget-ladder variant's compile, so the live render loop
        never stalls on the remote compiler mid-stream or syncs the host per
        pose. Call at engine construction (engines/lip.py:152-156 is the
        convention).

        Drops the whole caches first: entries under non-track pose keys
        (orbit snapshots, bench scenarios) may have been probed against an
        older occupancy grid, and prefilling without clearing would let
        them survive behind the refreshed cache_state marker."""
        span_cache.clear()
        torso_cache.clear()
        track = (dataset.poses if cache_cap is None
                 else dataset.poses[:cache_cap])
        outs = [span_fn(jnp.asarray(p), density) for p in track]
        counts = np.asarray(jnp.stack([o[2] for o in outs]))
        for i, (sp, va, _) in enumerate(outs):
            span_cache[i] = (sp, va, int(counts[i]))
        cache_state["occ"] = density.occupancy
        if torso_bg_fn is not None:
            torso_state["bg"] = bg
            for i, p in enumerate(track):
                torso_cache[i] = torso_bg_fn(variables, jnp.asarray(p),
                                             jnp.asarray(bg))
        sp0, va0, _ = span_cache[0]
        auds0 = jnp.zeros((8, network.cfg.audio_in_dim, 16))
        prev0 = jnp.zeros(enc_a_shape.shape, enc_a_shape.dtype)
        bg0 = jnp.asarray(torso_cache[0] if torso_bg_fn is not None else bg)
        for b in budget_ladder:
            if b not in frame_fns:
                frame_fns[b] = make_frame_fn(b)
            img, *_ = frame_fns[b](
                variables, planes_major, jnp.asarray(dataset.poses[0]),
                sp0, va0, auds0, jnp.zeros((1, 1)), bg0, prev0,
                jnp.asarray(False),
            )
        np.asarray(img)  # drain the warmup executions

    step.warmup = warmup
    step.ladder = tuple(budget_ladder)
    step.ladder_top = t           # full coverage: no frame can drop tiles
    return step
