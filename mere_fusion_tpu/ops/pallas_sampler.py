"""Pallas TPU kernel: windowed two-hot bilinear triplane sampling.

The ER-NeRF inference hot loop needs ~4M bilinear texture samples per 512px
frame. XLA lowers texture lookups to gather, which on TPU runs at a fixed
~10 ns/row regardless of layout (measured; it is the frame bottleneck at
30-90 ms). This kernel replaces the gather with MXU math, exploiting ray
coherence (reference: the CUDA kernels in ernerf/raymarching &
ernerf/gridencoder solve the same problem with warp-level gathers):

- Rays are processed in pixel tiles; along a ray, samples are split into
  contiguous depth groups. All samples of one (tile, depth-group) land in a
  small texture window.
- A job = (pixel tile, plane). Per depth group the kernel DMAs the window
  [WU, WV*CP] from HBM into VMEM (double-buffered) and evaluates

      out[s, c] = sum_u sum_v tu[s,u] * tv[s,v] * win[u, v*CP + c]
                = ((tu @ win) * tvc) @ G

  where tu/tvc are bilinear "two-hot" tent weights (max(0, 1-|lane-coord|))
  and G[x, c] = (x % CP == c) is a constant channel-regrouping matmul —
  i.e. the bilinear gather becomes two matmuls and one elementwise multiply,
  entirely reshape-free (Mosaic cannot reshape on non-128 minors).

- Planes are stored contract-major [R_u, R_v * CP] with channels padded to
  CP=16 so window origins only need (u % 8, v % 8) alignment
  (v*CP % 128 == 0). Out-of-window samples clamp to the window edge; the
  host-side planner sizes windows from per-ray spans so overflow is rare
  and reported (see plan_jobs).

Throughput: ~1.5-3 ns per plane-sample (vs ~10 ns XLA gather), exact
bilinear filtering.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class SamplerSpec:
    resolution: int          # plane texture resolution R
    channels: int            # real feature channels C (e.g. 12)
    tile_w: int = 8          # pixels per tile, x
    tile_h: int = 8          # pixels per tile, y
    k: int = 16              # samples per ray
    kg: int = 4              # depth groups per ray (k % kg == 0)
    wu: int = 64             # window extent along the contract axis
    wv: int = 32             # window extent along the lateral axis
    levels: int = 5          # mip levels (level 0 = full resolution)
    ahead: int = 2           # DMA prefetch depth, in tile steps (3·kg windows
                             # each; 2 measured equal to 3 at dense 512²)
    tent_bf16: bool = False  # run the per-window accumulate chain (m1·tvc,
                             # lane fold) in bf16. MEASURED A LOSS on v5e
                             # (37.20→38.86 ms dense 512² job set): the VPU
                             # executes bf16 elementwise at the same rate as
                             # f32 (32-bit lanes), so the f32→bf16 casts are
                             # pure overhead. Kept as a knob because the
                             # numerics are validated (≤1e-3 rel) and other
                             # TPU generations pack bf16 2×.

    @property
    def cp(self) -> int:     # padded channels: v*cp must tile to 128 lanes
        return 16

    @property
    def rays_per_tile(self) -> int:
        return self.tile_w * self.tile_h

    @property
    def sg(self) -> int:     # samples per depth group within a job
        return self.rays_per_tile * (self.k // self.kg)

    @property
    def mip_rows(self) -> tuple:
        """Row offset of each mip level in the packed plane (mips stacked
        along the contract axis, all at the level-0 lane width)."""
        offs, off = [], 0
        for lvl in range(self.levels):
            offs.append(off)
            off += max(self.resolution >> lvl, self.wu)
        return tuple(offs + [off])


def pack_planes_major(planes: dict, spec: SamplerSpec) -> jax.Array:
    """Stack baked planes [R, R, C] into the kernel layout
    [3, sum_mip_rows, R_v*CP] with a mip pyramid along the contract axis.

    Contract axes: xy plane contracts x, yz and xz contract z — the long
    (depth) axis of the window always rides the MXU contraction.
    Input dict arrays are indexed [axis0, axis1, C] with axis order (x, y)
    for plane_xy, (y, z) for plane_yz, (x, z) for plane_xz (the
    ops.triplane_bake convention: sample_plane(uv) with uv = (axis0, axis1)
    and storage [axis1, axis0, C]).

    Mips: level l is a 2^l× average-pooled copy occupying rows
    [mip_rows[l], mip_rows[l]+R/2^l) at lanes [0, (R/2^l)*CP). The planner
    drops to the coarsest level whose window covers a depth group's
    footprint, so wide spans filter down instead of clamping wrong."""
    r, cp, c = spec.resolution, spec.cp, spec.channels

    def prep(p, transpose: bool):
        # p: [R(v-axis), R(u-axis), C] per triplane_bake's [row=second coord,
        # col=first coord] storage; we want [R_u, R_v, CP]
        if p.ndim == 2:
            p = p.reshape(r, r, -1)
        p = p.astype(jnp.bfloat16)
        if transpose:
            p = jnp.transpose(p, (1, 0, 2))
        pad = jnp.zeros((r, r, cp - c), jnp.bfloat16)
        base = jnp.concatenate([p, pad], axis=-1)      # [R, R, CP] level 0
        rows = spec.mip_rows
        total = rows[-1]
        out = jnp.zeros((total, r * cp), jnp.bfloat16)
        level = base
        for lvl in range(spec.levels):
            rl = level.shape[0]
            out = jax.lax.dynamic_update_slice(
                out, level.reshape(rl, rl * cp), (rows[lvl], 0)
            )
            if lvl + 1 < spec.levels:
                level = (
                    level.reshape(rl // 2, 2, rl // 2, 2, cp)
                    .astype(jnp.float32).mean(axis=(1, 3))
                ).astype(jnp.bfloat16)
        return out

    # triplane_bake stores plane arrays as [row=coord1, col=coord0, C] and
    # samples with uv=(coord0, coord1):
    #   plane_xy: uv=(x, y)  → storage [y, x, C]
    #   plane_yz: uv=(y, z)  → storage [z, y, C]
    #   plane_xz: uv=(x, z)  → storage [z, x, C]
    # kernel wants [u=contract, v=lateral]: xy contracts x → [x, y*CP]
    # (transpose); yz contracts z → [z, y*CP] (no transpose); xz contracts
    # z → [z, x*CP] (no transpose).
    stacked = jnp.stack([
        prep(planes["plane_xy"], True),
        prep(planes["plane_yz"], False),
        prep(planes["plane_xz"], False),
    ])
    return stacked


def _window_machinery(spec: SamplerSpec, jobs_ref, planes_ref, win, sem,
                      pgs: int = 2):
    """Shared core of the sampler kernels: windowed two-hot accumulation.

    DMA pipelining: each (job, group) window is a small (~64 KB) HBM→VMEM
    copy whose wire latency exceeds the group's matmul time, so a 2-deep
    pipeline serializes on DMA latency. Windows are therefore prefetched
    `spec.ahead` STEPS ahead (ahead·3·kg copies in flight) into a rotating
    slot ring: triple (step, q, g) lives in slot
    (step % ahead)·3·kg + q·kg + g, is waited right before its matmul, and
    its slot is re-armed with the matching window `ahead` steps out —
    keeping the DMA engine continuously queued.

    pgs: scalars per (job, group) in the SMEM job table; the first two are
    always (ou, ov). The classic planner emits 2, the rays planner 4
    (+lvl, +mip_base).

    Returns (prefetch, group_acc): prefetch(ni) arms the first `ahead`
    steps' copies; group_acc(uv_fn, i, ni, g) waits/re-arms group g's
    three plane windows and returns its PLANE-MINOR feature rows
    [sg, 3·cp] f32 — plane q's channels land at lane offset q·cp via the
    per-plane selector matmul, so the per-sample triplane concat exists in
    registers and never needs a relayout. uv_fn(q, g, base) must return
    the job's texel coords as [sg, 1] f32 (u absolute in the mip stack,
    v mip-local)."""
    wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
    ahead = spec.ahead
    stride = 1 + pgs * kg   # per-job scalars: plane, kg*(ou, ov, ...)

    def copy(step, q, g, slot):
        base = (step * 3 + q) * stride
        p = jobs_ref[base]
        ou = pl.multiple_of(jobs_ref[base + 1 + pgs * g], 8)
        ov = pl.multiple_of(jobs_ref[base + 1 + pgs * g + 1], 8)
        return pltpu.make_async_copy(
            planes_ref.at[p, pl.ds(ou, wu),
                          pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
            win.at[slot], sem.at[slot],
        )

    def prefetch(ni):
        for a in range(ahead):                   # static unroll
            @pl.when(a < ni)
            def _(a=a):
                for q in range(3):
                    for g in range(kg):
                        copy(a, q, g, (a * 3 + q) * kg + g).start()

    # loop-invariant tent lattices. acc_t: the dtype of the per-window
    # accumulate chain (tvc tent, m1·tvc, lane fold) — bf16 when
    # spec.tent_bf16 (the default; the shade MLPs consume bf16 features, so
    # f32 here bought no end precision while costing ~2× the VPU passes).
    # Coordinates stay exact: vx holds integers ≤ wv (bf16-exact to 256),
    # and the tent value max(0, 1-|d|) rounds at ~2^-8 relative — the same
    # order as the bf16 plane storage itself.
    acc_t = jnp.bfloat16 if spec.tent_bf16 else jnp.float32
    uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1).astype(jnp.float32)
    # the tent ARGUMENT stays f32 (bf16 ulp at v≈31 is 0.125 — casting the
    # coordinate, not the tent value, would skew weights by up to 12%);
    # only the in-[0,1] tent value is cast to acc_t (≤2⁻⁹ rounding)
    vx = (jax.lax.broadcasted_iota(jnp.int32, (sg, wv * cp), 1) // cp
          ).astype(jnp.float32)
    # per-plane channel selectors: G_q[x, q·cp + c] = (x % cp == c) — one
    # matmul per plane finishes the v-regroup AND places the plane's
    # channels at its lane offset in the [sg, 3·cp] output row
    fold_to = min(128, wv * cp)
    gx = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 0) % cp
    gc = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 1)
    gsels = [(gx + q * cp == gc).astype(acc_t) for q in range(3)]

    def group_acc(uv_fn, i, ni, g):
        cyc = (i % ahead) * 3 * kg
        accs = []
        for q in range(3):
            slot = cyc + q * kg + g
            base = (i * 3 + q) * stride
            ou = jobs_ref[base + 1 + pgs * g].astype(jnp.float32)
            ov = jobs_ref[base + 1 + pgs * g + 1].astype(jnp.float32)
            u, v = uv_fn(q, g, base)                     # [sg, 1] each
            u = u - ou
            v = v - ov
            # clamp into the window interior (planner keeps overflow rare)
            u = jnp.clip(u, 0.0, wu - 1.001)
            v = jnp.clip(v, 0.0, wv - 1.001)
            # bilinear two-hot == tent weights at integer lanes
            tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u)
                             ).astype(jnp.bfloat16)
            tvc = jnp.maximum(0.0, 1.0 - jnp.abs(vx - v)).astype(acc_t)
            copy(i, q, g, slot).wait()
            # Mosaic requires a 32-bit matmul accumulator; cast the result
            # down so the multiply/fold chain still runs in acc_t
            m1 = jnp.dot(tu, win[slot],
                         preferred_element_type=jnp.float32).astype(acc_t)
            # channel regroup out[s, c] = Σ_v (m1·tvc)[s, v·cp + c]: fold
            # the lane tree (exact shift+adds: ≤4 terms of bounded tents)
            # only down to 128 lanes, then one [sg,128]@[128,3cp] selector
            # matmul finishes the regroup. Folding all the way to cp
            # serializes log2 VPU passes on ever-narrower vectors; the
            # 128-lane crossover is the measured optimum (21.3→18.6 ms on
            # the dense 512² job set).
            acc = m1 * tvc
            half = wv * cp
            while half > fold_to:
                half //= 2
                acc = acc[:, :half] + acc[:, half:2 * half]
            accs.append(jnp.dot(acc, gsels[q],
                                preferred_element_type=jnp.float32))
            # re-arm the slot with the matching window `ahead` steps out
            @pl.when(i + ahead < ni)
            def _(q=q, g=g, slot=slot):
                copy(i + ahead, q, g, slot).start()

        return accs[0] + accs[1] + accs[2]

    return prefetch, group_acc


def _uv_from_ref(uv_ref):
    """uv_fn reading precomputed texel coords from the classic uv operand
    ([3, kg, 2, sg] lane-major rows)."""
    def uv_fn(q, g, base):
        return uv_ref[q, g, 0, :][:, None], uv_ref[q, g, 1, :][:, None]
    return uv_fn


def _sampler_kernel(spec: SamplerSpec,
                    jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
    """One grid step = one TILE = 3 plane jobs x spec.kg windowed passes,
    emitting plane-minor features [1, kg, sg, 3·cp] (see
    _window_machinery)."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    prefetch, group_acc = _window_machinery(spec, jobs_ref, planes_ref,
                                            win, sem)

    @pl.when(i == 0)
    def _():
        prefetch(ni)

    uv_fn = _uv_from_ref(uv_ref)
    for g in range(spec.kg):                     # static unroll
        out_ref[0, g] = group_acc(uv_fn, i, ni, g).astype(jnp.bfloat16)


#: packed shade-weight operand names, in kernel argument order. All are
#: [rows, lanes] arrays in the shade dtype; see engines.nerf_pallas.
#: shade_weights for how each is derived from the NeRFNetwork params.
SHADE_WEIGHTS = (
    "wx_aud",    # [3cp, 64]  aud_ch_att_net.net_0, rows lifted to 3·cp
    "w_aud1",    # [64, A]    aud_ch_att_net.net_1
    "wx_sig",    # [3cp, 64]  sigma_net.net_0 rows :3C, lifted
    "w_aud_sig",  # [A, 64]   diag(enc_a) · sigma_net.net_0 rows 3C:3C+A
    "wx_eye",    # [3cp, 16]  eye_att_net.net_0, lifted (zeros if no eye)
    "w_eye1",    # [16, 8]    eye_att_net.net_1 in col 0
    "w_sig_e",   # [8, 64]    row 0 = eye_scalar · sigma_net.net_0 row 3C+A
    "w_sig1",    # [64, 64]   sigma_net.net_1
    "w_sigcol",  # [64, 16]   sigma_net.net_2 col 0 (σ) in col 0
    "w_geo",     # [64, 64]   sigma_net.net_2 cols 1:65 (geo_feat)
    "w_col_g",   # [64, 64]   color_net.net_0 rows 16:80 (geo part)
    "w_rgb",     # [64, 16]   color_net.net_1 cols 0:3 placed at cols 1:4
    "col_bias",  # [8, 64]    row 0 = ind · color_net.net_0 rows 80: (or 0)
)


def _shade_core(spec: SamplerSpec, w: dict, x, dsamp):
    """The NeRF head MLP chain on a [ns, 3·cp] feature batch (registers in,
    registers out). Math mirrors NeRFNetwork.forward_with_enc
    (models/ernerf/network.py:231-247, density 203-222; reference ernerf
    network.py:178-221) with per-frame constants folded into the weight
    operands (see SHADE_WEIGHTS): enc_a into w_aud_sig, the eye scalar into
    w_sig_e, the individual code into col_bias, and the per-ray SH·W_d
    projection arriving as dsamp rows. First-layer concats become matmul
    adds — exact up to fp summation order. Returns (sig_p [ns, 16] with the
    raw σ logit in col 0, rgb_p [ns, 16] with rgb logits in cols 1:4)."""
    dtype = w["wx_aud"].dtype
    f32 = jnp.float32
    mm = lambda a, b: jnp.dot(a.astype(dtype), b,
                              preferred_element_type=f32)
    # matmuls sharing an lhs are issued as one wider matmul (three x@W
    # issues with n = 64/64/16 become one x@[k, 144]); measured NEUTRAL on
    # the dense 512² job set (Mosaic evidently pipelines the small issues
    # well) — kept because it is no slower and simplifies the issue count.
    na, ns_, ne = (w["wx_aud"].shape[1], w["wx_sig"].shape[1],
                   w["wx_eye"].shape[1])
    wx_all = jnp.concatenate(
        [w["wx_aud"][...], w["wx_sig"][...], w["wx_eye"][...]], axis=1)
    hx = mm(x, wx_all)
    aud_h = jax.nn.relu(hx[:, :na])
    h0 = hx[:, na:na + ns_]
    eye_h = jax.nn.relu(hx[:, na + ns_:na + ns_ + ne])
    aud_ch = mm(aud_h, w["w_aud1"][...])                  # [ns, A]
    h = h0 + mm(aud_ch, w["w_aud_sig"][...])
    eye_att = jax.nn.sigmoid(mm(eye_h, w["w_eye1"][...])[:, :1])
    h = jax.nn.relu(h + eye_att * w["w_sig_e"][:1].astype(f32))
    h = jax.nn.relu(mm(h, w["w_sig1"][...]))
    nc_, ng = w["w_sigcol"].shape[1], w["w_geo"].shape[1]
    wh_all = jnp.concatenate([w["w_sigcol"][...], w["w_geo"][...]], axis=1)
    hs = mm(h, wh_all)
    sig_p = hs[:, :nc_]                                   # [ns, 16] col 0
    geo = hs[:, nc_:nc_ + ng]                             # [ns, 64]
    ch = mm(geo, w["w_col_g"][...]) + dsamp + w["col_bias"][:1].astype(f32)
    rgb_p = mm(jax.nn.relu(ch), w["w_rgb"][...])          # [ns, 16] cols 1:4
    return sig_p, rgb_p


def _shade_kernel(spec: SamplerSpec, jobs_ref, uv_ref, dproj_ref,
                  *refs):
    """Fused sample+shade: the NeRF heads run on each depth group's
    [sg, 3·cp] feature rows while they are still VMEM registers.

    Shading 4.2M samples through the 64-wide heads as XLA HLOs costs
    13-26 ms at dense 512² — every matmul boundary spills an [N, ≤64]
    activation to HBM (~20 sweeps ≈ 10 GB of traffic). In-kernel, the
    whole chain is ~10 small MXU ops per (tile, group) with zero HBM
    spill, and the kernel's output shrinks from [N, 3cp] features (400 MB)
    to σ+rgb (268 MB f32, lanes 0..3 of 16)."""
    *weights, planes_ref, out_ref, win, sem = refs
    w = dict(zip(SHADE_WEIGHTS, weights))
    sg, kg = spec.sg, spec.kg
    rpt = spec.rays_per_tile
    ks = sg // rpt
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    prefetch, group_acc = _window_machinery(spec, jobs_ref, planes_ref,
                                            win, sem)

    @pl.when(i == 0)
    def _():
        prefetch(ni)

    ns = kg * sg
    # per-ray dir projection rows → per-sample rows in the concatenated
    # [kg·sg] group-major order: sublane broadcast over (kg, ks) then a
    # no-op merge (minor stays a full 128 lanes)
    dp = dproj_ref[0]                                     # [rpt, 128]
    dsamp = jnp.broadcast_to(dp[None, :, None, :], (kg, rpt, ks, 128)
                             ).reshape(ns, 128)[:, :64]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ns, 16), 1)
    m_sig = lane == 0
    m_rgb = (lane >= 1) & (lane <= 3)

    # accumulate ALL depth groups first, then shade them as ONE [kg·sg, ·]
    # batch: per-matmul issue overhead dominates at [sg, ·] granularity
    # (48 MXU issues/step cost +16 ms at dense 512²; batched it's 12)
    uv_fn = _uv_from_ref(uv_ref)
    x = jnp.concatenate(
        [group_acc(uv_fn, i, ni, g) for g in range(kg)], axis=0)
    sig_p, rgb_p = _shade_core(spec, w, x, dsamp)
    out_ref[0] = (jnp.where(m_sig, jnp.exp(sig_p), 0.0)
                  + jnp.where(m_rgb,
                              jax.nn.sigmoid(rgb_p) * (1 + 2 * 0.001)
                              - 0.001,
                              0.0))


def _bcast_ray_rows(v, spec: SamplerSpec, lanes: int):
    """[rpt, L] per-ray rows → [ns, :lanes] per-sample rows in the
    kernel's (g, r, s) order: pad the minor to a full 128 lanes (Mosaic
    merges sublane dims only over a full-lane minor), sublane-broadcast
    over (kg, ks), slice back."""
    rpt = spec.rays_per_tile
    kg = spec.kg
    ks = spec.sg // rpt
    ns = kg * spec.sg
    l = v.shape[-1]
    if l < 128:
        v = jnp.concatenate(
            [v, jnp.zeros((rpt, 128 - l), v.dtype)], axis=1)
    return jnp.broadcast_to(v[None, :, None, :], (kg, rpt, ks, 128)
                            ).reshape(ns, 128)[:, :lanes]


def _shade_comp_kernel(spec: SamplerSpec, jobs_ref, uv_ref, dproj_ref,
                       dtv_ref, *refs):
    """Fused sample + shade + COMPOSITE: the whole per-tile render — texture
    sampling, NeRF head MLPs, and the volume-rendering integral — runs in
    one grid step with nothing but per-RAY results leaving VMEM.

    Output shrinks [ns, 16] per-sample σ/rgb (268 MB f32 at dense 512²,
    whose HBM write + read-back cost ≈2 ms each) → [rpt, 16] per-ray
    (17 MB): lane 0 = Σ weights (for background mixing), lanes 1:4 =
    Σ weight·rgb. dt·valid per ray arrives in dtv lane 0 (zero dt ⇒ α=0
    and no attenuation — exactly the invalid-ray contract of the unfused
    composite); see _composite_rows for the integral."""
    *weights, planes_ref, out_ref, win, sem = refs
    w = dict(zip(SHADE_WEIGHTS, weights))
    kg = spec.kg
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    # NOTE a two-planes-per-matmul K-packing (block-diagonal [sg,128] lhs)
    # was tried here and measured 4 ms SLOWER at dense 512²: the MXU's
    # effective contraction depth per pass is 64, so K=128 costs two
    # passes and the packing saves nothing while adding VPU tent work.
    prefetch, group_acc = _window_machinery(spec, jobs_ref, planes_ref,
                                            win, sem)

    @pl.when(i == 0)
    def _():
        prefetch(ni)

    f32 = jnp.float32
    dsamp = _bcast_ray_rows(dproj_ref[0], spec, 64).astype(f32)
    dtv = _bcast_ray_rows(dtv_ref[0], spec, 1)            # [ns, 1] dt·valid

    uv_fn = _uv_from_ref(uv_ref)
    x = jnp.concatenate(
        [group_acc(uv_fn, i, ni, g) for g in range(kg)], axis=0)
    sig_p, rgb_p = _shade_core(spec, w, x, dsamp)
    out_ref[0] = _composite_rows(spec, sig_p, rgb_p, dtv)


def _composite_rows(spec: SamplerSpec, sig_p, rgb_p, dtv):
    """The volume-rendering integral on the kernel's (g, r, s) row order:
    sig_p/rgb_p [ns, 16] from _shade_core, dtv [ns, 1] per-sample dt·valid.
    Returns [rpt, 16]: lane 0 = Σ weights, lanes 1:4 = Σ weight·rgb.

    Transmittance = exp(-Σ σ·dt), the exact log-space form of
    renderer.composite's cumprod of (1-α). Per-ray exclusive depth sums run
    as masked pltpu.roll shifts: a segmented Hillis-Steele scan within
    groups (rows of one ray are ks-contiguous), a group-total broadcast,
    and a second scan across the kg group blocks — ~12 VPU row ops, no
    transpose or relayout."""
    f32 = jnp.float32
    sg, kg = spec.sg, spec.kg
    rpt = spec.rays_per_tile
    ks = sg // rpt
    ns = kg * sg
    lane = jax.lax.broadcasted_iota(jnp.int32, (ns, 16), 1)
    m_sig = lane == 0
    m_rgb = (lane >= 1) & (lane <= 3)
    sd = jnp.exp(sig_p[:, :1]) * dtv                      # σ·dt  [ns, 1]
    alpha = 1.0 - jnp.exp(-sd)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ns, 1), 0)
    s_id = riota % ks
    g_id = riota // sg
    roll = lambda v, d: pltpu.roll(v, d, axis=0)
    # within-group inclusive scan over s (segmented Hillis-Steele: the
    # s_id >= d mask stops sums at ray boundaries; rolled-in wrap rows are
    # always masked because their s < d)
    y = sd
    d = 1
    while d < ks:
        y = y + jnp.where(s_id >= d, roll(y, d), 0.0)
        d *= 2
    e_w = jnp.where(s_id >= 1, roll(y, 1), 0.0)           # exclusive in s
    # group-total broadcast: every row receives its ray's s=ks-1 total
    # (mask s_id + d == ks-1 also kills cyclic-wrap contamination)
    t0 = jnp.where(s_id == ks - 1, y, 0.0)
    tot = t0
    for d in range(1, ks):
        # roll up by d == cyclic roll down by ns-d (pltpu.roll wants >= 0)
        tot = tot + jnp.where(s_id + d == ks - 1, roll(t0, ns - d), 0.0)
    # cross-group scan over g (row stride sg keeps (r, s) fixed)
    z = tot
    d = 1
    while d < kg:
        z = z + jnp.where(g_id >= d, roll(z, d * sg), 0.0)
        d *= 2
    e_g = jnp.where(g_id >= 1, roll(z, sg), 0.0)          # exclusive in g
    trans = jnp.exp(-(e_w + e_g))
    wgt = jnp.where(trans > 1e-4, alpha * trans, 0.0)     # [ns, 1]
    base = (jnp.where(m_sig, 1.0, 0.0)
            + jnp.where(m_rgb,
                        jax.nn.sigmoid(rgb_p) * (1 + 2 * 0.001) - 0.001,
                        0.0))
    contrib = wgt * base                                  # [ns, 16]
    # per-ray reduction in two stages. A single [rpt, ns] selector matmul
    # costs M·⌈K/128⌉ = 128·16 = 2048 MXU row-passes per tile (measured
    # ~4.4 ms of the dense 512² frame); instead:
    #  1. Σ over depth groups: cyclic roll-adds bring every group's row
    #     onto block 0 (rows ≥ sg hold wrapped garbage, never read);
    #  2. Σ over the ks in-group samples: two roll-adds leave each ray's
    #     total at its s = 0 row;
    #  3. one [rpt, sg] selector matmul (K = 512 → 4 passes, 512 row-
    #     cycles) picks rows r·ks. Same f32 sums up to reassociation.
    cg = contrib
    for g in range(1, kg):
        cg = cg + roll(contrib, ns - g * sg)
    # segmented suffix sum over s (masked doubling): row r·ks ends with
    # Σ_{s} of its ray's rows
    y = cg
    d = 1
    while d < ks:
        y = y + jnp.where(s_id < ks - d, roll(y, ns - d), 0.0)
        d *= 2
    si = jax.lax.broadcasted_iota(jnp.int32, (rpt, sg), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (rpt, sg), 0)
    ssel = (si == ri * ks).astype(f32)
    return jnp.dot(ssel, y[:sg], preferred_element_type=f32)


def _render_rays_kernel(spec: SamplerSpec, bound: float, jobs_ref,
                        rays_ref, dproj_ref, *refs):
    """Fully fused render kernel with IN-KERNEL uv synthesis: per-sample
    texel coordinates never exist outside VMEM.

    Instead of the classic [T, 3, kg, 2, sg] uv operand (~100 MB at dense
    512², built by a ~5 ms XLA planning pass over a 50 MB xyz tensor), the
    kernel receives 8 numbers per RAY — origin, direction, span ends
    ([T, rpt, 8], 8 MB) — and reconstructs every sample position itself:
    one [sg, rpt] 0/1 expansion matmul turns ray rows into per-sample rows,
    then z = zmin + span·kfrac, xyz = clip(o + d·z), and the plane-affine
    texel transform run as a handful of [sg, 1] VPU ops per (plane, group).
    Mip placement (level, row base) comes via two extra SMEM scalars per
    (job, group) from plan_jobs_rays, whose cost is per-RAY endpoint math
    (extrema of a monotonic segment are its endpoints).

    dt·valid is also derived in-kernel from the span (invalid rays carry
    zmin == zmax ⇒ dt = 0 ⇒ α = 0), so dproj shrinks to the bare [rpt, 64]
    direction projection. Output as _shade_comp_kernel."""
    *weights, planes_ref, out_ref, win, sem = refs
    w = dict(zip(SHADE_WEIGHTS, weights))
    sg, kg, k = spec.sg, spec.kg, spec.k
    rpt = spec.rays_per_tile
    ks = sg // rpt
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    prefetch, group_acc = _window_machinery(spec, jobs_ref, planes_ref,
                                            win, sem, pgs=4)

    @pl.when(i == 0)
    def _():
        prefetch(ni)

    f32 = jnp.float32
    ns = kg * sg
    scale = spec.resolution / (2.0 * bound)

    # ray rows → per-sample rows: ex[r·ks + s, c] = rays[r, c]
    xi = jax.lax.broadcasted_iota(jnp.int32, (sg, rpt), 0) // ks
    xr = jax.lax.broadcasted_iota(jnp.int32, (sg, rpt), 1)
    xsel = (xi == xr).astype(f32)
    ex = jnp.dot(xsel, rays_ref[0].astype(f32),
                 preferred_element_type=f32)               # [sg, 8]
    o3, d3 = ex[:, 0:3], ex[:, 3:6]
    zmin_s, zmax_s = ex[:, 6:7], ex[:, 7:8]
    span_s = zmax_s - zmin_s
    srow = (jax.lax.broadcasted_iota(jnp.int32, (sg, 1), 0) % ks
            ).astype(f32)

    # per-GROUP shared sample math, hoisted out of the per-window loop:
    # level-0 texel coords for all 3 axes ([sg, 3], ~6 VPU ops per group);
    # each window then needs only one fused multiply-add for its mip
    # placement. (Recomputing z/xyz/tex inside uv_fn cost ~130 narrow VPU
    # ops per step — measured +2.5 ms at dense 512² over the explicit-uv
    # kernel; hoisted it's ~24.)
    texs = []
    for g in range(kg):
        kf = (g * ks + srow) / (k - 1.0)
        z = zmin_s + span_s * kf                           # [sg, 1]
        xyz = jnp.clip(o3 + d3 * z, -bound, bound)         # [sg, 3]
        texs.append((xyz + bound) * scale - 0.5)           # level-0 texels

    # plane (u, v) coordinate indices into xyz: xy→(x,y), yz→(z,y), xz→(z,x)
    PUV = ((0, 1), (2, 1), (2, 0))

    def uv_fn(q, g, base):
        ui, vi = PUV[q]
        lvl = jobs_ref[base + 1 + 4 * g + 2]
        mbase = jobs_ref[base + 1 + 4 * g + 3].astype(f32)
        inv_ms = jnp.exp2(-lvl.astype(f32))
        # (tex + 0.5)·inv_ms − 0.5 (+ mbase): scalar parts fold into one
        # madd per coordinate
        cu = 0.5 * inv_ms - 0.5 + mbase
        cv = 0.5 * inv_ms - 0.5
        u_abs = texs[g][:, ui:ui + 1] * inv_ms + cu
        v_loc = texs[g][:, vi:vi + 1] * inv_ms + cv
        return u_abs, v_loc

    dsamp = _bcast_ray_rows(dproj_ref[0], spec, 64).astype(f32)
    dt_sg = span_s / k                                     # [sg, 1]
    dtv = jnp.concatenate([dt_sg] * kg, axis=0)            # [ns, 1]

    x = jnp.concatenate(
        [group_acc(uv_fn, i, ni, g) for g in range(kg)], axis=0)
    sig_p, rgb_p = _shade_core(spec, w, x, dsamp)
    out_ref[0] = _composite_rows(spec, sig_p, rgb_p, dtv)


def sample_shade_tiles(planes_major: jax.Array, jobs: jax.Array,
                       uv: jax.Array, dproj: jax.Array, weights: dict,
                       spec: SamplerSpec,
                       interpret: bool = False) -> jax.Array:
    """Fused sample+shade kernel (see _shade_kernel).

    planes_major: [3, R, R*CP]; jobs/uv as sample_tiles;
    dproj: [J//3, rpt, 128] per-ray color-dir projections (lanes 64: zero);
    weights: dict matching SHADE_WEIGHTS.
    Returns [J//3, kg·sg, 16] float32 — σ at lane 0, rgb at lanes 1:4,
    rows in group-major (kg, rpt, k/kg) sample order.
    """
    j = uv.shape[0]
    t = j // 3
    kernel = functools.partial(_shade_kernel, spec)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, spec.kg, 2, spec.sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spec.rays_per_tile, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in SHADE_WEIGHTS] + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.kg * spec.sg, 16),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, spec.kg * spec.sg, 16),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * 3 * spec.kg, spec.wu,
                        spec.wv * spec.cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * 3 * spec.kg,)),
        ],
        interpret=interpret,
    )(jobs, uv, dproj, *[weights[k] for k in SHADE_WEIGHTS], planes_major)


def sample_shade_comp_tiles(planes_major: jax.Array, jobs: jax.Array,
                            uv: jax.Array, dproj: jax.Array,
                            dtv: jax.Array, weights: dict,
                            spec: SamplerSpec,
                            interpret: bool = False) -> jax.Array:
    """Fully fused sample+shade+composite kernel (see _shade_comp_kernel).

    Same jobs/uv operands as sample_shade_tiles; dproj shrinks to the bare
    [J//3, rpt, 64] direction projection (any float dtype) and dtv
    [J//3, rpt, 8] f32 carries each ray's dt·valid in lane 0.
    Returns [J//3, rpt, 16] float32 per-RAY results: lane 0 = Σ weights
    (background mix factor), lanes 1:4 = Σ weight·rgb.
    """
    j = uv.shape[0]
    t = j // 3
    kernel = functools.partial(_shade_comp_kernel, spec)
    scratch = [
        pltpu.VMEM((spec.ahead * 3 * spec.kg, spec.wu,
                    spec.wv * spec.cp), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((spec.ahead * 3 * spec.kg,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, spec.kg, 2, spec.sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spec.rays_per_tile, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spec.rays_per_tile, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in SHADE_WEIGHTS] + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.rays_per_tile, 16),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, spec.rays_per_tile, 16),
                                       jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jobs, uv, dproj, dtv, *[weights[k] for k in SHADE_WEIGHTS],
      planes_major)


def render_rays_tiles(planes_major: jax.Array, jobs: jax.Array,
                      rays: jax.Array, dproj: jax.Array, weights: dict,
                      spec: SamplerSpec, bound: float,
                      interpret: bool = False) -> jax.Array:
    """Fully fused render with in-kernel uv synthesis (_render_rays_kernel).

    jobs: [T·3·(1+4kg)] int32 from plan_jobs_rays (per job: plane, then
          (ou, ov, lvl, mip_base) per depth group).
    rays: [T, rpt, 8] f32 per-ray (ox, oy, oz, dx, dy, dz, zmin, zmax);
          invalid rays must carry zmin == zmax.
    dproj: [T, rpt, 64] per-ray color-dir projections (any float dtype).
    Returns [T, rpt, 16] float32: lane 0 = Σ weights, lanes 1:4 =
    Σ weight·rgb.
    """
    t = rays.shape[0]
    kernel = functools.partial(_render_rays_kernel, spec, bound)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spec.rays_per_tile, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spec.rays_per_tile, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in SHADE_WEIGHTS] + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.rays_per_tile, 16),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, spec.rays_per_tile, 16),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * 3 * spec.kg, spec.wu,
                        spec.wv * spec.cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * 3 * spec.kg,)),
        ],
        interpret=interpret,
    )(jobs, rays, dproj, *[weights[k] for k in SHADE_WEIGHTS], planes_major)


def sample_tiles(planes_major: jax.Array, jobs: jax.Array, uv: jax.Array,
                 spec: SamplerSpec, interpret: bool = False) -> jax.Array:
    """Run the sampler.

    planes_major: [3, R, R*CP] from pack_planes_major
    jobs: [J * (1 + 2*kg)] int32 — per job: plane_id, then (ou, ov) per
          depth group (ou % 8 == 0, ov % 8 == 0), jobs ordered plane-minor
          (job = tile·3 + plane). All jobs run: the caller compacts away
          inactive tiles (and pads with duplicates), keeping the
          double-buffered DMA chain unconditional.
    uv:   [J, kg, 2, sg] float32 texel coords, lane-major rows (u row 0,
          v row 1) — sg on the minor axis so the per-step block DMA moves
          packed lanes instead of 64×-padded pairs.
    returns [J//3, kg, sg, 3*CP] bfloat16: per-sample triplane features
          with plane p's channels at lanes [p·cp, p·cp+C) — reshape to
          [J//3·kg·sg, 3·cp] is free, so the MLP consumes it without the
          former full-tensor regroup relayout.
    """
    j = uv.shape[0]
    t = j // 3
    kernel = functools.partial(_sampler_kernel, spec)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, spec.kg, 2, spec.sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.kg, spec.sg, 3 * spec.cp),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, spec.kg, spec.sg, 3 * spec.cp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * 3 * spec.kg, spec.wu,
                        spec.wv * spec.cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * 3 * spec.kg,)),
        ],
        interpret=interpret,
    )(jobs, uv, planes_major)


# ---- host-side planning ------------------------------------------------------

def tile_permutation(h: int, w: int, tile_w: int, tile_h: int) -> np.ndarray:
    """Pixel permutation row-major → tile-major; rays reordered once per
    frame with this constant index map (and the frame scattered back with
    its inverse)."""
    idx = np.arange(h * w).reshape(h, w)
    tiles = []
    for ty in range(0, h, tile_h):
        for tx in range(0, w, tile_w):
            tiles.append(idx[ty:ty + tile_h, tx:tx + tile_w].reshape(-1))
    return np.concatenate(tiles)


def to_tiles(x: jnp.ndarray, h: int, w: int, tile_w: int, tile_h: int):
    """Row-major pixel array [H·W, ...] → tile-major [T, tile_h·tile_w, ...]
    as reshape+transpose (a gather-free relayout — XLA transposes run at
    HBM bandwidth while a 262K-row permutation gather costs ~3 ms)."""
    lead = x.shape[1:]
    x = x.reshape(h // tile_h, tile_h, w // tile_w, tile_w, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(-1, tile_h * tile_w, *lead)


def from_tiles(x: jnp.ndarray, h: int, w: int, tile_w: int, tile_h: int):
    """Inverse of to_tiles."""
    lead = x.shape[2:]
    x = x.reshape(h // tile_h, w // tile_w, tile_h, tile_w, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(h * w, *lead)


def plan_jobs(xyz_tiles: jnp.ndarray, valid_tiles: jnp.ndarray,
              spec: SamplerSpec, bound: float):
    """Build the kernel job table from tile-major sample positions.

    xyz_tiles: [T, K_total_samples, 3] where K_total = rays_per_tile * k,
               ordered [ray, k] — regrouped here into kg depth groups of
               consecutive k indices.
    valid_tiles: [T, rays_per_tile, k] bool.
    Returns (scalars [T, 3, 1+2kg] int32, uv [T, 3, kg, 2, sg] f32
             lane-major rows (u row 0, v row 1 — the kernel's DMA-packed
             layout), active [T] bool, overflow [T, 3] bool). The caller
             gathers active tiles (fixed budget) and flattens before
             sample_tiles.
    """
    t = xyz_tiles.shape[0]
    rpt, k, kg = spec.rays_per_tile, spec.k, spec.kg
    ks = k // kg
    # depth groups: consecutive k indices → [T, kg, rpt*ks, 3]
    xyz_g = (xyz_tiles.reshape(t, rpt, kg, ks, 3)
             .transpose(0, 2, 1, 3, 4)
             .reshape(t, kg, rpt * ks, 3))
    valid_g = (valid_tiles.reshape(t, rpt, kg, ks).transpose(0, 2, 1, 3)
               .reshape(t, kg, rpt * ks))
    return plan_jobs_grouped(xyz_g, valid_g, spec, bound)


def plan_jobs_grouped(xyz_g: jnp.ndarray, valid_g: jnp.ndarray,
                      spec: SamplerSpec, bound: float):
    """plan_jobs for positions already in the kernel's group-major sample
    order: xyz_g [T, kg, sg, 3], valid_g [T, kg, sg] (sg = rpt·(k/kg)).
    Callers that build sample positions directly in group-major order (the
    engine does — it also shades and composites group-major) skip the
    [T, rpt·k, 3] regrouping transpose entirely."""
    t = xyz_g.shape[0]
    kg = spec.kg
    r = spec.resolution
    scale = r / (2.0 * bound)

    # texel coords per plane: u = contract axis, v = lateral axis
    tex = (xyz_g + bound) * scale - 0.5              # [T, kg, sg, 3] texels
    x, y, z = tex[..., 0], tex[..., 1], tex[..., 2]
    # plane (u, v): xy → (x, y); yz → (z, y); xz → (z, x)
    uv = jnp.stack([
        jnp.stack([x, y], axis=2),
        jnp.stack([z, y], axis=2),
        jnp.stack([z, x], axis=2),
    ], axis=1)                                        # [T, 3, kg, 2, sg]

    vmask = valid_g.reshape(t, 1, kg, 1, -1)
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(vmask, uv, big), axis=4)              # [T,3,kg,2]
    hi = jnp.max(jnp.where(vmask, uv, -big), axis=4)
    ext = jnp.clip(hi - lo, 0.0, None)

    # mip level per (tile, plane, group): coarsest-needed so the footprint
    # fits the window (usable extent = w − 8 alignment slack − 2 margin)
    need = jnp.maximum(ext[..., 0] / (spec.wu - 10),
                       ext[..., 1] / (spec.wv - 10))
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(need, 1e-6))),
                   0, spec.levels - 1).astype(jnp.int32)         # [T,3,kg]
    ms = jnp.exp2(lvl.astype(jnp.float32))             # mip downscale factor
    rl = (r / ms)                                      # rows at that mip
    mip_base = jnp.asarray(spec.mip_rows[:-1], jnp.int32)[lvl]

    lo_l = (lo + 0.5) / ms[..., None] - 0.5
    uv = (uv + 0.5) / ms[..., None, None] - 0.5        # mip-local texels

    # only level-picking misses can still overflow (clamped lvl): flag them
    overflow = jnp.any(need / ms > 1.0, axis=-1)                 # [T, 3]

    # origin: 1-texel margin, 8-quantized, clamped into the mip
    ou = jnp.clip((lo_l[..., 0] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wu, 0))
    ov = jnp.clip((lo_l[..., 1] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wv, 0))
    ou = ou + mip_base                       # absolute row in the mip stack
    # the kernel subtracts the absolute origin, so lift u to absolute rows
    uv = uv.at[..., 0, :].add(mip_base[..., None].astype(jnp.float32))
    active = valid_g.reshape(t, -1).any(axis=-1)

    plane_id = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (t, 3))
    scalars = jnp.concatenate(
        [plane_id[..., None],
         jnp.stack([ou, ov], axis=-1).reshape(t, 3, 2 * kg)],
        axis=-1,
    )                                                  # [T, 3, 1+2kg]
    return scalars, uv, active, overflow.reshape(t, 3)


def plan_jobs_rays(o_t: jnp.ndarray, d_t: jnp.ndarray, zmin: jnp.ndarray,
                   zmax: jnp.ndarray, valid: jnp.ndarray,
                   spec: SamplerSpec, bound: float):
    """Planning for render_rays_tiles: per-RAY endpoint math only.

    Along a ray x(z) = o + d·z each coordinate is monotonic in z (clipping
    to ±bound preserves monotonicity), and the per-group sample fractions
    (linspace over k split into kg blocks) include both group ends — so
    each (ray, group, plane) footprint's extrema are exactly its two
    endpoint samples, and plan_jobs_grouped's per-sample min/max over the
    [T, kg, sg, 3] position tensor (50 MB + a 100 MB uv emit at dense
    512²) collapses to [·, 2] endpoint evaluations.

    o_t/d_t [T, rpt, 3]; zmin/zmax [T, rpt]; valid [T, rpt] (invalid rays
    are excluded from window fitting; callers must also zero their spans —
    zmax == zmin — so the kernel derives dt = 0 for them).
    Returns (scalars [T, 3, 1+4kg] int32 — plane, then (ou, ov, lvl,
    mip_base) per depth group — and overflow [T, 3] bool)."""
    t, rpt = zmin.shape
    kg, k = spec.kg, spec.k
    ks = k // kg
    r = spec.resolution
    scale = r / (2.0 * bound)

    kf = jnp.linspace(0.0, 1.0, k).reshape(kg, ks)
    ke = jnp.stack([kf[:, 0], kf[:, -1]], axis=-1)     # [kg, 2] group ends
    span = zmax - zmin
    z_e = (zmin[:, None, :, None]
           + span[:, None, :, None] * ke[:, None, :])   # [T, kg, rpt, 2]
    xyz_e = jnp.clip(
        o_t[:, None, :, None] + d_t[:, None, :, None] * z_e[..., None],
        -bound, bound,
    )                                                   # [T, kg, rpt, 2, 3]
    tex = (xyz_e + bound) * scale - 0.5
    x, y, z = tex[..., 0], tex[..., 1], tex[..., 2]
    uv_e = jnp.stack([
        jnp.stack([x, y], axis=2),
        jnp.stack([z, y], axis=2),
        jnp.stack([z, x], axis=2),
    ], axis=1)                                   # [T, 3plane, kg, 2uv, rpt, 2]
    vm = valid[:, None, None, None, :, None]
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(vm, uv_e, big), axis=(4, 5))          # [T,3,kg,2]
    hi = jnp.max(jnp.where(vm, uv_e, -big), axis=(4, 5))
    ext = jnp.clip(hi - lo, 0.0, None)

    # identical mip/origin logic to plan_jobs_grouped
    need = jnp.maximum(ext[..., 0] / (spec.wu - 10),
                       ext[..., 1] / (spec.wv - 10))
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(need, 1e-6))),
                   0, spec.levels - 1).astype(jnp.int32)         # [T,3,kg]
    ms = jnp.exp2(lvl.astype(jnp.float32))
    rl = r / ms
    mip_base = jnp.asarray(spec.mip_rows[:-1], jnp.int32)[lvl]
    lo_l = (lo + 0.5) / ms[..., None] - 0.5
    overflow = jnp.any(need / ms > 1.0, axis=-1)                 # [T, 3]
    ou = jnp.clip((lo_l[..., 0] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wu, 0))
    ov = jnp.clip((lo_l[..., 1] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wv, 0))
    ou = ou + mip_base                       # absolute row in the mip stack

    plane_id = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (t, 3))
    scalars = jnp.concatenate(
        [plane_id[..., None],
         jnp.stack([ou, ov, lvl, mip_base], axis=-1).reshape(t, 3, 4 * kg)],
        axis=-1,
    )                                                  # [T, 3, 1+4kg]
    return scalars, overflow


def plan_jobs_span(o_t: jnp.ndarray, d_t: jnp.ndarray, zmin: jnp.ndarray,
                   zmax: jnp.ndarray, valid: jnp.ndarray,
                   spec: SamplerSpec, bound: float):
    """Lean planner for sample_shade_comp_tiles: endpoint-based window
    fitting (see plan_jobs_rays — extrema of a monotonic segment are its
    endpoint samples) + a fully-fusable uv emit.

    plan_jobs_grouped reduces min/max over a materialized [T, kg, sg, 3]
    position tensor (~4.8 ms at dense 512²: 150 MB of intermediates plus
    masked reductions over 100M elements). Here window origins come from
    [T, kg, rpt, 2, 3] endpoint math (25 MB), and the uv payload is one
    elementwise broadcast chain from (o, d, span) that XLA fuses into a
    single 100 MB-output kernel with no intermediate tensor.

    Same operands/returns as plan_jobs_grouped but ray-form inputs:
    o_t/d_t [T, rpt, 3], zmin/zmax [T, rpt] (zmax == zmin on invalid
    rays), valid [T, rpt].
    Returns (scalars [T, 3, 1+2kg], uv [T, 3, kg, 2, sg], overflow
    [T, 3])."""
    t, rpt = zmin.shape
    kg, k = spec.kg, spec.k
    ks = k // kg
    sg = spec.sg
    r = spec.resolution
    scale = r / (2.0 * bound)

    kf = jnp.linspace(0.0, 1.0, k).reshape(kg, ks)
    ke = jnp.stack([kf[:, 0], kf[:, -1]], axis=-1)     # [kg, 2] group ends
    span = zmax - zmin
    z_e = (zmin[:, None, :, None]
           + span[:, None, :, None] * ke[:, None, :])   # [T, kg, rpt, 2]
    xyz_e = jnp.clip(
        o_t[:, None, :, None] + d_t[:, None, :, None] * z_e[..., None],
        -bound, bound,
    )                                                   # [T, kg, rpt, 2, 3]
    tex_e = (xyz_e + bound) * scale - 0.5
    xe, ye, ze = tex_e[..., 0], tex_e[..., 1], tex_e[..., 2]
    uv_e = jnp.stack([
        jnp.stack([xe, ye], axis=2),
        jnp.stack([ze, ye], axis=2),
        jnp.stack([ze, xe], axis=2),
    ], axis=1)                                   # [T, 3plane, kg, 2uv, rpt, 2]
    vm = valid[:, None, None, None, :, None]
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(vm, uv_e, big), axis=(4, 5))          # [T,3,kg,2]
    hi = jnp.max(jnp.where(vm, uv_e, -big), axis=(4, 5))
    ext = jnp.clip(hi - lo, 0.0, None)

    need = jnp.maximum(ext[..., 0] / (spec.wu - 10),
                       ext[..., 1] / (spec.wv - 10))
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(need, 1e-6))),
                   0, spec.levels - 1).astype(jnp.int32)         # [T,3,kg]
    ms = jnp.exp2(lvl.astype(jnp.float32))
    rl = r / ms
    mip_base = jnp.asarray(spec.mip_rows[:-1], jnp.int32)[lvl]
    lo_l = (lo + 0.5) / ms[..., None] - 0.5
    overflow = jnp.any(need / ms > 1.0, axis=-1)                 # [T, 3]
    ou = jnp.clip((lo_l[..., 0] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wu, 0))
    ov = jnp.clip((lo_l[..., 1] - 1).astype(jnp.int32) & ~7, 0,
                  jnp.maximum(rl.astype(jnp.int32) - spec.wv, 0))
    ou = ou + mip_base                       # absolute row in the mip stack

    plane_id = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (t, 3))
    scalars = jnp.concatenate(
        [plane_id[..., None],
         jnp.stack([ou, ov], axis=-1).reshape(t, 3, 2 * kg)],
        axis=-1,
    )                                                  # [T, 3, 1+2kg]

    # uv emit: one broadcast-mul chain, no intermediate ever reduced over —
    # XLA fuses it into a single kernel writing the [T, 3, kg, 2, sg] output
    kfs = ((jnp.arange(kg)[:, None] * ks + jnp.arange(sg)[None, :] % ks)
           / (k - 1.0))                                 # [kg, sg]
    rep = lambda a: jnp.repeat(a, ks, axis=-1)          # [T, rpt] → [T, sg]
    z_s = (rep(zmin)[:, None, :] + rep(span)[:, None, :] * kfs[None]
           )                                            # [T, kg, sg]
    tex = [
        (jnp.clip(rep(o_t[..., c])[:, None, :]
                  + rep(d_t[..., c])[:, None, :] * z_s, -bound, bound)
         + bound) * scale - 0.5
        for c in range(3)
    ]                                                   # 3 × [T, kg, sg]
    uv = jnp.stack([
        jnp.stack([tex[0], tex[1]], axis=2),
        jnp.stack([tex[2], tex[1]], axis=2),
        jnp.stack([tex[2], tex[0]], axis=2),
    ], axis=1)                                          # [T, 3, kg, 2, sg]
    uv = (uv + 0.5) / ms[..., None, None] - 0.5         # mip-local texels
    uv = uv.at[..., 0, :].add(mip_base[..., None].astype(jnp.float32))
    return scalars, uv, overflow


def enc_selector(spec: SamplerSpec, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[3·CP, 3·C] 0/1 matrix S with S[p·cp + c, p·C + c] = 1: maps the
    kernel's padded plane-minor feature rows (free reshape of its output)
    onto the MLP's enc_x basis (encode_x_baked concat order xy, yz, xz) as
    ONE matmul — exact (0/1 weights) and MXU-fast, replacing the former
    full-tensor regroup relayout."""
    cp, c = spec.cp, spec.channels
    rows = np.arange(3 * cp)
    p, ch = rows // cp, rows % cp
    s = np.zeros((3 * cp, 3 * c), np.float32)
    keep = ch < c
    s[rows[keep], (p * c + ch)[keep]] = 1.0
    return jnp.asarray(s, dtype)


def regroup_features(feats: jnp.ndarray, spec: SamplerSpec) -> jnp.ndarray:
    """Kernel output [T, kg, sg, 3·CP] → per-sample triplane features
    [T, rpt, k, 3*C] in the concat order of ops.triplane_bake.encode_x_baked
    (xy, yz, xz). Kept for parity tests and ray-major consumers; the engine
    hot path instead reshapes the kernel output to [N, 3·cp] for free and
    applies enc_selector inside the shade matmul."""
    t = feats.shape[0]
    rpt, k, kg, c = spec.rays_per_tile, spec.k, spec.kg, spec.channels
    ks = k // kg
    f = feats.reshape(t, kg, rpt, ks, 3, spec.cp)[..., :c]
    f = f.transpose(0, 2, 1, 3, 4, 5)                  # [T, rpt, kg, ks, 3, C]
    return f.reshape(t, rpt, k, 3 * c)
