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
    ahead: int = 4           # DMA prefetch depth, in jobs (kg windows each)

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


def _sampler_kernel(spec: SamplerSpec,
                    jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
    """One grid step = one (tile, plane) job = spec.kg windowed passes.

    DMA pipelining: each (job, group) window is a small (~64 KB) HBM→VMEM
    copy whose wire latency exceeds the group's matmul time, so a 2-deep
    pipeline serializes on DMA latency (measured 6.3 µs/job at 512² dense —
    the frame bottleneck). Windows are therefore prefetched `spec.ahead`
    JOBS ahead (ahead·kg copies in flight) into a rotating slot ring:
    pair (j, g) lives in slot (j % ahead)·kg + g, is waited right before
    its matmul, and its slot is re-armed with pair (j+ahead, g) immediately
    after — keeping the DMA engine continuously queued so throughput
    approaches the HBM-bandwidth floor instead of the latency product."""
    wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
    ahead = spec.ahead
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    stride = 1 + 2 * kg   # per-job scalars: plane, kg*(ou, ov)

    def copy(job, g, slot):
        base = job * stride
        p = jobs_ref[base]
        ou = pl.multiple_of(jobs_ref[base + 1 + 2 * g], 8)
        ov = pl.multiple_of(jobs_ref[base + 1 + 2 * g + 1], 8)
        return pltpu.make_async_copy(
            planes_ref.at[p, pl.ds(ou, wu),
                          pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
            win.at[slot], sem.at[slot],
        )

    @pl.when(j == 0)
    def _():
        for a in range(ahead):                   # static unroll
            @pl.when(a < nj)
            def _(a=a):
                for g in range(kg):
                    copy(a, g, a * kg + g).start()

    # loop-invariant tent lattices
    uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1).astype(jnp.float32)
    vx = (jax.lax.broadcasted_iota(jnp.int32, (sg, wv * cp), 1) // cp
          ).astype(jnp.float32)
    # channel-selector for the final regroup matmul: G[x, c] = (x % cp == c)
    fold_to = min(128, wv * cp)
    gx = jax.lax.broadcasted_iota(jnp.int32, (fold_to, cp), 0) % cp
    gc = jax.lax.broadcasted_iota(jnp.int32, (fold_to, cp), 1)
    gsel = (gx == gc).astype(jnp.float32)
    cyc = (j % ahead) * kg

    for g in range(kg):                          # static unroll
        slot = cyc + g
        base = j * stride
        ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
        ov = jobs_ref[base + 1 + 2 * g + 1].astype(jnp.float32)
        u = uv_ref[0, g, :, 0] - ou
        v = uv_ref[0, g, :, 1] - ov
        # clamp into the window interior (planner keeps overflow rare)
        u = jnp.clip(u, 0.0, wu - 1.001)
        v = jnp.clip(v, 0.0, wv - 1.001)
        # bilinear two-hot == tent weights at integer lanes
        tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                         ).astype(jnp.bfloat16)
        tvc = jnp.maximum(0.0, 1.0 - jnp.abs(vx - v[:, None]))
        copy(j, g, slot).wait()
        m1 = jnp.dot(tu, win[slot], preferred_element_type=jnp.float32)
        # channel regroup out[s, c] = Σ_v (m1·tvc)[s, v·cp + c]: fold the
        # lane tree (f32-exact shift+adds) only down to 128 lanes, then one
        # [sg,128]@[128,cp] selector matmul finishes the regroup. Folding
        # all the way to cp serializes log2(wv·cp/cp) VPU passes on
        # ever-narrower vectors (sub-lane shifts are the slow ones); a full
        # [wv·cp, cp] selector matmul instead wastes 8× MXU on the padded
        # N=cp. The 128-lane crossover is the measured optimum
        # (21.3→18.6 ms on the dense 512² job set).
        acc = m1 * tvc
        half = wv * cp
        while half > fold_to:
            half //= 2
            acc = acc[:, :half] + acc[:, half:2 * half]
        out_ref[0, g] = jnp.dot(acc, gsel,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
        # re-arm the slot with the same group of the job `ahead` steps out
        @pl.when(j + ahead < nj)
        def _(g=g, slot=slot):
            copy(j + ahead, g, slot).start()


def sample_tiles(planes_major: jax.Array, jobs: jax.Array, uv: jax.Array,
                 spec: SamplerSpec, interpret: bool = False) -> jax.Array:
    """Run the sampler.

    planes_major: [3, R, R*CP] from pack_planes_major
    jobs: [J * (1 + 2*kg)] int32 — per job: plane_id, then (ou, ov) per
          depth group (ou % 8 == 0, ov % 8 == 0). All jobs run: the caller
          compacts away inactive tiles (and pads with duplicates), keeping
          the double-buffered DMA chain unconditional.
    uv:   [J, kg, sg, 2] float32 texel coords (u = contract axis)
    returns [J, kg, sg, CP] bfloat16 features (channels [C:] are zero)
    """
    j = uv.shape[0]
    kernel = functools.partial(_sampler_kernel, spec)
    return pl.pallas_call(
        kernel,
        grid=(j,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spec.kg, spec.sg, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.kg, spec.sg, spec.cp),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((j, spec.kg, spec.sg, spec.cp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * spec.kg, spec.wu, spec.wv * spec.cp),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * spec.kg,)),
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
    Returns (scalars [T, 3, 1+2kg] int32, uv [T, 3, kg, sg, 2] f32,
             active [T] bool, overflow [T, 3] bool). The caller gathers
             active tiles (fixed budget) and flattens before sample_tiles.
    """
    t = xyz_tiles.shape[0]
    rpt, k, kg = spec.rays_per_tile, spec.k, spec.kg
    ks = k // kg
    r = spec.resolution
    scale = r / (2.0 * bound)

    # texel coords per plane: u = contract axis, v = lateral axis
    tex = (xyz_tiles + bound) * scale - 0.5          # [T, rpt*k, 3] texels
    tex = tex.reshape(t, rpt, k, 3)
    # depth groups: consecutive k indices → [T, kg, rpt*ks, 3]
    tex = (tex.reshape(t, rpt, kg, ks, 3)
              .transpose(0, 2, 1, 3, 4)
              .reshape(t, kg, rpt * ks, 3))
    x, y, z = tex[..., 0], tex[..., 1], tex[..., 2]
    # plane (u, v): xy → (x, y); yz → (z, y); xz → (z, x)
    uv = jnp.stack([
        jnp.stack([x, y], axis=-1),
        jnp.stack([z, y], axis=-1),
        jnp.stack([z, x], axis=-1),
    ], axis=1)                                        # [T, 3, kg, sg, 2]

    vmask = valid_tiles.reshape(t, rpt, kg, ks).transpose(0, 2, 1, 3)
    vmask = vmask.reshape(t, 1, kg, rpt * ks, 1)
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(vmask, uv, big), axis=3)              # [T,3,kg,2]
    hi = jnp.max(jnp.where(vmask, uv, -big), axis=3)
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
    uv = uv.at[..., 0].add(mip_base[..., None].astype(jnp.float32))
    active = valid_tiles.reshape(t, -1).any(axis=-1)

    plane_id = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None], (t, 3))
    scalars = jnp.concatenate(
        [plane_id[..., None],
         jnp.stack([ou, ov], axis=-1).reshape(t, 3, 2 * kg)],
        axis=-1,
    )                                                  # [T, 3, 1+2kg]
    uv_jobs = uv.reshape(t, 3, kg, rpt * ks, 2)
    return scalars, uv_jobs, active, overflow.reshape(t, 3)


def regroup_features(feats: jnp.ndarray, spec: SamplerSpec) -> jnp.ndarray:
    """Kernel output [T*3, kg, sg, CP] → per-sample triplane features
    [T, rpt, k, 3*C] in the concat order of ops.triplane_bake.encode_x_baked
    (xy, yz, xz)."""
    t3 = feats.shape[0]
    t = t3 // 3
    rpt, k, kg, c = spec.rays_per_tile, spec.k, spec.kg, spec.channels
    ks = k // kg
    f = feats.reshape(t, 3, kg, rpt, ks, spec.cp)[..., :c]
    f = f.transpose(0, 3, 2, 4, 1, 5)                  # [T, rpt, kg, ks, 3, C]
    return f.reshape(t, rpt, k, 3 * c)
