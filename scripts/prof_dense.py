"""Stage-by-stage profile of the dense (full-coverage) ER-NeRF 512px frame.

Reconstructs the stages of engines/nerf_pallas.make_pallas_render_step's
frame_fn as separately jitted programs and times each on the real chip with
dependency-chained iterations (CLAUDE.md measurement convention). Run:

    python scripts/prof_dense.py [iters]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset, synthesize_nerf_dataset
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import (
    DensityGrid, composite, get_rays, intersect_aabb,
    render_torso_background, select_occupied_depths,
)
from mere_fusion_tpu.ops.pallas_sampler import (
    SamplerSpec, enc_selector, from_tiles, pack_planes_major, plan_jobs,
    sample_tiles, to_tiles,
)
from mere_fusion_tpu.ops.triplane_bake import bake_triplanes

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def timed(name, fn, *args, iters=ITERS):
    """Time fn(*args, chain) with a scalar dependency chain; returns ms."""
    out = fn(*args, jnp.zeros((), jnp.float32))
    jax.tree.map(lambda x: x.block_until_ready(), out)
    chain = out[-1]
    np.asarray(chain)  # force through the tunnel
    best = float("inf")
    for _ in range(2):
        chain = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, chain)
            chain = out[-1]
        np.asarray(chain)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:28s} {best*1e3:8.2f} ms")
    return best * 1e3


def main():
    cfg = Config().override(**{"avatar.kind": "ernerf",
                               "nerf.audio_in_dim": 29})
    nc = cfg.nerf
    with tempfile.TemporaryDirectory() as td:
        d = synthesize_nerf_dataset(td, hw=512)
        dataset = NeRFTestDataset.load(f"{d}/transforms.json", f"{d}/au.csv",
                                       scale=1.0)
    network = NeRFNetwork(NeRFNetConfig(
        bound=nc.bound, audio_in_dim=nc.audio_in_dim, audio_dim=nc.audio_dim,
        exp_eye=nc.exp_eye, num_levels=nc.num_levels,
        base_resolution=nc.base_resolution,
        log2_hashmap_size=nc.log2_hashmap_size,
        desired_resolution=nc.desired_resolution, torso=nc.torso,
        level_dim=nc.level_dim))
    variables = jax.jit(network.init, static_argnames="method")(
        jax.random.key(0), jnp.zeros((8, network.cfg.audio_in_dim, 16)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0),
        None, jnp.zeros((1, 1)), method=NeRFNetwork.full_init)
    baked = bake_triplanes(variables["params"], network.cfg.plane_spec,
                           network.cfg.bound,
                           resolution=min(1024, 2 * nc.desired_resolution),
                           dtype=jnp.bfloat16)

    H, W = dataset.H, dataset.W
    intrinsics = dataset.intrinsics
    k = nc.max_steps
    b0 = next(iter(baked.values()))
    res = int(round(b0.shape[0] ** 0.5)) if b0.ndim == 2 else b0.shape[0]
    channels = network.cfg.num_levels * network.cfg.plane_spec.level_dim
    spec = SamplerSpec(resolution=res, channels=channels, tile_w=8, tile_h=8,
                       k=k, kg=nc.pallas_depth_groups,
                       wu=nc.pallas_window_u, wv=nc.pallas_window_v)
    rpt = spec.rays_per_tile
    n = H * W
    t = n // rpt
    budget = t  # FULL coverage
    bound = nc.bound

    tile = lambda x: to_tiles(x, H, W, spec.tile_w, spec.tile_h)
    untile = lambda x: from_tiles(x, H, W, spec.tile_w, spec.tile_h)
    variables = jax.device_put(variables)
    planes_major = jax.jit(lambda b: pack_planes_major(b, spec))(
        jax.device_put(baked))
    print("planes_major", planes_major.shape, planes_major.dtype,
          planes_major.nbytes / 1e6, "MB; channels", channels,
          "res", res, "t", t, "k", k)

    density = DensityGrid.create(nc.grid_size)  # fully occupied → dense
    pose = jnp.asarray(dataset.poses[0])
    auds = jnp.zeros((8, network.cfg.audio_in_dim, 16))
    eye = jnp.zeros((1, 1))
    bg = jax.device_put(jnp.zeros((n, 3), jnp.float32))

    # ---- stage A: span probe (cached at steady state, but time it)
    @jax.jit
    def span_fn(pose, chain):
        rays_o, rays_d = get_rays(pose, intrinsics, H, W)
        near, far, ray_valid = intersect_aabb(rays_o, rays_d, bound)
        z, dt_, valid = select_occupied_depths(
            rays_o, rays_d, near, far, density, bound, nc.grid_size,
            nc.n_candidates, 2)
        zmin, zmax = z[:, 0], z[:, -1]
        tile_valid = valid.any(-1) & ray_valid
        va = tile(tile_valid)
        sp = tile(jnp.stack([zmin, zmax], -1).astype(jnp.float16))
        return sp, va, sp.astype(jnp.float32).sum() * 1e-30 + chain

    sp, va, _ = span_fn(pose, jnp.zeros((), jnp.float32))
    sp, va = jax.device_put(sp), jax.device_put(va)
    timed("span_fn (probe, cached)", span_fn, pose)

    # ---- stage B: rays + plan
    @jax.jit
    def plan_fn(pose, sp, va, chain):
        rays_o, rays_d = get_rays(pose, intrinsics, H, W)
        o_t, d_t = tile(rays_o), tile(rays_d)
        spf = sp.astype(jnp.float32)
        zmin, zmax = spf[..., 0], spf[..., 1]
        kfrac = jnp.linspace(0.0, 1.0, k)
        z = zmin[..., None] + (zmax - zmin)[..., None] * kfrac
        dt_ = ((zmax - zmin) / k)[..., None]
        xyz = jnp.clip(o_t[:, :, None] + d_t[:, :, None] * z[..., None],
                       -bound, bound)
        valid_k = jnp.broadcast_to(va[..., None], (budget, rpt, k))
        scalars, uv, _, overflow = plan_jobs(
            xyz.reshape(budget, rpt * k, 3), valid_k, spec, bound)
        return (scalars, uv, z, dt_, valid_k, d_t,
                uv.sum() * 1e-30 + chain)

    scalars, uv, z, dt_, valid_k, d_t, _ = plan_fn(
        pose, sp, va, jnp.zeros((), jnp.float32))
    for x in (scalars, uv, z, dt_, valid_k, d_t):
        x.block_until_ready()
    timed("plan (rays+xyz+plan_jobs)", plan_fn, pose, sp, va)

    # ---- stage C: Pallas sampler
    scalars_d = jax.device_put(scalars.reshape(-1))
    uv_d = jax.device_put(uv.reshape(budget * 3, spec.kg, 2, spec.sg))

    @jax.jit
    def sample_fn(planes_major, scalars, uv, chain):
        feats = sample_tiles(planes_major, scalars, uv, spec)
        return feats, feats.astype(jnp.float32).sum() * 1e-30 + chain

    feats, _ = sample_fn(planes_major, scalars_d, uv_d,
                         jnp.zeros((), jnp.float32))
    feats.block_until_ready()
    timed("sample_tiles (pallas)", sample_fn, planes_major, scalars_d, uv_d)

    # ---- stage D: regroup + shade
    shade_net = NeRFNetwork(network.cfg, dtype=jnp.bfloat16)
    feats_d = jax.device_put(feats)
    d_t_d = jax.device_put(d_t)

    ks = k // spec.kg

    @jax.jit
    def shade_fn(variables, feats, d_t, auds, eye, chain):
        enc = jnp.dot(feats.reshape(-1, 3 * spec.cp),
                      enc_selector(spec, feats.dtype),
                      preferred_element_type=feats.dtype)
        enc_a = network.apply(variables, auds, method=NeRFNetwork.encode_audio)
        m = budget * rpt
        dirs = jnp.broadcast_to(d_t[:, None, :, None, :],
                                (budget, spec.kg, rpt, ks, 3)).reshape(-1, 3)
        sigma, color, *_ = shade_net.apply(
            variables, enc, dirs, enc_a, None, eye,
            training=False, method=NeRFNetwork.forward_with_enc)
        sigma = (sigma.astype(jnp.float32).reshape(budget, spec.kg, rpt, ks)
                 .transpose(0, 2, 1, 3).reshape(m, k))
        color = (color.astype(jnp.float32)
                 .reshape(budget, spec.kg, rpt, ks, 3)
                 .transpose(0, 2, 1, 3, 4).reshape(m, k, 3))
        return (sigma, color,
                sigma.sum() * 1e-30 + chain)

    sigma, color, _ = shade_fn(variables, feats_d, d_t_d, auds, eye,
                               jnp.zeros((), jnp.float32))
    sigma.block_until_ready()
    timed("regroup+shade (MLPs)", shade_fn, variables, feats_d, d_t_d,
          auds, eye)

    # ---- stage D split: selector matmul alone
    @jax.jit
    def regroup_fn(feats, chain):
        enc = jnp.dot(feats.reshape(-1, 3 * spec.cp),
                      enc_selector(spec, feats.dtype),
                      preferred_element_type=feats.dtype)
        return enc, enc.astype(jnp.float32).sum() * 1e-30 + chain

    timed("  selector matmul alone", regroup_fn, feats_d)

    # ---- stage E: composite + scatter
    sigma_d, color_d = jax.device_put(sigma), jax.device_put(color)
    z_d, dtv_d, vk_d = (jax.device_put(z), jax.device_put(dt_),
                        jax.device_put(valid_k))

    @jax.jit
    def comp_fn(sigma, color, z, dtv, valid_k, bg, chain):
        m = budget * rpt
        bg_t = tile(bg)
        out = composite(sigma.reshape(m, k), color.reshape(m, k, 3),
                        z.reshape(m, k), dtv.reshape(m, 1),
                        valid_k.reshape(m, k), bg_t.reshape(m, 3))
        img_t = out["image"].reshape(budget, rpt, 3)
        img = jnp.clip(untile(img_t).reshape(H, W, 3), 0.0, 1.0)
        img = (img * 255).astype(jnp.uint8)
        return img, img.astype(jnp.float32).sum() * 1e-30 + chain

    timed("composite+scatter", comp_fn, sigma_d, color_d, z_d, dtv_d,
          vk_d, bg)

    # ---- torso background (in frame when cfg.torso)
    if network.cfg.torso:
        @jax.jit
        def torso_fn_t(variables, pose, bg, chain):
            def tf(x, p):
                return network.apply(variables, x, p, None,
                                     method=NeRFNetwork.forward_torso)
            bgc, _ = render_torso_background(tf, H, W, pose, bg)
            return bgc, bgc.sum() * 1e-30 + chain

        timed("torso background", torso_fn_t, variables, pose, bg)


if __name__ == "__main__":
    main()
