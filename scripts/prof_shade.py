"""Isolate the shade stage cost at dense 512px (new plane-minor layout)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.ops.pallas_sampler import SamplerSpec, enc_selector

B, RPT, K, KG = 4096, 64, 16, 4
KS = K // KG
N = B * RPT * K
C3 = 36


def timed(name, fn, *args, iters=15):
    out = fn(*args, jnp.zeros((), jnp.float32))
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(out[-1])
    best = float("inf")
    for _ in range(2):
        chain = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, chain)
            chain = out[-1]
        np.asarray(chain)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:36s} {best*1e3:8.2f} ms", flush=True)


cfg = Config().override(**{"avatar.kind": "ernerf", "nerf.audio_in_dim": 29})
nc = cfg.nerf
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
variables = jax.device_put(variables)
shade_net = NeRFNetwork(network.cfg, dtype=jnp.bfloat16)
spec = SamplerSpec(resolution=1024, channels=12, tile_w=8, tile_h=8,
                   k=K, kg=KG, wu=64, wv=32)

rng = np.random.default_rng(0)
feats = jax.device_put(jnp.asarray(
    rng.standard_normal((B, KG, RPT * KS, 48)).astype(np.float32),
    dtype=jnp.bfloat16))
enc = jax.device_put(jnp.asarray(
    rng.standard_normal((N, C3)).astype(np.float32), dtype=jnp.bfloat16))
dirs = jax.device_put(jnp.asarray(
    rng.standard_normal((N, 3)).astype(np.float32)))
d_t = jax.device_put(jnp.asarray(
    rng.standard_normal((B, RPT, 3)).astype(np.float32)))
enc_a = jax.device_put(jnp.zeros((1, network.cfg.audio_dim)))
eye = jnp.zeros((1, 1))
sigma_flat = jax.device_put(jnp.asarray(
    rng.standard_normal(N).astype(np.float32)))


@jax.jit
def mlp_only(variables, enc, dirs, enc_a, eye, chain):
    sigma, color, *_ = shade_net.apply(
        variables, enc, dirs, enc_a, None, eye,
        training=False, method=NeRFNetwork.forward_with_enc)
    return sigma, color, sigma.astype(jnp.float32).sum() * 1e-30 + chain


@jax.jit
def dirs_fn(d_t, chain):
    d = jnp.broadcast_to(d_t[:, None, :, None, :],
                         (B, KG, RPT, KS, 3)).reshape(-1, 3)
    return d, d.sum() * 1e-30 + chain


@jax.jit
def sel_fn(feats, chain):
    e = jnp.dot(feats.reshape(-1, 3 * spec.cp), enc_selector(spec, feats.dtype),
                preferred_element_type=feats.dtype)
    return e, e.astype(jnp.float32).sum() * 1e-30 + chain


@jax.jit
def sel_fn_f32(feats, chain):
    e = jnp.dot(feats.reshape(-1, 3 * spec.cp),
                enc_selector(spec, jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return e, e.astype(jnp.float32).sum() * 1e-30 + chain


@jax.jit
def reorder_fn(sigma, chain):
    s = (sigma.reshape(B, KG, RPT, KS).transpose(0, 2, 1, 3)
         .reshape(B * RPT, K))
    return s, s.sum() * 1e-30 + chain


timed("mlp_only (enc+dirs ready)", mlp_only, variables, enc, dirs, enc_a, eye)
timed("dirs broadcast", dirs_fn, d_t)
timed("selector dot bf16 acc", sel_fn, feats)
timed("selector dot f32 acc", sel_fn_f32, feats)
timed("sigma reorder", reorder_fn, sigma_flat)


# ---- new fused path stages ---------------------------------------------------
from mere_fusion_tpu.engines.nerf_pallas import (  # noqa: E402
    _composite_grouped, _fused_shade)

sh_ray = jax.device_put(jnp.asarray(
    rng.standard_normal((B, RPT, 16)).astype(np.float32)))
ind = None  # full_init above built color_net without individual codes


@jax.jit
def fused_shade_fn(variables, feats, sh_ray, enc_a, eye, chain):
    sigma, color = _fused_shade(variables["params"], spec, feats, sh_ray,
                                enc_a, ind, eye, jnp.bfloat16)
    return sigma, color, sigma.sum() * 1e-30 + chain


sigma_g = jax.device_put(jnp.asarray(
    rng.standard_normal((B, KG, RPT, KS)).astype(np.float32)) ** 2)
color_g = jax.device_put(jnp.asarray(
    rng.random((B, KG, RPT, KS, 3)).astype(np.float32)))
z_g = jax.device_put(jnp.asarray(
    rng.random((B, KG, RPT, KS)).astype(np.float32)))
dt_r = jax.device_put(jnp.full((B, RPT), 0.01, jnp.float32))
valid_g = jax.device_put(jnp.ones((B, KG, RPT, KS), bool))
bg_rays = jax.device_put(jnp.zeros((B, RPT, 3), jnp.float32))


@jax.jit
def comp_fn(sigma, color, z, dt, valid, bg, chain):
    img, ws = _composite_grouped(sigma, color, z, dt, valid, bg)
    return img, img.sum() * 1e-30 + chain


timed("fused shade (feats ready)", fused_shade_fn, variables, feats, sh_ray,
      enc_a, eye)
timed("composite grouped", comp_fn, sigma_g, color_g, z_g, dt_r, valid_g,
      bg_rays)
