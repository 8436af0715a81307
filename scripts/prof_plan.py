"""Time the frame's non-kernel XLA sections at dense 512px."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mere_fusion_tpu.ops.pallas_sampler import SamplerSpec, plan_jobs_grouped
from mere_fusion_tpu.ops.encoders import sh_encode
from mere_fusion_tpu.engines.nerf_pallas import _composite_grouped

B, RPT, K, KG = 4096, 64, 16, 4
KS = K // KG
SG = RPT * KS
spec = SamplerSpec(resolution=1024, channels=12, tile_w=8, tile_h=8,
                   k=K, kg=KG, wu=64, wv=32)
bound = 1.0
rng = np.random.default_rng(0)
o_t = jax.device_put(jnp.asarray(rng.uniform(-0.2, 0.2, (B, RPT, 3)).astype(np.float32)))
d_t = jax.device_put(jnp.asarray(rng.standard_normal((B, RPT, 3)).astype(np.float32)))
sp = jax.device_put(jnp.asarray(np.stack([np.full((B, RPT), 0.2), np.full((B, RPT), 1.4)], -1).astype(np.float16)))
va = jax.device_put(jnp.ones((B, RPT), bool))
cw016 = jax.device_put(jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32)))

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

@jax.jit
def plan_fn(o_t, d_t, sp, va, chain):
    spf = sp.astype(jnp.float32)
    zmin, zmax = spf[..., 0], spf[..., 1]
    kfrac = jnp.linspace(0.0, 1.0, K).reshape(KG, KS)
    span = zmax - zmin
    z_g = zmin[:, None, :, None] + span[:, None, :, None] * kfrac[None, :, None, :]
    xyz_g = jnp.clip(o_t[:, None, :, None] + d_t[:, None, :, None] * z_g[..., None], -bound, bound)
    valid_g = jnp.broadcast_to(va[:, None, :, None], (B, KG, RPT, KS))
    scalars, uv, active, overflow = plan_jobs_grouped(
        xyz_g.reshape(B, KG, SG, 3), valid_g.reshape(B, KG, SG), spec, bound)
    return scalars, uv, uv.sum() * 1e-30 + chain

@jax.jit
def dproj_fn(d_t, cw016, chain):
    sh_ray = sh_encode(d_t.reshape(-1, 3), 4).reshape(B, RPT, 16)
    dproj = jnp.pad((sh_ray.astype(jnp.bfloat16) @ cw016.astype(jnp.bfloat16)).astype(jnp.float32),
                    ((0, 0), (0, 0), (0, 64)))
    return dproj, dproj.sum() * 1e-30 + chain

timed("plan grouped (xyz+jobs)", plan_fn, o_t, d_t, sp, va)
timed("sh_ray + dproj", dproj_fn, d_t, cw016)

# ---- composite + scatter section (reads the kernel's [T, kg*sg, 16] output)
sr = jax.device_put(jnp.asarray(
    rng.standard_normal((B, KG * SG, 16)).astype(np.float32)))
z_g = jax.device_put(jnp.asarray(
    rng.uniform(0.2, 1.4, (B, KG, RPT, KS)).astype(np.float32)))
dt_r = jax.device_put(jnp.asarray(np.full((B, RPT), 0.075, np.float32)))
valid_g = jax.device_put(jnp.ones((B, KG, RPT, KS), bool))
bg_t = jax.device_put(jnp.zeros((B, RPT, 3), jnp.float32))
H = Wd = 512

from mere_fusion_tpu.ops.pallas_sampler import from_tiles

@jax.jit
def comp_fn(sr, z_g, dt_r, valid_g, bg_t, chain):
    sigma = sr[..., 0].reshape(B, KG, RPT, KS)
    color = sr[..., 1:4].reshape(B, KG, RPT, KS, 3)
    image, _ = _composite_grouped(sigma, color, dt_r, valid_g, bg_t)
    img = jnp.clip(from_tiles(image, H, Wd, 8, 8).reshape(H, Wd, 3), 0.0, 1.0)
    img = (img * 255).astype(jnp.uint8)
    return img, img.astype(jnp.float32).sum() * 1e-30 + chain

timed("composite+scatter (from sr)", comp_fn, sr, z_g, dt_r, valid_g, bg_t)

@jax.jit
def slice_fn(sr, chain):
    sigma = sr[..., 0].reshape(B, KG, RPT, KS)
    color = sr[..., 1:4].reshape(B, KG, RPT, KS, 3)
    return sigma, color, sigma.sum() * 1e-30 + color.sum() * 1e-30 + chain

timed("  sr slice alone", slice_fn, sr)
