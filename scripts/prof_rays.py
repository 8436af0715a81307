"""Time render_rays_tiles standalone at dense 512px."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mere_fusion_tpu.ops.pallas_sampler import (
    SamplerSpec, SHADE_WEIGHTS, render_rays_tiles)

R, C = 1024, 12
T = 4096
spec = SamplerSpec(resolution=R, channels=C, tile_w=8, tile_h=8, k=16, kg=4,
                   wu=64, wv=32)
rng = np.random.default_rng(0)
j = T * 3
stride = 1 + 4 * spec.kg
scal = np.zeros((j, stride), np.int32)
scal[:, 0] = rng.integers(0, 3, j)
for g in range(spec.kg):
    scal[:, 1 + 4 * g] = rng.integers(0, R - spec.wu, j) & ~7
    scal[:, 2 + 4 * g] = rng.integers(0, R - spec.wv, j) & ~7
scal = jax.device_put(jnp.asarray(scal.reshape(-1)))
rays = jax.device_put(jnp.asarray(
    rng.standard_normal((T, spec.rays_per_tile, 8)).astype(np.float32)))
proj = jax.device_put(jnp.asarray(
    rng.standard_normal((T, spec.rays_per_tile, 64)).astype(np.float32)))
planes = jax.device_put(jnp.asarray(
    rng.standard_normal((3, spec.mip_rows[-1], R * spec.cp)), jnp.bfloat16))
shapes = {"wx_aud": (48, 64), "w_aud1": (64, 32), "wx_sig": (48, 64),
          "w_aud_sig": (32, 64), "wx_eye": (48, 16), "w_eye1": (16, 8),
          "w_sig_e": (8, 64), "w_sig1": (64, 64), "w_sigcol": (64, 16),
          "w_geo": (64, 64), "w_col_g": (64, 64), "w_rgb": (64, 16),
          "col_bias": (8, 64)}
weights = {k: jax.device_put(jnp.asarray(
    0.05 * rng.standard_normal(shapes[k]), jnp.bfloat16))
    for k in SHADE_WEIGHTS}

def bench(name, fn, *args, iters=20):
    out = fn(*args)
    out.block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)

f = jax.jit(lambda s, r, d, w, p: render_rays_tiles(p, s, r, d, w, spec, 1.0))
bench("rays kernel (in-kernel uv)", f, scal, rays, proj, weights, planes)
