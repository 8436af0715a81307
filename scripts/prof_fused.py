"""Time sample_shade_tiles standalone at dense 512px vs sample_tiles."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mere_fusion_tpu.ops.pallas_sampler import (
    SamplerSpec, SHADE_WEIGHTS, sample_shade_tiles, sample_tiles)

R, C = 1024, 12
T = 4096
spec = SamplerSpec(resolution=R, channels=C, tile_w=8, tile_h=8, k=16, kg=4,
                   wu=64, wv=32)
rng = np.random.default_rng(0)
j = T * 3
stride = 1 + 2 * spec.kg
scal = np.zeros((j, stride), np.int32)
scal[:, 0] = rng.integers(0, 3, j)
for g in range(spec.kg):
    scal[:, 1 + 2 * g] = rng.integers(0, R - spec.wu, j) & ~7
    scal[:, 2 + 2 * g] = rng.integers(0, R - spec.wv, j) & ~7
scal = jax.device_put(jnp.asarray(scal.reshape(-1)))
uv = jax.device_put(jnp.asarray(
    rng.uniform(0, R, (j, spec.kg, 2, spec.sg)).astype(np.float32)))
planes = jax.device_put(jnp.asarray(
    rng.standard_normal((3, spec.mip_rows[-1], R * spec.cp)), jnp.bfloat16))
dproj = jax.device_put(jnp.asarray(
    rng.standard_normal((T, spec.rays_per_tile, 128)).astype(np.float32)))
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
    print(f"{name:36s} {best*1e3:8.2f} ms", flush=True)

f1 = jax.jit(lambda s, u, p: sample_tiles(p, s, u, spec))
f2 = jax.jit(lambda s, u, d, w, p: sample_shade_tiles(p, s, u, d, w, spec))
bench("sample_tiles (features only)", f1, scal, uv, planes)
bench("sample_shade_tiles (fused)", f2, scal, uv, dproj, weights, planes)
