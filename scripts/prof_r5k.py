"""A/B the fused shade_comp kernel variants on dense-512px-shaped operands.

Variants: tent/accumulate dtype (f32 vs bf16), tile shape (16x8 vs 32x8),
DMA prefetch depth. Run: python scripts/prof_r5k.py
"""
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.ops.pallas_sampler import (
    SHADE_WEIGHTS, SamplerSpec, sample_shade_comp_tiles,
)

R = 1024
C = 12
N_RAYS = 512 * 512


def make_inputs(spec, t):
    """Operands generated ON DEVICE (one tiny jitted program): the ~200 MB
    of uv/planes would otherwise crawl through the tunnel's host→device
    transfer path for tens of minutes."""
    j = t * 3
    stride = 1 + 2 * spec.kg

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 8)
        ou = (jax.random.randint(ks[0], (j, spec.kg), 0,
                                 max(1, R - spec.wu)) // 8) * 8
        ov = (jax.random.randint(ks[1], (j, spec.kg), 0,
                                 max(1, R - spec.wv)) // 8) * 8
        scal = jnp.zeros((j, stride), jnp.int32)
        scal = scal.at[:, 1::2].set(ou)
        scal = scal.at[:, 2::2].set(ov)
        u = (ou[:, :, None]
             + jax.random.uniform(ks[2], (j, spec.kg, spec.sg),
                                  maxval=spec.wu - 1.01))
        v = jax.random.uniform(ks[3], (j, spec.kg, spec.sg),
                               maxval=spec.wv - 1.01)
        uv = jnp.stack([u, v], axis=2)                     # [j, kg, 2, sg]
        planes = jax.random.normal(
            ks[4], (3, spec.mip_rows[-1], R * spec.cp), jnp.bfloat16)
        dproj = jax.random.normal(
            ks[5], (t, spec.rays_per_tile, 64), jnp.bfloat16)
        dtv = jnp.zeros((t, spec.rays_per_tile, 8)).at[..., 0].set(0.01)
        return scal.reshape(-1), uv, dproj, dtv, planes

    scal, uv, dproj, dtv, planes = gen(jax.random.key(0))
    shapes = {"wx_aud": (48, 64), "w_aud1": (64, 32), "wx_sig": (48, 64),
              "w_aud_sig": (32, 64), "wx_eye": (48, 16), "w_eye1": (16, 8),
              "w_sig_e": (8, 64), "w_sig1": (64, 64), "w_sigcol": (64, 16),
              "w_geo": (64, 64), "w_col_g": (64, 64), "w_rgb": (64, 16),
              "col_bias": (8, 64)}
    rng = np.random.default_rng(0)
    weights = {k: jnp.asarray(
        0.1 * rng.standard_normal(shapes[k]).astype(np.float32),
        dtype=jnp.bfloat16) for k in SHADE_WEIGHTS}
    return scal, uv, dproj, dtv, weights, planes


def run(name, spec):
    t = N_RAYS // spec.rays_per_tile
    scal, uv, dproj, dtv, weights, planes = make_inputs(spec, t)

    @jax.jit
    def go(planes, scal, uv, dproj, dtv, weights):
        return sample_shade_comp_tiles(
            planes, scal, uv.reshape(t * 3, spec.kg, 2, spec.sg),
            dproj, dtv, weights, spec)

    out = go(planes, scal, uv, dproj, dtv, weights)
    np.asarray(out[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = go(planes, scal, uv, dproj, dtv, weights)
        np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{name:40s} {best*1e3:8.2f} ms", flush=True)
    return best, out


def main():
    base = SamplerSpec(resolution=R, channels=C, tile_w=16, tile_h=8,
                       k=16, kg=4, wu=64, wv=32, tent_bf16=False)
    run("16x8 wv32 merged-shade", base)
    run("32x8 wv32 merged-shade", replace(base, tile_w=32))
    run("16x8 wv16 merged-shade", replace(base, wv=16))
    run("32x8 wv16 merged-shade", replace(base, tile_w=32, wv=16))


if __name__ == "__main__":
    main()
