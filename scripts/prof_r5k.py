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
    rng = np.random.default_rng(0)
    j = t * 3
    stride = 1 + 2 * spec.kg
    scal = np.zeros((j, stride), np.int32)
    for g in range(spec.kg):
        scal[:, 1 + 2 * g] = rng.integers(0, max(1, R - spec.wu), j) & ~7
        scal[:, 2 + 2 * g] = rng.integers(0, max(1, R - spec.wv), j) & ~7
    uv = np.zeros((j, spec.kg, 2, spec.sg), np.float32)
    for g in range(spec.kg):
        uv[:, g, 0] = (scal[:, 1 + 2 * g, None]
                       + rng.uniform(0, spec.wu - 1.01, (j, spec.sg)))
        uv[:, g, 1] = rng.uniform(0, spec.wv - 1.01, (j, spec.sg))
    planes = rng.standard_normal(
        (3, spec.mip_rows[-1], R * spec.cp)).astype(np.float32)
    dproj = rng.standard_normal((t, spec.rays_per_tile, 64)).astype(np.float32)
    dtv = np.zeros((t, spec.rays_per_tile, 8), np.float32)
    dtv[..., 0] = 0.01
    shapes = {"wx_aud": (48, 64), "w_aud1": (64, 32), "wx_sig": (48, 64),
              "w_aud_sig": (32, 64), "wx_eye": (48, 16), "w_eye1": (16, 8),
              "w_sig_e": (8, 64), "w_sig1": (64, 64), "w_sigcol": (64, 16),
              "w_geo": (64, 64), "w_col_g": (64, 64), "w_rgb": (64, 16),
              "col_bias": (8, 64)}
    weights = {k: jnp.asarray(
        0.1 * rng.standard_normal(shapes[k]).astype(np.float32),
        dtype=jnp.bfloat16) for k in SHADE_WEIGHTS}
    return (jax.device_put(jnp.asarray(scal.reshape(-1))),
            jax.device_put(jnp.asarray(uv)),
            jax.device_put(jnp.asarray(dproj, dtype=jnp.bfloat16)),
            jax.device_put(jnp.asarray(dtv)),
            jax.device_put(jax.tree.map(jnp.asarray, weights)),
            jax.device_put(jnp.asarray(planes, dtype=jnp.bfloat16)))


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
    _, o_f32 = run("16x8 f32 tents (r4 baseline)", base)
    _, o_bf16 = run("16x8 bf16 tents", replace(base, tent_bf16=True))
    d = np.abs(np.asarray(o_f32) - np.asarray(o_bf16))
    den = np.abs(np.asarray(o_f32)).max()
    print(f"   bf16-vs-f32 max abs diff {d.max():.5f} (rel {d.max()/den:.5f})")
    run("32x8 bf16 tents", replace(base, tile_w=32, tent_bf16=True))
    run("16x16 bf16 tents", replace(base, tile_w=16, tile_h=16,
                                    tent_bf16=True))
    run("16x8 bf16 ahead=3", replace(base, tent_bf16=True, ahead=3))
    run("16x8 bf16 kg=2", replace(base, tent_bf16=True, kg=2))


if __name__ == "__main__":
    main()
