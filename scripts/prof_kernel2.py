"""Candidate redesign of the triplane sampler kernel, timed at dense 512px.

Design under test (vs ops/pallas_sampler current):
- uv input as lane-major rows [J, kg, 2, sg] (sg=1024 minor) instead of
  [J, kg, sg, 2] (minor dim 2 -> 64x lane padding on the block DMA).
- one grid step = one TILE = 3 plane jobs (jps=3), writing plane-minor
  output [T, kg, sg, 3*cp] so the MLP consumes it reshape-free.
- full pipeline (tu matmul, tvc tent, fold tree, selector matmul).

Run: python scripts/prof_kernel2.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mere_fusion_tpu.ops.pallas_sampler import SamplerSpec

R = 1024
C = 12
N_RAYS = 512 * 512
T = None  # set per-spec: N_RAYS // rays_per_tile


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[0, 0, 0, 0])  # tiny device-side readback
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


def make_inputs(spec, T):
    rng = np.random.default_rng(0)
    j = T * 3
    stride = 1 + 2 * spec.kg
    scal = np.zeros((j, stride), np.int32)
    scal[:, 0] = rng.integers(0, 3, j)
    for g in range(spec.kg):
        scal[:, 1 + 2 * g] = rng.integers(0, max(1, R - spec.wu), j) & ~7
        scal[:, 2 + 2 * g] = rng.integers(0, max(1, R - spec.wv), j) & ~7
    uv = rng.uniform(0, R, (j, spec.kg, 2, spec.sg)).astype(np.float32)
    planes = rng.standard_normal(
        (3, spec.mip_rows[-1], R * spec.cp)).astype(np.float32)
    return (jax.device_put(jnp.asarray(scal.reshape(-1))),
            jax.device_put(jnp.asarray(uv)),
            jax.device_put(jnp.asarray(planes, dtype=jnp.bfloat16)))


def run(name, spec, m1_only=False, ahead=2):
    T = N_RAYS // spec.rays_per_tile
    scal, uv, planes = make_inputs(spec, T)

    def kernel(spec, jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
        wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
        i = pl.program_id(0)
        ni = pl.num_programs(0)
        stride = 1 + 2 * kg

        def copy(step, q, g, slot):
            base = (step * 3 + q) * stride
            p = jobs_ref[base]
            ou = pl.multiple_of(jobs_ref[base + 1 + 2 * g], 8)
            ov = pl.multiple_of(jobs_ref[base + 1 + 2 * g + 1], 8)
            return pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(ou, wu),
                              pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
                win.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            for a in range(ahead):
                @pl.when(a < ni)
                def _(a=a):
                    for q in range(3):
                        for g in range(kg):
                            copy(a, q, g, (a * 3 + q) * kg + g).start()

        uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1).astype(jnp.float32)
        vx = (jax.lax.broadcasted_iota(jnp.int32, (sg, wv * cp), 1) // cp
              ).astype(jnp.float32)
        fold_to = min(128, wv * cp)
        # selector with the identity block at lane offset q*cp: one matmul
        # per plane writes its channels into the plane-minor [sg, 3cp] row
        gx = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 0) % cp
        gc = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 1)
        gsels = [
            ((gx + q * cp == gc)).astype(jnp.float32) for q in range(3)
        ]
        cyc = (i % ahead) * 3 * kg

        for g in range(kg):
            accs = []
            for q in range(3):
                slot = cyc + q * kg + g
                base = (i * 3 + q) * stride
                ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
                ov = jobs_ref[base + 1 + 2 * g + 1].astype(jnp.float32)
                u = uv_ref[q, g, 0, :] - ou
                v = uv_ref[q, g, 1, :] - ov
                u = jnp.clip(u, 0.0, wu - 1.001)
                v = jnp.clip(v, 0.0, wv - 1.001)
                tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                                 ).astype(jnp.bfloat16)
                copy(i, q, g, slot).wait()
                m1 = jnp.dot(tu, win[slot], preferred_element_type=jnp.float32)
                if m1_only:
                    acc = m1[:, :fold_to]
                else:
                    tvc = jnp.maximum(0.0, 1.0 - jnp.abs(vx - v[:, None]))
                    acc = m1 * tvc
                    half = wv * cp
                    while half > fold_to:
                        half //= 2
                        acc = acc[:, :half] + acc[:, half:2 * half]
                accs.append(jnp.dot(acc, gsels[q],
                                    preferred_element_type=jnp.float32))

                @pl.when(i + ahead < ni)
                def _(q=q, g=g, slot=slot):
                    copy(i + ahead, q, g, slot).start()

            out_ref[0, g] = (accs[0] + accs[1] + accs[2]).astype(jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(kernel, spec),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, spec.kg, 2, spec.sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.kg, spec.sg, 3 * spec.cp),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, spec.kg, spec.sg, 3 * spec.cp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((ahead * 3 * spec.kg, spec.wu, spec.wv * spec.cp),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((ahead * 3 * spec.kg,)),
        ],
    )
    g = jax.jit(lambda s, u, p: f(s, u, p))
    bench(name, g, scal, uv, planes)


base = SamplerSpec(resolution=R, channels=C, tile_w=8, tile_h=8, k=16, kg=4,
                   wu=64, wv=32)
run("base 8x8 kg4 full", base)
run("base 8x8 kg4 m1", base, m1_only=True)
run("16x8 kg4 full", SamplerSpec(resolution=R, channels=C, tile_w=16,
                                 tile_h=8, k=16, kg=4, wu=64, wv=32))
run("16x16 kg4 full", SamplerSpec(resolution=R, channels=C, tile_w=16,
                                  tile_h=16, k=16, kg=4, wu=64, wv=32))
run("8x8 kg2 full", SamplerSpec(resolution=R, channels=C, tile_w=8,
                                tile_h=8, k=16, kg=2, wu=64, wv=32))
run("16x8 kg2 full", SamplerSpec(resolution=R, channels=C, tile_w=16,
                                 tile_h=8, k=16, kg=2, wu=64, wv=32))
run("16x8 kg4 wv16 full", SamplerSpec(resolution=R, channels=C, tile_w=16,
                                      tile_h=8, k=16, kg=4, wu=64, wv=16))
