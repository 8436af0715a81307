"""Isolate what bounds the tile-step sampler kernel at dense 512px.

Probes (base spec 8x8 kg4, T=4096, full-coverage):
  A m1-only, tu built from uv (lane->sublane transpose of u per window)
  B m1-only, tu CONSTANT precomputed bf16 (pure DMA + matmul floor)
  C m1-only transposed: tuT [wu, sg] built lane-major (no transpose),
    m1T = dot_general(tuT, win, contract dim0/dim0) -> [sg? no, [wvcp, sg]]
    wait: contract tuT dim0 (wu) with win dim0 (wu) -> [sg, wvcp]. MXU
    contracts sublanes natively or via the transpose unit.
  D full pipeline fully transposed: m1T [wvcp, sg], tvcT lane-major,
    sublane fold, selector dot_general -> outT [3cp, sg].
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


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[0])
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


def run(name, spec, mode, ahead=2):
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

        cyc = (i % ahead) * 3 * kg
        dn = (((0,), (0,)), ((), ()))  # contract dim0 x dim0

        if mode == "B":
            tu_const = (jax.lax.broadcasted_iota(
                jnp.int32, (sg, wu), 1).astype(jnp.float32)
                * 0.01).astype(jnp.bfloat16)
        uuT = jax.lax.broadcasted_iota(jnp.int32, (wu, sg), 0
                                       ).astype(jnp.float32)
        uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1
                                      ).astype(jnp.float32)
        vxT = (jax.lax.broadcasted_iota(jnp.int32, (wv * cp, sg), 0) // cp
               ).astype(jnp.float32)
        vx = (jax.lax.broadcasted_iota(jnp.int32, (sg, wv * cp), 1) // cp
              ).astype(jnp.float32)
        vx_b = vx.astype(jnp.bfloat16)
        fold_to = min(128, wv * cp)
        gx = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 0) % cp
        gc = jax.lax.broadcasted_iota(jnp.int32, (fold_to, 3 * cp), 1)
        gsels = [((gx + q * cp == gc)).astype(jnp.bfloat16) for q in range(3)]

        for g in range(kg):
            accs = []
            for q in range(3):
                slot = cyc + q * kg + g
                base = (i * 3 + q) * stride
                ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
                ov = jobs_ref[base + 1 + 2 * g + 1].astype(jnp.float32)
                u = jnp.clip(uv_ref[q, g, 0, :] - ou, 0.0, wu - 1.001)
                v = jnp.clip(uv_ref[q, g, 1, :] - ov, 0.0, wv - 1.001)
                copy(i, q, g, slot).wait()
                if mode == "A":
                    tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                                     ).astype(jnp.bfloat16)
                    r = jnp.dot(tu, win[slot],
                                preferred_element_type=jnp.float32)
                    r = r[:, :fold_to]
                elif mode == "B":
                    r = jnp.dot(tu_const, win[slot],
                                preferred_element_type=jnp.float32)
                    r = r[:, :fold_to]
                elif mode == "C":
                    tuT = jnp.maximum(0.0, 1.0 - jnp.abs(uuT - u[None, :])
                                      ).astype(jnp.bfloat16)
                    r = jax.lax.dot_general(
                        tuT, win[slot], dn,
                        preferred_element_type=jnp.float32)  # [sg, wvcp]
                    r = r[:, :fold_to]
                elif mode == "E":  # full pipeline, bf16 tvc+fold
                    tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                                     ).astype(jnp.bfloat16)
                    copy_done = None
                    m1 = jnp.dot(tu, win[slot],
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
                    tvc = jnp.maximum(
                        0.0, 1.0 - jnp.abs(vx - v[:, None])
                    ).astype(jnp.bfloat16)
                    acc = m1 * tvc
                    half = wv * cp
                    while half > fold_to:
                        half //= 2
                        acc = acc[:, :half] + acc[:, half:2 * half]
                    r = jnp.dot(acc, gsels[q],
                                preferred_element_type=jnp.float32)
                elif mode == "F":  # full pipeline, f32 (reference shape)
                    tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                                     ).astype(jnp.bfloat16)
                    m1 = jnp.dot(tu, win[slot],
                                 preferred_element_type=jnp.float32)
                    tvc = jnp.maximum(0.0, 1.0 - jnp.abs(vx - v[:, None]))
                    acc = m1 * tvc
                    half = wv * cp
                    while half > fold_to:
                        half //= 2
                        acc = acc[:, :half] + acc[:, half:2 * half]
                    r = jnp.dot(acc.astype(jnp.bfloat16), gsels[q],
                                preferred_element_type=jnp.float32)
                else:  # D: fully transposed full pipeline
                    tuT = jnp.maximum(0.0, 1.0 - jnp.abs(uuT - u[None, :])
                                      ).astype(jnp.bfloat16)
                    m1T = jax.lax.dot_general(
                        win[slot], tuT, dn,
                        preferred_element_type=jnp.float32)  # [wvcp, sg]
                    tvcT = jnp.maximum(0.0, 1.0 - jnp.abs(vxT - v[None, :]))
                    accT = m1T * tvcT
                    half = wv * cp
                    while half > fold_to:
                        half //= 2
                        accT = accT[:half] + accT[half:2 * half]
                    r = jax.lax.dot_general(
                        accT.astype(jnp.bfloat16), gsels[q], dn,
                        preferred_element_type=jnp.float32)  # [sg, 3cp]
                accs.append(r)

                @pl.when(i + ahead < ni)
                def _(q=q, g=g, slot=slot):
                    copy(i + ahead, q, g, slot).start()

            if mode == "D":
                out_ref[0, g] = (accs[0] + accs[1] + accs[2]
                                 ).astype(jnp.bfloat16)
            else:
                out_ref[0, g] = (accs[0][:, :3 * cp] + accs[1][:, :3 * cp]
                                 + accs[2][:, :3 * cp]).astype(jnp.bfloat16)

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
run("E full pipeline bf16 tvc+fold", base, "E")
run("F full pipeline f32 (reference)", base, "F")
