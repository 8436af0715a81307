"""Sampler-kernel experiments: what bounds sample_tiles at dense 512px?

Variants: prefetch depth (ahead), window extent wu, tvc-free (no lateral
tent), fold-free. Timing only — outputs are numerically meaningless for the
reduced-window variants.
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

from mere_fusion_tpu.ops.pallas_sampler import SamplerSpec, sample_tiles

T = 4096  # tiles (full coverage at 512px)
R = 1024
C = 12


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    chain = jnp.zeros((), jnp.float32)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            args = (*args[:-1], args[-1] + out[1] * 1e-30) \
                if isinstance(out, tuple) else args
        jax.tree.map(lambda x: x.block_until_ready(), out)
        np.asarray(out[1] if isinstance(out, tuple) else out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:40s} {best*1e3:8.2f} ms")
    return best


def make_inputs(spec):
    rng = np.random.default_rng(0)
    j = T * 3
    stride = 1 + 2 * spec.kg
    scal = np.zeros((j, stride), np.int32)
    scal[:, 0] = rng.integers(0, 3, j)
    mrows = spec.mip_rows
    for g in range(spec.kg):
        scal[:, 1 + 2 * g] = rng.integers(0, max(1, R - spec.wu), j) & ~7
        scal[:, 2 + 2 * g] = rng.integers(0, max(1, R - spec.wv), j) & ~7
    uv = rng.uniform(0, R, (j, spec.kg, spec.sg, 2)).astype(np.float32)
    planes = rng.standard_normal((3, mrows[-1], R * spec.cp)).astype(np.float32)
    return (jax.device_put(jnp.asarray(scal.reshape(-1))),
            jax.device_put(jnp.asarray(uv)),
            jax.device_put(jnp.asarray(planes, dtype=jnp.bfloat16)))


def run_variant(name, spec, tvc_off=False, fold_off=False, m1_only=False):
    scal, uv, planes = make_inputs(spec)

    def kernel(spec, jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
        wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
        ahead = spec.ahead
        j = pl.program_id(0)
        nj = pl.num_programs(0)
        stride = 1 + 2 * kg

        def copy(job, g, slot):
            base = job * stride
            p = jobs_ref[base]
            ou = pl.multiple_of(jobs_ref[base + 1 + 2 * g], 8)
            ov = pl.multiple_of(jobs_ref[base + 1 + 2 * g + 1], 8)
            return pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(ou, wu),
                              pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
                win.at[slot], sem.at[slot])

        @pl.when(j == 0)
        def _():
            for a in range(ahead):
                @pl.when(a < nj)
                def _(a=a):
                    for g in range(kg):
                        copy(a, g, a * kg + g).start()

        uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1).astype(jnp.float32)
        vx = (jax.lax.broadcasted_iota(jnp.int32, (sg, wv * cp), 1) // cp
              ).astype(jnp.float32)
        fold_to = min(128, wv * cp)
        gx = jax.lax.broadcasted_iota(jnp.int32, (fold_to, cp), 0) % cp
        gc = jax.lax.broadcasted_iota(jnp.int32, (fold_to, cp), 1)
        gsel = (gx == gc).astype(jnp.float32)
        cyc = (j % ahead) * kg

        for g in range(kg):
            slot = cyc + g
            base = j * stride
            ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
            ov = jobs_ref[base + 1 + 2 * g + 1].astype(jnp.float32)
            u = uv_ref[0, g, :, 0] - ou
            v = uv_ref[0, g, :, 1] - ov
            u = jnp.clip(u, 0.0, wu - 1.001)
            v = jnp.clip(v, 0.0, wv - 1.001)
            tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                             ).astype(jnp.bfloat16)
            copy(j, g, slot).wait()
            m1 = jnp.dot(tu, win[slot], preferred_element_type=jnp.float32)
            if m1_only:
                out_ref[0, g] = m1[:, :cp].astype(jnp.bfloat16)
            else:
                if tvc_off:
                    acc = m1
                else:
                    tvc = jnp.maximum(0.0, 1.0 - jnp.abs(vx - v[:, None]))
                    acc = m1 * tvc
                if fold_off:
                    out_ref[0, g] = acc[:, :cp].astype(jnp.bfloat16)
                else:
                    half = wv * cp
                    while half > fold_to:
                        half //= 2
                        acc = acc[:, :half] + acc[:, half:2 * half]
                    out_ref[0, g] = jnp.dot(
                        acc, gsel, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)

            @pl.when(j + ahead < nj)
            def _(g=g, slot=slot):
                copy(j + ahead, g, slot).start()

    jtot = uv.shape[0]
    f = pl.pallas_call(
        functools.partial(kernel, spec),
        grid=(jtot,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spec.kg, spec.sg, 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, spec.kg, spec.sg, spec.cp),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((jtot, spec.kg, spec.sg, spec.cp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * spec.kg, spec.wu, spec.wv * spec.cp),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * spec.kg,)),
        ],
    )
    g = jax.jit(lambda s, u, p: f(s, u, p))
    bench(name, g, scal, uv, planes)


base = SamplerSpec(resolution=R, channels=C, tile_w=8, tile_h=8, k=16, kg=4,
                   wu=64, wv=32)
print("jobs", T * 3, "groups", T * 3 * base.kg, "sg", base.sg)
run_variant("baseline wu64 wv32 ahead4", base)
run_variant("ahead=8", SamplerSpec(resolution=R, channels=C, k=16, kg=4,
                                   wu=64, wv=32, ahead=8))
run_variant("ahead=2", SamplerSpec(resolution=R, channels=C, k=16, kg=4,
                                   wu=64, wv=32, ahead=2))
run_variant("wu=32", SamplerSpec(resolution=R, channels=C, k=16, kg=4,
                                 wu=32, wv=32))
run_variant("wv=16", SamplerSpec(resolution=R, channels=C, k=16, kg=4,
                                 wu=64, wv=16))
run_variant("tvc off (no lateral tent)", base, tvc_off=True)
run_variant("fold off (no regroup)", base, fold_off=True)
run_variant("m1 only (matmul+dma)", base, m1_only=True)
run_variant("kg=2 (2 depth groups)", SamplerSpec(resolution=R, channels=C,
                                                 k=16, kg=2, wu=64, wv=32))


# ---- layout experiments ------------------------------------------------------
def run_layout(name, spec, uv_mode="none", jobs_per_step=1):
    """uv_mode: none (constant coords) | rows ([J, 2*kg, sg] layout)."""
    scal, uv, planes = make_inputs(spec)
    uv_rows = jnp.transpose(uv, (0, 1, 3, 2)).reshape(
        uv.shape[0], 2 * spec.kg, spec.sg)  # [J, kg*2(u,v), sg]
    jps = jobs_per_step

    def kernel(spec, jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
        wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
        ahead = spec.ahead
        jj = pl.program_id(0)
        nj = pl.num_programs(0)
        stride = 1 + 2 * kg

        def copy(step, q, g, slot):
            base = (step * jps + q) * stride
            p = jobs_ref[base]
            ou = pl.multiple_of(jobs_ref[base + 1 + 2 * g], 8)
            ov = pl.multiple_of(jobs_ref[base + 1 + 2 * g + 1], 8)
            return pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(ou, wu),
                              pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
                win.at[slot], sem.at[slot])

        @pl.when(jj == 0)
        def _():
            for a in range(ahead):
                @pl.when(a < nj)
                def _(a=a):
                    for q in range(jps):
                        for g in range(kg):
                            copy(a, q, g, (a % ahead) * jps * kg + q * kg + g).start()

        uu = jax.lax.broadcasted_iota(jnp.int32, (sg, wu), 1).astype(jnp.float32)
        cyc = (jj % ahead) * jps * kg
        for q in range(jps):
            for g in range(kg):
                slot = cyc + q * kg + g
                base = (jj * jps + q) * stride
                ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
                if uv_mode == "none":
                    u = jnp.full((sg,), 8.5, jnp.float32)
                else:
                    u = uv_ref[q, 2 * g, :] - ou
                u = jnp.clip(u, 0.0, wu - 1.001)
                tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u[:, None])
                                 ).astype(jnp.bfloat16)
                copy(jj, q, g, slot).wait()
                m1 = jnp.dot(tu, win[slot], preferred_element_type=jnp.float32)
                out_ref[q, g] = m1[:, :cp].astype(jnp.bfloat16)

                @pl.when(jj + ahead < nj)
                def _(q=q, g=g, slot=slot):
                    copy(jj + ahead, q, g, slot).start()

    jtot = uv.shape[0]
    nsteps = jtot // jps
    f = pl.pallas_call(
        functools.partial(kernel, spec),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((jps, 2 * spec.kg, spec.sg),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((jps, spec.kg, spec.sg, spec.cp),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, spec.kg, spec.sg, spec.cp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * jps * spec.kg, spec.wu,
                        spec.wv * spec.cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * jps * spec.kg,)),
        ],
    )
    g = jax.jit(lambda s, u, p: f(s, u, p))
    bench(name, g, scal, uv_rows, planes)


run_layout("m1, no uv read, jps=1", base, uv_mode="none")
run_layout("m1, uv rows [2kg,sg], jps=1", base, uv_mode="rows")
run_layout("m1, uv rows, jps=4", base, uv_mode="rows", jobs_per_step=4)
run_layout("m1, uv rows, jps=8", base, uv_mode="rows", jobs_per_step=8)
run_layout("m1, no uv, jps=8", base, uv_mode="none", jobs_per_step=8)
