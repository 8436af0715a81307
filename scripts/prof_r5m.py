"""Isolate the fused kernel's wall: window-matmul section only, vs a
block-diagonal formulation that issues ONE matmul per plane instead of one
per (plane, depth-group). Run: python scripts/prof_r5m.py"""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mere_fusion_tpu.ops.pallas_sampler import SamplerSpec
from scripts.prof_r5k import R, C, N_RAYS, make_inputs


def bench(name, go, *args):
    out = go(*args)
    np.asarray(out[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = go(*args)
        np.asarray(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)


def m1_only(spec, blockdiag):
    """Window DMA + tu tent + m1 matmuls, nothing else."""
    wu, wv, cp, sg, kg = spec.wu, spec.wv, spec.cp, spec.sg, spec.kg
    ahead = spec.ahead
    stride = 1 + 2 * kg
    t = N_RAYS // spec.rays_per_tile

    def kernel(jobs_ref, uv_ref, planes_ref, out_ref, win, sem):
        i = pl.program_id(0)
        ni = pl.num_programs(0)

        def copy(step, q, g, slot):
            base = (step * 3 + q) * stride
            p = jobs_ref[base]
            ou = pl.multiple_of(jobs_ref[base + 1 + 2 * g], 8)
            ov = pl.multiple_of(jobs_ref[base + 1 + 2 * g + 1], 8)
            if blockdiag:
                return pltpu.make_async_copy(
                    planes_ref.at[p, pl.ds(ou, wu),
                                  pl.ds(pl.multiple_of(ov * cp, 128),
                                        wv * cp)],
                    win.at[slot // kg, pl.ds((slot % kg) * wu, wu)],
                    sem.at[slot],
                )
            return pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(ou, wu),
                              pl.ds(pl.multiple_of(ov * cp, 128), wv * cp)],
                win.at[slot], sem.at[slot],
            )

        @pl.when(i == 0)
        def _():
            for a in range(ahead):
                @pl.when(a < ni)
                def _(a=a):
                    for q in range(3):
                        for g in range(kg):
                            copy(a, q, g, (a * 3 + q) * kg + g).start()

        if not blockdiag:
            uu = jax.lax.broadcasted_iota(
                jnp.int32, (sg, wu), 1).astype(jnp.float32)
            acc = jnp.zeros((sg, 128), jnp.float32)
            for q in range(3):
                for g in range(kg):
                    slot = (i % ahead) * 3 * kg + q * kg + g
                    base = (i * 3 + q) * stride
                    ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
                    u = uv_ref[q, g, 0, :][:, None] - ou
                    u = jnp.clip(u, 0.0, wu - 1.001)
                    tu = jnp.maximum(0.0, 1.0 - jnp.abs(uu - u)
                                     ).astype(jnp.bfloat16)
                    copy(i, q, g, slot).wait()
                    m1 = jnp.dot(tu, win[slot],
                                 preferred_element_type=jnp.float32)
                    acc = acc + m1[:, :128]
                    @pl.when(i + ahead < ni)
                    def _(q=q, g=g, slot=slot):
                        copy(i + ahead, q, g, slot).start()
            out_ref[0] = acc
        else:
            # ONE [kg·sg, kg·wu] @ [kg·wu, wv·cp] matmul per plane: rows are
            # the kg groups' samples stacked; the tent lives only in its
            # group's wu-column block (block-diagonal lhs, dense rhs)
            ns = kg * sg
            col = jax.lax.broadcasted_iota(jnp.int32, (ns, kg * wu), 1)
            gid = jax.lax.broadcasted_iota(jnp.int32, (ns, kg * wu), 0) // sg
            colf = col.astype(jnp.float32)
            acc = jnp.zeros((ns, 128), jnp.float32)
            for q in range(3):
                base = (i * 3 + q) * stride
                us = []
                for g in range(kg):
                    ou = jobs_ref[base + 1 + 2 * g].astype(jnp.float32)
                    u = uv_ref[q, g, 0, :][:, None] - ou
                    us.append(jnp.clip(u, 0.0, wu - 1.001) + g * wu)
                u_cat = jnp.concatenate(us, axis=0)        # [ns, 1]
                tu = jnp.where(col // wu == gid,
                               jnp.maximum(0.0, 1.0 - jnp.abs(colf - u_cat)),
                               0.0).astype(jnp.bfloat16)
                slot3 = (i % ahead) * 3 + q
                for g in range(kg):
                    copy(i, q, g, ((i % ahead) * 3 + q) * kg + g).wait()
                m1 = jnp.dot(tu, win[slot3],
                             preferred_element_type=jnp.float32)
                acc = acc + m1[:, :128]
                @pl.when(i + ahead < ni)
                def _(q=q):
                    for g in range(kg):
                        copy(i + ahead, q, g,
                             ((i % ahead) * 3 + q) * kg + g).start()
            out_ref[0] = acc

    rows = sg if not blockdiag else kg * sg
    scratch = (pltpu.VMEM((ahead * 3 * kg, wu, wv * cp), jnp.bfloat16)
               if not blockdiag else
               pltpu.VMEM((ahead * 3, kg * wu, wv * cp), jnp.bfloat16))
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, kg, 2, sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, rows, 128), jnp.float32),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA((ahead * 3 * kg,))],
    )


def sections(spec, mode):
    """Staged replica of _shade_comp_kernel: 'win' = m1+tvc+fold+selector
    (the full group_acc), 'shade' = win + shade MLPs, 'full' = + composite."""
    from mere_fusion_tpu.ops.pallas_sampler import (
        SHADE_WEIGHTS, _bcast_ray_rows, _composite_rows, _shade_core,
        _uv_from_ref, _window_machinery,
    )
    sg, kg = spec.sg, spec.kg
    rpt = spec.rays_per_tile
    t = N_RAYS // rpt

    def kernel(jobs_ref, uv_ref, dproj_ref, dtv_ref, *refs):
        *weights, planes_ref, out_ref, win, sem = refs
        w = dict(zip(SHADE_WEIGHTS, weights))
        i = pl.program_id(0)
        ni = pl.num_programs(0)
        prefetch, group_acc = _window_machinery(spec, jobs_ref, planes_ref,
                                                win, sem)

        @pl.when(i == 0)
        def _():
            prefetch(ni)

        uv_fn = _uv_from_ref(uv_ref)
        x = jnp.concatenate(
            [group_acc(uv_fn, i, ni, g) for g in range(kg)], axis=0)
        if mode == "win":
            # consume EVERY row and lane of x (a bare slice lets the
            # compiler dead-code most of the window section)
            ns = kg * sg
            acc = jnp.zeros((rpt, 16), jnp.float32)
            for r0 in range(0, ns, rpt):
                for l0 in range(0, x.shape[1], 16):
                    acc = acc + x[r0:r0 + rpt, l0:l0 + 16]
            out_ref[0] = acc
            return
        dsamp = _bcast_ray_rows(dproj_ref[0], spec, 64).astype(jnp.float32)
        sig_p, rgb_p = _shade_core(spec, w, x, dsamp)
        if mode == "shade":
            out_ref[0] = sig_p[:rpt] + rgb_p[:rpt]
            return
        dtv = _bcast_ray_rows(dtv_ref[0], spec, 1)
        out_ref[0] = _composite_rows(spec, sig_p, rgb_p, dtv)

    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, kg, 2, sg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpt, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in SHADE_WEIGHTS]
          + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, rpt, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, rpt, 16), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((spec.ahead * 3 * kg, spec.wu, spec.wv * spec.cp),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((spec.ahead * 3 * kg,)),
        ],
    )


def main():
    from mere_fusion_tpu.ops.pallas_sampler import SHADE_WEIGHTS
    for tw, wv in ((16, 32),):
        spec = SamplerSpec(resolution=R, channels=C, tile_w=tw, tile_h=8,
                           k=16, kg=4, wu=64, wv=wv)
        t = N_RAYS // spec.rays_per_tile
        scal, uv, dproj, dtv, weights, planes = make_inputs(spec, t)
        uvr = uv.reshape(t * 3, spec.kg, 2, spec.sg)

        call = m1_only(spec, False)
        go = jax.jit(lambda planes, scal, uvr, call=call:
                     call(scal, uvr, planes))
        bench(f"{tw}x8 wv{wv} m1-only", go, planes, scal, uvr)
        for mode in ("win", "shade", "full"):
            call = sections(spec, mode)
            wl = [weights[k] for k in SHADE_WEIGHTS]
            go = jax.jit(lambda planes, scal, uvr, dproj, dtv, *wl,
                         call=call: call(scal, uvr, dproj, dtv, *wl, planes))
            bench(f"{tw}x8 wv{wv} section={mode}", go, planes, scal, uvr,
                  dproj, dtv, *wl)


if __name__ == "__main__":
    main()
