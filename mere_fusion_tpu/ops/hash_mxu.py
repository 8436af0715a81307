"""Hash-grid encode as one-hot MXU matmuls — the training-path gather killer.

The XLA gather that backs ops.hashgrid.grid_encode runs at a fixed
~7.7 ns/row on TPU regardless of table size or index order (measured:
3.1 M random lookups per plane serialize at ~130 M/s), which made the
hash encode dominate the ER-NeRF training step (reference trains with
random rays — ernerf/nerf_triplane/utils.py:255-343 — so the tile-coherent
windowed sampler in ops.pallas_sampler does not apply).

This module replaces gather+scatter with MXU selection, which works for
RANDOM indices:

- every level's table is padded to [H, 128·C] (row-major: row = idx // 128,
  lane group = idx % 128), H = padded_rows/128 ≤ 128 for ER-NeRF's 2^14
  hashmap;
- a lookup idx = hi·128 + lo becomes
      tmp[s, :] = onehot(hi)[s, H] @ table[H, 128·C]        (MXU)
      out[s, c] = Σ_k (k//C == lo[s]) · tmp[s, k] · G[k, c]  (mask + MXU)
  i.e. 128·C MACs·H/128 per lookup instead of a serialized gather row —
  ~20× faster at ER-NeRF sizes despite the extra FLOPs;
- the backward pass w.r.t. the table is the transposed matmul
  (onehotᵀ @ masked-cotangent), replacing the XLA scatter-add that
  mirrors gridencoder.cu:227.

The weight cotangent (needed only when the encode input depends on params,
e.g. the torso deformation path) is computed with a plain XLA gather in the
custom-vjp backward; XLA dead-code-eliminates it in the head-training path
where ray positions are parameter-free.

Numerics: tables and one-hots stay float32 end-to-end (a one-hot matmul
selects exact table entries; the only rounding is the f32 multiply-add of
the corner lerp, same as the gather path) — verified bit-close against
grid_encode in tests/test_hash_mxu.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mere_fusion_tpu.ops.hashgrid import GridSpec, corner_indices_weights

# Module override for tests: None = auto (TPU only), True/False = force.
FORCE: bool | None = None

_NB = 1024          # samples per grid step
_MIN_N = 2048       # below this the gather path wins (dispatch overhead)


def enabled_for(x: jnp.ndarray, spec: GridSpec) -> bool:
    if FORCE is not None:
        return FORCE
    return (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and x.shape[0] >= _MIN_N
        and spec.input_dim == 2
    )


def interpret_mode() -> bool:
    """Pallas interpret mode is needed off-TPU (tests force FORCE=True
    on the CPU mesh with small shapes)."""
    return jax.default_backend() != "tpu"


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def pad_tables(tables_flat: list, specs: list, h: int) -> jax.Array:
    """Flat level-concatenated tables → [G, H, 128·C] row-major blocks.

    tables_flat: list of [total_params, C] arrays (one per grid/plane);
    specs: matching GridSpec per table (all with the same level_dim C).
    G = Σ num_levels. h = rows (= padded_size // 128) shared by all groups.
    """
    groups = []
    for table, spec in zip(tables_flat, specs):
        c = spec.level_dim
        for (_, _, hsize, offset) in spec.level_params():
            lvl = jax.lax.dynamic_slice_in_dim(table, offset, hsize, 0)
            pad = h * 128 - hsize
            lvl = jnp.pad(lvl, ((0, pad), (0, 0)))
            groups.append(lvl.reshape(h, 128 * c))
    return jnp.stack(groups)


def unpad_tables(dtables: jax.Array, specs: list) -> list:
    """[G, H, 128·C] cotangents → list of flat [total_params, C] trees."""
    out = []
    g = 0
    for spec in specs:
        c = spec.level_dim
        parts = []
        for (_, _, hsize, _offset) in spec.level_params():
            parts.append(dtables[g].reshape(-1, c)[:hsize])
            g += 1
        out.append(jnp.concatenate(parts, axis=0))
    return out


def _fwd_kernel(nb: int, h: int, c: int, cp: int, ncorner: int,
                idx_ref, w_ref, table_ref, out_ref):
    table = table_ref[0]                                        # [H, 128C]
    lanes = 128 * c
    il = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1) // c
    ih = jax.lax.broadcasted_iota(jnp.int32, (nb, h), 1)
    gk = jax.lax.broadcasted_iota(jnp.int32, (lanes, cp), 0) % c
    gc = jax.lax.broadcasted_iota(jnp.int32, (lanes, cp), 1)
    gmat = ((gk == gc) & (gc < c)).astype(jnp.float32)          # [128C, CP]
    acc = jnp.zeros((nb, cp), jnp.float32)
    for k in range(ncorner):
        idxv = idx_ref[0, k, :]                                 # [NB] f32
        wv = w_ref[0, k, :]
        hi = jnp.floor(idxv * (1.0 / 128.0))
        lo = (idxv - hi * 128.0).astype(jnp.int32)
        oh = (ih == hi.astype(jnp.int32)[:, None]).astype(jnp.float32)            # [NB, H]
        tmp = jnp.dot(oh, table, preferred_element_type=jnp.float32)
        masked = jnp.where(il == lo[:, None], tmp, 0.0)
        sel = jnp.dot(masked, gmat, preferred_element_type=jnp.float32)
        acc = acc + wv[:, None] * sel
    out_ref[0] = acc


def _bwd_kernel(nb: int, h: int, c: int, cp: int, ncorner: int,
                idx_ref, w_ref, g_ref, dtable_ref):
    b = pl.program_id(1)
    lanes = 128 * c
    il = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1) // c
    ih = jax.lax.broadcasted_iota(jnp.int32, (nb, h), 1)
    gk = jax.lax.broadcasted_iota(jnp.int32, (cp, lanes), 1) % c
    gc = jax.lax.broadcasted_iota(jnp.int32, (cp, lanes), 0)
    gmat_t = ((gk == gc) & (gc < c)).astype(jnp.float32)        # [CP, 128C]
    gout = g_ref[0]                                             # [NB, CP]
    gex = jnp.dot(gout, gmat_t, preferred_element_type=jnp.float32)

    @pl.when(b == 0)
    def _():
        dtable_ref[0] = jnp.zeros((h, lanes), jnp.float32)

    acc = dtable_ref[0]
    for k in range(ncorner):
        idxv = idx_ref[0, k, :]
        wv = w_ref[0, k, :]
        hi = jnp.floor(idxv * (1.0 / 128.0))
        lo = (idxv - hi * 128.0).astype(jnp.int32)
        oh = (ih == hi.astype(jnp.int32)[:, None]).astype(jnp.float32)            # [NB, H]
        ghat = jnp.where(il == lo[:, None], gex, 0.0) * wv[:, None]
        acc = acc + jax.lax.dot_general(
            oh, ghat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [H, 128C]
    dtable_ref[0] = acc


def _lookup_fwd_call(tables, idx, w, interpret: bool):
    g, h, lanes = tables.shape
    c = lanes // 128
    cp = _round_up(c, 8)
    ncorner = idx.shape[1]
    n = idx.shape[2]
    nblk = n // _NB
    kernel = functools.partial(_fwd_kernel, _NB, h, c, cp, ncorner)
    out = pl.pallas_call(
        kernel,
        grid=(g, nblk),
        in_specs=[
            pl.BlockSpec((1, ncorner, _NB), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncorner, _NB), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lanes), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NB, cp), lambda i, b: (i, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, cp), jnp.float32),
        interpret=interpret,
    )(idx, w, tables)
    return out[..., :c]


def _lookup_bwd_call(tables_shape, idx, w, gout, interpret: bool):
    g, h, lanes = tables_shape
    c = lanes // 128
    cp = _round_up(c, 8)
    ncorner = idx.shape[1]
    n = idx.shape[2]
    nblk = n // _NB
    gout_p = jnp.pad(gout, ((0, 0), (0, 0), (0, cp - c)))
    kernel = functools.partial(_bwd_kernel, _NB, h, c, cp, ncorner)
    return pl.pallas_call(
        kernel,
        grid=(g, nblk),
        in_specs=[
            pl.BlockSpec((1, ncorner, _NB), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncorner, _NB), lambda i, b: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NB, cp), lambda i, b: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, lanes), lambda i, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, h, lanes), jnp.float32),
        interpret=interpret,
    )(idx, w, gout_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lookup(tables, idx, w, interpret: bool = False):
    """tables [G, H, 128·C] f32, idx [G, K, N] f32 (row index, local to the
    group), w [G, K, N] f32 corner weights → out [G, N, C] f32 with
    out[g, n, :] = Σ_k w[g,k,n] · tables[g].reshape(-1, C)[idx[g,k,n]]."""
    return _lookup_fwd_call(tables, idx, w, interpret)


def _lookup_fwd(tables, idx, w, interpret):
    return _lookup_fwd_call(tables, idx, w, interpret), (tables, idx, w)


def _lookup_bwd(interpret, res, gout):
    tables, idx, w = res
    dtables = _lookup_bwd_call(tables.shape, idx, w, gout, interpret)
    # dw via a plain gather — only alive when the encode input itself
    # depends on parameters (torso deformation); DCE'd otherwise.
    g, h, lanes = tables.shape
    c = lanes // 128
    flat = tables.reshape(g, h * 128, c)
    vals = jnp.take_along_axis(
        flat, idx.astype(jnp.int32).reshape(g, -1, 1), axis=1
    ).reshape(g, idx.shape[1], idx.shape[2], c)
    dw = jnp.einsum("gknc,gnc->gkn", vals, gout)
    didx = jnp.zeros_like(idx)
    return dtables, didx, dw


lookup.defvjp(_lookup_fwd, _lookup_bwd)


def _prep_indices(xs: list, specs: list, bounds: list):
    """Per-plane corner indices/weights → stacked [G, K, N] f32 arrays,
    padded to a multiple of the kernel block."""
    idx_groups, w_groups = [], []
    for x, spec, bound in zip(xs, specs, bounds):
        idx, w = corner_indices_weights(x, spec, bound)   # [N, L, K]
        idx_groups.append(jnp.moveaxis(idx.astype(jnp.float32), 0, -1))
        w_groups.append(jnp.moveaxis(w, 0, -1))           # [L, K, N]
    idx = jnp.concatenate(idx_groups, axis=0)             # [G, K, N]
    w = jnp.concatenate(w_groups, axis=0)
    n = idx.shape[-1]
    pad = _round_up(max(n, _NB), _NB) - n
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
    return idx, w, n


def multi_grid_encode_mxu(tables_flat: list, xs: list, specs: list,
                          bounds: list, interpret: bool = False) -> list:
    """Encode several grids in ONE kernel launch.

    tables_flat[i]: [total_params, C]; xs[i]: [N, D] (same N across grids);
    returns [features [N, L_i·C]] matching grid_encode per grid."""
    h = max(
        _round_up(max(hs for (_, _, hs, _) in spec.level_params()), 128) // 128
        for spec in specs
    )
    tables = pad_tables(tables_flat, specs, h)
    idx, w, n = _prep_indices(xs, specs, bounds)
    out = lookup(tables, idx, w, interpret)               # [G, Npad, C]
    feats = []
    g = 0
    for x, spec in zip(xs, specs):
        l, c = spec.num_levels, spec.level_dim
        f = out[g : g + l, :n]                            # [L, N, C]
        feats.append(jnp.moveaxis(f, 0, 1).reshape(n, l * c))
        g += l
    return feats


def grid_encode_mxu(table, x, spec: GridSpec, bound: float = 1.0,
                    interpret: bool = False):
    """Drop-in for ops.hashgrid.grid_encode on the MXU path."""
    return multi_grid_encode_mxu([table], [x], [spec], [bound], interpret)[0]


def triplane_encode_mxu(plane_xy, plane_yz, plane_xz, xyz,
                        spec: GridSpec, bound: float = 1.0,
                        interpret: bool = False):
    """encode_x (network.py) with all 3 planes in one kernel launch:
    [N, 3] → [N, 3·L·C] in (xy, yz, xz) concat order."""
    xy = xyz[:, :2]
    yz = xyz[:, 1:]
    xz = jnp.stack([xyz[:, 0], xyz[:, 2]], axis=-1)
    feats = multi_grid_encode_mxu(
        [plane_xy, plane_yz, plane_xz], [xy, yz, xz],
        [spec, spec, spec], [bound, bound, bound], interpret,
    )
    return jnp.concatenate(feats, axis=-1)
