"""Pallas windowed triplane sampler vs the XLA bilinear reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.ops.pallas_sampler import (
    SamplerSpec,
    pack_planes_major,
    plan_jobs,
    regroup_features,
    sample_tiles,
    tile_permutation,
)
from mere_fusion_tpu.ops.triplane_bake import encode_x_baked

BOUND = 1.0


def make_setup(seed=0, t=6):
    spec = SamplerSpec(resolution=128, channels=4, tile_w=4, tile_h=4,
                       k=8, kg=2, wu=32, wv=16)
    rng = np.random.default_rng(seed)
    planes = {
        name: jnp.asarray(
            rng.standard_normal((spec.resolution, spec.resolution,
                                 spec.channels)).astype(np.float32)
        )
        for name in ("plane_xy", "plane_yz", "plane_xz")
    }
    # tiles of rays marching forward in z: coherent footprints that fit
    # the windows (per depth-group z extent < wu, lateral extent < wv)
    rpt, k = spec.rays_per_tile, spec.k
    xyz = np.empty((t, rpt, k, 3), np.float32)
    for i in range(t):
        ox, oy = rng.uniform(-0.7, 0.5, 2)
        oz = rng.uniform(-0.7, 0.2)
        for rix in range(rpt):
            jx, jy = rix % spec.tile_w, rix // spec.tile_w
            x0 = ox + 0.02 * jx + rng.uniform(0, 0.01)
            y0 = oy + 0.02 * jy + rng.uniform(0, 0.01)
            zs = oz + np.linspace(0, 0.45, k) + rng.uniform(0, 0.01)
            xyz[i, rix, :, 0] = x0 + 0.05 * (zs - oz)   # slight drift
            xyz[i, rix, :, 1] = y0 + 0.03 * (zs - oz)
            xyz[i, rix, :, 2] = zs
    valid = rng.random((t, rpt, k)) < 0.9
    valid[0] = True
    return spec, planes, jnp.asarray(xyz), jnp.asarray(valid)


def test_plan_and_sample_matches_xla_bilinear():
    spec, planes, xyz, valid = make_setup()
    t = xyz.shape[0]
    scalars, uv, active, overflow = plan_jobs(
        xyz.reshape(t, -1, 3), valid, spec, BOUND
    )
    assert bool(active.all())
    assert not bool(overflow.any()), "test geometry must fit the windows"
    packed = pack_planes_major(planes, spec)
    feats = sample_tiles(packed, scalars.reshape(-1), uv.reshape(
        t * 3, spec.kg, 2, spec.sg), spec, interpret=True)
    enc = regroup_features(feats, spec)               # [T, rpt, k, 3C]

    ref = encode_x_baked(
        {k_: v for k_, v in planes.items()}, xyz.reshape(-1, 3), BOUND,
        "bilinear",
    ).reshape(t, spec.rays_per_tile, spec.k, 3 * spec.channels)
    # bf16 plane quantization in the kernel path: tolerance ~1e-2
    v = np.asarray(valid)[..., None]
    err = np.abs(np.asarray(enc) - np.asarray(ref)) * v
    assert err.max() < 2e-2, err.max()


def test_lod_absorbs_wide_spans_exactly_on_linear_fields():
    """A depth group whose footprint exceeds the window drops to a coarser
    mip instead of clamping. Average-pooled mips preserve linear feature
    fields exactly, so on a linear field the LOD path must still match the
    analytic bilinear value."""
    spec, _, xyz, valid = make_setup()
    t = xyz.shape[0]
    r, c = spec.resolution, spec.channels
    gx, gy = np.meshgrid(np.arange(r), np.arange(r), indexing="xy")
    lin = np.stack([0.01 * gx + 0.02 * gy + 0.1 * k for k in range(c)], -1)
    planes = {n: jnp.asarray(lin.astype(np.float32))
              for n in ("plane_xy", "plane_yz", "plane_xz")}
    xyz = xyz.at[2, 0, -1, 2].set(0.9)  # yank one sample far in z
    scalars, uv, active, overflow = plan_jobs(
        xyz.reshape(t, -1, 3), valid, spec, BOUND
    )
    assert not bool(overflow.any()), "LOD must absorb the wide span"
    packed = pack_planes_major(planes, spec)
    feats = sample_tiles(packed, scalars.reshape(-1),
                         uv.reshape(t * 3, spec.kg, 2, spec.sg), spec,
                         interpret=True)
    enc = regroup_features(feats, spec)
    ref = encode_x_baked(planes, xyz.reshape(-1, 3), BOUND, "bilinear"
                         ).reshape(t, spec.rays_per_tile, spec.k, 3 * c)
    v = np.asarray(valid)[..., None]
    err = np.abs(np.asarray(enc) - np.asarray(ref)) * v
    # bf16 storage of values up to ~4 → quantization ~0.03
    assert err.max() < 0.06, err.max()


def test_tile_permutation_roundtrip():
    perm = tile_permutation(16, 32, 8, 4)
    assert sorted(perm.tolist()) == list(range(16 * 32))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    x = np.arange(16 * 32)
    np.testing.assert_array_equal(x[perm][inv], x)


def test_enc_selector_matches_regroup():
    """The engine hot path (free reshape + 0/1 selector matmul) must equal
    regroup_features up to sample reordering: row ((t·kg + g)·rpt + r)·ks + j
    of the flat enc corresponds to enc_ref[t, r, g·ks + j]."""
    from mere_fusion_tpu.ops.pallas_sampler import enc_selector

    spec, planes, xyz, valid = make_setup()
    t = xyz.shape[0]
    scalars, uv, _, _ = plan_jobs(xyz.reshape(t, -1, 3), valid, spec, BOUND)
    packed = pack_planes_major(planes, spec)
    feats = sample_tiles(packed, scalars.reshape(-1),
                         uv.reshape(t * 3, spec.kg, 2, spec.sg), spec,
                         interpret=True)
    enc_ref = regroup_features(feats, spec)            # [T, rpt, k, 3C]
    flat = jnp.dot(feats.reshape(-1, 3 * spec.cp),
                   enc_selector(spec, feats.dtype),
                   preferred_element_type=feats.dtype)
    ks = spec.k // spec.kg
    got = (np.asarray(flat)
           .reshape(t, spec.kg, spec.rays_per_tile, ks, 3 * spec.channels)
           .transpose(0, 2, 1, 3, 4)
           .reshape(t, spec.rays_per_tile, spec.k, 3 * spec.channels))
    np.testing.assert_allclose(got, np.asarray(enc_ref), rtol=0, atol=0)
