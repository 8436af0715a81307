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


def test_shade_comp_kernel_matches_unfused():
    """sample_shade_comp_tiles (in-kernel volume integral) must equal the
    per-sample shade kernel followed by the XLA grouped composite, bit-near
    (both are f32; the fused path swaps cumprod(1-α) for exp(-Σσdt), exact
    in exchange for the reference's 1e-10 cumprod epsilon)."""
    from mere_fusion_tpu.engines.nerf_pallas import _composite_grouped
    from mere_fusion_tpu.ops.pallas_sampler import (
        SHADE_WEIGHTS,
        sample_shade_comp_tiles,
        sample_shade_tiles,
    )

    spec = SamplerSpec(resolution=128, channels=4, tile_w=4, tile_h=4,
                       k=8, kg=2, wu=32, wv=16)
    t = 5
    rpt, kg, sg = spec.rays_per_tile, spec.kg, spec.sg
    ks = sg // rpt
    rng = np.random.default_rng(0)
    j = t * 3
    stride = 1 + 2 * kg
    scal = np.zeros((j, stride), np.int32)
    scal[:, 0] = np.tile(np.arange(3), t)
    for g in range(kg):
        scal[:, 1 + 2 * g] = rng.integers(0, 64, j) & ~7
        scal[:, 2 + 2 * g] = rng.integers(0, 64, j) & ~7
    scal = jnp.asarray(scal.reshape(-1))
    uv = jnp.asarray(rng.uniform(8, 100, (j, kg, 2, sg)).astype(np.float32))
    planes = jnp.asarray(rng.standard_normal(
        (3, spec.mip_rows[-1], spec.resolution * spec.cp)), jnp.bfloat16)
    shapes = {"wx_aud": (48, 64), "w_aud1": (64, 32), "wx_sig": (48, 64),
              "w_aud_sig": (32, 64), "wx_eye": (48, 16), "w_eye1": (16, 8),
              "w_sig_e": (8, 64), "w_sig1": (64, 64), "w_sigcol": (64, 16),
              "w_geo": (64, 64), "w_col_g": (64, 64), "w_rgb": (64, 16),
              "col_bias": (8, 64)}
    weights = {k_: jnp.asarray(0.3 * rng.standard_normal(shapes[k_]),
                               jnp.float32) for k_ in SHADE_WEIGHTS}
    dt_r = jnp.asarray(rng.uniform(0.05, 0.4, (t, rpt)).astype(np.float32))
    va = jnp.asarray(rng.random((t, rpt)) < 0.85)
    proj = jnp.asarray(rng.standard_normal((t, rpt, 64)).astype(np.float32))
    dtv = jnp.pad((dt_r * va)[..., None], ((0, 0), (0, 0), (0, 7)))
    # the per-sample shade kernel still takes the wide dproj (dtv unused)
    dproj = jnp.concatenate([proj, jnp.zeros((t, rpt, 64))], axis=-1)

    sr = sample_shade_tiles(planes, scal, uv, dproj, weights, spec,
                            interpret=True)
    sigma = sr[..., 0].reshape(t, kg, rpt, ks)
    color = sr[..., 1:4].reshape(t, kg, rpt, ks, 3)
    valid_g = jnp.broadcast_to(va[:, None, :, None], (t, kg, rpt, ks))
    bg = jnp.zeros((t, rpt, 3), jnp.float32)
    img_ref, ws_ref = _composite_grouped(sigma, color, dt_r, valid_g, bg)

    out = sample_shade_comp_tiles(planes, scal, uv, proj, dtv, weights,
                                  spec, interpret=True)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(ws_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[..., 1:4]),
                               np.asarray(img_ref), atol=2e-5)


def test_render_rays_kernel_matches_classic_path():
    """The fully fused rays kernel (in-kernel uv synthesis from 8 per-ray
    numbers + endpoint-only planning) must reproduce the classic path
    (per-sample XLA planner + explicit-uv comp kernel) bit-near: both
    evaluate the same affine sample math, and group extrema of a monotonic
    segment are exactly its endpoint samples."""
    from mere_fusion_tpu.ops.pallas_sampler import (
        SHADE_WEIGHTS,
        plan_jobs_grouped,
        plan_jobs_rays,
        render_rays_tiles,
        sample_shade_comp_tiles,
    )

    spec = SamplerSpec(resolution=128, channels=4, tile_w=4, tile_h=4,
                       k=8, kg=2, wu=32, wv=16)
    t = 6
    rpt, kg, sg, k = spec.rays_per_tile, spec.kg, spec.sg, spec.k
    ks = k // kg
    rng = np.random.default_rng(1)
    o = np.empty((t, rpt, 3), np.float32)
    d = np.empty((t, rpt, 3), np.float32)
    for i in range(t):
        ox, oy = rng.uniform(-0.6, 0.4, 2)
        for r_ in range(rpt):
            jx, jy = r_ % spec.tile_w, r_ // spec.tile_w
            o[i, r_] = [ox + 0.02 * jx, oy + 0.02 * jy,
                        rng.uniform(-0.7, -0.3)]
            v = np.array([0.05 + 0.002 * jx, 0.03, 1.0])
            d[i, r_] = v / np.linalg.norm(v)
    zmin = rng.uniform(0.05, 0.15, (t, rpt)).astype(np.float32)
    va = rng.random((t, rpt)) < 0.85
    span = rng.uniform(0.3, 0.5, (t, rpt)).astype(np.float32) * va
    zmax = zmin + span
    o, d = jnp.asarray(o), jnp.asarray(d)
    zmin, zmax, span = map(jnp.asarray, (zmin, zmax, span))
    va_j = jnp.asarray(va)
    planes = jnp.asarray(rng.standard_normal(
        (3, spec.mip_rows[-1], spec.resolution * spec.cp)), jnp.bfloat16)
    shapes = {"wx_aud": (48, 64), "w_aud1": (64, 32), "wx_sig": (48, 64),
              "w_aud_sig": (32, 64), "wx_eye": (48, 16), "w_eye1": (16, 8),
              "w_sig_e": (8, 64), "w_sig1": (64, 64), "w_sigcol": (64, 16),
              "w_geo": (64, 64), "w_col_g": (64, 64), "w_rgb": (64, 16),
              "col_bias": (8, 64)}
    weights = {k_: jnp.asarray(0.3 * rng.standard_normal(shapes[k_]),
                               jnp.float32) for k_ in SHADE_WEIGHTS}
    proj = jnp.asarray(rng.standard_normal((t, rpt, 64)).astype(np.float32))

    # classic: per-sample grouped planner + explicit-uv comp kernel
    from mere_fusion_tpu.ops.pallas_sampler import plan_jobs_span

    kf = jnp.linspace(0.0, 1.0, k).reshape(kg, ks)
    z_g = (zmin[:, None, :, None]
           + span[:, None, :, None] * kf[None, :, None, :])
    dt_r = (zmax - zmin) / k
    xyz_g = jnp.clip(
        o[:, None, :, None] + d[:, None, :, None] * z_g[..., None], -1., 1.)
    valid_g = jnp.broadcast_to(va_j[:, None, :, None], (t, kg, rpt, ks))
    sc_g, uv, _, _ = plan_jobs_grouped(
        xyz_g.reshape(t, kg, sg, 3), valid_g.reshape(t, kg, sg), spec,
        BOUND)
    dtv = jnp.pad((dt_r * va_j)[..., None], ((0, 0), (0, 0), (0, 7)))
    ref = sample_shade_comp_tiles(planes, sc_g.reshape(-1),
                                  uv.reshape(t * 3, kg, 2, sg),
                                  proj, dtv, weights, spec, interpret=True)

    # lean span planner (endpoint scalars + fused uv emit) must agree
    sc_s, uv_s, _ = plan_jobs_span(o, d, zmin, zmax, va_j, spec, BOUND)
    np.testing.assert_array_equal(np.asarray(sc_s), np.asarray(sc_g))
    out_s = sample_shade_comp_tiles(planes, sc_s.reshape(-1),
                                    uv_s.reshape(t * 3, kg, 2, sg),
                                    proj, dtv, weights, spec,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               atol=1e-4)

    # fully-in-kernel uv synthesis must agree too
    sc_r, _ = plan_jobs_rays(o, d, zmin, zmax, va_j, spec, BOUND)
    rays8 = jnp.concatenate([o, d, zmin[..., None], zmax[..., None]], -1)
    out = render_rays_tiles(planes, sc_r.reshape(-1), rays8, proj, weights,
                            spec, BOUND, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


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


def test_window_v16_quality_on_smooth_planes():
    """The wv=16 default (lateral mip one level sooner) must stay close to
    exact full-resolution bilinear on SMOOTH, band-limited feature planes —
    the regime trained triplanes live in (hash features are low-frequency
    per level). Random planes are the adversarial case and are covered by
    the LOD-exactness test on linear fields; this bounds the realistic
    one. Also asserts wv=16 error is within 2× of wv=32 on the same
    geometry (the ladder degrades gracefully, not catastrophically)."""
    from dataclasses import replace

    rng = np.random.default_rng(3)
    spec32, _, xyz, valid = make_setup()
    r, c = spec32.resolution, spec32.channels
    # band-limited planes: a few low-frequency sinusoids per channel
    gy, gx = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")
    planes = {}
    for name in ("plane_xy", "plane_yz", "plane_xz"):
        chans = []
        for _ in range(c):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 6.28, 2)
            chans.append(np.sin(2 * np.pi * fx * gx / r + ph[0])
                         * np.cos(2 * np.pi * fy * gy / r + ph[1]))
        planes[name] = jnp.asarray(np.stack(chans, -1).astype(np.float32))

    ref = encode_x_baked(planes, np.asarray(xyz).reshape(-1, 3), BOUND,
                         "bilinear")

    def render(spec):
        t = xyz.shape[0]
        scalars, uv, active, _ = plan_jobs(
            xyz.reshape(t, -1, 3), valid, spec, BOUND)
        assert bool(active.all())
        packed = pack_planes_major(planes, spec)
        feats = sample_tiles(packed, scalars.reshape(-1),
                             uv.reshape(t * 3, spec.kg, 2, spec.sg), spec,
                             interpret=True)
        return regroup_features(feats, spec)

    v = np.asarray(valid).reshape(-1)[:, None]
    scale = np.abs(np.asarray(ref)).max()

    def rmse(spec):
        enc = np.asarray(render(spec)).reshape(ref.shape)
        return float(np.sqrt((((enc - np.asarray(ref)) * v) ** 2).mean()))

    e16 = rmse(replace(spec32, wv=16))
    e32 = rmse(spec32)
    # smooth content: wv=16 within 2% of full-res bilinear (≈34 dB)
    assert e16 < 0.02 * scale, (e16, scale)
    assert e16 <= 2.0 * max(e32, 1e-4 * scale), (e16, e32)
