import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import (
    DensityGrid,
    composite,
    get_rays,
    intersect_aabb,
    render_rays,
    select_occupied_depths,
    update_density_grid,
    voxel_index,
)
from mere_fusion_tpu.ops.encoders import freq_encode, sh_encode
from mere_fusion_tpu.ops.hashgrid import GridSpec, grid_encode, grid_init

SMALL_NERF = NeRFNetConfig(
    num_levels=4, base_resolution=16, desired_resolution=64, log2_hashmap_size=10
)


def numpy_grid_encode_golden(table, x01, spec: GridSpec):
    """Independent numpy transcription of the CUDA kernel math."""
    primes = (1, 2654435761, 805459861)
    outs = []
    for scale, res, hsize, offset in spec.level_params():
        pos = x01 * scale + 0.5
        pf = np.floor(pos).astype(np.uint64)
        frac = pos - np.floor(pos)
        acc = np.zeros((x01.shape[0], spec.level_dim), np.float32)
        for corner in itertools.product((0, 1), repeat=spec.input_dim):
            w = np.ones(x01.shape[0], np.float32)
            idx = np.zeros(x01.shape[0], np.uint64)
            stride = 1
            pg = []
            for d, c in enumerate(corner):
                w *= frac[:, d] if c else 1 - frac[:, d]
                pg.append(pf[:, d] + c)
            for d in range(spec.input_dim):
                if stride <= hsize:
                    idx += pg[d] * stride
                    stride *= res + 1
            if spec.gridtype == "hash" and stride > hsize:
                idx = np.zeros_like(idx)
                for d in range(spec.input_dim):
                    idx ^= (pg[d].astype(np.uint32) * np.uint32(primes[d])).astype(np.uint64) & 0xFFFFFFFF
            idx = idx % hsize
            acc += w[:, None] * table[offset + idx.astype(np.int64)]
        outs.append(acc)
    return np.concatenate(outs, axis=-1)


def test_hashgrid_matches_golden():
    spec = GridSpec(input_dim=2, num_levels=6, level_dim=2, base_resolution=8,
                    log2_hashmap_size=8, desired_resolution=128)
    table = np.asarray(grid_init(spec, jax.random.key(0)))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (64, 2)).astype(np.float32)
    got = np.asarray(grid_encode(jnp.asarray(table), jnp.asarray(x), spec, 1.0))
    want = numpy_grid_encode_golden(table, (x + 1) / 2, spec)
    assert got.shape == (64, 12)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hashgrid_gradients_flow():
    spec = GridSpec(input_dim=2, num_levels=2, level_dim=1, base_resolution=8,
                    log2_hashmap_size=6, desired_resolution=16)
    table = grid_init(spec, jax.random.key(0))
    x = jnp.asarray([[0.3, -0.2], [0.9, 0.1]])

    def loss(t):
        return grid_encode(t, x, spec, 1.0).sum()

    g = jax.grad(loss)(table)
    assert float(jnp.abs(g).sum()) > 0


def test_sh_encode_canonical():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(d, 4))[0]
    assert out.shape == (16,)
    np.testing.assert_allclose(out[0], 0.28209479, atol=1e-6)
    np.testing.assert_allclose(out[2], 0.48860251, atol=1e-6)
    np.testing.assert_allclose(out[6], 0.94617470 - 0.31539157, atol=1e-6)
    np.testing.assert_allclose(out[12], 0.37317633 * 2.0, atol=1e-6)


def test_freq_encode_layout():
    x = jnp.asarray([[0.5, -0.25]])
    out = np.asarray(freq_encode(x, 2))[0]
    assert out.shape == (2 + 2 * 2 * 2,)
    np.testing.assert_allclose(out[:2], [0.5, -0.25])
    np.testing.assert_allclose(out[2], np.sin(0.5), atol=1e-6)
    np.testing.assert_allclose(out[4], np.cos(0.5), atol=1e-6)
    np.testing.assert_allclose(out[6], np.sin(1.0), atol=1e-6)


@pytest.fixture(scope="module")
def nerf():
    model = NeRFNetwork(SMALL_NERF)
    aud = jnp.zeros((8, 44, 16))
    x = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / np.sqrt(3)
    variables = model.init(
        jax.random.key(0), aud, x, d, jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    return model, variables


def test_nerf_network_shapes(nerf):
    model, variables = nerf
    enc_a = model.apply(variables, jnp.zeros((8, 44, 16)),
                        method=NeRFNetwork.encode_audio)
    assert enc_a.shape == (1, 32)
    x = jax.random.uniform(jax.random.key(1), (128, 3), minval=-1, maxval=1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (128, 1))
    sigma, color, aud, eye, unc = model.apply(
        variables, x, d, enc_a, jnp.zeros((1, 4)), jnp.asarray([[0.25]])
    )
    assert sigma.shape == (128,) and color.shape == (128, 3)
    assert aud.shape == (128, 1) and eye.shape == (128, 1) and unc.shape == (128, 1)
    assert float(sigma.min()) >= 0 and float(color.min()) >= -0.001


def test_intersect_aabb():
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far, valid = intersect_aabb(o, d, 1.0)
    np.testing.assert_allclose(near[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(far[0], 3.0, atol=1e-5)
    assert bool(valid[0])


def test_composite_opaque_sample():
    sigmas = jnp.asarray([[1000.0, 1000.0]])
    colors = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    z = jnp.asarray([[1.0, 2.0]])
    dt = jnp.asarray([[0.1]])
    valid = jnp.ones((1, 2), bool)
    out = composite(sigmas, colors, z, dt, valid, jnp.ones(3))
    np.testing.assert_allclose(out["image"][0], [1.0, 0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(out["depth"][0], 1.0, atol=1e-3)


def test_occupancy_guided_selection():
    g = 16
    density = DensityGrid.create(g)
    # only a z-slab around z∈[0.25, 0.5] occupied
    idx = jnp.arange(g**3)
    zc = (idx % g).astype(jnp.float32) / g * 2 - 1
    occ = (zc > 0.25) & (zc < 0.5)
    density = DensityGrid(density.grid, occ, density.mean_density)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far, _ = intersect_aabb(o, d, 1.0)
    z, dt, valid = select_occupied_depths(o, d, near, far, density, 1.0, g, 64, 8)
    zs = np.asarray(z[0])[np.asarray(valid[0])]
    pts = np.asarray(o[0, 2]) + zs  # z coordinate of samples
    assert len(pts) > 0
    assert pts.min() >= 0.2 and pts.max() <= 0.56


def test_render_rays_constant_field():
    g = 8
    density = DensityGrid.create(g)

    def apply_fn(xyz, dirs, training):
        n = xyz.shape[0]
        return (
            jnp.full((n,), 50.0),
            jnp.tile(jnp.asarray([[0.2, 0.4, 0.6]]), (n, 1)),
            jnp.zeros((n, 1)),
            jnp.zeros((n, 1)),
            jnp.zeros((n, 1)),
        )

    o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = render_rays(apply_fn, o, d, density, 1.0, g, jnp.ones(3))
    np.testing.assert_allclose(out["image"][0], [0.2, 0.4, 0.6], atol=1e-2)
    assert out["weights_sum"][0] > 0.99


def test_update_density_grid():
    g = 8
    density = DensityGrid.create(g)

    def density_fn(xyz):
        return jnp.where(xyz[:, 2] > 0, 100.0, 0.0)

    new = update_density_grid(density_fn, density, 1.0, g, density_thresh=10.0)
    occ = np.asarray(new.occupancy).reshape(g, g, g)
    assert occ[:, :, g // 2 :].all()
    assert not occ[:, :, : g // 2].any()


def test_get_rays_shapes():
    pose = jnp.eye(4)
    o, d = get_rays(pose, (100.0, 100.0, 32.0, 32.0), 64, 64)
    assert o.shape == (4096, 3) and d.shape == (4096, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
