import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.ops.hashgrid import GridSpec, grid_encode, grid_init
from mere_fusion_tpu.ops.triplane_bake import (
    bake_plane,
    bake_triplanes,
    encode_x_baked,
    sample_plane,
)


def test_sample_plane_exact_at_texel_centers():
    r = 8
    plane = jnp.arange(r * r * 2, dtype=jnp.float32).reshape(r, r, 2)
    centers = (np.arange(r) + 0.5) / r * 2 - 1
    uv = jnp.asarray([[centers[3], centers[5]]])  # x=3, y=5
    out = np.asarray(sample_plane(plane, uv, 1.0))
    np.testing.assert_allclose(out[0], np.asarray(plane)[5, 3], atol=1e-5)


def test_bake_alignment_exact_on_linear_field():
    """A linear feature field survives bilinear re-sampling exactly, so any
    residual error would expose a coordinate-alignment bug."""
    spec = GridSpec(input_dim=2, num_levels=1, level_dim=1, base_resolution=8,
                    log2_hashmap_size=10, desired_resolution=8, gridtype="tiled")
    (scale, res, hsize, offset), = spec.level_params()
    side = res + 1
    ix = np.arange(hsize) % side
    iy = np.arange(hsize) // side
    table = jnp.asarray((0.25 * ix + 0.5 * iy).astype(np.float32)[:, None])
    baked = bake_plane(table, spec, 1.0, resolution=64)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-0.9, 0.9, (256, 2)).astype(np.float32))
    exact = np.asarray(grid_encode(table, uv, spec, 1.0))
    approx = np.asarray(sample_plane(baked, uv, 1.0))
    np.testing.assert_allclose(approx, exact, atol=1e-4)


def test_bake_error_bounded_on_hashed_noise():
    """Hashed levels are noise-like at cell scale; oversampled baking bounds
    the resample error to a fraction of the cell-to-cell variation."""
    spec = GridSpec(input_dim=2, num_levels=4, level_dim=1, base_resolution=8,
                    log2_hashmap_size=8, desired_resolution=32)
    table = grid_init(spec, jax.random.key(0), std=0.5)
    baked = bake_plane(table, spec, 1.0, resolution=256)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-0.95, 0.95, (512, 2)).astype(np.float32))
    exact = np.asarray(grid_encode(table, uv, spec, 1.0))
    approx = np.asarray(sample_plane(baked, uv, 1.0))
    # finest cell value range ~2·std; 8x oversampling → ≤ ratio/2 ≈ 6% of it
    assert np.abs(exact - approx).max() < 0.08


def test_encode_x_baked_shape():
    spec = GridSpec(input_dim=2, num_levels=4, level_dim=1, base_resolution=8,
                    log2_hashmap_size=8, desired_resolution=32)
    params = {
        name: grid_init(spec, jax.random.key(i))
        for i, name in enumerate(("plane_xy", "plane_yz", "plane_xz"))
    }
    baked = bake_triplanes(params, spec, 1.0, resolution=64)
    xyz = jnp.zeros((10, 3))
    out = encode_x_baked(baked, xyz, 1.0)
    assert out.shape == (10, 12)
