import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.models.ernerf.renderer import DensityGrid, render_rays


def constant_apply(sigma_val=50.0, color=(0.2, 0.4, 0.6)):
    def apply_fn(xyz, dirs, training):
        n = xyz.shape[0]
        return (
            jnp.full((n,), sigma_val),
            jnp.tile(jnp.asarray([color]), (n, 1)),
            jnp.zeros((n, 1)),
            jnp.zeros((n, 1)),
            jnp.zeros((n, 1)),
        )

    return apply_fn


def test_compaction_matches_full_render():
    g = 16
    # occupied slab so only some rays hit
    idx = jnp.arange(g**3)
    xc = (idx // (g * g)).astype(jnp.float32) / g * 2 - 1
    occ = xc < -0.5  # occupied only for x < -0.5
    density = DensityGrid(jnp.zeros((g**3,)), occ, jnp.zeros(()))

    n = 64
    xs = np.linspace(-0.9, 0.9, n, dtype=np.float32)
    rays_o = jnp.asarray(np.stack([xs, np.zeros(n), np.full(n, -2.0)], -1))
    rays_d = jnp.asarray(np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1)))
    bg = jnp.ones(3)

    full = render_rays(constant_apply(), rays_o, rays_d, density, 1.0, g, bg,
                       n_candidates=32, n_steps=8)
    compact = render_rays(constant_apply(), rays_o, rays_d, density, 1.0, g, bg,
                          n_candidates=32, n_steps=8, max_active_rays=32)
    np.testing.assert_allclose(
        np.asarray(compact["image"]), np.asarray(full["image"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(compact["weights_sum"]), np.asarray(full["weights_sum"]),
        atol=1e-5,
    )
    # inactive rays are pure background
    inactive = np.asarray(rays_o[:, 0]) > -0.5
    np.testing.assert_allclose(np.asarray(compact["image"])[inactive], 1.0)


def test_blocked_probe_matches_per_ray_on_slab():
    from mere_fusion_tpu.models.ernerf.renderer import (
        intersect_aabb, select_depths_blocked,
    )

    g = 16
    idx = jnp.arange(g**3)
    zc = (idx % g).astype(jnp.float32) / g * 2 - 1
    occ = (zc > 0.0) & (zc < 0.5)
    density = DensityGrid(jnp.zeros((g**3,)), occ, jnp.zeros(()))

    H = W = 8
    n = H * W
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32))
    rays_d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (n, 1)).astype(np.float32))
    near, far, _ = intersect_aabb(rays_o, rays_d, 1.0)
    z, dt, valid = select_depths_blocked(
        rays_o, rays_d, near, far, density, 1.0, g, 32, 8, block=4, H=H, W=W
    )
    assert bool(valid.all())
    pts = np.asarray(rays_o[:, 2:3] + z)   # z coords of samples
    assert pts.min() > -0.2 and pts.max() < 0.7  # span ≈ occupied slab ± pad
