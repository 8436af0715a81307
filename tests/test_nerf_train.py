import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.train.ernerf_train import (
    NeRFTrainConfig,
    init_nerf_train,
    make_nerf_train_step,
    refresh_density_grid,
)
from mere_fusion_tpu.utils.checkpoint import Checkpointer

NET_CFG = NeRFNetConfig(
    num_levels=4, base_resolution=16, desired_resolution=64,
    log2_hashmap_size=10, individual_dim=4, num_train_frames=4,
)
TRAIN_CFG = NeRFTrainConfig(grid_size=16, n_candidates=16, n_steps=4, iters=1000)


@pytest.fixture(scope="module")
def setup():
    network = NeRFNetwork(NET_CFG)
    variables = network.init(
        jax.random.key(0),
        jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    tx, state = init_nerf_train(network, variables, TRAIN_CFG)
    step = make_nerf_train_step(network, tx, TRAIN_CFG)
    return network, tx, state, step


def make_batch(n=256, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(np.zeros((n, 3), np.float32) + [0, 0, -2.0]),
        "rays_d": jnp.asarray(np.abs(d) * [0.2, 0.2, 1.0] / 1.2),
        "rgb": jnp.asarray(rng.uniform(0.4, 0.6, (n, 3)).astype(np.float32)),
        "bg_color": jnp.ones(3),
        "auds": jnp.asarray(rng.standard_normal((8, 44, 16)).astype(np.float32) * 0.1),
        "eye": jnp.asarray([[0.25]]),
        "index": jnp.zeros((), jnp.int32),
        "face_mask": jnp.asarray(rng.uniform(size=n) > 0.5),
    }


def test_train_step_decreases_loss(setup):
    network, tx, state, step = setup
    batch = make_batch()
    losses = []
    for i in range(60):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["mse"]))
    assert int(state.step) == 60
    # random per-ray targets fit slowly under shared-span quadrature; the
    # real-scene e2e (test_nerf_train_e2e) covers strong convergence
    assert losses[-1] < losses[0] * 0.95, f"mse did not drop: {losses[0]} → {losses[-1]}"
    assert np.isfinite(losses).all()


def test_density_refresh(setup):
    network, tx, state, step = setup
    auds = jnp.zeros((8, 44, 16))
    new_state = refresh_density_grid(network, state, auds, TRAIN_CFG)
    assert new_state.density.grid.shape == (16**3,)
    assert bool(jnp.isfinite(new_state.density.mean_density))


def test_checkpoint_roundtrip(setup, tmp_path):
    network, tx, state, step = setup
    batch = make_batch()
    state, m = step(state, batch, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path / "ckpts"))
    ckpt.save(int(state.step), state, {"loss": float(m["loss"])})
    restored = ckpt.restore(state)
    assert int(restored.step) == int(state.step)
    chex = np.asarray(jax.tree.leaves(restored.params)[0])
    want = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(chex, want)
    ckpt.close()
