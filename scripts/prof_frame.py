"""Fused full-coverage 512px frame time through make_pallas_render_step."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset, synthesize_nerf_dataset
from mere_fusion_tpu.engines.nerf_pallas import make_pallas_render_step
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import DensityGrid
from mere_fusion_tpu.ops.triplane_bake import bake_triplanes

cfg = Config().override(**{"avatar.kind": "ernerf", "nerf.audio_in_dim": 29})
nc = cfg.nerf
with tempfile.TemporaryDirectory() as td:
    d = synthesize_nerf_dataset(td, hw=512)
    dataset = NeRFTestDataset.load(f"{d}/transforms.json", f"{d}/au.csv",
                                   scale=1.0)
network = NeRFNetwork(NeRFNetConfig(
    bound=nc.bound, audio_in_dim=nc.audio_in_dim, audio_dim=nc.audio_dim,
    exp_eye=nc.exp_eye, num_levels=nc.num_levels,
    base_resolution=nc.base_resolution, log2_hashmap_size=nc.log2_hashmap_size,
    desired_resolution=nc.desired_resolution, torso=nc.torso,
    level_dim=nc.level_dim))
variables = jax.jit(network.init, static_argnames="method")(
    jax.random.key(0), jnp.zeros((8, network.cfg.audio_in_dim, 16)),
    jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0),
    (jnp.zeros((1, network.cfg.individual_dim))
     if network.cfg.individual_dim else None),
    jnp.zeros((1, 1)), method=NeRFNetwork.full_init)
baked = bake_triplanes(variables["params"], network.cfg.plane_spec,
                       network.cfg.bound,
                       resolution=min(1024, 2 * nc.desired_resolution),
                       dtype=jnp.bfloat16)
step = make_pallas_render_step(network, variables, dataset, cfg, baked)
density = DensityGrid.create(nc.grid_size)  # fully occupied -> full coverage
bg = jnp.zeros((3,), jnp.float32)
auds = jnp.zeros((8, network.cfg.audio_in_dim, 16))
eye = jnp.zeros((1, 1))
pose = jnp.asarray(dataset.poses[0])

t0 = time.perf_counter()
img, n_active, _ = step(pose, auds, eye, density, bg, pose_key=0)
np.asarray(img)
print("compile+first:", time.perf_counter() - t0, "active:", int(n_active),
      flush=True)

best = float("inf")
iters = 30
for _ in range(3):
    t0 = time.perf_counter()
    eye_c = eye
    for i in range(iters):
        img, _, _ = step(pose, auds, eye_c, density, bg, pose_key=0)
        eye_c = eye + img[0, 0, 0].astype(jnp.float32) * 1e-30
    np.asarray(img)
    best = min(best, (time.perf_counter() - t0) / iters)
print(f"fused full-coverage frame: {best*1e3:.2f} ms ({1/best:.1f} fps)",
      flush=True)
