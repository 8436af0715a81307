"""End-to-end: head training -> frozen-head torso training -> serving.

Exercises the full new-stage pipeline through the real CLIs and the
checkpoint loader: a tiny head stage checkpoints to a workspace, the torso
stage loads+freezes it and trains the 2-D torso nets against torso_imgs/,
and the engine then serves the torso workspace (torso background composite
+ EMA params) — the reference's train_obama.sh + app.py --torso flow.
"""
import json
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import (
    NeRFTestDataset,
    synthesize_nerf_train_data,
)


def test_head_torso_train_then_serve(tmp_path):
    base = synthesize_nerf_train_data(str(tmp_path), n_frames=4, hw=64)
    base = base if isinstance(base, str) else str(tmp_path)

    # torso images: opaque lower band
    tdir = os.path.join(base, "torso_imgs")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(base, "transforms.json")) as f:
        frames = json.load(f)["frames"]
    for fr in frames:
        img = np.zeros((64, 64, 4), np.uint8)
        img[44:, :, :3] = 90
        img[44:, :, 3] = 255
        cv2.imwrite(os.path.join(tdir, f"{fr['img_id']}.png"), img)

    from mere_fusion_tpu.train.ernerf_cli import main

    ws = os.path.join(base, "ws_head")
    main([base, "--iters", "6", "--num_rays", "256", "--grid_size", "16",
          "--num_levels", "4", "--base_resolution", "16",
          "--desired_resolution", "64", "--log2_hashmap_size", "10",
          "--workspace", ws, "--ckpt_every", "1000"])
    assert os.path.exists(os.path.join(ws, "scalars.jsonl"))

    ws_torso = os.path.join(base, "ws_torso")
    main([base, "--torso", "--head_ckpt", ws, "--iters", "6",
          "--num_rays", "256", "--grid_size", "16",
          "--num_levels", "4", "--base_resolution", "16",
          "--desired_resolution", "64", "--log2_hashmap_size", "10",
          "--workspace", ws_torso, "--ckpt_every", "1000"])

    # serve the torso workspace
    cfg = Config().override(**{
        "tts.backend": "procedural", "avatar.kind": "ernerf",
        "nerf.torso": True, "nerf.grid_size": 16,
        "nerf.num_levels": 4, "nerf.base_resolution": 16,
        "nerf.desired_resolution": 64, "nerf.log2_hashmap_size": 10,
        "nerf.max_steps": 8, "nerf.ckpt": ws_torso,
    })
    from mere_fusion_tpu.engines.nerf import (
        NeRFNetConfig,
        NeRFNetwork,
        NeRFReal,
        load_nerf_checkpoint,
    )

    variables, density = load_nerf_checkpoint(cfg)
    assert "torso_net" in variables["params"]
    assert density is not None

    dataset = NeRFTestDataset.load(
        os.path.join(base, "transforms.json"),
        os.path.join(base, "au.csv"), scale=1.0,
    )
    nc = cfg.nerf
    network = NeRFNetwork(NeRFNetConfig(
        bound=nc.bound, audio_in_dim=nc.audio_in_dim,
        audio_dim=nc.audio_dim, exp_eye=nc.exp_eye,
        num_levels=nc.num_levels, base_resolution=nc.base_resolution,
        log2_hashmap_size=nc.log2_hashmap_size,
        desired_resolution=nc.desired_resolution, torso=True,
        individual_dim=4, num_train_frames=4,
    ))
    engine = NeRFReal(cfg, network=network, variables=variables,
                      dataset=dataset, density=density)
    ok = engine.test_step()
    for _ in range(6):
        if engine.latest_frame is not None:
            break
        engine.test_step()
    frame = engine.latest_frame.image
    assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8
    assert np.isfinite(frame.astype(np.float32)).all()
