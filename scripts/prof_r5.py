"""Round-5 breakdown: dense frame program vs ASR vs torso pass at 512px.

Times, on the real chip (dependency-chained per CLAUDE.md):
  1. the span-cached dense frame program (engine._render_step, pose_key=0)
  2. the 2-DeepSpeech-steps-per-frame ASR budget
  3. the torso background pass at full res and half res (bf16 + f32)

Run: python scripts/prof_r5.py [iters]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.audio.deepspeech import deepspeech_logits_fn, init_params
from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset, synthesize_nerf_dataset
from mere_fusion_tpu.engines.nerf import NeRFReal
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import render_torso_background

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def main():
    cfg = Config().override(
        **{"avatar.kind": "ernerf", "tts.backend": "procedural",
           "nerf.audio_in_dim": 29})
    with tempfile.TemporaryDirectory() as td:
        d = synthesize_nerf_dataset(td, hw=512)
        dataset = NeRFTestDataset.load(
            f"{d}/transforms.json", f"{d}/au.csv", scale=1.0)
        ds_params = init_params()
        engine = NeRFReal(
            cfg, dataset=dataset,
            logits_fn=deepspeech_logits_fn(params=ds_params, device=None,
                                           compute_dtype="bfloat16"),
            device_logits_fn=deepspeech_logits_fn(params=ds_params,
                                                  return_device=True),
        )
        speech = 0.3 * np.sin(
            np.linspace(0, 440 * 6.28, 320)).astype(np.float32)

        data = dataset.collate(0)
        auds = engine.asr.get_next_feat_device()
        eye = jnp.asarray(data["eye"])

        # ---- 1. frame program only (span cached after first call)
        def frame_only(chain):
            img, n_active, _ = engine._render_step(
                data["pose"], auds, eye + chain, engine.density,
                engine._bg_dev, pose_key=0)
            return img.astype(jnp.float32).sum() * 1e-30

        chain = frame_only(jnp.zeros(()))
        np.asarray(chain)
        best = float("inf")
        for _ in range(2):
            chain = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(ITERS):
                chain = frame_only(chain)
            np.asarray(chain)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"frame_program_dense          {best*1e3:8.2f} ms")

        # ---- 2. ASR: 2 steps/frame
        for _ in range(4):
            engine.asr.put_audio_frame(speech)
            engine.asr.run_step()
        np.asarray(engine.asr.get_next_feat_device())
        t0 = time.perf_counter()
        for _ in range(ITERS):
            for _ in range(2):
                engine.asr.put_audio_frame(speech)
                engine.asr.run_step()
            a = engine.asr.get_next_feat_device()
        np.asarray(a)
        print(f"asr_2steps_plus_window       {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms")

    # ---- 3. torso pass
    nc = cfg.nerf
    network = NeRFNetwork(NeRFNetConfig(
        bound=nc.bound, audio_in_dim=nc.audio_in_dim, audio_dim=nc.audio_dim,
        exp_eye=nc.exp_eye, num_levels=nc.num_levels,
        base_resolution=nc.base_resolution,
        log2_hashmap_size=nc.log2_hashmap_size,
        desired_resolution=nc.desired_resolution, torso=True,
        individual_dim=4, num_train_frames=4, level_dim=nc.level_dim))
    variables = jax.jit(network.init, static_argnames="method")(
        jax.random.key(0), jnp.zeros((8, network.cfg.audio_in_dim, 16)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init)
    pose = jnp.asarray(dataset.poses[0])
    bg = jnp.zeros((3,), jnp.float32)

    def torso_fn(x, p):
        c = variables["params"]["individual_codes_torso"][:1]
        return network.apply(variables, x, p, c,
                             method=NeRFNetwork.forward_torso)

    for hw in (512, 256):
        @jax.jit
        def tpass(pose, chain, hw=hw):
            bg2, _ = render_torso_background(torso_fn, hw, hw, pose, bg)
            return bg2.astype(jnp.float32).sum() * 1e-30

        chain = tpass(pose, jnp.zeros(()))
        np.asarray(chain)
        best = float("inf")
        for _ in range(2):
            chain = jnp.zeros(())
            t0 = time.perf_counter()
            for _ in range(ITERS):
                chain = tpass(pose + chain * 0, chain)
            np.asarray(chain)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"torso_pass_{hw}px             {best*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
