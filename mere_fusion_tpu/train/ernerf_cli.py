"""ER-NeRF training CLI (the reference's ernerf/main.py equivalent).

    python -m mere_fusion_tpu.train.ernerf_cli data/obama --iters 100000 \
        --workspace trial_obama --num_rays 65536

Data dir format: transforms.json + gt_imgs/ + aud.npy + au.csv (+ parsing/).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser("ernerf-train")
    p.add_argument("data_dir")
    p.add_argument("--workspace", default="workspace")
    p.add_argument("--iters", type=int, default=200_000)
    p.add_argument("--num_rays", type=int, default=65536 // 16)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--lr_net", type=float, default=5e-4)
    p.add_argument("--grid_size", type=int, default=128)
    p.add_argument("--audio_dim", type=int, default=44)
    p.add_argument("--num_levels", type=int, default=12)
    p.add_argument("--base_resolution", type=int, default=64)
    p.add_argument("--desired_resolution", type=int, default=512)
    p.add_argument("--log2_hashmap_size", type=int, default=14)
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preload", type=int, default=1, choices=(0, 1, 2),
                   help="dataset tier: 0 disk-lazy, 1 host RAM, "
                        "2 device-resident frames (reference --preload)")
    p.add_argument("--patch_size", type=int, default=0,
                   help="sample NxN pixel patches and add the 0.1×LPIPS "
                        "patch loss (reference --patch_size, utils.py:816)")
    p.add_argument("--lpips_alex", default=None,
                   help="torchvision alexnet .pth for the LPIPS backbone")
    p.add_argument("--lpips_lins", default=None,
                   help="lpips package lin-head .pth (alex.pth)")
    p.add_argument("--finetune_lips", action="store_true",
                   help="lips fine-tune: alternate normal steps with a "
                        "static lips-window step carrying a 0.01×LPIPS loss "
                        "(reference --finetune_lips, utils.py:824-837)")
    p.add_argument("--lips_size", type=int, default=64,
                   help="static lips window side (TPU replaces the "
                        "reference's per-frame dynamic rect)")
    p.add_argument("--test", action="store_true",
                   help="evaluation mode: render every training frame from "
                        "the workspace's EMA params and report PSNR/SSIM "
                        "(reference main.py --test / Trainer.evaluate)")
    p.add_argument("--viewer_port", type=int, default=None,
                   help="start the interactive HTTP training viewer on this "
                        "port (0 = auto): MJPEG /preview of the in-flight "
                        "weights + POST /camera orbit + /stats, the "
                        "reference GUI's train mode (gui.py:140-162) "
                        "reworked for headless TPU hosts")
    p.add_argument("--viewer_size", type=int, default=256,
                   help="training-viewer render resolution")
    p.add_argument("--torso", action="store_true",
                   help="torso fine-tune stage: train only the 2-D torso "
                        "nets against torso_imgs/ with the head frozen "
                        "(reference main.py:154-171)")
    p.add_argument("--head_ckpt", default="",
                   help="workspace of the trained head stage to load+freeze")
    args = p.parse_args(argv)

    import os

    import jax

    # jax is already imported by sitecustomize on this image, so the env var
    # alone is ignored — set the config directly
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/mere_fusion_jax")))
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.data.provider import NeRFTrainDataset
    from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
    from mere_fusion_tpu.train.ernerf_train import (
        NeRFTrainConfig,
        init_nerf_train,
        make_nerf_train_step,
        refresh_density_grid,
    )
    from mere_fusion_tpu.utils.checkpoint import Checkpointer

    dataset = NeRFTrainDataset.load(args.data_dir, preload=args.preload)
    print(f"[train] {len(dataset)} frames, {dataset.H}x{dataset.W}")

    net_cfg = NeRFNetConfig(
        audio_in_dim=args.audio_dim, num_train_frames=len(dataset),
        torso=args.torso, num_levels=args.num_levels,
        base_resolution=args.base_resolution,
        desired_resolution=args.desired_resolution,
        log2_hashmap_size=args.log2_hashmap_size,
    )
    network = NeRFNetwork(net_cfg)
    variables = jax.jit(network.init, static_argnames="method")(
        jax.random.key(args.seed),
        jnp.zeros((8, args.audio_dim, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, net_cfg.individual_dim)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    tcfg = NeRFTrainConfig(
        grid_size=args.grid_size, iters=args.iters, lr=args.lr,
        lr_net=args.lr_net,
    )
    if args.test:
        _evaluate(args, dataset, net_cfg, tcfg)
        return
    if args.torso:
        from mere_fusion_tpu.train.ernerf_train import (
            init_torso_train,
            make_torso_train_step,
        )

        head_params = None
        head_density = None
        if args.head_ckpt:
            from mere_fusion_tpu.engines.nerf import split_checkpoint_tree

            head_ckpt = Checkpointer(args.head_ckpt)
            head_raw = head_ckpt.restore_raw()
            head_ckpt.close()
            # non-strict merge of the head state dict, like the reference's
            # load_state_dict(strict=False); the head's trained density grid
            # rides along (it is a model buffer there)
            head_params = (head_raw["params"]
                           if "params" in head_raw else None)
            _, head_density = split_checkpoint_tree(head_raw)
        tx, state = init_torso_train(network, variables, tcfg,
                                     head_params=head_params)
        if head_density is not None:
            state = state._replace(density=head_density)
        step = make_torso_train_step(network, tx, tcfg)
        ckpt = Checkpointer(args.workspace)
        from mere_fusion_tpu.train.logger import ScalarLogger, StopFlag

        slog = ScalarLogger(args.workspace)
        stop = StopFlag.install()
        rng = np.random.default_rng(args.seed)
        t0 = time.time()
        metrics = {"loss": float("nan")}
        it = 0
        for it in range(args.iters):
            frame = int(rng.integers(0, len(dataset)))
            batch = dataset.sample_torso_rays(frame, args.num_rays, rng)
            state, metrics = step(state, batch, jax.random.key(it))
            if it % 100 == 0:
                rate = (it + 1) / (time.time() - t0)
                print(f"[torso] it {it}  loss {float(metrics['loss']):.5f}"
                      f"  {rate:.1f} it/s")
                slog.log(it, loss=metrics["loss"], mse=metrics["mse"],
                         it_per_s=rate)
            if it > 0 and it % args.ckpt_every == 0:
                ckpt.save(it, state, {"loss": float(metrics["loss"])})
            if stop:
                print(f"[torso] stop signal — checkpointing at it {it}")
                break
        ckpt.save(it + 1 if stop else args.iters, state,
                  {"loss": float(metrics["loss"])})
        stop.uninstall()
        slog.close()
        ckpt.close()
        print("[torso] done")
        return

    tx, state = init_nerf_train(network, variables, tcfg)
    lpips_fn = None
    patch_hw = None
    patch_size = args.patch_size or None
    if patch_size:
        from mere_fusion_tpu.models.lpips import make_lpips_fn

        lpips_fn = make_lpips_fn(args.lpips_alex, args.lpips_lins)
        patch_hw = (patch_size, patch_size)
    step = make_nerf_train_step(network, tx, tcfg, lpips_fn=lpips_fn,
                                patch_hw=patch_hw)
    lips_step = None
    if args.finetune_lips:
        from dataclasses import replace as _replace

        from mere_fusion_tpu.models.lpips import make_lpips_fn

        if lpips_fn is None:
            lpips_fn = make_lpips_fn(args.lpips_alex, args.lpips_lins)
        # flip mode disables the uncertainty loss (utils.py:789)
        lips_step = make_nerf_train_step(
            network, tx, _replace(tcfg, unc_loss=False), lpips_fn=lpips_fn,
            patch_hw=(args.lips_size, args.lips_size), lpips_weight=0.01,
        )
    ckpt = Checkpointer(args.workspace)
    it0 = 0
    if ckpt.latest_step is not None:
        # resume (the reference's --ckpt latest continuation used by the
        # 2-stage train_obama.sh recipe)
        state = ckpt.restore(state)
        it0 = int(state.step)
        print(f"[train] resumed from step {it0}")
    if it0 >= args.iters:
        print(f"[train] checkpoint step {it0} >= --iters {args.iters}; "
              "nothing to do (pass a larger total step target)")
        ckpt.close()
        return

    from mere_fusion_tpu.train.logger import ScalarLogger, StopFlag

    viewer = None
    if args.viewer_port is not None:
        from mere_fusion_tpu.train.viewer import TrainingViewer

        viewer = TrainingViewer(
            _make_viewer_render(network, net_cfg, tcfg, dataset,
                                args.viewer_size),
            width=args.viewer_size, height=args.viewer_size,
            port=args.viewer_port)
        print(f"[train] viewer: http://127.0.0.1:{viewer.port}/preview")

    slog = ScalarLogger(args.workspace)
    stop = StopFlag.install()
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    metrics = {"loss": float("nan")}
    it = it0
    for it in range(it0, args.iters):
        frame = int(rng.integers(0, len(dataset)))
        if lips_step is not None and it % 2 == 1:
            # flip every step, like the reference's flip_finetune_lips
            batch = dataset.sample_lips_rays(frame, rng, size=args.lips_size)
            state, metrics = lips_step(state, batch, jax.random.key(it))
        else:
            batch = dataset.sample_rays(frame, args.num_rays, rng,
                                        patch_size=patch_size)
            state, metrics = step(state, batch, jax.random.key(it))
        if it % 16 == 0:
            state = refresh_density_grid(
                network, state,
                jnp.asarray(dataset.auds[
                    np.clip(np.arange(8), 0, len(dataset) - 1)
                ]),
                tcfg
            )
        if viewer is not None:
            viewer.tick(state, it, metrics)
        if it % 100 == 0:
            loss = float(metrics["loss"])
            rate = (it - it0 + 1) / (time.time() - t0)
            print(f"[train] it {it}  loss {loss:.5f}  {rate:.1f} it/s")
            slog.log(it, loss=metrics["loss"], mse=metrics["mse"],
                     it_per_s=rate)
        if it > 0 and it % args.ckpt_every == 0:
            ckpt.save(it, state, {"loss": float(metrics["loss"])})
        if stop:
            print(f"[train] stop signal — checkpointing at it {it}")
            break
    ckpt.save(it + 1 if stop else args.iters, state,
              {"loss": float(metrics["loss"])})
    stop.uninstall()
    if viewer is not None:
        viewer.close()
    slog.close()
    ckpt.close()
    print("[train] done")


def _make_viewer_render(network, net_cfg, tcfg, dataset, size: int):
    """Render closure for the training viewer: current (non-EMA) params +
    density grid → one orbit-camera frame at the viewer resolution, with the
    dataset's first attention window as the (frozen) audio condition — the
    reference train GUI likewise renders whatever its loader last yielded
    (gui.py:163-231 test_step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.models.ernerf.network import NeRFNetwork
    from mere_fusion_tpu.models.ernerf.renderer import get_rays, render_rays

    auds = jnp.asarray(dataset.auds[np.clip(np.arange(8), 0,
                                            len(dataset) - 1)])
    eye = jnp.asarray([[float(np.mean(dataset.eye_area))]], np.float32)

    @jax.jit
    def render(params, density, pose, intrinsics):
        variables = {"params": params}
        enc_a = network.apply(variables, auds,
                              method=NeRFNetwork.encode_audio)
        ind = (network.apply(variables, 0,
                             method=NeRFNetwork.individual_code)
               if net_cfg.individual_dim > 0 else None)
        rays_o, rays_d = get_rays(pose, intrinsics, size, size)

        def apply_fn(xyz, dirs, training):
            return network.apply(variables, xyz, dirs, enc_a, ind, eye,
                                 training=training)

        out = render_rays(
            apply_fn, rays_o, rays_d, density, bound=tcfg.bound,
            grid_size=tcfg.grid_size, bg_color=jnp.ones(3),
            n_candidates=tcfg.n_candidates, n_steps=tcfg.n_steps,
        )
        return jnp.clip(out["image"].reshape(size, size, 3), 0.0, 1.0)

    def render_fn(state, pose, intrinsics):
        return render(state.params, state.density, jnp.asarray(pose),
                      jnp.asarray(intrinsics))

    return render_fn


def _evaluate(args, dataset, net_cfg, tcfg) -> None:
    """Render every frame from the workspace checkpoint and report
    PSNR/SSIM (the reference's --test flow, main.py:184-215 +
    Trainer.evaluate metrics, utils.py:410-580)."""
    import json as _json
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mere_fusion_tpu.engines.nerf import split_checkpoint_tree
    from mere_fusion_tpu.models.ernerf.network import NeRFNetwork
    from mere_fusion_tpu.utils.checkpoint import Checkpointer
    from mere_fusion_tpu.train.metrics import MetricMeter, psnr, ssim
    from mere_fusion_tpu.models.ernerf.renderer import get_rays, render_rays

    network = NeRFNetwork(net_cfg)
    ckpt = Checkpointer(args.workspace)
    raw = ckpt.restore_raw()
    ckpt.close()
    params, density = split_checkpoint_tree(raw)
    variables = {"params": params}

    H, W = dataset.H, dataset.W

    @jax.jit
    def render(pose, auds, eye):
        enc_a = network.apply(variables, auds,
                              method=NeRFNetwork.encode_audio)
        ind = (network.apply(variables, 0,
                             method=NeRFNetwork.individual_code)
               if net_cfg.individual_dim > 0 else None)
        rays_o, rays_d = get_rays(jnp.asarray(pose), dataset.intrinsics, H, W)

        def apply_fn(xyz, dirs, training):
            return network.apply(variables, xyz, dirs, enc_a, ind, eye,
                                 training=training)

        out = render_rays(
            apply_fn, rays_o, rays_d, density, bound=tcfg.bound,
            grid_size=tcfg.grid_size, bg_color=jnp.ones(3),
            n_candidates=tcfg.n_candidates, n_steps=tcfg.n_steps,
        )
        return jnp.clip(out["image"].reshape(H, W, 3), 0.0, 1.0)

    m_psnr = MetricMeter(psnr, "PSNR")
    m_ssim = MetricMeter(ssim, "SSIM")
    att = 8
    t0 = time.time()
    for i in range(len(dataset)):
        idx = np.clip(np.arange(i - att // 2, i + att // 2), 0,
                      len(dataset) - 1)
        img = render(dataset.poses[i], jnp.asarray(dataset.auds[idx]),
                     jnp.asarray([[dataset.eye_area[i]]], np.float32))
        gt = jnp.asarray(dataset.images[i])
        m_psnr.update(img, gt)
        m_ssim.update(img, gt)
    dt = time.time() - t0
    report = {"frames": len(dataset), "psnr": m_psnr.mean,
              "ssim": float(m_ssim.mean), "seconds": round(dt, 1)}
    with open(os.path.join(args.workspace, "eval.json"), "w") as f:
        _json.dump(report, f)
    print(f"[test] {m_psnr.report()}  {m_ssim.report()}  "
          f"({len(dataset)} frames in {dt:.1f} s)")


if __name__ == "__main__":
    main()
