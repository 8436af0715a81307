import json
import os
import signal

import numpy as np

from mere_fusion_tpu.train.logger import ScalarLogger, StopFlag


def test_scalar_logger_jsonl(tmp_path):
    log = ScalarLogger(str(tmp_path / "ws"))
    log.log(0, loss=1.5, psnr=20.0)
    log.log(100, loss=np.float32(0.5))
    log.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "ws" / "scalars.jsonl")]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[0]["psnr"] == 20.0 and "wall_s" in lines[0]
    assert lines[1]["step"] == 100 and lines[1]["loss"] == 0.5

    # append-only across restarts (preemption resume)
    log2 = ScalarLogger(str(tmp_path / "ws"))
    log2.log(200, loss=0.1)
    log2.close()
    assert len(open(tmp_path / "ws" / "scalars.jsonl").readlines()) == 3


def test_stop_flag_sigterm():
    flag = StopFlag.install(signals=(signal.SIGTERM,))
    try:
        assert not flag
        signal.raise_signal(signal.SIGTERM)
        assert flag  # first signal sets the flag instead of killing
    finally:
        flag.uninstall()
    # handler restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler, signal.Handlers.SIG_DFL)


def test_training_cli_writes_scalars_and_final_ckpt(tmp_path):
    from mere_fusion_tpu.data.provider import synthesize_nerf_train_data
    from mere_fusion_tpu.train.ernerf_cli import main

    root = synthesize_nerf_train_data(str(tmp_path), n_frames=4, hw=64)
    base = root if isinstance(root, str) else str(tmp_path)
    ws = os.path.join(base, "ws")
    main([base, "--iters", "3", "--num_rays", "256", "--grid_size", "16",
          "--workspace", ws, "--ckpt_every", "1000"])
    lines = [json.loads(l) for l in open(os.path.join(ws, "scalars.jsonl"))]
    assert lines and lines[0]["step"] == 0 and "loss" in lines[0]


def test_training_cli_test_mode(tmp_path):
    """--test renders the workspace's EMA params and writes eval.json."""
    import json

    from mere_fusion_tpu.data.provider import synthesize_nerf_train_data
    from mere_fusion_tpu.train.ernerf_cli import main

    root = synthesize_nerf_train_data(str(tmp_path), n_frames=2, hw=48)
    base = root if isinstance(root, str) else str(tmp_path)
    ws = os.path.join(base, "ws")
    flags = ["--num_rays", "256", "--grid_size", "16",
             "--num_levels", "4", "--base_resolution", "16",
             "--desired_resolution", "64", "--log2_hashmap_size", "10",
             "--workspace", ws, "--ckpt_every", "1000"]
    main([base, "--iters", "4"] + flags)
    main([base, "--test"] + flags)
    report = json.load(open(os.path.join(ws, "eval.json")))
    assert report["frames"] == 2
    assert np.isfinite(report["psnr"]) and np.isfinite(report["ssim"])
