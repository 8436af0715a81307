import os

import cv2
import numpy as np
import pytest

from mere_fusion_tpu.tools import nerf_data


def test_audio_features_windows(tmp_path):
    from scipy.io import wavfile

    wav = (np.sin(np.linspace(0, 440 * 6.28, 32000)) * 0.4).astype(np.float32)
    path = str(tmp_path / "a.wav")
    wavfile.write(path, 16000, (wav * 32767).astype(np.int16))

    def logits_fn(audio):
        frames = audio.reshape(-1, 320)
        return np.tile(frames.mean(axis=1, keepdims=True), (1, 44))[:-1]

    out = nerf_data.audio_features(path, str(tmp_path / "aud.npy"), logits_fn)
    feats = np.load(out)
    assert feats.shape[1:] == (16, 44)
    assert feats.shape[0] == (len(wav) // 320 - 1) // 2


def test_background_and_transforms(tmp_path):
    frames_dir = tmp_path / "frames"
    parsing_dir = tmp_path / "parsing"
    frames_dir.mkdir()
    parsing_dir.mkdir()
    for i in range(3):
        img = np.full((32, 32, 3), 100, np.uint8)
        img[8:24, 8:24] = 200  # "face"
        cv2.imwrite(str(frames_dir / f"{i}.jpg"), img)
        mask = np.full((32, 32, 3), 255, np.uint8)  # semantic maps: bg white
        mask[8:24, 8:24] = (255, 0, 0)              # head blue
        cv2.imwrite(str(parsing_dir / f"{i}.png"), mask)
    bg_path = nerf_data.extract_background(
        str(frames_dir), str(parsing_dir), str(tmp_path / "bg.jpg"), sample_every=1
    )
    bg = cv2.imread(bg_path)
    assert abs(int(bg[0, 0, 0]) - 100) <= 2      # background value kept
    assert abs(int(bg[16, 16, 0]) - 255) <= 2    # masked face area filled

    poses = np.tile(np.eye(4), (3, 1, 1))
    tpath = nerf_data.export_transforms(poses, 300.0, 16.0, 16.0,
                                        str(tmp_path / "transforms.json"))
    import json

    with open(tpath) as f:
        t = json.load(f)
    assert len(t["frames"]) == 3 and t["focal_len"] == 300.0


def test_gated_tasks_raise():
    # task 8 is implemented (JAX landmark 3DMM fitter) but needs either a
    # BFM asset path or an explicit model
    with pytest.raises(ValueError):
        nerf_data.face_tracking(np.zeros((1, 4, 2), np.float32), (64, 64))
    with pytest.raises(ValueError):
        nerf_data.landmarks("/nonexistent")


def test_face_tracking_task_runs_with_explicit_model():
    from mere_fusion_tpu.tools.face_tracking import (
        MorphableModel, euler_to_rot, project,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 16
    model = MorphableModel(
        mean=rng.normal(0, 30, (n, 3)).astype(np.float32),
        base_id=rng.normal(0, 2, (n * 3, 4)).astype(np.float32),
        base_exp=rng.normal(0, 1, (n * 3, 3)).astype(np.float32),
    )
    pts = model.mean[None] + np.zeros((2, n, 3), np.float32)
    cam = pts + np.asarray([0, 0, -600.0], np.float32)
    lmk = np.asarray(project(jnp.asarray(cam), 1100.0, (128.0, 128.0)))
    poses, focal, fit = nerf_data.face_tracking(
        lmk, (256, 256), model=model, iters=800
    )
    assert poses.shape == (2, 4, 4)
    assert fit["pixel_rmse"] < 3.0


def test_extract_torso_and_gt(tmp_path):
    """Task 6 composites (reference process.py:120-240): gt over clean bg,
    RGBA torso with vertical inpainting above the neck/torso tops."""
    import cv2

    base = str(tmp_path)
    ori = os.path.join(base, "ori_imgs")
    parsing = os.path.join(base, "parsing")
    os.makedirs(ori); os.makedirs(parsing)

    H = W = 80
    img = np.full((H, W, 3), 200, np.uint8)
    img[:, :, 0] = 50  # distinctive person color
    cv2.imwrite(os.path.join(ori, "0.jpg"), img)

    seg = np.full((H, W, 3), 255, np.uint8)       # bg white
    seg[10:40, 20:60] = (255, 0, 0)               # head (blue)
    seg[40:46, 30:50] = (0, 255, 0)               # neck (green)
    seg[46:78, 25:55] = (0, 0, 255)               # torso (red)
    cv2.imwrite(os.path.join(parsing, "0.png"), seg)

    bg = np.zeros((H, W, 3), np.uint8)
    bg[..., 2] = 255                              # red background
    cv2.imwrite(os.path.join(base, "bc.jpg"), bg)

    from mere_fusion_tpu.tools import nerf_data

    n = nerf_data.extract_torso_and_gt(base, ori)
    assert n == 1
    gt = cv2.imread(os.path.join(base, "gt_imgs", "0.jpg"))
    # background replaced by bc.jpg, person kept
    assert gt[0, 0, 2] > 200 and gt[0, 0, 0] < 60
    assert gt[20, 30, 0] == 50

    torso = cv2.imread(os.path.join(base, "torso_imgs", "0.png"),
                       cv2.IMREAD_UNCHANGED)
    assert torso.shape == (H, W, 4)
    alpha = torso[..., 3]
    assert alpha[50, 40] == 255        # torso body opaque
    assert alpha[5, 5] == 0            # background transparent
    assert alpha[20, 25] == 0          # head region transparent
    # inpainted strip extends upward from the neck top (row 40) into the
    # head region for those columns
    assert alpha[39, 40] == 255


def test_face_parsing_semantic_map_fallback(tmp_path):
    """face_parsing task writes reference-colored maps from a mask-only
    parser; provider.load reads the head mask back."""
    import cv2

    from mere_fusion_tpu.tools import nerf_data

    frames = os.path.join(str(tmp_path), "frames")
    out = os.path.join(str(tmp_path), "parsing")
    os.makedirs(frames)
    cv2.imwrite(os.path.join(frames, "0.jpg"), np.zeros((32, 32, 3), np.uint8))

    def parser(img, size=(512, 512)):
        m = np.zeros(size, np.uint8)
        m[:256] = 255
        return m

    nerf_data.face_parsing(frames, out, parser)
    seg = cv2.imread(os.path.join(out, "0.png"))
    assert tuple(seg[0, 0]) == (255, 0, 0)    # head blue
    assert tuple(seg[31, 0]) == (255, 255, 255)  # bg white


def test_pipeline_cli_tasks_5_6(tmp_path):
    """The task-runner CLI executes the feasible tasks over a prepared dir."""
    import cv2

    from mere_fusion_tpu.tools.nerf_data import main

    base = str(tmp_path)
    ori = os.path.join(base, "ori_imgs")
    parsing = os.path.join(base, "parsing")
    os.makedirs(ori); os.makedirs(parsing)
    img = np.full((64, 64, 3), 128, np.uint8)
    seg = np.full((64, 64, 3), 255, np.uint8)
    seg[10:30, 20:44] = (255, 0, 0)
    seg[30:34, 26:38] = (0, 255, 0)
    seg[34:60, 22:42] = (0, 0, 255)
    for i in range(2):
        cv2.imwrite(os.path.join(ori, f"{i}.jpg"), img)
        cv2.imwrite(os.path.join(parsing, f"{i}.png"), seg)

    main([base, "--task", "5"])
    assert os.path.exists(os.path.join(base, "bc.jpg"))
    main([base, "--task", "6"])
    assert os.path.exists(os.path.join(base, "gt_imgs", "0.jpg"))
    assert os.path.exists(os.path.join(base, "torso_imgs", "1.png"))
