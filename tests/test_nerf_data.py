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
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[8:24, 8:24] = (255, 0, 0)
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
