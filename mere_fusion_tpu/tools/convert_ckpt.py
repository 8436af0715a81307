"""Checkpoint conversion CLI: reference torch/diffusers weights → native trees.

    python -m mere_fusion_tpu.tools.convert_ckpt wav2lip models/wav2lip.pth out/
    python -m mere_fusion_tpu.tools.convert_ckpt whisper models/whisper/tiny.pt out/
    python -m mere_fusion_tpu.tools.convert_ckpt vae models/sd-vae-ft-mse/... out/
    python -m mere_fusion_tpu.tools.convert_ckpt musetalk-unet pytorch_model.bin out/ \
        --unet-config musetalk.json
    python -m mere_fusion_tpu.tools.convert_ckpt s3fd s3fd.pth out/
    python -m mere_fusion_tpu.tools.convert_ckpt bisenet 79999_iter.pth out/

Output is an orbax checkpoint directory loadable with
mere_fusion_tpu.utils.checkpoint.Checkpointer (plus a families.json note).
"""
from __future__ import annotations

import argparse
import json
import os


def convert(family: str, in_path: str, unet_config: str | None = None) -> dict:
    return convert_with_meta(family, in_path, unet_config)[0]


def convert_with_meta(family: str, in_path: str,
                      unet_config: str | None = None) -> tuple[dict, dict]:
    """(param tree, metadata). Metadata captures architecture facts that
    don't live in the tree — e.g. whisper dims — so serving can rebuild the
    right model from a converted orbax dir (family.json)."""
    from mere_fusion_tpu.utils import torch_convert as tc

    meta: dict = {}
    if family.startswith("face-"):
        # DeepFace Keras .h5 weight files (age/gender/race/emotion), not
        # torch checkpoints (reference consumption: yolo_opencv.py:202-217)
        from mere_fusion_tpu.utils import keras_convert as kc

        task = family[len("face-"):]
        if task == "emotion":
            return kc.convert_emotion_h5(in_path), meta
        n_cls = {"age": 101, "gender": 2, "race": 6}.get(task)
        if n_cls is None:
            raise ValueError(f"unknown family {family!r}")
        return kc.convert_vggface_h5(in_path, n_classes=n_cls), meta

    sd = tc.load_torch_checkpoint(in_path)
    if family == "wav2lip":
        return tc.convert_wav2lip(sd), meta
    if family == "wav2lip-disc":
        return tc.convert_wav2lip_disc(sd), meta
    if family == "syncnet":
        from mere_fusion_tpu.models.syncnet import convert_syncnet

        return convert_syncnet(sd), meta
    if family == "whisper":
        from mere_fusion_tpu.models.whisper import WhisperDims

        import dataclasses

        dims = WhisperDims(**sd["dims"]) if "dims" in sd else WhisperDims()
        meta["dims"] = dataclasses.asdict(dims)
        state = sd.get("model_state_dict", sd)
        return tc.convert_whisper(state, dims), meta
    if family == "vae":
        from mere_fusion_tpu.utils.diffusers_convert import convert_vae

        return convert_vae(sd), meta
    if family == "musetalk-unet":
        from mere_fusion_tpu.models.musetalk import UNetConfig
        from mere_fusion_tpu.utils.diffusers_convert import convert_musetalk_unet

        cfg = UNetConfig.from_json(unet_config) if unet_config else UNetConfig()
        return convert_musetalk_unet(sd, cfg), meta
    if family == "s3fd":
        return tc.convert_s3fd(sd), meta
    if family == "bisenet":
        return tc.convert_bisenet(sd), meta
    if family == "fan":
        return tc.convert_fan(sd), meta
    if family == "ernerf":
        # Trainer checkpoints wrap the network under 'model' and carry the
        # density grid beside it (utils.py:1418-1477)
        model_sd = sd.get("model", sd)
        out = tc.convert_ernerf(model_sd)
        if "density_grid" in model_sd:
            out = {**out, "density": tc.density_from_ernerf(
                model_sd, mean_density=sd.get("mean_density"))}
        return out, meta
    if family == "rtmpose":
        # DWPose wholebody landmarker (models/dwpose/dw-ll_ucoco_384.pth,
        # musetalk/utils/preprocessing.py:17-18)
        return tc.convert_rtmpose(sd), meta
    if family == "craft":
        # EasyOCR text detector (craft_mlt_25k.pth; yolo_opencv.py:189-199)
        return tc.convert_craft(sd), meta
    if family == "crnn":
        # EasyOCR recognizer (english_g2.pth family)
        return tc.convert_crnn(sd), meta
    if family == "yolo":
        # ultralytics yolov10*.pt (tensors extracted without ultralytics);
        # perception backend "yolo-tpu" serves these (yolo_opencv.py:42)
        from mere_fusion_tpu.utils.yolo_convert import (
            convert_yolo,
            load_ultralytics_state_dict,
        )

        return convert_yolo(load_ultralytics_state_dict(in_path)), meta
    raise ValueError(f"unknown family {family!r}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser("convert-ckpt")
    p.add_argument("family",
                   choices=["wav2lip", "wav2lip-disc", "syncnet", "whisper",
                            "vae", "musetalk-unet", "s3fd", "bisenet",
                            "fan", "ernerf", "yolo", "face-age",
                            "face-gender", "face-race", "face-emotion",
                            "craft", "crnn", "rtmpose"])
    p.add_argument("input")
    p.add_argument("out_dir")
    p.add_argument("--unet-config", default=None)
    args = p.parse_args(argv)

    variables, meta = convert_with_meta(args.family, args.input,
                                        args.unet_config)

    from mere_fusion_tpu.utils.checkpoint import Checkpointer

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = Checkpointer(args.out_dir, max_keep=1, best_mode="min")
    ckpt.save(0, variables)
    ckpt.close()
    with open(os.path.join(args.out_dir, "family.json"), "w") as f:
        json.dump({"family": args.family,
                   "source": os.path.abspath(args.input), **meta}, f)
    n = sum(x.size for x in __import__("jax").tree.leaves(variables))
    print(f"converted {args.family}: {n/1e6:.1f}M params → {args.out_dir}")


if __name__ == "__main__":
    main()
