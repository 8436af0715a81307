"""Server CLI: flag surface mapped onto the typed Config.

Covers the reference's main server flags (reference: app.py:550-707 — avatar
kind/id, batch size, TTS backend + server, ASR strides, transport mode +
SRS URLs, session cap, port) as ``group.field`` dotted overrides.
"""
from __future__ import annotations

import argparse
import json

from mere_fusion_tpu.config import Config

_FLAG_TO_KEY = {
    "fps": "audio.fps",
    "l": "stride.left",
    "m": "stride.mid",
    "r": "stride.right",
    "model": "avatar.kind",
    "avatar_id": "avatar.avatar_id",
    "avatar_dir": "avatar.avatar_dir",
    "batch_size": "avatar.batch_size",
    "tts": "tts.backend",
    "tts_server": "tts.server_url",
    "ref_file": "tts.ref_audio",
    "ref_text": "tts.ref_text",
    "asr_backend": "asr.backend",
    "transport": "transport.mode",
    "push_url": "transport.push_url",
    "pull_url": "transport.pull_url",
    "rtp_host": "transport.rtp_host",
    "rtp_audio_port": "transport.rtp_audio_port",
    "rtp_video_port": "transport.rtp_video_port",
    "max_session": "server.max_sessions",
    "listenport": "server.listen_port",
    "avatar_ckpt": "avatar.ckpt",
    "vae_ckpt": "avatar.vae_ckpt",
    "unet_ckpt": "avatar.unet_ckpt",
    "unet_config": "avatar.unet_config",
    "vae_int8": "avatar.vae_int8",
    "whisper_ckpt": "avatar.whisper_ckpt",
    "pose": "nerf.pose_path",
    "au": "nerf.au_path",
    "bg_img": "nerf.bg_img",
    "fix_eye": "nerf.fix_eye",
    "fullbody_img": "nerf.fullbody_imgs",
    "torso": "nerf.torso",
    "nerf_ckpt": "nerf.ckpt",
    "asr_model": "nerf.asr_model",
    "perception": "perception.backend",
    "yolo_ckpt": "perception.ckpt",
    "yolo_scale": "perception.scale",
    "perception_fps": "perception.fps_throttle",
    "face_attrs": "perception.face_attrs",
    "ocr": "perception.ocr",
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mere-fusion-tpu server")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("-l", type=int, default=10, help="left stride (20 ms frames)")
    p.add_argument("-m", type=int, default=8, help="context size")
    p.add_argument("-r", type=int, default=10, help="right stride")
    p.add_argument("--model", default="wav2lip",
                   choices=["wav2lip", "musetalk", "ernerf"])
    p.add_argument("--avatar_id", default="avator_1")
    p.add_argument("--avatar_dir", default="./data/avatars")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--tts", default="edge",
                   choices=["edge", "gpt-sovits", "cosyvoice", "xtts", "procedural"])
    p.add_argument("--tts_server", default="http://127.0.0.1:9880")
    p.add_argument("--ref_file", default="")
    p.add_argument("--ref_text", default="")
    p.add_argument("--asr_backend", default="jax-whisper")
    p.add_argument("--transport", default="webrtc",
                   choices=["webrtc", "rtmp", "rtp", "loopback"])
    p.add_argument("--push_url", default="http://localhost:1985/rtc/v1/publish/")
    p.add_argument("--pull_url", default="http://localhost:1985/rtc/v1/play/")
    p.add_argument("--rtp_host", default="127.0.0.1",
                   help="--transport rtp: destination host")
    p.add_argument("--rtp_audio_port", type=int, default=5004,
                   help="--transport rtp: L16 audio UDP port (RTCP on +1)")
    p.add_argument("--rtp_video_port", type=int, default=5006,
                   help="--transport rtp: RFC4175 video UDP port (RTCP on +1)")
    p.add_argument("--max_session", type=int, default=10)
    p.add_argument("--listenport", type=int, default=8010)
    p.add_argument("--customopt", default="", help="path to custom idle-track json")
    # serving weights: reference torch files converted on the fly, or orbax
    # dirs from tools/convert_ckpt (reference loads ./models/wav2lip.pth at
    # lipreal.py:76 and the musetalk bundle at musetalk/utils/utils.py:18-24)
    p.add_argument("--avatar_ckpt", default="",
                   help="wav2lip generator weights (.pth or orbax dir)")
    p.add_argument("--vae_ckpt", default="",
                   help="musetalk sd-vae weights (.bin/.pth or orbax dir)")
    p.add_argument("--unet_ckpt", default="",
                   help="musetalk UNet weights (.bin/.pth or orbax dir)")
    p.add_argument("--unet_config", default="",
                   help="musetalk.json UNet architecture")
    p.add_argument("--vae_int8", default="auto",
                   choices=["auto", "on", "off"],
                   help="int8 VAE decode (musetalk speed tier): auto "
                        "(default) enables when the load-time PSNR gate "
                        "passes on the loaded weights")
    p.add_argument("--whisper_ckpt", default="",
                   help="whisper-tiny weights for MuseASR features (.pt or orbax dir)")
    # ER-NeRF serving flags (reference app.py:550-707)
    p.add_argument("--pose", default="data/transforms.json")
    p.add_argument("--au", default="data/au.csv")
    p.add_argument("--bg_img", default="white")
    p.add_argument("--fix_eye", type=float, default=-1.0)
    p.add_argument("--torso", action="store_true")
    p.add_argument("--nerf_ckpt", default="")
    p.add_argument("--asr_model", default="",
                   help="ER-NeRF live featurizer: a DeepSpeech .pb, a "
                        "transformers CTC model name, or empty for the fake")
    p.add_argument("--fullbody", action="store_true")
    p.add_argument("--fullbody_img", default="")
    p.add_argument("--fullbody_offset_x", type=int, default=0)
    p.add_argument("--fullbody_offset_y", type=int, default=0)
    p.add_argument("--perception", default="stub",
                   choices=["stub", "yolo-tpu", "yolo"],
                   help="camera scene understanding: flax YOLOv10 on TPU "
                        "(yolo-tpu), ultralytics (yolo), or the stub")
    p.add_argument("--yolo_ckpt", default="",
                   help="yolov10*.pt weights (yolo-tpu loads it without "
                        "the ultralytics package)")
    p.add_argument("--yolo_scale", default="x",
                   choices=["n", "s", "m", "b", "l", "x"])
    p.add_argument("--perception_fps", type=int, default=10,
                   help="analyze every Nth camera frame")
    p.add_argument("--face_attrs", default="",
                   help="TPU face attributes for yolo-tpu: 'random' or "
                        "'age=age.h5,gender=gender.h5,...' (DeepFace .h5 "
                        "weights); empty = deepface import fallback")
    p.add_argument("--ocr", default="",
                   help="TPU scene-text OCR for yolo-tpu: 'random' or "
                        "'craft=craft_mlt_25k.pth,crnn=english_g2.pth'; "
                        "empty = easyocr import fallback")
    p.add_argument("--llm", default="", help="llm backend (openai|vllm|qwen|echo)")
    p.add_argument("--llm_url", default="")
    p.add_argument("--llm_model", default="gpt-3.5-turbo")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    overrides = {
        key: getattr(args, flag)
        for flag, key in _FLAG_TO_KEY.items()
        if getattr(args, flag, None) is not None
    }
    if getattr(args, "fullbody", False) and not args.fullbody_img:
        raise SystemExit("--fullbody needs --fullbody_img <dir>")
    if getattr(args, "fullbody_img", ""):
        overrides["nerf.fullbody_offset"] = (
            args.fullbody_offset_x, args.fullbody_offset_y,
        )
    return Config().override(**overrides)


def main(argv=None) -> None:
    import os

    import jax

    # persistent XLA compilation cache: session N+1 and server restarts skip
    # the multi-minute first-compile of the engine step functions. jax may
    # already be imported (sitecustomize), so set the config directly — the
    # env var alone is frozen at import time.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/mere_fusion_jax")))
    # API keys from a .env file in the cwd, reference app.py:10 behavior
    # (dependency-free parser; existing environment wins)
    from mere_fusion_tpu.utils.env import load_dotenv

    load_dotenv()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    custom_opts = []
    if args.customopt:
        with open(args.customopt) as f:
            custom_opts = json.load(f)

    from mere_fusion_tpu.engines import make_engine
    from mere_fusion_tpu.server.app import run_server

    llm = None
    if args.llm:
        from mere_fusion_tpu.llm import make_llm

        kw = {}
        if args.llm in ("openai", "chatgpt") and args.llm_url:
            kw = {"base_url": args.llm_url, "model": args.llm_model}
        llm = make_llm(args.llm, **kw)

    # **kw forwards the SessionManager's device= placement so each session's
    # engine commits its weights to its assigned chip
    run_server(cfg, lambda c, **kw: make_engine(c, custom_opts=custom_opts, **kw),
               llm=llm)


if __name__ == "__main__":
    main()
