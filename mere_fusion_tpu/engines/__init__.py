"""Real-time avatar engines (the reference's L3 "*Real" layer).

Each engine owns: a TTS adapter feeding 20 ms PCM chunks, an ASR feeder that
featurizes audio for its model, a device inference stage (jit-compiled — the
reference's mp.Process GPU worker becomes an in-process thread dispatching
async XLA computations), and a frame-assembly stage pasting generated crops
into full frames for the output tracks.
"""
from __future__ import annotations

from mere_fusion_tpu.config import Config


def make_engine(cfg: Config, **kw):
    """Engine factory keyed by cfg.avatar.kind (reference: app.py:330-343)."""
    kind = cfg.avatar.kind
    if kind == "wav2lip":
        from mere_fusion_tpu.engines.lip import LipReal

        return LipReal(cfg, **kw)
    if kind == "musetalk":
        from mere_fusion_tpu.engines.muse import MuseReal

        return MuseReal(cfg, **kw)
    if kind == "ernerf":
        from mere_fusion_tpu.data.provider import NeRFTestDataset
        from mere_fusion_tpu.engines.nerf import NeRFReal

        if "dataset" not in kw:
            kw["dataset"] = NeRFTestDataset.load(
                cfg.nerf.pose_path, cfg.nerf.au_path, bg_img=cfg.nerf.bg_img,
                scale=cfg.nerf.scale, offset=tuple(cfg.nerf.offset),
                smooth_path=cfg.nerf.smooth_path,
                smooth_path_window=cfg.nerf.smooth_path_window,
                smooth_eye=cfg.nerf.smooth_eye,
                data_range=tuple(cfg.nerf.data_range),
            )
        if cfg.nerf.fix_eye >= 0:
            kw["dataset"].eye_area[:] = cfg.nerf.fix_eye
        if cfg.nerf.ckpt and "variables" not in kw:
            from mere_fusion_tpu.engines.nerf import load_nerf_checkpoint

            variables, density = load_nerf_checkpoint(cfg)
            kw["variables"] = variables
            if density is not None:
                kw["density"] = density
        if cfg.nerf.fullbody_imgs and "fullbody_frames" not in kw:
            from mere_fusion_tpu.engines.base import _sorted_imgs, read_imgs

            kw["fullbody_frames"] = read_imgs(
                _sorted_imgs(cfg.nerf.fullbody_imgs))
            kw["fullbody_offset"] = tuple(cfg.nerf.fullbody_offset)
        return NeRFReal(cfg, **kw)
    raise ValueError(f"unknown avatar kind {kind!r}")
