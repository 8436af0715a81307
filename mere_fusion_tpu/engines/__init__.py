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
                smooth_path=True, smooth_path_window=cfg.nerf.smooth_path_window,
            )
        return NeRFReal(cfg, **kw)
    raise ValueError(f"unknown avatar kind {kind!r}")
