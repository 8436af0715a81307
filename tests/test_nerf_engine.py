import asyncio
import threading
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import NeRFTestDataset, synthesize_nerf_dataset
from mere_fusion_tpu.engines.nerf import NeRFReal, NerfASR, fake_logits_fn
from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork

CFG = Config().override(
    **{
        "tts.backend": "procedural",
        "avatar.kind": "ernerf",
        "nerf.grid_size": 16,
        "nerf.num_levels": 4,
        "nerf.base_resolution": 16,
        "nerf.desired_resolution": 64,
        "nerf.log2_hashmap_size": 10,
        "nerf.max_steps": 8,
    }
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = synthesize_nerf_dataset(str(tmp_path_factory.mktemp("nerfdata")), hw=64)
    return NeRFTestDataset.load(f"{d}/transforms.json", f"{d}/au.csv", scale=1.0)


def test_dataset_load(dataset):
    assert dataset.H == dataset.W == 64
    assert len(dataset) == 4
    assert 0.0 <= dataset.eye_area.min() <= dataset.eye_area.max() <= 1.0
    item = dataset.collate(5)  # mirrored: 5 → index 2
    assert item["pose"].shape == (4, 4)
    assert item["bg_color"].shape == (64 * 64, 3)


def test_nerfasr_ring_and_window():
    asr = NerfASR(CFG, None, fake_logits_fn(CFG.nerf.audio_in_dim))
    asr.warm_up()
    feat = asr.get_next_feat()
    assert feat.shape == (8, 44, 16)
    # drive like the render loop: 2 ASR steps per video frame, one window per
    # frame; with speech flowing the attention stack must eventually light up
    saw_nonzero = False
    for _ in range(40):
        for _ in range(2):
            asr.put_audio_frame(0.5 * np.ones(320, np.float32))
            asr.run_step()
        feat = asr.get_next_feat()
        assert feat.shape == (8, 44, 16)
        if np.abs(feat).sum() > 0:
            saw_nonzero = True
    assert saw_nonzero, "speech features must reach the attention window"


def test_nerf_engine_renders_frames(dataset):
    engine = NeRFReal(CFG, dataset=dataset)

    async def main():
        loop = asyncio.get_running_loop()
        vtrack = SimpleNamespace(_queue=asyncio.Queue())
        atrack = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render, args=(quit_event, loop, atrack, vtrack), daemon=True
        )
        t.start()
        engine.put_msg_txt("talking head")
        frames, chunks = [], []
        try:
            while len(frames) < 6:
                frames.append(await asyncio.wait_for(vtrack._queue.get(), timeout=180))
            # warm-up leaves ~28 silence chunks queued ahead of the speech
            while len(chunks) < 80:
                chunks.append(await asyncio.wait_for(atrack._queue.get(), timeout=60))
        finally:
            quit_event.set()
            t.join(timeout=10)
        return frames, chunks

    frames, chunks = asyncio.run(main())
    assert all(f.image.shape == (64, 64, 3) for f in frames)
    pattern = "".join("1" if np.any(c.samples != 0) else "0" for c in chunks)
    assert "1" in pattern, f"speech audio must flow, got {pattern}"
    # untrained NeRF over a white bg composites to a bright, valid frame
    assert all(f.image.dtype == np.uint8 for f in frames)
    assert all(f.image.mean() > 128 for f in frames)
