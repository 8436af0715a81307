import asyncio
import threading
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.audio.features import WhisperFeatureExtractor
from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines.muse import (
    MuseModels,
    MuseReal,
    blend_face,
    synthesize_muse_avatar,
)
from mere_fusion_tpu.models.musetalk import (
    AutoencoderKL,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from mere_fusion_tpu.models.whisper import WhisperDims

TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=2,
                     norm_num_groups=8)
TINY_UNET = UNetConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    attention_head_dim=4,
    cross_attention_dim=64,
    norm_num_groups=8,
)
SMALL_WHISPER = WhisperDims(
    n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_vocab=100, n_text_ctx=24, n_text_state=64, n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def models():
    return MuseModels(TINY_VAE, TINY_UNET, face_size=64)


def test_vae_shapes(models):
    x = jnp.zeros((2, 64, 64, 3))
    z = models.vae.apply(models.vae_vars, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 32, 32, 4)
    y = models.vae.apply(models.vae_vars, z, method=AutoencoderKL.decode)
    assert y.shape == (2, 64, 64, 3)


def test_unet_shapes(models):
    lat = jnp.zeros((2, 32, 32, 8))
    ctx = jnp.zeros((2, 50, 64))
    out = models.unet.apply(models.unet_vars, lat, jnp.zeros((2,)), ctx)
    assert out.shape == (2, 32, 32, 4)


def test_generate_step(models):
    lat = jnp.zeros((2, 32, 32, 8))
    feats = jnp.zeros((2, 50, 64))
    img = np.asarray(models.generate(lat, feats))
    assert img.shape == (2, 64, 64, 3) and img.dtype == np.uint8


def test_feature_slicing_formula():
    feat = np.arange(40)[:, None, None].repeat(5, 1).repeat(4, 2).astype(np.float32)
    out = WhisperFeatureExtractor.get_sliced_feature(feat, vid_idx=5, fps=25)
    # center = 10, frames 6..15, each expanded by 5 layers
    assert out.shape == (50, 4)
    assert out[0, 0] == 6 and out[-1, 0] == 15


def test_blend_face_preserves_outside():
    img = np.full((100, 100, 3), 50, np.uint8)
    face = np.full((40, 40, 3), 200, np.uint8)
    mask = np.zeros((60, 60, 3), np.uint8)
    mask[10:50, 10:50] = 255
    out = blend_face(img.copy(), face, (20, 20, 60, 60), mask, (10, 10, 70, 70))
    assert out[0, 0, 0] == 50            # far outside untouched
    assert out[40, 40, 0] > 150          # face region dominated by generated


def test_muse_engine_end_to_end(models):
    avatar = synthesize_muse_avatar(models, n_frames=4)
    cfg = Config().override(
        **{"avatar.kind": "musetalk", "avatar.batch_size": 2,
           "tts.backend": "procedural", "stride.left": 4, "stride.right": 4}
    )
    extractor = WhisperFeatureExtractor(dims=SMALL_WHISPER)
    engine = MuseReal(cfg, models=models, avatar=avatar, feature_extractor=extractor)

    async def main():
        loop = asyncio.get_running_loop()
        vtrack = SimpleNamespace(_queue=asyncio.Queue())
        atrack = SimpleNamespace(_queue=asyncio.Queue())
        quit_event = threading.Event()
        t = threading.Thread(
            target=engine.render, args=(quit_event, loop, atrack, vtrack), daemon=True
        )
        t.start()
        engine.put_msg_txt("muse speaks")
        frames = []
        try:
            while len(frames) < 16:
                frames.append(await asyncio.wait_for(vtrack._queue.get(), timeout=120))
        finally:
            quit_event.set()
            t.join(timeout=10)
        return frames

    frames = asyncio.run(main())
    cycle = [f.tobytes() for f in avatar.frame_cycle]
    assert any(f.image.tobytes() not in cycle for f in frames), "speech must blend faces"
    assert all(f.image.shape == avatar.frame_cycle[0].shape for f in frames)
