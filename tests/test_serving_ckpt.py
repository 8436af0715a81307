"""Serving-weights path: make_engine loads converted checkpoints and shares
one committed copy per chip across sessions.

Reference behavior mirrored: engines load their weights at start
(lipreal.py:75-80 loads ./models/wav2lip.pth; musetalk/utils/utils.py:18-24
loads sd-vae + UNet + whisper together) — here via avatar.ckpt/vae_ckpt/
unet_ckpt/whisper_ckpt, accepting torch files or orbax dirs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.engines import (
    _DEVICE_TREES,
    make_engine,
    shared_device_tree,
)
from mere_fusion_tpu.engines.avatar import synthesize_avatar
from mere_fusion_tpu.utils.checkpoint import Checkpointer


def _save_tree(path, tree):
    ckpt = Checkpointer(str(path), max_keep=1, best_mode="min")
    ckpt.save(0, tree)
    ckpt.close()
    return str(path)


def test_shared_device_tree_commits_and_dedupes(tmp_path):
    tree = {"params": {"w": np.arange(16, dtype=np.float32).reshape(4, 4)}}
    path = _save_tree(tmp_path / "t", tree)
    dev = jax.devices()[2]

    a = shared_device_tree("wav2lip", path, dev)
    b = shared_device_tree("wav2lip", path, dev)
    assert a is b, "same (path, device) must return the cached tree"
    assert a["params"]["w"].devices() == {dev}
    np.testing.assert_array_equal(np.asarray(a["params"]["w"]),
                                  tree["params"]["w"])

    other = shared_device_tree("wav2lip", path, jax.devices()[3])
    assert other is not a
    assert other["params"]["w"].devices() == {jax.devices()[3]}

    cast = shared_device_tree("wav2lip", path, dev, dtype=jnp.bfloat16)
    assert cast["params"]["w"].dtype == jnp.bfloat16
    assert cast is not a, "cast trees are cached under their own key"


def test_make_engine_wav2lip_serving_ckpt(tmp_path):
    from mere_fusion_tpu.models.wav2lip import Wav2Lip

    model = Wav2Lip()
    variables = jax.jit(model.init)(
        jax.random.key(7), jnp.zeros((1, 80, 16)), jnp.zeros((1, 96, 96, 6))
    )
    path = _save_tree(tmp_path / "w2l", jax.tree.map(np.asarray, variables))
    avatar = synthesize_avatar(str(tmp_path / "avatar"), n_frames=4)
    cfg = Config().override(**{
        "avatar.batch_size": 2, "tts.backend": "procedural",
        "avatar.dtype": "float32", "avatar.ckpt": path,
    })
    dev = jax.devices()[1]
    n_trees = len(_DEVICE_TREES)
    engine = make_engine(cfg, avatar=avatar, device=dev)
    assert len(_DEVICE_TREES) == n_trees + 1

    mel = jnp.zeros((2, 80, 16))
    faces = jnp.zeros((2, 96, 96, 3), jnp.uint8)
    out = engine._device_step(mel, faces)
    assert out.devices() == {dev}, "serving weights must be committed"

    # the engine's step must compute with the LOADED weights: reproduce it
    # from the restored tree directly
    x = jnp.concatenate(
        [jnp.zeros((2, 96, 96, 3)).at[:, 48:].set(0.0),
         jnp.zeros((2, 96, 96, 3))], axis=-1)
    ref = model.apply(variables, mel, x)
    ref_u8 = jnp.clip(ref * 255.0, 0, 255).astype(jnp.uint8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_u8), atol=1)

    # a second session on the same chip reuses the cached committed tree
    engine2 = make_engine(cfg, avatar=avatar, device=dev)
    assert len(_DEVICE_TREES) == n_trees + 1
    out2 = engine2._device_step(mel, faces)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_make_engine_musetalk_serving_ckpts(tmp_path):
    import dataclasses
    import json

    from mere_fusion_tpu.audio.features import WhisperFeatureExtractor
    from mere_fusion_tpu.engines.muse import MuseModels, synthesize_muse_avatar
    from tests.test_musetalk import SMALL_WHISPER, TINY_UNET, TINY_VAE

    src = MuseModels(TINY_VAE, TINY_UNET, face_size=64)
    vae_path = _save_tree(tmp_path / "vae",
                          jax.tree.map(lambda x: np.asarray(x), src.vae_vars))
    unet_path = _save_tree(tmp_path / "unet",
                           jax.tree.map(lambda x: np.asarray(x), src.unet_vars))
    unet_json = tmp_path / "musetalk.json"
    unet_json.write_text(json.dumps(dataclasses.asdict(TINY_UNET)))

    cfg = Config().override(**{
        "avatar.kind": "musetalk",
        "avatar.batch_size": 2,
        "avatar.dtype": "float32",
        "tts.backend": "procedural",
        "avatar.vae_ckpt": vae_path,
        "avatar.unet_ckpt": unet_path,
        "avatar.unet_config": str(unet_json),
    })
    avatar = synthesize_muse_avatar(src, n_frames=4)
    dev = jax.devices()[1]
    engine = make_engine(
        cfg, avatar=avatar, vae_cfg=TINY_VAE, face_size=64,
        feature_extractor=WhisperFeatureExtractor(dims=SMALL_WHISPER),
        device=dev,
    )
    assert jax.tree.leaves(engine.models.vae_vars)[0].devices() == {dev}

    # the served models must compute exactly what the source weights do
    lat = jnp.zeros((2, src.latent_size, src.latent_size, 8))
    feats = jnp.zeros((2, 30, TINY_UNET.cross_attention_dim))
    np.testing.assert_array_equal(
        np.asarray(engine.models.generate(lat, feats)),
        np.asarray(src.generate(lat, feats)),
    )


def test_musetalk_requires_both_vae_and_unet(tmp_path):
    cfg = Config().override(**{
        "avatar.kind": "musetalk",
        "avatar.vae_ckpt": str(tmp_path / "vae"),
    })
    with pytest.raises(ValueError, match="BOTH"):
        make_engine(cfg)


def test_serving_tree_rejects_unknown_format(tmp_path):
    bogus = tmp_path / "weights.npz"
    bogus.write_bytes(b"x")
    with pytest.raises(ValueError, match="neither an orbax dir nor a torch"):
        shared_device_tree("wav2lip", str(bogus))
