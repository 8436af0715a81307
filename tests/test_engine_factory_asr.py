"""make_engine wires the ER-NeRF live featurizer from nerf.asr_model
(reference --asr_model, app.py:596 / nerfasr.py:39-45): a DeepSpeech .pb
path builds our 29-dim extractor plus its device-resident twin.

NeRFReal itself is intercepted (its render-step compile is tested in
test_nerf_engine.py); the logits functions handed to it are real.
"""
import numpy as np
import pytest

from mere_fusion_tpu.config import Config
from mere_fusion_tpu.data.provider import synthesize_nerf_dataset
from mere_fusion_tpu.engines import make_engine


@pytest.fixture()
def capture_engine(monkeypatch):
    """Intercept NeRFReal at the factory boundary and capture its kwargs."""
    import mere_fusion_tpu.engines.nerf as nerf_mod

    captured = {}

    def fake_engine(cfg, **kw):
        captured.update(kw)
        return "engine"

    monkeypatch.setattr(nerf_mod, "NeRFReal", fake_engine)
    return captured


def _cfg(tmp_path, **extra):
    d = synthesize_nerf_dataset(str(tmp_path / "nerfdata"), hw=64)
    over = {
        "tts.backend": "procedural",
        "avatar.kind": "ernerf",
        "nerf.pose_path": f"{d}/transforms.json",
        "nerf.au_path": f"{d}/au.csv",
        "nerf.scale": 1.0,
    }
    over.update(extra)
    return Config().override(**over)


def test_asr_model_pb_builds_deepspeech_featurizer(tmp_path, monkeypatch,
                                                   capture_engine):
    from mere_fusion_tpu.audio import deepspeech

    pb = tmp_path / "model.pb"
    pb.write_bytes(b"fake")
    # a real frozen graph isn't shippable in tests; patch the .pb parse and
    # keep everything downstream (param tree → jitted LSTM → logits) real
    monkeypatch.setattr(deepspeech, "read_graph_constants", lambda p: p)
    monkeypatch.setattr(deepspeech, "params_from_graph",
                        lambda g: deepspeech.init_params())

    cfg = _cfg(tmp_path,
               **{"nerf.asr_model": str(pb), "nerf.audio_in_dim": 29})
    assert make_engine(cfg) == "engine"
    assert "logits_fn" in capture_engine and "device_logits_fn" in capture_engine

    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    logits = capture_engine["logits_fn"](audio)
    assert logits.shape[1] == 29
    dev_logits = capture_engine["device_logits_fn"](audio)
    assert dev_logits.shape[1] == 29
    np.testing.assert_allclose(np.asarray(dev_logits), logits, atol=2e-4)


def test_asr_model_empty_keeps_fake(tmp_path, capture_engine):
    assert make_engine(_cfg(tmp_path)) == "engine"
    # no featurizer configured: NeRFReal falls back to fake_logits_fn
    assert "logits_fn" not in capture_engine
    assert "device_logits_fn" not in capture_engine
