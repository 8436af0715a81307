import pytest

from mere_fusion_tpu.config import Config


def test_defaults():
    cfg = Config()
    assert cfg.audio.chunk == 320
    assert cfg.avatar.batch_size == 16
    assert cfg.stride.left == 10 and cfg.stride.right == 10


def test_override_dotted():
    cfg = Config().override(**{"avatar.batch_size": 8, "tts.backend": "xtts"})
    assert cfg.avatar.batch_size == 8
    assert cfg.tts.backend == "xtts"
    assert Config().avatar.batch_size == 16  # original untouched


def test_override_unknown_field_raises():
    with pytest.raises(KeyError):
        Config().override(**{"avatar.nope": 1})


def test_round_trip_dict():
    cfg = Config().override(**{"server.max_sessions": 4})
    again = Config.from_dict(cfg.to_dict())
    assert again.server.max_sessions == 4
