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


def test_nerf_serving_flags_mapping():
    """CLI maps the reference's ER-NeRF serving flags (pose/au/fullbody/
    fix_eye, app.py:550-707) onto nerf.* config fields."""
    from mere_fusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        "--model", "ernerf", "--pose", "/d/t.json", "--au", "/d/au.csv",
        "--fix_eye", "0.3", "--fullbody", "--fullbody_img", "/d/full",
        "--fullbody_offset_x", "40", "--fullbody_offset_y", "60",
    ])
    cfg = config_from_args(args)
    assert cfg.nerf.pose_path == "/d/t.json"
    assert cfg.nerf.au_path == "/d/au.csv"
    assert cfg.nerf.fix_eye == 0.3
    assert cfg.nerf.fullbody_imgs == "/d/full"
    assert cfg.nerf.fullbody_offset == (40, 60)

    import pytest

    with pytest.raises(SystemExit):
        config_from_args(build_parser().parse_args(
            ["--model", "ernerf", "--fullbody"]))


def test_transport_rtmp_choice_reachable():
    """MIGRATION.md promises --transport rtmp; the CLI must accept it and
    map it onto transport.mode (sessions.py implements the mode)."""
    from mere_fusion_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--transport", "rtmp", "--push_url", "rtmp://srs/live/x"])
    cfg = config_from_args(args)
    assert cfg.transport.mode == "rtmp"
    assert cfg.transport.push_url == "rtmp://srs/live/x"
