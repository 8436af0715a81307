import numpy as np
import jax.numpy as jnp

from mere_fusion_tpu.cli import build_parser, config_from_args
from mere_fusion_tpu.train.metrics import MetricMeter, landmark_distance, psnr, ssim


def test_cli_maps_flags_to_config():
    args = build_parser().parse_args(
        ["--model", "musetalk", "--batch_size", "8", "--tts", "procedural",
         "-l", "6", "--transport", "loopback", "--max_session", "3"]
    )
    cfg = config_from_args(args)
    assert cfg.avatar.kind == "musetalk"
    assert cfg.avatar.batch_size == 8
    assert cfg.tts.backend == "procedural"
    assert cfg.stride.left == 6
    assert cfg.transport.mode == "loopback"
    assert cfg.server.max_sessions == 3


def test_psnr_identity_and_noise():
    img = jnp.ones((16, 16, 3)) * 0.5
    assert float(psnr(img, img)) > 100
    noisy = img + 0.1
    assert 19 < float(psnr(noisy, img)) < 21


def test_ssim_bounds():
    img = jnp.linspace(0, 1, 16 * 16 * 3).reshape(16, 16, 3)
    assert float(ssim(img, img)) > 0.99
    assert float(ssim(img, 1 - img)) < 0.5


def test_lmd_translation_invariant():
    rng = np.random.default_rng(0)
    lms = rng.uniform(0, 100, (4, 20, 2))
    shifted = lms + 7.0
    assert landmark_distance(lms, shifted) < 1e-6


def test_meter_running_mean():
    m = MetricMeter(lambda a, b: abs(a - b), "err")
    m.update(1.0, 0.0)
    m.update(3.0, 0.0)
    assert m.mean == 2.0
    assert "err" in m.report()
