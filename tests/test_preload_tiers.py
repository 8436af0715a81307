"""NeRFTrainDataset preload tiers (reference NeRFDataset --preload 0/1/2,
ernerf/nerf_triplane/provider.py:362-807): 0 disk-lazy, 1 host RAM,
2 device-resident frames with on-device batch gathers. All three tiers
must produce identical training batches."""
import numpy as np

from mere_fusion_tpu.data.provider import (
    LazyFrames,
    NeRFTrainDataset,
    synthesize_nerf_train_data,
)


def _batches_equal(a: dict, b: dict, rgb_atol=0.0):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            atol=rgb_atol if k == "rgb" else 1e-6, err_msg=k)


def test_preload_tiers_agree(tmp_path):
    root = synthesize_nerf_train_data(str(tmp_path / "scene"), n_frames=3,
                                      hw=32)
    d1 = NeRFTrainDataset.load(root, scale=1.0, preload=1)
    d0 = NeRFTrainDataset.load(root, scale=1.0, preload=0)
    d2 = NeRFTrainDataset.load(root, scale=1.0, preload=2)

    assert isinstance(d0.images, LazyFrames)
    assert d0.images.shape == d1.images.shape == (3, 32, 32, 3)
    np.testing.assert_allclose(d0.images[1], d1.images[1])
    assert d2.images_dev is not None and d1.images_dev is None

    for index in (0, 2):
        b1 = d1.sample_rays(index, 64, np.random.default_rng(7))
        b0 = d0.sample_rays(index, 64, np.random.default_rng(7))
        # identical pixels → identical batches (tier 0 decodes the same file)
        _batches_equal(b0, b1)
        b2 = d2.sample_rays(index, 64, np.random.default_rng(7))
        # tier 2 stores u8 on device: rgb agrees to one quantization step
        _batches_equal(b2, b1, rgb_atol=1.0 / 255.0 + 1e-6)


def test_preload0_lru_is_bounded(tmp_path):
    root = synthesize_nerf_train_data(str(tmp_path / "scene"), n_frames=4,
                                      hw=16)
    d0 = NeRFTrainDataset.load(root, scale=1.0, preload=0)
    d0.images._cap = 2
    for i in [0, 1, 2, 3, 0, 1]:
        d0.images[i]
    assert len(d0.images._lru) <= 2
    # hits return the cached object
    first = d0.images[1]
    assert d0.images[1] is first
