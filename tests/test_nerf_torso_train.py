import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.train.ernerf_train import (
    NeRFTrainConfig,
    TORSO_PARAMS,
    init_torso_train,
    make_torso_train_step,
)

NET_CFG = NeRFNetConfig(
    num_levels=4, base_resolution=16, desired_resolution=64,
    log2_hashmap_size=10, individual_dim=4, num_train_frames=4, torso=True,
)
TRAIN_CFG = NeRFTrainConfig(grid_size=16, iters=1000, lr=5e-3)


def _init_variables(cfg=NET_CFG, seed=0):
    network = NeRFNetwork(cfg)
    variables = network.init(
        jax.random.key(seed),
        jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    return network, variables


def _torso_batch(n=512, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    # target: a dark "torso" in the lower half over white bg
    lower = coords[:, 1] > 0
    gt = np.where(lower[:, None], 0.25, 1.0).astype(np.float32)
    return {
        "coords": jnp.asarray(coords),
        "bg_torso_color": jnp.asarray(np.repeat(gt, 3, -1).reshape(n, 3)),
        "bg_color": jnp.ones((n, 3), jnp.float32),
        "pose": jnp.eye(4),
        "index": jnp.zeros((), jnp.int32),
    }


def test_torso_step_trains_only_torso_params():
    network, variables = _init_variables()
    tx, state = init_torso_train(network, variables, TRAIN_CFG)
    step = make_torso_train_step(network, tx, TRAIN_CFG)
    batch = _torso_batch()
    p0 = jax.tree.map(np.asarray, state.params)
    losses = []
    for i in range(40):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]
    for name, v in state.params.items():
        before = p0[name]
        changed = any(
            not np.allclose(np.asarray(a), b)
            for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(before))
        )
        if name in TORSO_PARAMS:
            assert changed, f"torso param {name} did not train"
        else:
            assert not changed, f"head param {name} must stay frozen"


def test_head_params_merge():
    network, variables = _init_variables()
    # head checkpoint from a differently-seeded torso-less network
    head_cfg = NeRFNetConfig(
        num_levels=4, base_resolution=16, desired_resolution=64,
        log2_hashmap_size=10, individual_dim=4, num_train_frames=4,
    )
    _, head_vars = _init_variables(head_cfg, seed=7)
    tx, state = init_torso_train(network, variables, TRAIN_CFG,
                                 head_params=head_vars["params"])
    for name, v in head_vars["params"].items():
        if name in TORSO_PARAMS or name not in state.params:
            continue
        for a, b in zip(jax.tree.leaves(state.params[name]),
                        jax.tree.leaves(v)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_torso_rays():
    from mere_fusion_tpu.data.provider import NeRFTrainDataset

    H = W = 16
    rng = np.random.default_rng(0)
    torso = np.zeros((1, H, W, 4), np.float32)
    torso[0, H // 2:, :, :3] = 0.3
    torso[0, H // 2:, :, 3] = 1.0  # opaque lower half
    ds = NeRFTrainDataset(
        poses=np.eye(4, dtype=np.float32)[None],
        images=np.ones((1, H, W, 3), np.float32),
        auds=np.zeros((1, 44, 16), np.float32),
        eye_area=np.zeros(1, np.float32),
        face_masks=np.ones((1, H, W), bool),
        bg_img=np.ones((H, W, 3), np.float32),
        intrinsics=(20.0, 20.0, W / 2, H / 2),
        H=H, W=W, torso_imgs=torso,
    )
    batch = ds.sample_torso_rays(0, 64, rng)
    coords = np.asarray(batch["coords"])
    gt = np.asarray(batch["bg_torso_color"])
    assert coords.min() >= -1 and coords.max() <= 1
    lower = coords[:, 1] > 0
    np.testing.assert_allclose(gt[lower], 0.3, atol=1e-6)
    np.testing.assert_allclose(gt[~lower], 1.0, atol=1e-6)


def test_sample_lips_rays_static_window():
    from mere_fusion_tpu.data.provider import NeRFTrainDataset

    H = W = 64
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    # lips rect rows 40..48, cols 20..36
    ds = NeRFTrainDataset(
        poses=np.eye(4, dtype=np.float32)[None],
        images=img,
        auds=np.zeros((1, 44, 16), np.float32),
        eye_area=np.zeros(1, np.float32),
        face_masks=np.ones((1, H, W), bool),
        bg_img=np.zeros((H, W, 3), np.float32),
        intrinsics=(60.0, 60.0, W / 2, H / 2),
        H=H, W=W,
        lips_rects=np.array([[40, 48, 20, 36]], np.int32),
    )
    batch = ds.sample_lips_rays(0, rng, size=16)
    rgb = np.asarray(batch["rgb"]).reshape(16, 16, 3)
    # window is centered on (44, 28) → rows 36..52, cols 20..36
    np.testing.assert_allclose(rgb, img[0, 36:52, 20:36])
    # clamped at the border for a rect near the edge
    ds.lips_rects = np.array([[0, 4, 60, 64]], np.int32)
    batch = ds.sample_lips_rays(0, rng, size=16)
    rgb = np.asarray(batch["rgb"]).reshape(16, 16, 3)
    np.testing.assert_allclose(rgb, img[0, 0:16, 48:64])


def test_lips_rect_loading(tmp_path):
    from mere_fusion_tpu.data.provider import (
        NeRFTrainDataset,
        synthesize_nerf_train_data,
    )

    root = synthesize_nerf_train_data(str(tmp_path), n_frames=2, hw=64)
    base = root if isinstance(root, str) else str(tmp_path)
    import os

    lms = np.zeros((68, 2))
    lms[48:60, 0] = np.linspace(20, 36, 12)  # cols
    lms[48:60, 1] = np.linspace(40, 48, 12)  # rows
    os.makedirs(os.path.join(base, "ori_imgs"), exist_ok=True)
    for i in range(2):
        np.savetxt(os.path.join(base, "ori_imgs", f"{i}.lms"), lms, "%f")
    ds = NeRFTrainDataset.load(base)
    assert ds.lips_rects is not None and ds.lips_rects.shape == (2, 4)
    # squared: rows 40..48 center 44, cols 20..36 center 28, half=8
    np.testing.assert_array_equal(ds.lips_rects[0], [36, 52, 20, 36])
