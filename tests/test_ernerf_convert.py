"""Converter parity for trained reference ER-NeRF checkpoints.

The reference network can't be imported here (its encoders JIT-compile CUDA
on import), so the torch twins are rebuilt inline per the published module
structure (ernerf/nerf_triplane/network.py:9-163) to generate reference
outputs at random weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.utils.torch_convert import (
    _morton3d,
    convert_ernerf,
    density_from_ernerf,
)

NET_CFG = NeRFNetConfig(individual_dim=4, num_train_frames=6)


def _torch_reference_modules(torch, audio_in=44, audio_dim=32, in_dim=36,
                             ind_dim=4):
    nn = torch.nn
    audio_net = nn.ModuleDict()
    audio_net["encoder_conv"] = nn.Sequential(
        nn.Conv1d(audio_in, 32, 3, 2, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(32, 32, 3, 2, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(32, 64, 3, 2, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(64, 64, 3, 2, 1), nn.LeakyReLU(0.02),
    )
    audio_net["encoder_fc1"] = nn.Sequential(
        nn.Linear(64, 64), nn.LeakyReLU(0.02), nn.Linear(64, audio_dim),
    )
    att = nn.ModuleDict()
    att["attentionConvNet"] = nn.Sequential(
        nn.Conv1d(audio_dim, 16, 3, 1, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(16, 8, 3, 1, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(8, 4, 3, 1, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(4, 2, 3, 1, 1), nn.LeakyReLU(0.02),
        nn.Conv1d(2, 1, 3, 1, 1), nn.LeakyReLU(0.02),
    )
    att["attentionNet"] = nn.Sequential(nn.Linear(8, 8), nn.Softmax(dim=1))

    def mlp(dims):
        return nn.ModuleDict({"net": nn.ModuleList(
            [nn.Linear(dims[i], dims[i + 1], bias=False)
             for i in range(len(dims) - 1)])})

    mods = {
        "audio_net": audio_net,
        "audio_att_net": att,
        "eye_att_net": mlp([in_dim, 16, 1]),
        "sigma_net": mlp([in_dim + audio_dim + 1, 64, 64, 65]),
        "color_net": mlp([16 + 64 + ind_dim, 64, 3]),
        "unc_net": mlp([in_dim, 32, 1]),
        "aud_ch_att_net": mlp([in_dim, 64, 32]),
    }
    with torch.no_grad():
        for m in mods.values():
            for p in m.parameters():
                p.normal_(0, 0.1)
    return mods


def _state_dict(torch, mods, cfg=NET_CFG):
    sd = {}
    for name, m in mods.items():
        for k, v in m.state_dict().items():
            sd[f"{name}.{k}"] = v
    rng = np.random.default_rng(0)
    total = cfg.plane_spec.total_params
    for plane in ("xy", "yz", "xz"):
        sd[f"encoder_{plane}.embeddings"] = torch.from_numpy(
            rng.normal(0, 1e-2, (total, cfg.level_dim)).astype(np.float32))
    sd["individual_codes"] = torch.from_numpy(
        rng.normal(0, 0.1, (6, 4)).astype(np.float32))
    return sd


def test_convert_ernerf_full_forward_parity():
    torch = pytest.importorskip("torch")
    mods = _torch_reference_modules(torch)
    sd = _state_dict(torch, mods)
    variables = convert_ernerf(sd)

    network = NeRFNetwork(NET_CFG)
    # converted tree must initialize-apply cleanly through full_init shapes
    init = network.init(
        jax.random.key(0), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)),
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init,
    )
    want_shapes = jax.tree.map(lambda x: x.shape, init["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, variables["params"])
    assert want_shapes == got_shapes

    rng = np.random.default_rng(1)

    # audio net + attention (encode_audio) vs torch
    auds = rng.normal(0, 1, (8, 44, 16)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(auds)
        h = t[:, :, 0:16]
        h = mods["audio_net"]["encoder_conv"](h).squeeze(-1)
        enc = mods["audio_net"]["encoder_fc1"](h)          # [8, 32]
        y = enc[None].permute(0, 2, 1)
        y = mods["audio_att_net"]["attentionConvNet"](y)
        w = mods["audio_att_net"]["attentionNet"](y.view(1, 8)).view(1, 8, 1)
        want_a = (w * enc[None]).sum(dim=1).numpy()        # [1, 32]

    got_a = np.asarray(network.apply(variables, jnp.asarray(auds),
                                     method=NeRFNetwork.encode_audio))
    np.testing.assert_allclose(got_a, want_a, atol=2e-5)

    # head MLPs over precomputed features (forward_with_enc) vs torch
    enc_x = rng.normal(0, 0.5, (32, 36)).astype(np.float32)
    dirs = rng.normal(0, 1, (32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    eye = np.full((1, 1), 0.25, np.float32)
    ind = np.asarray(sd["individual_codes"][0])[None]

    def t_mlp(m, x):
        for i, lin in enumerate(m["net"]):
            x = lin(x)
            if i != len(m["net"]) - 1:
                x = torch.relu(x)
        return x

    from mere_fusion_tpu.ops.encoders import sh_encode

    with torch.no_grad():
        tx = torch.from_numpy(enc_x)
        aud = torch.from_numpy(want_a)
        aud_att = t_mlp(mods["aud_ch_att_net"], tx)  # raw, no sigmoid
        a = aud * aud_att
        eye_att = torch.sigmoid(t_mlp(mods["eye_att_net"], tx))
        e = torch.from_numpy(eye) * eye_att
        h = torch.cat([tx, a, e], dim=-1)
        sig_out = t_mlp(mods["sigma_net"], h)
        want_sigma = torch.exp(sig_out[..., 0]).numpy()
        geo = sig_out[..., 1:]
        enc_d = torch.from_numpy(np.asarray(sh_encode(jnp.asarray(dirs), 4)))
        hc = torch.cat([enc_d, geo, torch.from_numpy(ind).repeat(32, 1)], -1)
        want_color = (torch.sigmoid(t_mlp(mods["color_net"], hc))
                      * (1 + 2 * 0.001) - 0.001).numpy()

    sigma, color, _aud, _eye, _unc = network.apply(
        variables, jnp.asarray(enc_x), jnp.asarray(dirs),
        jnp.asarray(want_a), jnp.asarray(ind), jnp.asarray(eye),
        training=False, method=NeRFNetwork.forward_with_enc,
    )
    np.testing.assert_allclose(np.asarray(sigma), want_sigma, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(color), want_color, atol=2e-5)


def test_morton_density_conversion():
    # independent bit-interleave reference
    def slow_morton(x, y, z):
        m = 0
        for b in range(10):
            m |= (((x >> b) & 1) << (3 * b)
                  | ((y >> b) & 1) << (3 * b + 1)
                  | ((z >> b) & 1) << (3 * b + 2))
        return m

    g = 8
    idx = np.arange(g ** 3)
    x, y, z = idx // (g * g), (idx // g) % g, idx % g
    fast = _morton3d(x, y, z)
    slow = np.array([slow_morton(a, b, c) for a, b, c in zip(x, y, z)])
    np.testing.assert_array_equal(fast, slow)

    # grid round-trip: write cell value = its raster index, morton-pack like
    # the reference, convert back, expect identity
    raster_truth = np.arange(g ** 3, dtype=np.float32)
    morton_packed = np.zeros(g ** 3, np.float32)
    morton_packed[fast] = raster_truth
    dens = density_from_ernerf(
        {"density_grid": morton_packed[None], "mean_density": 1.0},
        grid_size=g,
    )
    np.testing.assert_array_equal(np.asarray(dens.grid), raster_truth)
    assert float(dens.mean_density) == 1.0


def test_load_nerf_checkpoint_from_training_workspace(tmp_path):
    """Serving loads a training workspace: EMA params + density grid."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.nerf import load_nerf_checkpoint
    from mere_fusion_tpu.train.ernerf_train import (
        NeRFTrainConfig,
        init_nerf_train,
    )
    from mere_fusion_tpu.utils.checkpoint import Checkpointer

    cfg = Config().override(**{
        "nerf.num_levels": 4, "nerf.base_resolution": 16,
        "nerf.desired_resolution": 64, "nerf.log2_hashmap_size": 10,
        "nerf.grid_size": 16, "nerf.ckpt": str(tmp_path / "ws"),
    })
    nc = cfg.nerf
    # trained with a frame count the server can't know (the restore must be
    # template-free — a default-config template would shape-mismatch)
    network = NeRFNetwork(NeRFNetConfig(
        audio_in_dim=nc.audio_in_dim, num_levels=nc.num_levels,
        base_resolution=nc.base_resolution,
        log2_hashmap_size=nc.log2_hashmap_size,
        desired_resolution=nc.desired_resolution,
        individual_dim=4, num_train_frames=7,
    ))
    variables = network.init(
        jax.random.key(3), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)),
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init,
    )
    assert variables["params"]["individual_codes"].shape == (7, 4)
    tcfg = NeRFTrainConfig(grid_size=16)
    _tx, state = init_nerf_train(network, variables, tcfg)
    state = state._replace(
        ema_params=jax.tree.map(lambda x: x + 1.0, state.params))
    ckpt = Checkpointer(str(tmp_path / "ws"))
    ckpt.save(5, state)
    ckpt.close()

    loaded, density = load_nerf_checkpoint(cfg)
    # EMA params (params + 1), not raw params
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["sigma_net"]["net_0"]["kernel"]),
        np.asarray(state.params["sigma_net"]["net_0"]["kernel"]) + 1.0,
    )
    assert density is not None
    assert np.asarray(density.grid).shape == (16 ** 3,)


def test_load_nerf_checkpoint_from_pth(tmp_path):
    """Serving converts a reference .pth on the fly, incl. density grid."""
    torch = pytest.importorskip("torch")
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.nerf import load_nerf_checkpoint

    mods = _torch_reference_modules(torch)
    sd = _state_dict(torch, mods)
    g = 16
    sd["density_grid"] = torch.zeros((1, g ** 3))
    sd["mean_density"] = 0.5
    path = str(tmp_path / "ngp_kf.pth")
    torch.save({"model": sd}, path)

    cfg = Config().override(**{"nerf.ckpt": path, "nerf.grid_size": g})
    variables, density = load_nerf_checkpoint(cfg)
    assert "sigma_net" in variables["params"]
    assert density is not None and float(density.mean_density) == 0.5


def test_load_nerf_checkpoint_validates_config_mismatch(tmp_path):
    """A serving config that disagrees with the trained workspace fails
    loudly at load time (restore_raw skips orbax's template check)."""
    from mere_fusion_tpu.config import Config
    from mere_fusion_tpu.engines.nerf import load_nerf_checkpoint
    from mere_fusion_tpu.train.ernerf_train import (
        NeRFTrainConfig,
        init_nerf_train,
    )
    from mere_fusion_tpu.utils.checkpoint import Checkpointer

    # train tiny
    network = NeRFNetwork(NeRFNetConfig(
        num_levels=4, base_resolution=16, desired_resolution=64,
        log2_hashmap_size=10, individual_dim=4, num_train_frames=2,
    ))
    variables = network.init(
        jax.random.key(0), jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0), jnp.zeros((1, 4)),
        jnp.zeros((1, 1)), method=NeRFNetwork.full_init,
    )
    _tx, state = init_nerf_train(network, variables,
                                 NeRFTrainConfig(grid_size=16))
    ckpt = Checkpointer(str(tmp_path / "ws"))
    ckpt.save(1, state)
    ckpt.close()

    # serve with DEFAULT (big) net config → clear error naming the knobs
    cfg = Config().override(**{"nerf.ckpt": str(tmp_path / "ws")})
    with pytest.raises(ValueError, match="hash tables"):
        load_nerf_checkpoint(cfg)

    # matching config loads
    cfg_ok = Config().override(**{
        "nerf.ckpt": str(tmp_path / "ws"), "nerf.num_levels": 4,
        "nerf.base_resolution": 16, "nerf.desired_resolution": 64,
        "nerf.log2_hashmap_size": 10, "nerf.grid_size": 16,
    })
    variables2, density = load_nerf_checkpoint(cfg_ok)
    assert density is not None

    # wrong grid size → named error
    cfg_bad_grid = Config().override(**{
        "nerf.ckpt": str(tmp_path / "ws"), "nerf.num_levels": 4,
        "nerf.base_resolution": 16, "nerf.desired_resolution": 64,
        "nerf.log2_hashmap_size": 10, "nerf.grid_size": 32,
    })
    with pytest.raises(ValueError, match="density grid"):
        load_nerf_checkpoint(cfg_bad_grid)
