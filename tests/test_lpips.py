import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.lpips import (
    LPIPS,
    _SCALE,
    _SHIFT,
    convert_lpips,
    make_lpips_fn,
)


def test_identity_is_zero_and_symmetric():
    fn = make_lpips_fn()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    assert float(fn(x, x)) == pytest.approx(0.0, abs=1e-6)
    d = float(fn(x, y))
    assert d > 0
    assert float(fn(y, x)) == pytest.approx(d, rel=1e-5)


def test_gradient_flows():
    fn = make_lpips_fn()
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    y = jnp.zeros((1, 32, 32, 3))
    g = jax.grad(lambda a: fn(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_parity_vs_torch_manual():
    """Converter + forward parity against a torch implementation of the same
    published architecture (torchvision alexnet.features layout + lpips
    scaling/normalize/lin math) at random weights."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
    )
    lins = [tnn.Conv2d(c, 1, 1, bias=False)
            for c in (64, 192, 384, 256, 256)]
    with torch.no_grad():
        for p in feats.parameters():
            p.normal_(0, 0.05)
        for lin in lins:
            lin.weight.uniform_(0, 0.2)  # lpips lins are non-negative

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    def torch_lpips(a_np, b_np):
        taps = [1, 4, 7, 9, 11]
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

        def run(t):
            t = (t - shift) / scale
            outs = []
            for i, layer in enumerate(feats):
                t = layer(t)
                if i in taps:
                    outs.append(t)
            return outs

        with torch.no_grad():
            fa = run(torch.from_numpy(a_np.transpose(0, 3, 1, 2)))
            fb = run(torch.from_numpy(b_np.transpose(0, 3, 1, 2)))
            total = 0.0
            for i, (p, q) in enumerate(zip(fa, fb)):
                p = p / (p.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
                q = q / (q.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
                d = lins[i]((p - q) ** 2)
                total = total + d.mean(dim=(2, 3))
            return float(total.mean())

    want = torch_lpips(x, y)

    alex_sd = {}
    for i, j in enumerate((0, 3, 6, 8, 10)):
        alex_sd[f"features.{j}.weight"] = feats[
            {0: 0, 3: 3, 6: 6, 8: 8, 10: 10}[j]].weight
        alex_sd[f"features.{j}.bias"] = feats[j].bias
    lpips_sd = {f"lin{i}.model.1.weight": lins[i].weight for i in range(5)}

    variables = convert_lpips(alex_sd, lpips_sd)
    got = float(LPIPS().apply(variables, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_nerf_train_step_with_lpips_patch_loss():
    """Patch-sampled train step with the 0.1×LPIPS loss compiles and steps
    (reference utils.py:810-818)."""
    from tests.test_nerf_train import NET_CFG, TRAIN_CFG, make_batch
    from mere_fusion_tpu.models.ernerf.network import NeRFNetwork
    from mere_fusion_tpu.train.ernerf_train import (
        init_nerf_train,
        make_nerf_train_step,
    )

    network = NeRFNetwork(NET_CFG)
    variables = network.init(
        jax.random.key(0),
        jnp.zeros((8, 44, 16)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / np.sqrt(3.0),
        jnp.zeros((1, 4)), jnp.zeros((1, 1)),
        method=NeRFNetwork.full_init,
    )
    tx, state = init_nerf_train(network, variables, TRAIN_CFG)
    fn = make_lpips_fn()
    step = make_nerf_train_step(network, tx, TRAIN_CFG, lpips_fn=fn,
                                patch_hw=(32, 32))
    batch = make_batch(n=1024)  # one 32x32 patch (LPIPS minimum input)
    state, m = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_patch_sampling_contiguous():
    """provider.sample_rays(patch_size=...) returns row-major contiguous
    patches whose rgb matches the source image pixels."""
    from mere_fusion_tpu.data.provider import NeRFTrainDataset

    H = W = 32
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    ds = NeRFTrainDataset(
        poses=np.eye(4, dtype=np.float32)[None],
        images=img,
        auds=np.zeros((1, 44, 16), np.float32),
        eye_area=np.zeros(1, np.float32),
        face_masks=np.ones((1, H, W), bool),
        bg_img=np.zeros((H, W, 3), np.float32),
        intrinsics=(30.0, 30.0, W / 2, H / 2),
        H=H, W=W,
    )
    batch = ds.sample_rays(0, 2 * 8 * 8, rng, patch_size=8)
    rgb = np.asarray(batch["rgb"]).reshape(2, 8, 8, 3)
    flat = img[0].reshape(-1, 3)
    # each patch must be a contiguous row-major block of the image
    for p in range(2):
        got = rgb[p]
        # locate the patch by its top-left pixel
        matches = np.where((flat == got[0, 0]).all(-1))[0]
        assert len(matches) >= 1
        tl = matches[0]
        y0, x0 = tl // W, tl % W
        np.testing.assert_allclose(got, img[0, y0:y0 + 8, x0:x0 + 8])
