import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.bisenet import (
    BiSeNet,
    FaceParsing,
    upsample_bilinear_align_corners,
    upsample_nearest_torch,
)
from mere_fusion_tpu.utils.torch_convert import convert_bisenet

REFERENCE = "/root/reference"


def test_forward_shapes():
    model = BiSeNet()
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    out, out16, out32 = model.apply(variables, x)
    assert out.shape == out16.shape == out32.shape == (1, 64, 64, 19)


def test_face_parsing_contract():
    fp = FaceParsing()
    mask = fp(np.full((100, 80, 3), 128, np.uint8), size=(64, 64))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)).issubset({0, 255})


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_vs_reference_torch(tmp_path):
    torch = pytest.importorskip("torch")
    # load model.py directly: the package __init__ needs torchvision
    import importlib.util
    import types

    # the reference files import torchvision at module level without using
    # it; stub it only while loading, then restore (a lingering stub breaks
    # transformers' torchvision detection in later tests)
    stubbed = [s for s in ("torchvision", "torchvision.models")
               if s not in sys.modules]
    for stub in stubbed:
        sys.modules[stub] = types.ModuleType(stub)
    try:
        pdir = os.path.join(REFERENCE, "musetalk", "utils", "face_parsing")
        pkg = types.ModuleType("refparse")
        pkg.__path__ = [pdir]
        sys.modules["refparse"] = pkg
        for name in ("resnet", "model"):
            spec = importlib.util.spec_from_file_location(
                f"refparse.{name}", os.path.join(pdir, f"{name}.py")
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refparse.{name}"] = mod
            spec.loader.exec_module(mod)
        TorchBiSeNet = sys.modules["refparse.model"].BiSeNet
    finally:
        for stub in stubbed:
            sys.modules.pop(stub, None)

    # the reference backbone loads resnet weights from a file at init;
    # feed it an empty dict so it keeps its random init
    resnet_stub = str(tmp_path / "resnet_stub.pth")
    torch.save({}, resnet_stub)
    tmodel = TorchBiSeNet(resnet_path=resnet_stub, n_classes=19).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out, t_out16, t_out32 = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    variables = convert_bisenet(tmodel.state_dict())
    out, out16, out32 = BiSeNet().apply(variables, jnp.asarray(img))
    for got, want in [(out, t_out), (out16, t_out16), (out32, t_out32)]:
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-3
        )


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_interpolation_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    got_n = np.asarray(upsample_nearest_torch(jnp.asarray(x), (10, 14)))
    want_n = F.interpolate(tx, (10, 14), mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got_n, want_n)

    got_b = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), (9, 13)))
    want_b = F.interpolate(tx, (9, 13), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got_b, want_b.numpy().transpose(0, 2, 3, 1), atol=1e-6)
