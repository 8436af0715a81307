import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.wav2lip import Wav2Lip, Wav2LipDisc
from mere_fusion_tpu.utils.torch_convert import (
    convert_wav2lip,
    convert_wav2lip_disc,
)

REFERENCE = "/root/reference"


def _rand_inputs(b=2, img=96, seed=0):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((b, 80, 16)).astype(np.float32)
    faces = rng.uniform(0, 1, (b, img, img, 6)).astype(np.float32)
    return mel, faces


def test_forward_shapes_and_range():
    model = Wav2Lip()
    mel, faces = _rand_inputs()
    variables = model.init(jax.random.key(0), jnp.asarray(mel), jnp.asarray(faces))
    out = model.apply(variables, jnp.asarray(mel), jnp.asarray(faces))
    assert out.shape == (2, 96, 96, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_jit_batch16():
    model = Wav2Lip()
    mel, faces = _rand_inputs(b=16)
    variables = model.init(jax.random.key(0), jnp.asarray(mel), jnp.asarray(faces))
    fn = jax.jit(lambda m, f: model.apply(variables, m, f))
    out = fn(jnp.asarray(mel), jnp.asarray(faces))
    assert out.shape == (16, 96, 96, 3)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_parity_vs_reference_torch():
    """Random-weight parity: our flax model + converter must reproduce the
    reference torch model's outputs bit-close. Validates both the
    architecture spec and the checkpoint converter end to end."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        from wav2lip.models import Wav2Lip as TorchWav2Lip
    finally:
        sys.path.remove(REFERENCE)

    tmodel = TorchWav2Lip().eval()
    # randomize BN stats too, so parity covers running-stat plumbing
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    mel, faces = _rand_inputs(b=2)
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(mel[:, None, :, :]),            # B,1,80,16
            torch.from_numpy(faces.transpose(0, 3, 1, 2)),   # B,6,96,96
        )
    want = tout.numpy().transpose(0, 2, 3, 1)

    variables = convert_wav2lip(tmodel.state_dict())
    model = Wav2Lip()
    got = np.asarray(model.apply(variables, jnp.asarray(mel), jnp.asarray(faces)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_disc_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        from wav2lip.models import Wav2Lip_disc_qual
    finally:
        sys.path.remove(REFERENCE)

    tmodel = Wav2Lip_disc_qual().eval()
    rng = np.random.default_rng(1)
    faces = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        # reference forward expects (B, C, T, H, W); use T=1
        tin = torch.from_numpy(faces.transpose(0, 3, 1, 2))[:, :, None]
        want = tmodel(tin).numpy()

    variables = convert_wav2lip_disc(tmodel.state_dict())
    got = np.asarray(Wav2LipDisc().apply(variables, jnp.asarray(faces)))
    np.testing.assert_allclose(got, want, atol=2e-5)
