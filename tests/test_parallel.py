import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_param_sharding_rule():
    mesh = make_mesh(dp=4, tp=2)
    params = {
        "big": {"kernel": jnp.zeros((3, 3, 256, 512)), "bias": jnp.zeros((512,))},
        "tiny": {"kernel": jnp.zeros((3, 3, 4, 4))},
        "bn": {"scale": jnp.zeros((512,))},
    }
    sh = shard_params(params, mesh)
    assert "tp" in str(sh["big"]["kernel"].spec)
    assert sh["big"]["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["tiny"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_dp_batch_math_is_correct():
    mesh = make_mesh(dp=8, tp=1)
    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, shard_batch(mesh))

    @jax.jit
    def f(x):
        return (x**2).sum()

    np.testing.assert_allclose(float(f(xs)), float((x**2).sum()), rtol=1e-6)


def test_dryrun_multichip_entrypoint():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
