"""MXU one-hot hash lookup vs the gather-path grid_encode.

The Pallas kernel runs in interpret mode on the CPU test mesh; shapes are
kept small (one kernel block). Covers values, table gradients (the
scatter-add equivalent), input gradients through the bilinear weights
(torso deformation path), and the triplane wrapper the network training
path uses (reference kernels: ernerf/gridencoder/src/gridencoder.cu:76-317).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.models.ernerf.network import NeRFNetConfig, NeRFNetwork
from mere_fusion_tpu.ops import hash_mxu
from mere_fusion_tpu.ops.hashgrid import GridSpec, grid_encode, grid_init

SPEC = GridSpec(input_dim=2, num_levels=12, level_dim=1, base_resolution=64,
                log2_hashmap_size=14, desired_resolution=512)
TORSO_SPEC = GridSpec(input_dim=2, num_levels=4, level_dim=2,
                      base_resolution=16, log2_hashmap_size=12,
                      desired_resolution=256, gridtype="tiled")


@pytest.fixture(autouse=True)
def _force_mxu():
    hash_mxu.FORCE = True
    yield
    hash_mxu.FORCE = None


def _rand(spec, n, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    table = grid_init(spec, k1, std=1e-2)
    x = jax.random.uniform(k2, (n, spec.input_dim), minval=-1.0, maxval=1.0)
    return table, x


@pytest.mark.parametrize("spec", [SPEC, TORSO_SPEC], ids=["hash", "tiled"])
def test_values_match_gather(spec):
    table, x = _rand(spec, 1024)
    ref = grid_encode(table, x, spec, 1.0)
    got = hash_mxu.grid_encode_mxu(table, x, spec, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-7)


def test_table_grad_matches_scatter():
    table, x = _rand(SPEC, 512, seed=1)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (512, SPEC.output_dim))

    def loss_g(t):
        return (((grid_encode(t, x, SPEC, 1.0) - tgt)) ** 2).sum()

    def loss_m(t):
        return ((hash_mxu.grid_encode_mxu(t, x, SPEC, 1.0, interpret=True)
                 - tgt) ** 2).sum()

    g_ref = jax.grad(loss_g)(table)
    g_mxu = jax.grad(loss_m)(table)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               rtol=0, atol=1e-5)


def test_input_grad_matches():
    """dw path (alive when x depends on params, e.g. torso deform)."""
    table, x = _rand(TORSO_SPEC, 256, seed=3)

    def loss_g(xx):
        return (grid_encode(table, xx, TORSO_SPEC, 1.0) ** 2).sum()

    def loss_m(xx):
        return (hash_mxu.grid_encode_mxu(table, xx, TORSO_SPEC, 1.0,
                                         interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_g)(x)
    g_mxu = jax.grad(loss_m)(x)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_triplane_encode_matches_network_encode_x():
    cfg = NeRFNetConfig()
    net = NeRFNetwork(cfg)
    rng = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(rng, (256, 3), minval=-1.0, maxval=1.0)
    auds = jax.random.normal(rng, (cfg.att_window, cfg.audio_in_dim, 16))
    d = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    variables = net.init(rng, auds, xyz, d, jnp.zeros((1, cfg.individual_dim)),
                         jnp.ones((1, 1)) * 0.25,
                         method=NeRFNetwork.full_init)
    # gather path
    hash_mxu.FORCE = False
    ref = net.apply(variables, xyz, method=NeRFNetwork.encode_x)
    # mxu path (interpret on CPU)
    hash_mxu.FORCE = True
    got = net.apply(variables, xyz, method=NeRFNetwork.encode_x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-7)


def test_padding_beyond_one_block():
    """N not a multiple of the kernel block exercises the pad/slice path."""
    table, x = _rand(SPEC, 1500, seed=4)
    ref = grid_encode(table, x, SPEC, 1.0)
    got = hash_mxu.grid_encode_mxu(table, x, SPEC, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-7)
