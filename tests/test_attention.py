"""Fused in-VMEM self-attention kernel vs the einsum reference.

The kernel (ops/attention.py) carries the MuseTalk UNet's 32²-latent
self-attentions (reference: the diffusers UNet2DConditionModel built from
musetalk.json, musetalk/models/unet.py:29-44); exactness matters because the
parity bar for the whole UNet vs its torch twin is 3e-4.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import mere_fusion_tpu.ops.attention as attention_mod
from mere_fusion_tpu.ops.attention import self_attention_fused


def einsum_attention(q, k, v):
    d = q.shape[-1]
    s = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d),
        axis=-1,
    ).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", s, v)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(
        attention_mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("shape,block_q", [
    ((2, 8, 1024, 40), 512),   # the 32² SD latent self-attn
    ((2, 8, 256, 80), 256),    # the 16² one
    ((1, 4, 512, 64), 128),    # multiple q blocks per row
])
def test_fused_matches_einsum(interpret_pallas, shape, block_q):
    b, h, l, d = shape
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))
    out = self_attention_fused(q, k, v, block_q=block_q)
    ref = einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_fused_rejects_ragged_blocks(interpret_pallas):
    q = jnp.zeros((1, 1, 300, 40))
    with pytest.raises(ValueError, match="not divisible"):
        self_attention_fused(q, q, q, block_q=256)


def test_unet_fused_impl_matches_xla():
    """The whole UNet with ATTN_IMPL='fused' agrees with the einsum path —
    the serving configuration (engines/muse.py) vs the parity-test one."""
    import mere_fusion_tpu.models.musetalk.unet as unet_mod
    from mere_fusion_tpu.models.musetalk.unet import (
        UNet2DCondition,
        positional_encoding,
    )

    model = UNet2DCondition()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    ctx = positional_encoding(
        jnp.asarray(rng.standard_normal((1, 50, 384)).astype(np.float32)))
    uv = model.init(jax.random.key(0), lat, jnp.zeros((1,)), ctx)

    outs = {}
    saved = unet_mod.ATTN_IMPL
    orig = attention_mod.pl.pallas_call
    attention_mod.pl.pallas_call = functools.partial(
        pl.pallas_call, interpret=True)  # CPU test mesh: interpret the kernel
    try:
        for impl in ("xla", "fused"):
            unet_mod.ATTN_IMPL = impl
            outs[impl] = np.asarray(
                model.apply(uv, lat, jnp.zeros((1,)), ctx))
    finally:
        unet_mod.ATTN_IMPL = saved
        attention_mod.pl.pallas_call = orig
    np.testing.assert_allclose(outs["fused"], outs["xla"],
                               atol=5e-5, rtol=1e-5)
