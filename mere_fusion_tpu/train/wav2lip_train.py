"""Wav2Lip generator training step (L1 reconstruction, optionally + sync/
perceptual terms later), shardable over a (dp, tp) mesh.

The reference trains wav2lip offline with torch (hparams at
wav2lip/hparams.py:76-100: batch 16, adam 1e-4, L1 + syncnet + disc terms).
Here the step is a pure jitted function: BN batch-stats are threaded as
explicit state, data parallelism shards the batch over 'dp', and large conv
kernels shard their output channels over 'tp' — XLA inserts the ICI
collectives (psum for grads, all-gathers at layer boundaries).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mere_fusion_tpu.models.wav2lip import Wav2Lip


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def init_state(rng, img_size: int = 96, lr: float = 1e-4, dtype=jnp.float32):
    model = Wav2Lip(dtype=dtype)
    variables = model.init(
        rng,
        jnp.zeros((1, 80, 16)),
        jnp.zeros((1, img_size, img_size, 6)),
        train=False,
    )
    tx = optax.adam(lr)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state


def make_train_step(model: Wav2Lip, tx: optax.GradientTransformation):
    """Returns step(state, batch) -> (state, metrics). batch:
    {mel [B,80,16], faces [B,S,S,6], target [B,S,S,3]}."""

    def loss_fn(params, batch_stats, batch):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mel"],
            batch["faces"],
            train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean(jnp.abs(out - batch["target"]))
        return loss, (updates["batch_stats"], out)

    def train_step(state: TrainState, batch):
        (loss, (new_stats, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
        return new_state, {"loss": loss}

    return train_step
