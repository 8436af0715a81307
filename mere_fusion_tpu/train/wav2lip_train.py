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
    variables = jax.jit(model.init, static_argnames='train')(
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


def make_train_step(
    model: Wav2Lip,
    tx: optax.GradientTransformation,
    syncnet=None,
    syncnet_vars=None,
    disc=None,
    disc_vars=None,
    syncnet_wt: float = 0.03,
    disc_wt: float = 0.07,
):
    """Returns step(state, batch) -> (state, metrics). batch:
    {mel [B,80,16], faces [B,S,S,6], target [B,S,S,3]}.

    Full recipe (reference wav2lip hparams.py:76-100): L1 reconstruction
    + frozen-SyncNet cosine sync loss on the lower half (syncnet_wt)
    + frozen-discriminator perceptual term (disc_wt). Pass syncnet/disc
    modules with their converted variables to enable those terms; the
    5-frame sync window degenerates to repeated single frames when the batch
    carries one frame per sample.
    """

    def loss_fn(params, batch_stats, batch):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mel"],
            batch["faces"],
            train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean(jnp.abs(out - batch["target"]))
        if syncnet is not None:
            from mere_fusion_tpu.models.syncnet import cosine_sync_loss

            half = out[:, out.shape[1] // 2 :]
            stacked = jnp.tile(half, (1, 1, 1, 5))  # [B, S/2, S, 15]
            a_emb, f_emb = syncnet.apply(syncnet_vars, batch["mel"], stacked)
            loss = loss + syncnet_wt * cosine_sync_loss(
                a_emb, f_emb, jnp.ones(out.shape[0])
            )
        if disc is not None:
            pred_real = disc.apply(disc_vars, out)
            loss = loss - disc_wt * jnp.log(jnp.clip(pred_real, 1e-7, 1.0)).mean()
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
