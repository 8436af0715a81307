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


class GANTrainState(NamedTuple):
    gen: TrainState
    disc_params: Any
    disc_opt_state: Any


SYNC_GATE_THRESHOLD = 0.75  # running sync loss below this flips sync_wt on


def init_gan_state(rng, img_size: int = 96, lr: float = 1e-4,
                   disc_lr: float = 1e-4, dtype=jnp.float32):
    """Generator + quality-discriminator training state (the reference's
    hq recipe: adam 1e-4 both, hparams.py:80, 93)."""
    from mere_fusion_tpu.models.wav2lip import Wav2LipDisc

    model, tx, gen_state = init_state(rng, img_size=img_size, lr=lr,
                                      dtype=dtype)
    disc = Wav2LipDisc(dtype=dtype)
    disc_vars = jax.jit(disc.init)(
        jax.random.fold_in(rng, 1), jnp.zeros((1, img_size, img_size, 3)))
    disc_tx = optax.adam(disc_lr)
    state = GANTrainState(gen=gen_state, disc_params=disc_vars["params"],
                          disc_opt_state=disc_tx.init(disc_vars["params"]))
    return model, disc, tx, disc_tx, state


def make_gan_train_step(model, disc, tx, disc_tx,
                        syncnet=None, syncnet_vars=None,
                        disc_wt: float = 0.07):
    """Alternating generator/discriminator step matching the reference hq
    recipe (wav2lip/models/wav2lip.py:127-184 + hparams.py:76-100):

      gen loss  = sync_wt·sync + disc_wt·perceptual + (1−sync_wt−disc_wt)·L1
        where perceptual = BCE(D(lower half of G), 1)
        (Wav2Lip_disc_qual.perceptual_forward, wav2lip.py:163-173)
      disc loss = BCE(D(lower half of gt), 1) + BCE(D(lower half of Ĝ), 0)
        on stop-gradiented generator output (the alternating schedule)

    ``sync_wt`` is a runtime scalar: the reference starts at 0.0 and flips
    to 0.03 once the running sync loss crosses SYNC_GATE_THRESHOLD
    (hparams.py:87 "is initially zero, will be set automatically to 0.03");
    keep that decision host-side and pass the current weight in.

    Returns step(state, batch, sync_wt) -> (state, metrics) with metrics
    {loss, l1, sync, perceptual, disc_real, disc_fake}.
    """

    def bce(pred, target):
        p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
        return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)).mean()

    def gen_loss_fn(params, batch_stats, disc_params, batch, sync_wt):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["mel"], batch["faces"], train=True,
            mutable=["batch_stats"])
        l1 = jnp.mean(jnp.abs(out - batch["target"]))
        sync = jnp.zeros(())
        if syncnet is not None:
            from mere_fusion_tpu.models.syncnet import cosine_sync_loss

            half = out[:, out.shape[1] // 2:]
            stacked = jnp.tile(half, (1, 1, 1, 5))
            a_emb, f_emb = syncnet.apply(syncnet_vars, batch["mel"], stacked)
            sync = cosine_sync_loss(a_emb, f_emb, jnp.ones(out.shape[0]))
        perc = bce(disc.apply({"params": disc_params}, out), 1.0)
        loss = (sync_wt * sync + disc_wt * perc
                + (1.0 - sync_wt - disc_wt) * l1)
        return loss, (updates["batch_stats"], out, l1, sync, perc)

    def disc_loss_fn(disc_params, fake, real):
        d_real = bce(disc.apply({"params": disc_params}, real), 1.0)
        d_fake = bce(disc.apply({"params": disc_params}, fake), 0.0)
        return d_real + d_fake, (d_real, d_fake)

    def step(state: GANTrainState, batch, sync_wt):
        g = state.gen
        (loss, (new_stats, out, l1, sync, perc)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(
            g.params, g.batch_stats, state.disc_params, batch, sync_wt)
        upd, new_opt = tx.update(grads, g.opt_state, g.params)
        new_gen = TrainState(optax.apply_updates(g.params, upd), new_stats,
                             new_opt, g.step + 1)
        (_, (d_real, d_fake)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(
            state.disc_params, jax.lax.stop_gradient(out), batch["target"])
        dupd, new_dopt = disc_tx.update(dgrads, state.disc_opt_state,
                                        state.disc_params)
        new_state = GANTrainState(
            gen=new_gen,
            disc_params=optax.apply_updates(state.disc_params, dupd),
            disc_opt_state=new_dopt)
        return new_state, {"loss": loss, "l1": l1, "sync": sync,
                           "perceptual": perc, "disc_real": d_real,
                           "disc_fake": d_fake}

    return step
