import jax
import jax.numpy as jnp
import numpy as np

from mere_fusion_tpu.models.syncnet import SyncNet
from mere_fusion_tpu.models.wav2lip import Wav2LipDisc
from mere_fusion_tpu.train.wav2lip_train import init_state, make_train_step


def make_batch(b=2, s=96, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": jnp.asarray(rng.standard_normal((b, 80, 16)).astype(np.float32)),
        "faces": jnp.asarray(rng.uniform(0, 1, (b, s, s, 6)).astype(np.float32)),
        "target": jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)),
    }


def test_l1_step_decreases_loss():
    model, tx, state = init_state(jax.random.key(0))
    step = jax.jit(make_train_step(model, tx))
    batch = make_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_full_recipe_with_sync_and_disc():
    model, tx, state = init_state(jax.random.key(0))
    batch = make_batch()

    sync = SyncNet()
    sync_vars = sync.init(
        jax.random.key(1), batch["mel"], jnp.zeros((2, 48, 96, 15))
    )
    disc = Wav2LipDisc()
    disc_vars = disc.init(jax.random.key(2), jnp.zeros((2, 96, 96, 3)))

    step = jax.jit(
        make_train_step(model, tx, sync, sync_vars, disc, disc_vars)
    )
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
