"""ER-NeRF training: composite loss, EMA, density-grid maintenance.

Loss structure follows the reference Trainer.train_step
(reference: ernerf/nerf_triplane/utils.py:734-888): per-ray MSE with
uncertainty re-weighting, the uncertainty NLL term on face pixels, static-
uncertainty suppression off-face, weights-sum entropy, ambient-audio
off-face and ambient-eye cross regularizers, and the jitter regularizer.
The reference's AMP fp16 + GradScaler becomes plain bf16-safe f32 math (TPU
needs no loss scaling); DDP data parallelism becomes a 'dp' mesh sharding of
the ray batch (the driver's dryrun exercises this).

LPIPS patch/lips-finetune terms are behind ``lpips_fn`` — pass a callable to
enable them (the reference uses AlexNet-LPIPS, utils.py:660; no pretrained
AlexNet ships in this environment).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mere_fusion_tpu.models.ernerf.network import NeRFNetwork
from mere_fusion_tpu.models.ernerf.renderer import (
    DensityGrid,
    render_rays,
    update_density_grid,
)


@dataclass(frozen=True)
class NeRFTrainConfig:
    bound: float = 1.0
    grid_size: int = 128
    n_candidates: int = 64
    n_steps: int = 16
    iters: int = 200_000
    lr: float = 5e-3          # grid lr (reference main.py:219)
    lr_net: float = 5e-4
    ema_decay: float = 0.95
    unc_loss: bool = True
    amb_aud_loss: bool = True
    amb_eye_loss: bool = True
    lambda_amb: float = 1e-4
    density_thresh: float = 10.0


class NeRFTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    density: DensityGrid
    step: jax.Array


def init_nerf_train(network: NeRFNetwork, variables, tcfg: NeRFTrainConfig):
    """Per-module LRs like the reference get_params (network.py:312-353):
    hash tables at lr, MLPs at lr_net, attention net at 5×lr_net."""

    def label(path, _):
        name = path[0].key if hasattr(path[0], "key") else str(path[0])
        if name.startswith("plane_") or name == "torso_grid":
            return "grid"
        if name == "audio_att_net":
            return "att"
        return "net"

    params = variables["params"]
    labels = jax.tree_util.tree_map_with_path(label, params)
    tx = optax.multi_transform(
        {
            "grid": optax.adam(tcfg.lr, b1=0.9, b2=0.99, eps=1e-15),
            "net": optax.adamw(tcfg.lr_net, b1=0.9, b2=0.99, eps=1e-15),
            "att": optax.adamw(5 * tcfg.lr_net, b1=0.9, b2=0.99, eps=1e-15,
                               weight_decay=1e-4),
        },
        labels,
    )
    state = NeRFTrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=params,
        density=DensityGrid.create(tcfg.grid_size),
        step=jnp.zeros((), jnp.int32),
    )
    return tx, state


def make_nerf_train_step(network: NeRFNetwork, tx, tcfg: NeRFTrainConfig,
                         lpips_fn: Optional[Callable] = None,
                         patch_hw: Optional[tuple] = None,
                         lpips_weight: float = 0.1):
    """step(state, batch, rng) → (state, metrics).

    batch: rays_o/rays_d/rgb [N,3], bg_color [N,3] or [3], auds [W,A,16],
    eye [1,1], index int32, face_mask [N] bool.

    patch_hw: static (ph, pw) when the ray batch is patch-sampled
    (provider.sample_rays(patch_size=...) or sample_lips_rays); with
    lpips_fn set this enables the reference's LPIPS patch loss —
    lpips_weight 0.1 for random patches (utils.py:816-818), 0.01 for the
    lips-finetune rect (utils.py:824-831).
    """

    def loss_fn(params, state: NeRFTrainState, batch, rng):
        variables = {"params": params}
        enc_a = network.apply(variables, batch["auds"],
                              method=NeRFNetwork.encode_audio)
        ind = (
            network.apply(variables, batch["index"],
                          method=NeRFNetwork.individual_code)
            if network.cfg.individual_dim > 0
            else None
        )
        eye = batch["eye"]

        def apply_fn(xyz, dirs, training):
            return network.apply(variables, xyz, dirs, enc_a, ind, eye,
                                 training=training)

        out = render_rays(
            apply_fn, batch["rays_o"], batch["rays_d"], state.density,
            bound=tcfg.bound, grid_size=tcfg.grid_size,
            bg_color=batch["bg_color"],
            n_candidates=tcfg.n_candidates, n_steps=tcfg.n_steps,
            training=True,
        )
        pred = out["image"]
        rgb = batch["rgb"]
        n = pred.shape[0]
        face_mask = batch["face_mask"]
        step_factor = jnp.minimum(state.step.astype(jnp.float32) / tcfg.iters, 1.0)

        loss = ((pred - rgb) ** 2).mean(-1)                     # [N]

        if tcfg.unc_loss:
            unc = out["uncertainty"][:, 0]                      # [N]
            unc_w = jax.nn.softmax(unc) * n
            alpha = 0.2
            w = alpha + (1 - alpha) * jnp.clip(
                (1 - step_factor) + step_factor * jax.lax.stop_gradient(unc_w),
                0, 10,
            )
            loss = loss * w
            beta = unc + 1.0
            norm_rgb = jax.lax.stop_gradient(
                jnp.linalg.norm(pred - rgb, axis=-1)
            )
            loss_u = norm_rgb / (2 * beta**2) + jnp.log(beta) ** 2 / 2
            loss = loss + step_factor * loss_u * face_mask
            loss = loss + 1e-3 * step_factor * unc * (~face_mask)

        loss = loss.mean()

        if lpips_fn is not None and patch_hw is not None:
            ph, pw = patch_hw
            loss = loss + lpips_weight * lpips_fn(
                pred.reshape(-1, ph, pw, 3), rgb.reshape(-1, ph, pw, 3)
            )

        # weights-sum entropy: push rays to fully opaque or fully transparent
        ws = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
        loss_ws = -(ws * jnp.log2(ws) + (1 - ws) * jnp.log2(1 - ws))
        loss = loss + 1e-4 * loss_ws.mean()

        lambda_amb = step_factor * tcfg.lambda_amb
        amb_aud = out["ambient_aud"][:, 0]
        if tcfg.amb_aud_loss:
            loss = loss + lambda_amb * (amb_aud * (~face_mask)).mean()
        if tcfg.amb_eye_loss:
            amb_eye = out["ambient_eye"][:, 0] / tcfg.n_steps
            loss_cross = (
                amb_eye * jax.lax.stop_gradient(amb_aud) * face_mask
            ).mean()
            loss = loss + lambda_amb * loss_cross

        # jitter regularizer on a point subsample (utils.py:867-885)
        xyz = batch["rays_o"] + batch["rays_d"]  # proxy points along rays
        delta = (jax.random.uniform(rng, xyz.shape) * 2 - 1) * 1e-3
        _, _, aud_raw, eye_raw, unc_raw = apply_fn(
            jax.lax.stop_gradient(xyz), batch["rays_d"], False
        )
        _, _, aud_reg, eye_reg, unc_reg = apply_fn(xyz + delta, batch["rays_d"], True)
        reg = ((aud_raw - aud_reg) ** 2).mean() + ((eye_raw - eye_reg) ** 2).mean()
        loss = loss + step_factor * 1e-5 * reg

        return loss, {"loss": loss, "mse": ((pred - rgb) ** 2).mean(),
                      "weights_sum": ws.mean()}

    def train_step(state: NeRFTrainState, batch, rng):
        (loss, metrics_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        metrics_out = dict(metrics_out, grad_norm=optax.global_norm(grads))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = 0.95
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params
        )
        return (
            NeRFTrainState(new_params, new_opt, new_ema, state.density,
                           state.step + 1),
            metrics_out,
        )

    return jax.jit(train_step)


def refresh_density_grid(network: NeRFNetwork, state: NeRFTrainState,
                         mean_auds, tcfg: NeRFTrainConfig) -> NeRFTrainState:
    """Every-16-steps grid maintenance (reference train loop, utils.py:1225).

    mean_auds: a representative audio window [W, A, 16] (the reference uses
    the training auds); density is evaluated with that condition.
    """
    variables = {"params": state.params}
    enc_a = network.apply(variables, mean_auds, method=NeRFNetwork.encode_audio)

    eye = jnp.asarray([[0.25]]) if network.cfg.exp_eye else None

    def density_fn(xyz):
        return network.apply(
            variables, xyz, enc_a, eye, method=NeRFNetwork.density
        )["sigma"]

    new_density = update_density_grid(
        density_fn, state.density, tcfg.bound, tcfg.grid_size,
        density_thresh=tcfg.density_thresh,
    )
    return state._replace(density=new_density)


# ---------------------------------------------------------------------------
# Torso fine-tune stage (reference main.py:154-171 + utils.py:747-848 torso
# branch): train ONLY the 2-D torso nets against torso-over-background
# targets, with every head parameter loaded from the head checkpoint and
# frozen (requires_grad=False in torch → optax.set_to_zero here).
# ---------------------------------------------------------------------------

TORSO_PARAMS = frozenset({
    "torso_grid", "torso_deform_net", "torso_net",
    "individual_codes_torso", "anchor_points",
})


def init_torso_train(network: NeRFNetwork, variables,
                     tcfg: NeRFTrainConfig, head_params=None):
    """Optimizer + state for the torso stage. head_params: params tree from
    the trained head checkpoint — merged in (non-strict, like the
    reference's load_state_dict(strict=False)) and frozen."""
    params = dict(variables["params"])
    if head_params is not None:
        for k, v in head_params.items():
            if k in params and k not in TORSO_PARAMS:
                params[k] = v

    def label(path, _):
        name = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "torso" if name in TORSO_PARAMS else "frozen"

    labels = jax.tree_util.tree_map_with_path(label, params)
    tx = optax.multi_transform(
        {
            "torso": optax.adam(tcfg.lr, b1=0.9, b2=0.99, eps=1e-15),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    state = NeRFTrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=params,
        density=DensityGrid.create(tcfg.grid_size),
        step=jnp.zeros((), jnp.int32),
    )
    return tx, state


def make_torso_train_step(network: NeRFNetwork, tx, tcfg: NeRFTrainConfig):
    """step(state, batch, rng) → (state, metrics).

    batch: coords [N,2] pixel centers in [−1,1]², bg_torso_color [N,3]
    (torso composited over background — the gt), bg_color [N,3], pose [4,4],
    index int32. Loss = MSE + anchor-visibility regularizer
    ((1−anchor_w)², utils.py:781) + 1e-4 × torso-alpha entropy
    (utils.py:840-843)."""

    def loss_fn(params, batch):
        variables = {"params": params}
        c = None
        if network.cfg.individual_dim_torso > 0:
            c = params["individual_codes_torso"][batch["index"]][None]
        alpha, color, _dx = network.apply(
            variables, batch["coords"], batch["pose"], c,
            method=NeRFNetwork.forward_torso,
        )
        pred = color * alpha + batch["bg_color"] * (1 - alpha)
        mse = ((pred - batch["bg_torso_color"]) ** 2).mean()
        loss = mse + ((1 - params["anchor_points"][:, 3]) ** 2).mean()
        a = jnp.clip(alpha, 1e-5, 1 - 1e-5)
        entropy = -(a * jnp.log2(a) + (1 - a) * jnp.log2(1 - a))
        loss = loss + 1e-4 * entropy.mean()
        return loss, {"loss": loss, "mse": mse,
                      "torso_alpha": alpha.mean()}

    def train_step(state: NeRFTrainState, batch, rng):
        (loss, metrics_out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = 0.95
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params
        )
        return (
            NeRFTrainState(new_params, new_opt, new_ema, state.density,
                           state.step + 1),
            metrics_out,
        )

    return jax.jit(train_step)
