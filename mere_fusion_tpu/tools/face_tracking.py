"""3DMM face tracking by differentiable landmark fitting (JAX).

TPU-native replacement for the reference's pytorch3d-based tracker
(reference: data_utils/face_tracking/face_tracker.py — optimizes BFM
id/exp/pose/focal per frame by differentiable rendering). The pose signal
that the ER-NeRF data pipeline actually consumes (transforms.json
euler/trans + focal, data_utils/process.py task 8) is recoverable from the
landmark term alone, so this implements that stage as a batched, jitted
Adam optimization over all frames at once:

    minimize  || project(R(euler_f)·(mean + B_id a + B_exp e_f) + t_f) - L_f ||²
              + λ_id ||a||² + λ_exp ||e_f||²

with a shared identity `a`, per-frame expressions `e_f`, per-frame pose
(euler_f, t_f) and a shared focal length. The reference's photometric
refinement stage needs a differentiable rasterizer and is out of scope —
documented, not silently skipped.

The morphable-model arrays (mean [N,3], id basis [N·3, K_id], exp basis
[N·3, K_exp]) load from the reference's 3DMM asset directory when present
(convert_BFM output), or can be passed directly (tests use a synthetic
model)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class MorphableModel:
    mean: np.ndarray        # [N, 3]
    base_id: np.ndarray     # [N*3, K_id]
    base_exp: np.ndarray    # [N*3, K_exp]
    faces: Optional[np.ndarray] = None   # [T, 3] triangle topology

    @classmethod
    def load(cls, path: str) -> "MorphableModel":
        """Load from the reference's converted BFM directory
        (data_utils/face_tracking/3DMM: 3DMM_info.npy from convert_BFM.py;
        triangle topology from topology_info.npy's "tris" when present —
        the reference renderer loads the same key, render_3dmm.py:97-100)."""
        import os

        info = np.load(os.path.join(path, "3DMM_info.npy"),
                       allow_pickle=True).item()
        faces = None
        topo_path = os.path.join(path, "topology_info.npy")
        if os.path.exists(topo_path):
            topo = np.load(topo_path, allow_pickle=True).item()
            if "tris" in topo:
                faces = np.asarray(topo["tris"], np.int32).reshape(-1, 3)
        return cls(
            mean=info["mu_shape"].reshape(-1, 3).astype(np.float32),
            base_id=info["b_shape"].astype(np.float32),
            base_exp=info["b_exp"].astype(np.float32),
            faces=faces,
        )


def euler_to_rot(euler: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (pitch, yaw, roll) → [..., 3, 3] rotation matrices (the
    reference's euler2rot convention, face_tracking/geo_transform.py)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], -1).reshape(*x.shape, 3, 3)
    ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], -1).reshape(*x.shape, 3, 3)
    rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], -1).reshape(*x.shape, 3, 3)
    return rz @ ry @ rx


def project(points: jnp.ndarray, focal: jnp.ndarray, center: tuple
            ) -> jnp.ndarray:
    """Perspective projection [..., N, 3] → [..., N, 2] pixels; camera looks
    down -z (the reference's forward_transform, geo_transform.py)."""
    z = jnp.maximum(-points[..., 2], 1e-4)
    u = points[..., 0] / z * focal + center[0]
    v = -points[..., 1] / z * focal + center[1]
    return jnp.stack([u, v], axis=-1)


def fit_landmarks(
    model: MorphableModel,
    landmarks: np.ndarray,          # [F, N, 2] detected 2D landmarks (px)
    image_hw: tuple,
    iters: int = 3000,
    lr: float = 3e-2,
    lambda_id: float = 1e-4,
    lambda_exp: float = 1e-4,
    init_trans_z: float = -600.0,
    init_focal: float = 1150.0,
    freeze_focal: bool = False,
) -> dict:
    """Fit shared id + focal and per-frame exp/euler/trans to landmarks.

    ``freeze_focal`` keeps the focal at ``init_focal`` — the probe mode the
    coarse focal sweep uses (reference face_tracker.py:54-111 fits each
    candidate focal with it fixed, then frees it from the winner).

    Returns {euler [F,3], trans [F,3], exp [F,Ke], id [Ki], focal ()} as
    numpy plus the final mean pixel error."""
    import optax

    f, n, _ = landmarks.shape
    h, w = image_hw
    center = (w / 2.0, h / 2.0)
    mean = jnp.asarray(model.mean)
    b_id = jnp.asarray(model.base_id).reshape(n, 3, -1)
    b_exp = jnp.asarray(model.base_exp).reshape(n, 3, -1)
    target = jnp.asarray(landmarks, jnp.float32)

    params = {
        "id": jnp.zeros((b_id.shape[-1],)),
        "exp": jnp.zeros((f, b_exp.shape[-1])),
        "euler": jnp.zeros((f, 3)),
        "trans": jnp.tile(jnp.asarray([0.0, 0.0, init_trans_z]), (f, 1)),
        "log_focal": jnp.log(jnp.asarray(init_focal, jnp.float32)),
    }

    def geometry(p):
        pts = (mean[None]
               + jnp.einsum("nvk,k->nv", b_id, p["id"])[None]
               + jnp.einsum("nvk,fk->fnv", b_exp, p["exp"]))
        rot = euler_to_rot(p["euler"])                  # [F, 3, 3]
        return jnp.einsum("fij,fnj->fni", rot, pts) + p["trans"][:, None]

    def loss_fn(p):
        proj = project(geometry(p), jnp.exp(p["log_focal"]), center)
        lmk = ((proj - target) ** 2).sum(-1).mean()
        reg = (lambda_id * (p["id"] ** 2).sum()
               + lambda_exp * (p["exp"] ** 2).sum())
        return lmk + reg, lmk

    if freeze_focal:
        tx = optax.multi_transform(
            {"free": optax.adam(lr), "frozen": optax.set_to_zero()},
            {k: ("frozen" if k == "log_focal" else "free") for k in params},
        )
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (_, lmk), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lmk

    lmk = jnp.inf
    for _ in range(iters):
        params, opt_state, lmk = step(params, opt_state)

    out = {k: np.asarray(v) for k, v in params.items()}
    out["focal"] = float(np.exp(out.pop("log_focal")))
    out["pixel_rmse"] = float(np.sqrt(np.asarray(lmk)))
    return out


def fit_landmarks_focal_sweep(
    model: MorphableModel,
    landmarks: np.ndarray,
    image_hw: tuple,
    focals=tuple(range(600, 1500, 100)),
    sweep_iters: int = 800,
    sweep_frame_stride: int = 40,
    **fit_kw,
) -> dict:
    """Coarse-to-fine focal: probe each candidate focal with a short
    frozen-focal fit on a frame subset, then run the full fit with the focal
    freed from the winner (reference face_tracker.py:45-126: sel_ids every
    40 frames, focal range(600, 1500, 100), best landmark loss wins)."""
    sel = landmarks[::max(1, sweep_frame_stride)]
    # probe calls pin iters/init_focal/freeze_focal; caller-supplied values
    # for those keys apply to the final free-focal fit only (passing them
    # through to the probes would raise "multiple values for argument")
    probe_kw = {k: v for k, v in fit_kw.items()
                if k not in ("iters", "init_focal", "freeze_focal")}
    best_focal, best_rmse = None, np.inf
    for focal in focals:
        probe = fit_landmarks(model, sel, image_hw, iters=sweep_iters,
                              init_focal=float(focal), freeze_focal=True,
                              **probe_kw)
        if probe["pixel_rmse"] < best_rmse:
            best_focal, best_rmse = float(focal), probe["pixel_rmse"]
    final_kw = dict(fit_kw)
    final_kw.setdefault("init_focal", best_focal)
    return fit_landmarks(model, landmarks, image_hw, **final_kw)


def poses_from_fit(fit: dict) -> np.ndarray:
    """Per-frame camera-to-world matrices [F, 4, 4] from the fitted head
    pose — the inverse rigid transform in the reference's transforms.json
    convention (data_utils/process.py:311-335 save_transforms).

    Convention bridge: our tracker's camera puts the head at NEGATIVE z
    with u = cx + f·X/depth, v = cy − f·Y/depth (face_tracking.project),
    while the reference's tracker puts it at POSITIVE z with
    u = cx − f·X/Z, v = cy + f·Y/Z (face_tracking/geo_transform.py:53-69
    proj_geo) — the consumed-by-provider convention whose c2w looks along
    +column-2. The two camera frames differ by a point reflection
    (ref_cam = −ours_cam), so the exported rotation is −Rᵀ while the
    camera position −Rᵀt is unchanged. Validated end-to-end by
    tests/test_pipeline_train_e2e.py (a wrong sign breaks multi-view
    consistency and the scene cannot train)."""
    euler = jnp.asarray(fit["euler"])
    trans = np.asarray(fit["trans"])
    rot = np.asarray(euler_to_rot(euler))
    f = rot.shape[0]
    out = np.tile(np.eye(4, dtype=np.float32), (f, 1, 1))
    # world→cam is (R, t); cam→world is (Rᵀ, -Rᵀ t); reference frame flip
    # negates the rotation block only
    rt = rot.transpose(0, 2, 1)
    out[:, :3, :3] = -rt
    out[:, :3, 3] = -np.einsum("fij,fj->fi", rt, trans)
    return out
