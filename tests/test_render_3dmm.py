"""Photometric 3DMM refinement: synthetic pose recovery.

Builds a synthetic textured face surface, renders ground-truth frames at
known poses with the point-splat renderer, fits poses from NOISY landmarks
(the stage the pipeline always runs), then refines photometrically and
asserts the refined pose error — rotation in degrees, translation in model
units — is strictly tighter than landmark-only
(reference: data_utils/face_tracking/render_3dmm.py:1-25 — the stage our
landmark-only round-1 tracker was missing).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from mere_fusion_tpu.tools.face_tracking import (
    MorphableModel,
    euler_to_rot,
    fit_landmarks,
    project,
)
from mere_fusion_tpu.tools.render_3dmm import (
    geometry_world,
    pose_errors,
    refine_photometric,
    render_splat,
)

HW = (64, 64)
FOCAL = 1150.0


def synthetic_face(n_side: int = 24, k: int = 4, seed: int = 0):
    """Bumpy convex surface + smooth per-vertex colors, BFM-ish units."""
    rng = np.random.default_rng(seed)
    g = np.linspace(-1, 1, n_side)
    xx, yy = np.meshgrid(g, g)
    zz = 0.35 * (1 - 0.5 * (xx**2 + yy**2))
    for _ in range(3):  # a few smooth bumps
        cx, cy, a, s = rng.uniform(-0.7, 0.7, 2).tolist() + [
            rng.uniform(0.05, 0.12), rng.uniform(0.15, 0.3)]
        zz = zz + a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s**2)
    mean = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32) * 10.0
    n = mean.shape[0]
    # smooth low-rank shape bases
    base_id = np.zeros((n * 3, k), np.float32)
    base_exp = np.zeros((n * 3, k), np.float32)
    for j in range(k):
        wx, wy = rng.uniform(0.5, 2.0, 2)
        field = np.sin(wx * xx + j) * np.cos(wy * yy - j)
        vec = np.stack([field, -field, 0.5 * field], -1).reshape(-1)
        base_id[:, j] = vec * 2.0
        base_exp[:, j] = np.roll(vec, 7) * 2.0
    model = MorphableModel(mean=mean, base_id=base_id, base_exp=base_exp)
    # smooth colors: strong low-frequency texture for photometric gradients
    colors = np.stack(
        [0.5 + 0.45 * np.sin(3.1 * xx + 1.0),
         0.5 + 0.45 * np.cos(2.3 * yy),
         0.5 + 0.45 * np.sin(2.7 * (xx + yy))], -1
    ).reshape(-1, 3).astype(np.float32).clip(0, 1)
    return model, colors


def gt_poses(f: int = 3):
    euler = np.stack([
        np.linspace(-0.12, 0.12, f),
        np.linspace(0.10, -0.10, f),
        np.linspace(-0.05, 0.05, f),
    ], -1).astype(np.float32)
    trans = np.tile(np.asarray([0.0, 0.0, -600.0], np.float32), (f, 1))
    trans[:, 0] = np.linspace(-4, 4, f)
    return euler, trans


def test_photometric_refinement_beats_landmark_fit():
    model, colors = synthetic_face()
    euler_gt, trans_gt = gt_poses()
    f = euler_gt.shape[0]
    center = (HW[1] / 2.0, HW[0] / 2.0)

    pts = geometry_world(model, jnp.zeros(4), jnp.zeros((f, 4)),
                         jnp.asarray(euler_gt), jnp.asarray(trans_gt))
    frames = np.stack([
        np.asarray(render_splat(pts[i], jnp.asarray(colors), FOCAL, center,
                                HW)[0])
        for i in range(f)
    ])
    assert frames.max() > 0.2  # the face is actually in frame

    # landmark stage: a sparse vertex subset with pixel noise
    lmk_idx = np.arange(0, model.mean.shape[0], 29)
    lmk_model = MorphableModel(
        mean=model.mean[lmk_idx],
        base_id=model.base_id.reshape(-1, 3, 4)[lmk_idx].reshape(-1, 4),
        base_exp=model.base_exp.reshape(-1, 3, 4)[lmk_idx].reshape(-1, 4),
    )
    lmk_px = np.asarray(project(pts[:, lmk_idx], FOCAL, center))
    rng = np.random.default_rng(1)
    lmk_noisy = lmk_px + rng.normal(0, 1.0, lmk_px.shape)

    fit = fit_landmarks(lmk_model, lmk_noisy.astype(np.float32), HW,
                        iters=2500, init_trans_z=-600.0)
    rot_lmk, trans_lmk = pose_errors(fit["euler"], fit["trans"],
                                     euler_gt, trans_gt)

    refined = refine_photometric(model, fit, frames, iters=800,
                                 colors=colors)
    rot_ph, trans_ph = pose_errors(refined["euler"], refined["trans"],
                                   euler_gt, trans_gt)

    # photometric must tighten BOTH error metrics well past landmark-only
    # (measured: rot 9.9° → 3.0°, trans 4.9 → 2.7 units) and land inside
    # hard absolute bounds
    assert rot_ph < 0.5 * rot_lmk, (rot_ph, rot_lmk)
    assert trans_ph < 0.75 * trans_lmk, (trans_ph, trans_lmk)
    assert rot_ph < 3.5, rot_ph           # degrees
    assert trans_ph < 3.5, trans_ph       # model units (head ~20 wide)
    assert refined["photo_rmse"] < 0.05


def test_photometric_texture_solve_recovers_albedo():
    """Texture-solve mode (refine_pose=False, the reference's texture/light
    stage): per-vertex albedo recovered from the frames at the known pose."""
    model, colors = synthetic_face(seed=3)
    euler_gt, trans_gt = gt_poses()
    f = euler_gt.shape[0]
    center = (HW[1] / 2.0, HW[0] / 2.0)
    pts = geometry_world(model, jnp.zeros(4), jnp.zeros((f, 4)),
                         jnp.asarray(euler_gt), jnp.asarray(trans_gt))
    frames = np.stack([
        np.asarray(render_splat(pts[i], jnp.asarray(colors), FOCAL, center,
                                HW)[0])
        for i in range(f)
    ])

    fit = {
        "euler": euler_gt, "trans": trans_gt,
        "exp": np.zeros((f, 4), np.float32),
        "id": np.zeros(4, np.float32),
        "focal": FOCAL,
    }
    refined = refine_photometric(model, fit, frames, iters=600,
                                 refine_pose=False)
    assert refined["colors"].shape == (model.mean.shape[0], 3)
    corr = np.corrcoef(refined["colors"].ravel(), colors.ravel())[0, 1]
    assert corr > 0.9, corr
    assert refined["photo_rmse"] < 0.1

    with pytest.raises(ValueError, match="refine_pose"):
        refine_photometric(model, fit, frames, iters=1, colors=colors,
                           refine_pose=False)


def test_render_splat_coverage_and_masking():
    model, colors = synthetic_face()
    pts = geometry_world(model, jnp.zeros(4), jnp.zeros((1, 4)),
                         jnp.zeros((1, 3)),
                         jnp.asarray([[0.0, 0.0, -600.0]]))
    rgb, cov = render_splat(pts[0], jnp.asarray(colors), FOCAL,
                            (32.0, 32.0), HW)
    rgb, cov = np.asarray(rgb), np.asarray(cov)
    assert rgb.shape == (*HW, 3) and cov.shape == HW
    assert cov.max() > 1.0            # face region densely covered
    assert cov[0, 0] == pytest.approx(0.0, abs=1e-5)  # corners empty
    assert np.all(rgb[cov == 0] == 0)  # untouched pixels stay background
