"""Evaluation metrics: PSNR, landmark distance, SSIM.

Equivalent of the reference's PSNR/LPIPS/LMD meters
(reference: ernerf/nerf_triplane/utils.py:410-580). LPIPS lives in
models/lpips.py (flax AlexNet backbone + converted lin heads; use
``make_lpips_fn(..., normalize=True)`` with a MetricMeter for the reference's
LPIPSMeter semantics, utils.py:447-481). SSIM is provided as an additional
structural-quality meter.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Global-statistics SSIM over [H, W, C] images (no window)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x, mu_y = pred.mean(), target.mean()
    var_x, var_y = pred.var(), target.var()
    cov = ((pred - mu_x) * (target - mu_y)).mean()
    return ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )


def landmark_distance(lms_pred: np.ndarray, lms_gt: np.ndarray) -> float:
    """Mean L2 landmark distance (the reference's LMD over lips landmarks,
    utils.py:470-520). lms: [N, K, 2] pixel coordinates."""
    lms_pred = lms_pred - lms_pred.mean(axis=1, keepdims=True)
    lms_gt = lms_gt - lms_gt.mean(axis=1, keepdims=True)
    return float(np.linalg.norm(lms_pred - lms_gt, axis=-1).mean())


class MetricMeter:
    """Running average meter matching the reference's measure/report cycle."""

    def __init__(self, fn, name: str):
        self.fn = fn
        self.name = name
        self.total = 0.0
        self.count = 0

    def update(self, pred, target) -> float:
        v = float(self.fn(pred, target))
        self.total += v
        self.count += 1
        return v

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    def report(self) -> str:
        return f"{self.name} = {self.mean:.4f}"
