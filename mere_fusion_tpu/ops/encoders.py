"""Frequency and spherical-harmonics input encodings (pure jnp).

Numerics match the reference CUDA extensions
(reference: ernerf/freqencoder/src/freqencoder.cu:29-57,
ernerf/shencoder/src/shencoder.cu:43-70). These are tiny elementwise
polynomials — XLA fuses them into the consuming MLP matmuls, so no Pallas
kernel is warranted.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """[N, D] → [N, D + D*2*degree]: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x)...]

    Column order matches the reference kernel: identity first, then for each
    (freq, phase) column all D dims together.
    """
    outs = [x]
    for k in range(degree):
        f = float(2**k)
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)


def freq_encode_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real SH basis up to 4 bands over unit directions [N, 3] → [N, degree²].

    Same hardcoded constants/sign conventions as the reference kernel.
    """
    if not 1 <= degree <= 4:
        raise ValueError("sh_encode supports degree 1..4")
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, yz, xz = x * y, y * z, x * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
