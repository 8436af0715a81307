"""int8 VAE decode: gate PSNR + speed, baseline vs per-input-channel
equalization (dynamic SmoothQuant). Run on the TPU: python scripts/prof_r5_int8.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

import mere_fusion_tpu.ops.quant as Q


def int8_conv_eq(x, kernel, bias, strides=(1, 1), padding="SAME",
                 out_dtype=jnp.bfloat16):
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=(0, 1, 2))
    ak = jnp.max(jnp.abs(kf), axis=(0, 1, 3))
    s = jnp.sqrt(jnp.maximum(ax, 1e-8) / jnp.maximum(ak, 1e-8))
    s = jnp.where((ax > 0) & (ak > 0), s, 1.0)
    xq, sx = Q.quantize_per_tensor(xf / s)
    kq, sw = Q.quantize_per_out_channel(kf * s[None, None, :, None])
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kq, tuple(strides), padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def measure_speed(models, batch=16):
    from numpy.random import default_rng
    rng = default_rng(0)
    ls = models.latent_size
    lat0 = jnp.asarray(rng.standard_normal((batch, ls, ls, 8)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((batch, 50, 384)).astype(np.float32))
    iters = 20

    @jax.jit
    def epoch(unet_vars, vae_vars, lat0, feats):
        def body(carry, _):
            img = models.generate_with_vars(unet_vars, vae_vars,
                                            lat0 + carry, feats)
            return img.astype(jnp.float32).sum() * 1e-30, None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)[0]

    args = (models.unet_vars, models.vae_vars, lat0, feats)
    np.asarray(epoch(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(epoch(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from mere_fusion_tpu.engines.muse import MuseModels

    m = MuseModels(dtype=jnp.bfloat16, vae_int8="auto")
    print(f"baseline  gate_psnr {m.int8_gate_psnr:.2f} enabled {m.int8_enabled}",
          flush=True)
    print(f"baseline  ms/batch16 {measure_speed(m):.2f}", flush=True)

    Q.int8_conv = int8_conv_eq
    m2 = MuseModels(dtype=jnp.bfloat16, vae_int8="auto")
    print(f"equalized gate_psnr {m2.int8_gate_psnr:.2f} enabled {m2.int8_enabled}",
          flush=True)
    print(f"equalized ms/batch16 {measure_speed(m2):.2f}", flush=True)


if __name__ == "__main__":
    main()
