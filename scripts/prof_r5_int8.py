"""int8 VAE decode tiers: auto-gate outcome (PSNR + chosen tier) and the
speed of each tier. Run on the TPU: python scripts/prof_r5_int8.py"""
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
    print(f"auto tier={m.int8_tier} gate_psnr={m.int8_gate_psnr:.2f} "
          f"enabled={m.int8_enabled}", flush=True)
    for k, v in getattr(m, "int8_gate_probes", {}).items():
        print(f"   probe {k}: {v:.2f} dB", flush=True)
    print(f"auto ms/batch16 {measure_speed(m):.2f}", flush=True)
    for tier, kw in (("full", dict(vae_int8="on")),
                     ("off", dict(vae_int8="off"))):
        m2 = MuseModels(dtype=jnp.bfloat16, **kw)
        print(f"{tier} ms/batch16 {measure_speed(m2):.2f}", flush=True)


if __name__ == "__main__":
    main()
