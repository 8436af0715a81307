"""LPIPS perceptual distance (AlexNet backbone) in flax (NHWC).

Twin of the ``lpips.LPIPS(net='alex')`` criterion the reference uses for the
patch / lips-finetune training losses (ernerf/nerf_triplane/utils.py:662-666,
816-831) and the LPIPSMeter eval metric (utils.py:447-481).

Structure (Zhang et al. 2018, public `lpips` package):
  scaling layer (fixed shift/scale) -> AlexNet features tapped after each of
  the 5 ReLU stages -> channel-unit-normalize -> per-layer 1x1 "lin" conv
  (non-negative weights) -> spatial mean -> sum over layers.

Call convention matches the reference exactly:
  * training loss: inputs already treated as [-1, 1] (the reference passes
    [0, 1] patches without normalize=True — we reproduce that verbatim);
  * LPIPSMeter: ``normalize=True`` maps [0, 1] -> [-1, 1] first.

Weights convert from the torch side via ``convert_lpips`` (torchvision
alexnet.features state dict + lpips lin heads); random init works for
smoke tests but is not a perceptual metric.
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (fixed buffers, not learned)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet.features layout: index of each conv in the Sequential
# and the 5 ReLU tap points (after features[1,4,7,9,11]).
_ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features, returning the 5 LPIPS tap activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda c, k, s, p, name: nn.Conv(
            c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            dtype=self.dtype, name=name,
        )
        pool = lambda z: nn.max_pool(z, (3, 3), strides=(2, 2))
        taps = []
        x = nn.relu(conv(64, 11, 4, 2, "conv0")(x))
        taps.append(x)
        x = nn.relu(conv(192, 5, 1, 2, "conv1")(pool(x)))
        taps.append(x)
        x = nn.relu(conv(384, 3, 1, 1, "conv2")(pool(x)))
        taps.append(x)
        x = nn.relu(conv(256, 3, 1, 1, "conv3")(x))
        taps.append(x)
        x = nn.relu(conv(256, 3, 1, 1, "conv4")(x))
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Perceptual distance; inputs NHWC RGB, H and W >= 32 (smaller inputs
    collapse to zero-size feature maps in the AlexNet pool stack, exactly as
    in the torch original). Returns mean distance (scalar)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, normalize: bool = False):
        if normalize:  # [0,1] -> [-1,1] (lpips normalize=True)
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            # lin head: 1x1 conv, no bias (lpips lins[i].model[1])
            w = self.param(f"lin{i}", nn.initializers.uniform(0.1),
                           (d.shape[-1], 1), jnp.float32)
            d = d @ jnp.abs(w)  # lpips clamps lin weights >= 0 at runtime
            total = total + jnp.mean(d, axis=(1, 2))  # spatial average
        return jnp.mean(total)


def convert_lpips(alex_sd: Mapping[str, Any],
                  lpips_sd: Mapping[str, Any]) -> dict:
    """Build LPIPS variables from torch state dicts.

    alex_sd:  torchvision alexnet state dict (``features.{0,3,6,8,10}.*``)
              or an lpips full dump containing ``net.slice*`` keys.
    lpips_sd: the lpips package's linear-head checkpoint
              (``lin{i}.model.1.weight``).
    """
    from mere_fusion_tpu.utils.torch_convert import _np

    def conv(w, b):
        return {"kernel": _np(w).transpose(2, 3, 1, 0), "bias": _np(b)}

    alex = {}
    if any(k.startswith("features.") for k in alex_sd):
        idxs = (0, 3, 6, 8, 10)
        for i, j in enumerate(idxs):
            alex[f"conv{i}"] = conv(alex_sd[f"features.{j}.weight"],
                                    alex_sd[f"features.{j}.bias"])
    else:  # lpips dump: net.sliceN.M.weight
        slice_conv = {1: (1, 0), 2: (2, 1), 3: (3, 2), 4: (4, 3), 5: (5, 4)}
        for k in alex_sd:
            if ".weight" in k and k.startswith("net.slice"):
                s = int(k.split("slice")[1].split(".")[0])
                i = slice_conv[s][1]
                base = k.rsplit(".", 1)[0]
                alex[f"conv{i}"] = conv(alex_sd[f"{base}.weight"],
                                        alex_sd[f"{base}.bias"])

    params: dict = {"alex": alex}
    for i in range(5):
        w = None
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = _np(lpips_sd[key])
                break
        if w is None:
            raise KeyError(f"lin{i} weight not found in lpips state dict")
        params[f"lin{i}"] = w.reshape(w.shape[0], -1).T  # [C,1]
    return {"params": params}


def make_lpips_fn(alex_path: str | None = None, lpips_path: str | None = None,
                  variables=None, normalize: bool = False):
    """Returns a jit-friendly ``fn(pred, gt) -> scalar`` for the Trainer's
    ``lpips_fn`` hook and the LPIPS eval meter. With no checkpoint paths the
    heads are randomly initialized (structural smoke only)."""
    model = LPIPS()
    if variables is None:
        if alex_path and lpips_path:
            from mere_fusion_tpu.utils.torch_convert import load_torch_checkpoint

            variables = convert_lpips(load_torch_checkpoint(alex_path),
                                      load_torch_checkpoint(lpips_path))
        else:
            variables = model.init(
                jax.random.key(0),
                jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)),
            )
    variables = jax.device_put(variables)

    def fn(pred, gt):
        return model.apply(variables, pred, gt, normalize=normalize)

    return fn
