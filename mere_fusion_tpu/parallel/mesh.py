"""Device mesh construction and param/batch sharding rules."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. With defaults, dp spans all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for input batches."""
    return NamedSharding(mesh, P("dp"))


def _leaf_spec(path: tuple, leaf, tp: int) -> P:
    """Tensor-parallel rule: shard the output-channel (last) dim of large
    kernels over 'tp'; replicate everything else (biases, norms, stats)."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = names and names[-1] == "kernel"
    if is_kernel and leaf.ndim >= 2 and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp * 8:
        return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def shard_params(variables, mesh: Mesh):
    """NamedSharding tree for a flax variable collection under the tp rule."""
    tp = mesh.shape["tp"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, tp))

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def device_put_sharded_tree(variables, shardings):
    return jax.tree.map(jax.device_put, variables, shardings)
