"""Mesh/sharding utilities for multi-chip scale-out.

The reference's only distributed mechanism is torch DDP for ER-NeRF training
(reference: ernerf/nerf_triplane/utils.py:636-638); inference scale-out is
one engine per GPU. Here the equivalents are jax.sharding meshes: data
parallelism over a 'dp' axis, optional tensor parallelism over 'tp' for
weight shards, with XLA inserting the ICI collectives.
"""

from mere_fusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    replicate,
)
