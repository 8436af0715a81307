"""Checkpoint save/restore (orbax).

Equivalent of the reference Trainer's checkpointing
(reference: ernerf/nerf_triplane/utils.py:1418-1538): keep the last
``max_keep`` checkpoints, track the best by a metric, restore
latest/best/explicit path. State is any pytree (params, optimizer, EMA,
density grid, step).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


class Checkpointer:
    def __init__(self, directory: str, max_keep: int = 2,
                 best_mode: str = "min"):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep,
                best_fn=(lambda m: m.get("loss", 0.0)) if best_mode else None,
                best_mode=best_mode,
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self.manager.save(
            step,
            args=self._ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self.manager.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None,
                best: bool = False) -> Any:
        if step is None:
            step = (self.manager.best_step() if best else self.manager.latest_step())
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            state_template,
        )
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract)
        )

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a template: returns the checkpoint's own tree
        structure (NamedTuples and dataclasses come back as dicts keyed by
        field name). Use when the caller can't reconstruct exact shapes
        (e.g. serving a workspace trained with a different frame count)."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        # typed restore against the checkpoint's OWN metadata tree: a bare
        # manager.restore(step) (or StandardRestore with no target) makes
        # orbax warn "generally UNSAFE" on every serving start; the saved
        # metadata has the exact topology, so build the abstract template
        # from it
        meta = self.manager.item_metadata(step)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding)
            if hasattr(m, "shape") and hasattr(m, "dtype") else m,
            meta,
        )
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract))

    @property
    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self) -> None:
        self.manager.close()
