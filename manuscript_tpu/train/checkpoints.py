"""Checkpoint management.

Two tiers, matching the reference's artifact taxonomy (reference:
src/manuscript/recognizers/_trba/training/train.py:979-1086 — last /
best-loss / best-acc, full-state + weights-only):

* flax msgpack blobs (used by the wrappers and trainers) — single-file,
  host-resident, torch-convertible;
* an orbax CheckpointManager wrapper for large-scale training: async saves,
  retention policies, step-indexed restore, and sharded-array support when
  training over a mesh.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


class OrbaxCheckpointer:
    """Step-indexed checkpoint manager over orbax.

    save(step, state) / restore(step=None→latest, template) with retention
    of the newest ``max_to_keep`` checkpoints. State is any pytree
    (train params, opt state, counters).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any], wait: bool = False) -> None:
        self.manager.save(
            step, args=self._ocp.args.StandardSave(jax.device_get(state))
        )
        if wait:
            self.manager.wait_until_finished()

    def restore(
        self, template: Dict[str, Any], step: Optional[int] = None
    ) -> Dict[str, Any]:
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(np.asarray, jax.device_get(template))
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract)
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def all_steps(self):
        return list(self.manager.all_steps())

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
