"""Checkpointing: orbax save/load with d2-style periodic semantics, plus a
torch-checkpoint converter for the released APE weights.

Capability match:
  * DetectionCheckpointer / PeriodicCheckpointer (reference ape/checkpoint/
    detection_checkpoint.py:16-47, COCO config period 5000 keep 2): tolerant
    load, `last_checkpoint` tag file, resume_or_load semantics.
  * FSDP full-state gather (detection_checkpoint.py:56-90) is free here: orbax
    saves sharded arrays natively and restores to any mesh.
  * torch->jax conversion replaces `?matching_heuristics=True` + offline
    eva_interpolate_patch_14to16.py; see convert.py for the name mapping.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger("ape_tpu")


class Checkpointer:
    def __init__(self, save_dir: str, keep: int = 2):
        self.save_dir = save_dir
        self.keep = keep
        os.makedirs(save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(save_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(
            step, args=self._ocp.args.StandardSave(jax.tree.map(np.asarray, state))
        )
        self._mgr.wait_until_finished()
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(str(step))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def load(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )

    def resume_or_load(self, state_template: Any, init_path: str = "", resume: bool = True):
        """d2 resume_or_load: if resuming and a checkpoint exists, restore it;
        otherwise load init weights (params only) from init_path if given."""
        if resume and self.latest_step() is not None:
            state = self.load(state_template)
            logger.info(f"resumed from step {self.latest_step()}")
            return state, int(self.latest_step())
        if init_path:
            from ape_tpu.checkpoint.convert import load_params_tolerant

            params = load_params_tolerant(init_path, state_template.params)
            state = state_template.replace(params=params)
            return state, 0
        return state_template, 0


class PeriodicCheckpointer:
    def __init__(self, checkpointer: Checkpointer, period: int = 5000, max_iter: int = None):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def step(self, iteration: int, state: Any):
        if (iteration + 1) % self.period == 0 or (
            self.max_iter and iteration + 1 >= self.max_iter
        ):
            self.checkpointer.save(iteration + 1, state)
