"""Orbax-backed checkpoint / resume (full train state, async, keep-N).

Upgrades the reference's two checkpoint generations (SURVEY.md S5):
  (a) iadb_bn.py saves weights ONLY (`model.ckpt` every epoch :1028) — resume
      loses the optimizer state and epoch counter (:828-829);
  (b) the diffusers pipelines use accelerate ``save_state`` checkpoint-N dirs
      with `--resume_from_checkpoint latest` scanning/sorting dirs
      (ddim_diffusers.py:599-621).
Here: ONE manager that checkpoints the complete train state (params +
optimizer state + EMA + learnable schedule params + step) with Orbax,
restores "latest" by default, and prunes to ``max_to_keep`` — which also
covers preemptible-TPU auto-resume (the reference has no failure handling
beyond a 7200s NCCL timeout).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep=3, save_interval_steps=1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step, state, wait=False):
        if self._mgr.latest_step() == int(step):
            return  # already saved this step (e.g. periodic + end-of-run)
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state_like, step=None):
        """Restore into the structure of ``state_like`` (an abstract or
        concrete train state with the right pytree/shape/dtype layout)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(int(step), args=ocp.args.StandardRestore(state_like))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
