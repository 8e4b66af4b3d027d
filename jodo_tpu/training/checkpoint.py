"""Orbax checkpointing with the reference's meta/numbered layout.

Reference scheme (run_lib.py:69-78,112-120; utils.py:7-30):
  workdir/checkpoints-meta/   rolling preemption-resume checkpoint
  workdir/checkpoints/<k>     numbered snapshots every snapshot_freq steps
Missing checkpoint => warn and return the fresh state.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, workdir: str):
        self.workdir = os.path.abspath(workdir)
        self.meta_dir = os.path.join(self.workdir, "checkpoints-meta")
        self.ckpt_dir = os.path.join(self.workdir, "checkpoints")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- rolling preemption checkpoint ------------------------------------
    def save_meta(self, state):
        path = os.path.join(self.meta_dir, "state")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore_meta(self, state):
        path = os.path.join(self.meta_dir, "state")
        if not os.path.exists(path):
            logging.warning(
                "No checkpoint found at %s. Returned the same state as input", path
            )
            return state
        return self._ckptr.restore(path, state)

    def restore_meta_raw(self):
        """Restore the meta checkpoint without a target template (None when
        absent); used for auxiliary artifacts like cached classifiers."""
        path = os.path.join(self.meta_dir, "state")
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path)

    # -- numbered snapshots ----------------------------------------------
    def save_numbered(self, state, index: int):
        path = os.path.join(self.ckpt_dir, f"checkpoint_{index}")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore_numbered(self, state, index: int):
        path = os.path.join(self.ckpt_dir, f"checkpoint_{index}")
        if not os.path.exists(path):
            raise FileNotFoundError(f"Checkpoint path error: {path}")
        return self._ckptr.restore(path, state)

    def available_checkpoints(self):
        if not os.path.isdir(self.ckpt_dir):
            return []
        out = []
        for name in os.listdir(self.ckpt_dir):
            if name.startswith("checkpoint_"):
                try:
                    out.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)
