"""Checkpoint / resume for models and pipeline stage artifacts.

The reference's recovery story is its file bus: every stage's outputs are
files, so a failed pipeline resumes from the last stage
(SURVEY.md section 5).  Here the same restartability comes from a stage
store: each stage's arrays (merge order, saliencies, features, probs,
label images) checkpoint into a directory, keyed by stage name, with numpy
for plain arrays and orbax for jax pytrees (model params / opt states).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


class StageStore:
    """Directory-backed store of per-stage arrays + metadata."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.npz")

    def has(self, stage: str) -> bool:
        return os.path.exists(self._path(stage))

    def save(self, stage: str, **arrays):
        meta = {k: v for k, v in arrays.items()
                if not isinstance(v, np.ndarray)}
        arrs = {k: v for k, v in arrays.items()
                if isinstance(v, np.ndarray)}
        np.savez_compressed(self._path(stage), **arrs)
        if meta:
            with open(os.path.join(self.root, f"{stage}.json"), "w") as f:
                json.dump(meta, f)

    def load(self, stage: str) -> Dict[str, Any]:
        z = np.load(self._path(stage), allow_pickle=False)
        out = {k: z[k] for k in z.files}
        meta_path = os.path.join(self.root, f"{stage}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                out.update(json.load(f))
        return out

    def run(self, stage: str, fn, *args, **kwargs):
        """Memoized stage execution: load if checkpointed, else compute
        and save.  fn must return a dict of arrays."""
        if self.has(stage):
            return self.load(stage)
        out = fn(*args, **kwargs)
        self.save(stage, **out)
        return out


def save_params(path: str, params):
    """Save a jax pytree of parameters via orbax (models, opt states)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
