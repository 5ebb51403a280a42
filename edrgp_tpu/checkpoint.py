"""Checkpoint / resume for fits, samplers, and particle ensembles.

SURVEY.md §5 obligation: the reference's only persistence is pickling a
fitted GPy model (``gp_model/base.py:224-257``, preserved via
``models.state.pickle``/``load_model``).  This module adds the training-
state side the reference never had: atomic, step-tagged checkpoints of
arbitrary pytrees (hyperparameters, optimizer state, NUTS chain state —
position/step-size/mass-matrix, SMC particle ensembles) so long multi-host
runs are restartable after failure.

Format: one ``.npz`` per step with flattened leaves + a JSON treedef
manifest; writes are atomic (tmp + rename) so a killed process never
leaves a torn checkpoint.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_step",
           "CheckpointManager"]

_STEP_RE = re.compile(r"^ckpt_(\d+)\.npz$")


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    keys, leaves = [], []
    for path, leaf in leaves_with_paths:
        keys.append(jax.tree_util.keystr(path))
        leaves.append(np.asarray(leaf))
    return keys, leaves


def save_checkpoint(directory: str, tree: Any, step: int) -> str:
    """Atomically write ``tree`` as ``<dir>/ckpt_<step>.npz``."""
    os.makedirs(directory, exist_ok=True)
    treedef = jax.tree_util.tree_structure(tree)
    keys, leaves = _flatten_with_paths(tree)
    payload = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    manifest = {"keys": keys, "treedef": str(treedef), "step": int(step),
                "num_leaves": len(leaves)}
    payload["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)

    final = os.path.join(directory, f"ckpt_{step}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return final


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := _STEP_RE.match(name))]
    return max(steps) if steps else None


def load_checkpoint(directory: str, tree_like: Any,
                    step: Optional[int] = None) -> tuple[Any, int]:
    """Load a checkpoint into the structure of ``tree_like``.

    ``tree_like`` supplies the pytree structure (and target dtypes if its
    leaves are jax arrays); values come from disk.  Returns (tree, step).
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"ckpt_{step}.npz")
    with np.load(path) as data:
        manifest = json.loads(bytes(data["__manifest__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(manifest["num_leaves"])]
    treedef = jax.tree_util.tree_structure(tree_like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; target structure has "
            f"{treedef.num_leaves}")
    ref_leaves = jax.tree_util.tree_leaves(tree_like)
    cast = [np.asarray(l).astype(r.dtype) if hasattr(r, "dtype") else l
            for l, r in zip(leaves, ref_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast), step


class CheckpointManager:
    """Keep-the-last-k checkpoint rotation for training loops."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_every: int = 100):
        self.directory = directory
        self.max_to_keep = max_to_keep
        self.save_every = save_every

    def maybe_save(self, tree: Any, step: int) -> Optional[str]:
        if step % self.save_every != 0:
            return None
        path = save_checkpoint(self.directory, tree, step)
        self._gc()
        return path

    def restore_or(self, tree_like: Any, default_step: int = 0):
        """(tree, step) from the latest checkpoint, else (tree_like, default)."""
        if latest_step(self.directory) is None:
            return tree_like, default_step
        return load_checkpoint(self.directory, tree_like)

    def _gc(self):
        steps = sorted(int(m.group(1)) for name in os.listdir(self.directory)
                       if (m := _STEP_RE.match(name)))
        for s in steps[:-self.max_to_keep]:
            os.unlink(os.path.join(self.directory, f"ckpt_{s}.npz"))
