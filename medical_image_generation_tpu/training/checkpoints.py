"""Checkpointing with the reference's last/best semantics, on Orbax.

Reference contract (train_autoencoder.py:533-588, train_ldm.py:466-505):
``checkpoints/last_model`` every epoch and ``checkpoints/best_model`` when
validation reconstruction loss improves, both carrying epoch, network,
optimizer, scheduler, and (for the AE) discriminator state; loss history
persisted as ``loss_dict.pkl`` and reloaded on ``-c`` resume.

Orbax writes checkpoint *directories* rather than .pth files; the names and
selection rules are identical.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(checkpoints_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(checkpoints_dir), name)


def save_checkpoint(checkpoints_dir: str, name: str, payload: Dict[str, Any]) -> None:
    """Atomically save a pytree payload as checkpoints/<name>."""
    path = _path(checkpoints_dir, name)
    ckptr = ocp.StandardCheckpointer()
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    ckptr.save(tmp, payload, force=True)
    ckptr.wait_until_finished()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.rename(tmp, path)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a payload; with ``target`` given, restores with matching
    structure/dtypes (needed for optimizer states)."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))


def save_loss_dict(save_path: str, loss_dict: Dict[str, list]) -> None:
    with open(os.path.join(save_path, "loss_dict.pkl"), "wb") as f:
        pickle.dump(loss_dict, f)


def load_loss_dict(save_path: str) -> Optional[Dict[str, list]]:
    p = os.path.join(save_path, "loss_dict.pkl")
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return pickle.load(f)


def to_host(tree):
    """Device -> host numpy pytree (for checkpoint payloads)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
