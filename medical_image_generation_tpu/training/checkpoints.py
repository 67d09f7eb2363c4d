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


def _migrate_groupnorm_params(tree):
    """Collapse the pre-round-2 GroupNorm param nesting on load.

    The round-2 folded GroupNorm (models/blocks.py) declares its scale/bias
    directly, moving params from ``.../GroupNorm_k/GroupNorm_0/{scale,bias}``
    (the old flax ``nn.GroupNorm`` submodule) to ``.../GroupNorm_k/{scale,
    bias}``. Checkpoints written before that change would otherwise fail with
    an opaque param-structure mismatch at apply time. Returns (migrated_tree,
    n_collapsed)."""
    n = 0

    def rec(node):
        nonlocal n
        if not isinstance(node, dict):
            return node
        if (
            set(node.keys()) == {"GroupNorm_0"}
            and isinstance(node["GroupNorm_0"], dict)
            and set(node["GroupNorm_0"].keys()) <= {"scale", "bias"}
        ):
            n += 1
            return dict(node["GroupNorm_0"])
        return {k: rec(v) for k, v in node.items()}

    return rec(tree), n


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a payload; with ``target`` given, restores with matching
    structure/dtypes (needed for optimizer states).

    Pre-round-2 checkpoints (nested ``GroupNorm_0`` param level) are migrated
    transparently: on a structure mismatch the payload is restored raw, the
    legacy nesting collapsed, and the result re-validated against ``target``."""
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    try:
        return ckptr.restore(os.path.abspath(path), target=target)
    except Exception as e:
        raw = ckptr.restore(os.path.abspath(path))
        migrated, n = _migrate_groupnorm_params(raw)
        if n == 0:
            raise
        t_struct = jax.tree_util.tree_structure(target)
        m_struct = jax.tree_util.tree_structure(migrated)
        if t_struct != m_struct:
            raise RuntimeError(
                f"checkpoint {path} uses the pre-round-2 GroupNorm param "
                f"layout (nested GroupNorm_0); automatic migration collapsed "
                f"{n} entries but the structure still does not match the "
                f"current model — retrain or convert the checkpoint manually"
            ) from e
        print(
            f"checkpoint {path}: migrated {n} legacy GroupNorm_0 param "
            f"nestings to the round-2 folded layout"
        )
        return jax.tree_util.tree_map(
            lambda t, v: np.asarray(v, dtype=np.asarray(t).dtype), target, migrated
        )


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
