"""Tensor-parallel parameter sharding rules for the diffusion U-Net.

Megatron-style column/row partitioning over the mesh 'model' axis, applied
by flax param-path pattern:

* ResBlock: first conv + time-emb projection shard their *output* channels
  (column-parallel); the second conv shards its *input* channels
  (row-parallel) — one all-reduce per block, inserted by GSPMD.
* AttentionBlock: the fused qkv projection is column-parallel, the output
  projection row-parallel.
* Everything else (norms, shortcuts, embeddings, out conv) is replicated.

The reference has no parallelism at all (SURVEY.md §2.25); this is the
forward-looking TP layout the ('data','model') mesh reserves. With
model_parallel=1 every spec degenerates to replication, so the same code
path serves pure DP.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))

    def col_kernel():  # shard output features
        return P(*([None] * (ndim - 1) + ["model"]))

    def row_kernel():  # shard input features
        if ndim < 2:
            return P()
        return P(*([None] * (ndim - 2) + ["model", None]))

    in_resblock = any("ResBlock" in n for n in names)
    in_attention = any("AttentionBlock" in n or "CrossAttention" in n for n in names)

    if in_resblock:
        # ConvND_0 = first 3x3 conv (column), Dense_0 = time-emb proj
        # (column, matches conv_0 output), ConvND_1 = second conv (row).
        if "ConvND_0" in joined and names[-1] == "kernel":
            return col_kernel()
        if "Dense_0" in joined and names[-1] == "kernel":
            return col_kernel()
        if ("ConvND_0" in joined or "Dense_0" in joined) and names[-1] == "bias":
            return P("model")
        if "ConvND_1" in joined and names[-1] == "kernel":
            return row_kernel()
        return P()

    if in_attention:
        # Dense_0 = fused qkv (column), Dense_1 = output projection (row)
        if "Dense_0" in joined and names[-1] == "kernel":
            return col_kernel()
        if "Dense_0" in joined and names[-1] == "bias":
            return P("model")
        if "Dense_1" in joined and names[-1] == "kernel":
            return row_kernel()
        return P()

    return P()


def unet_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for a DiffusionUNet param tree under `mesh`.

    Falls back to replication for any leaf whose sharded dimension would not
    divide evenly across the 'model' axis.
    """
    n_model = mesh.shape["model"]

    def make(path, leaf):
        spec = _spec_for_path(path, leaf)
        if n_model > 1:
            for axis_name, dim in zip(spec, leaf.shape):
                if axis_name == "model" and dim % n_model != 0:
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(make, params)


def apply_tp_sharding(params: Any, mesh: Mesh):
    """Place a param tree onto the mesh with the TP layout."""
    shardings = unet_param_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings


def train_state_shardings(state: Any, mesh: Mesh, param_shardings: Any):
    """Sharding pytree matching a TrainState: every sub-pytree that has the
    params' tree structure (params, EMA copy, adam mu/nu inside opt_state)
    gets the TP layout; all other leaves (step counters, schedules) are
    replicated."""
    rep = NamedSharding(mesh, P())
    ptd = jax.tree_util.tree_structure(param_shardings)

    def is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == ptd
        except Exception:  # pragma: no cover - non-pytree leaf
            return False

    return jax.tree_util.tree_map(
        lambda node: param_shardings if is_param_tree(node) else rep,
        state,
        is_leaf=is_param_tree,
    )


def place_train_state(state: Any, mesh: Mesh):
    """Place a TrainState onto the mesh: TP layout when the 'model' axis is
    >1 (params + matching optimizer moments), plain replication otherwise.
    Returns (state, shardings)."""
    if mesh.shape.get("model", 1) > 1:
        param_sh = unet_param_shardings(state.params, mesh)
    else:
        param_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state.params
        )
    sh = train_state_shardings(state, mesh, param_sh)
    return jax.device_put(state, sh), sh
