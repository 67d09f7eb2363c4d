"""Device mesh and sharding layout for SPMD training.

The reference is strictly single-GPU (SURVEY.md §2.25-26: no DP/TP/PP/SP/EP,
no distributed backend; one ``torch.device('cuda')`` per trainer). This
module introduces the parallelism layer the TPU build is designed around:

* a ``Mesh`` over all local devices with a ``data`` axis (batch sharding /
  gradient psum ride ICI) and an optional ``model`` axis reserved for tensor
  sharding of the UNet mid-block as models grow;
* ``NamedSharding`` helpers so the jitted train steps place the batch on
  ``('data',)`` and keep parameters/optimizer state replicated — XLA then
  inserts the all-reduces, no hand-written collectives in the hot path;
* train steps are plain ``jax.jit`` with in/out shardings, so the same code
  runs single-chip (mesh of 1) or multi-chip unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Multi-host bootstrap for TPU pods (SURVEY.md §2.26): call once from a
    CLI main before any device use. No-op unless a coordinator is configured
    (JAX_COORDINATOR_ADDRESS / MEDIMGEN_COORDINATOR_ADDRESS env), so
    single-host runs are untouched. After this, jax.process_count() > 1 and
    the loaders shard their patient lists per host (data/loader.py)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEDIMGEN_COORDINATOR_ADDRESS"
    )
    if not addr:
        return
    # Detect prior initialization WITHOUT touching the XLA backend:
    # jax.process_count() would itself initialize the backend, after which
    # jax.distributed.initialize() unconditionally raises RuntimeError
    # ("must be called before any JAX calls ..."). Inspect the distributed
    # client state directly instead.
    try:
        from jax._src import distributed as _jax_distributed

        if _jax_distributed.global_state.client is not None:
            return  # already initialized
    except (ImportError, AttributeError):
        pass  # private API moved; fall through and let initialize() decide
    jax.distributed.initialize()  # reads coordinator/num_processes/id from env
    print(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.local_devices())} local devices"
    )


def get_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the available devices: ('data', 'model').

    model_parallel=1 keeps everything data-parallel (the default, and the
    right layout for the planner's model sizes); the 'model' axis exists so
    trainers can annotate tensor-sharded params without restructuring.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"devices are visible; provision more (e.g. "
                f"--xla_force_host_platform_device_count) before building "
                f"the mesh"
            )
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh))


def _owned_data_coords(proc_grid: np.ndarray, proc: int) -> list:
    """Data-axis coordinates whose device row contains ``proc``.

    ``proc_grid`` is the (data, model) array of process indices. When the
    'model' axis spans processes, a data row has several owners — each must
    supply identical batch rows (the loaders key their sampling RNG on the
    GLOBAL row index, so co-owners reproduce the same rows independently)."""
    return [d for d in range(proc_grid.shape[0]) if proc in proc_grid[d]]


def data_axis_rows(mesh: Mesh, global_batch: int):
    """This process's slice ``(offset, count)`` of a global batch sharded
    on the 'data' axis — the rows ``jax.make_array_from_process_local_data``
    expects it to supply.

    Rows are coord-major: rows [d*rpc, (d+1)*rpc) belong to data coordinate
    d, rpc = global_batch / data-axis size (exact by construction: the
    loaders build global batches as batch_size × data-axis size)."""
    n_data = mesh.shape["data"]
    if global_batch % n_data:
        raise ValueError(
            f"global batch {global_batch} not a multiple of the data axis "
            f"({n_data}); loaders must build batch_size × mesh.shape['data']"
        )
    rpc = global_batch // n_data
    if jax.process_count() == 1:
        return 0, global_batch
    proc_grid = np.vectorize(lambda dev: dev.process_index)(mesh.devices)
    owned = _owned_data_coords(proc_grid, jax.process_index())
    if not owned:
        raise ValueError("this process owns no devices in the mesh")
    lo, hi = min(owned), max(owned)
    if owned != list(range(lo, hi + 1)):
        # non-contiguous ownership: fall back to building the full batch
        # (make_array_from_process_local_data still only reads our shards)
        return 0, global_batch
    return lo * rpc, (hi + 1 - lo) * rpc


def put_batch(batch, mesh: Mesh):
    """Place a loader batch on the mesh, sharded along axis 0.

    Single-host: plain ``device_put`` of the (padded) global batch.
    Multi-host: each process's loader builds only its ``data_axis_rows``
    slice of the global batch, and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — per-host patch-sampling and
    decode work stays constant as hosts are added, instead of every host
    materializing the full global batch."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(pad_batch_to_devices(batch, mesh), sh)
    if isinstance(batch, dict):
        return {k: put_batch(v, mesh) for k, v in batch.items()}
    return jax.make_array_from_process_local_data(sh, np.asarray(batch))


def pad_batch_to_devices(batch, mesh: Mesh) -> np.ndarray:
    """Round the batch up to a multiple of the data-axis size by repeating
    the last samples (keeps shapes static for jit on any mesh). Dict batches
    (class-conditional loaders) are padded leaf-wise."""
    if isinstance(batch, dict):
        return {k: pad_batch_to_devices(v, mesh) for k, v in batch.items()}
    batch = np.asarray(batch)
    n_data = mesh.shape["data"]
    b = batch.shape[0]
    if b % n_data == 0:
        return batch
    pad = n_data - (b % n_data)
    reps = -(-pad // b)  # tile if the batch is smaller than the pad
    filler = np.concatenate([batch] * reps, axis=0)[:pad]
    return np.concatenate([batch, filler], axis=0)
