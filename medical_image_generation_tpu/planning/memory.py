"""Ahead-of-time batch-size selection from XLA compile-time memory analysis.

The reference picks batch size / grad accumulation by *empirically training
one epoch per candidate and catching CUDA OOMs* (configuration.py:1448-1526,
auto_select_hyperparams). On TPU that design is wrong-shaped: OOM is not a
catchable per-op event, and a 1-epoch probe wastes chip time. Instead the
autoencoder train step is compiled ahead-of-time and XLA's own memory
analysis decides whether a candidate fits — deterministic, minutes cheaper,
and exact for the static shapes the planner produces.

What is probed is the SHIPPED step: ``AutoEncoderTrainer._make_train_step``
verbatim — device-side augmentation, L1 + perceptual + KL + LSGAN with the
discriminator update, both optimizers, packed-encoder execution — lowered
abstractly (no weights materialized). An L1-only proxy would answer "fits"
for configs whose real adversarial step OOMs (the 3D flagship at 128^3 needs
remat to fit one v5e at all — BENCH_NOTES.md).

The search ladder keeps the reference's semantics with TPU-specific rungs:
before shrinking the batch, rematerialization (``use_checkpointing``) is
enabled — first at the cheap "acts" granularity (ResBlock inner activations
saved: no conv recompute in the backward), then "full" (block inputs only)
— preserving the planner's batch size, which the reference cannot do
(torch's checkpointing changes its module code).
Ladder: (batch, no remat) -> (batch, remat "acts") -> (batch, remat "full")
-> halve batch with grad_accum=2 (2D halves toward min 6, 3D halves once to
min 1 — configuration.py:1504-1526).
"""

from __future__ import annotations

import copy
import shutil
import tempfile
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

DEFAULT_HBM_BYTES = 16 * 1024**3  # v5e
SAFETY_FRACTION = 0.92  # leave headroom for the runtime + host transfers


class MemoryPlan(NamedTuple):
    batch_size: int
    grad_accum: int
    use_checkpointing: bool
    remat_policy: str = "acts"  # meaningful only when use_checkpointing


def device_memory_budget() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"] * SAFETY_FRACTION)
    except Exception:  # noqa: BLE001
        pass
    return int(DEFAULT_HBM_BYTES * SAFETY_FRACTION)


def lower_ae_train_step(config: dict, batch_size: int,
                        use_checkpointing: bool = False,
                        remat_policy: str = "acts"):
    """Lower + compile the shipped adversarial AE train step abstractly.

    Builds a real ``AutoEncoderTrainer`` from ``config`` (results under a
    throwaway temp dir), eval-shapes its G/D train states, and AOT-compiles
    ``_make_train_step(adv_on=True)`` — the exact program ``medimgen_train_
    autoencoder`` runs after warm-up, which is the peak-memory phase.
    """
    from medical_image_generation_tpu.training import common
    from medical_image_generation_tpu.training.train_autoencoder import (
        AutoEncoderTrainer,
    )

    cfg = copy.deepcopy(config)
    cfg["vae_params"] = dict(cfg["vae_params"],
                             use_checkpointing=use_checkpointing,
                             remat_policy=remat_policy)
    cfg["results_path"] = tempfile.mkdtemp(prefix="medimgen_memprobe_")
    cfg.setdefault("task", "TaskProbe")
    # a pinned numeric weight keeps the probe off the adapt-at-train-start path
    if isinstance(cfg.get("kl_weight"), str):
        cfg["kl_weight"] = 1e-6

    try:
        return _lower_with_trainer(cfg, batch_size, AutoEncoderTrainer, common)
    finally:
        # the reference deletes its trial run dirs too (configuration.py:1496)
        shutil.rmtree(cfg["results_path"], ignore_errors=True)


def _lower_with_trainer(cfg, batch_size, AutoEncoderTrainer, common):
    from medical_image_generation_tpu.data.patches import (
        compute_initial_patch_size,
    )

    trainer = AutoEncoderTrainer(cfg, dtype=jnp.bfloat16)

    spatial_dims = trainer.spatial_dims
    patch = list(cfg["ae_transformations"]["patch_size"])
    if spatial_dims == 2 and len(patch) == 3:
        patch = patch[-2:]
    # the loader extracts the (possibly rotation/scale-enlarged) INITIAL
    # patch for training; the probe must price that exact batch shape
    patch = list(compute_initial_patch_size(cfg["ae_transformations"], patch))
    x_shape = (batch_size, *patch, trainer.in_channels)

    def make_states(rng):
        x = jnp.zeros((1, *x_shape[1:]), jnp.float32)
        if trainer.latent_space_type == "vae":
            g_vars = trainer.model.init({"params": rng}, x, rng)
        else:
            g_vars = trainer.model.init({"params": rng}, x)
        d_vars = trainer.discriminator.init(jax.random.fold_in(rng, 1), x)
        tx_g = common.make_optimizer(1e-4, trainer.clip, trainer.grad_accum)
        tx_d = common.make_optimizer(1e-4, trainer.clip, trainer.grad_accum)
        g_state = common.TrainState.create(
            apply_fn=trainer.model.apply, params=g_vars["params"], tx=tx_g
        )
        d_state = common.TrainState.create(
            apply_fn=trainer.discriminator.apply, params=d_vars["params"], tx=tx_d
        )
        return g_state, d_state

    g_abs, d_abs = jax.eval_shape(make_states, jax.random.PRNGKey(0))
    batch_sds = jax.ShapeDtypeStruct(x_shape, jnp.float32)  # loader emits fp32
    rng_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = trainer._make_train_step(adv_on=True)
    with trainer.mesh:
        return step.lower(g_abs, d_abs, batch_sds, rng_sds).compile()


def estimate_ae_step_memory(config: dict, batch_size: int,
                            use_checkpointing: bool = False,
                            remat_policy: str = "acts") -> Optional[int]:
    """Peak-memory estimate (bytes) of the SHIPPED adversarial AE train step
    at a given batch size, from XLA's compile-time analysis. None if the
    backend exposes no analysis."""
    try:
        compiled = lower_ae_train_step(config, batch_size, use_checkpointing,
                                       remat_policy)
        analysis = compiled.memory_analysis()
        if analysis is None:
            return None
        total = (
            getattr(analysis, "temp_size_in_bytes", 0)
            + getattr(analysis, "argument_size_in_bytes", 0)
            + getattr(analysis, "output_size_in_bytes", 0)
            - getattr(analysis, "alias_size_in_bytes", 0)
        )
        return int(total)
    except Exception as e:  # noqa: BLE001 - analysis is best-effort
        print(f"memory analysis unavailable: {e}")
        return None


def auto_select_hyperparams(
    config: dict,
    model_type: str,
    init_batch_size: int,
    init_grad_accum: int = 1,
    budget_bytes: Optional[int] = None,
) -> MemoryPlan:
    """Batch size + grad accumulation + remat that fit this chip (reference
    ladder semantics, configuration.py:1448-1526, with two remat rungs
    before the first batch halving — see module docstring)."""
    assert model_type in ("2d", "3d")
    budget = budget_bytes if budget_bytes is not None else device_memory_budget()
    min_batch = 6 if model_type == "2d" else 1

    def fits(bs: int, remat: bool, policy: str = "acts") -> Optional[bool]:
        est = estimate_ae_step_memory(config, bs, use_checkpointing=remat,
                                      remat_policy=policy)
        if est is None:
            return None  # no analysis available: trust the planner default
        tag = f" +remat({policy})" if remat else ""
        print(
            f"  batch {bs}{tag}: estimated peak "
            f"{est / 1e9:.2f} GB (budget {budget / 1e9:.2f} GB)"
        )
        return est <= budget

    batch, accum = init_batch_size, init_grad_accum
    first = fits(batch, False)
    if first is None or first:
        return MemoryPlan(batch, accum, False)

    # rung 2: rematerialization at the planner's batch size — the fallback
    # planner.py's use_checkpointing comment promises. "acts" first (no conv
    # recompute in the backward), then "full" (minimum memory).
    if fits(batch, True, "acts"):
        return MemoryPlan(batch, accum, True, "acts")
    if fits(batch, True, "full"):
        return MemoryPlan(batch, accum, True, "full")

    # rung 3: shrink the batch (full remat stays on), grad_accum=2 preserves
    # the effective batch as in the reference ladder
    if model_type == "2d":
        accum = 2
        while batch > min_batch:
            batch //= 2
            if batch <= min_batch:
                break
            f = fits(batch, True, "full")
            if f is None:
                # analysis went away mid-ladder: no information — stop
                # halving and trust the current batch, as rung 1 does
                return MemoryPlan(batch, accum, True, "full")
            if f:
                return MemoryPlan(batch, accum, True, "full")
        batch = max(batch, min_batch)
        if fits(batch, True, "full") is False:
            print(
                f"Warning! 2D model may not fit even at batch {batch} "
                f"(grad_accum {accum}, remat on)."
            )
        return MemoryPlan(batch, accum, True, "full")

    batch = max(min_batch, batch // 2)
    accum = 2
    # batch == init_batch_size means the planner already started at the
    # minimum: rung 2 answered "does not fit" and re-probing the same shape
    # would only recompile — warn directly
    if batch == init_batch_size or fits(batch, True, "full") is False:
        print(
            f"Warning! 3D model may not fit even at batch {batch} "
            f"(grad_accum {accum}, remat on)."
        )
    return MemoryPlan(batch, accum, True, "full")
