"""Ahead-of-time batch-size selection from XLA compile-time memory analysis.

The reference picks batch size / grad accumulation by *empirically training
one epoch per candidate and catching CUDA OOMs* (configuration.py:1448-1526,
auto_select_hyperparams). On TPU that design is wrong-shaped: OOM is not a
catchable per-op event, and a 1-epoch probe wastes chip time. Instead the
autoencoder train step is compiled ahead-of-time and XLA's own memory
analysis decides whether a candidate fits — deterministic, minutes cheaper,
and exact for the static shapes the planner produces.

The search ladder keeps the reference's semantics: start at the planner
batch size; 2D halves toward min 6 with grad_accum=2, 3D halves once to
min 1 with grad_accum=2 (configuration.py:1504-1526).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_HBM_BYTES = 16 * 1024**3  # v5e
SAFETY_FRACTION = 0.92  # leave headroom for the runtime + host transfers


def device_memory_budget() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"] * SAFETY_FRACTION)
    except Exception:  # noqa: BLE001
        pass
    return int(DEFAULT_HBM_BYTES * SAFETY_FRACTION)


def estimate_ae_step_memory(config: dict, batch_size: int) -> Optional[int]:
    """Peak-memory estimate (bytes) of the adversarial AE train step at a
    given batch size, from XLA's compile-time analysis. None if the backend
    exposes no analysis."""
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.training import common

    vae_cfg = config["vae_params"]
    spatial_dims = vae_cfg["spatial_dims"]
    patch = list(config["ae_transformations"]["patch_size"])
    if spatial_dims == 2 and len(patch) == 3:
        patch = patch[-2:]

    model = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    x_shape = (batch_size, *patch, vae_cfg["in_channels"])
    rng = jax.random.PRNGKey(0)

    def init_fn(r):
        return model.init(
            {"params": r}, jnp.zeros((1, *x_shape[1:]), jnp.float32), r
        )

    shapes = jax.eval_shape(init_fn, rng)
    params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes["params"]
    )
    tx = common.make_optimizer(1e-4, 1.0, 1)
    opt_state = jax.eval_shape(tx.init, params)

    kl_weight = float(config.get("kl_weight", 1e-6))

    def train_step(params, opt_state, batch, r):
        def loss_fn(p):
            recon, mu, sigma = model.apply({"params": p}, batch, r)
            rec = jnp.mean(jnp.abs(recon - batch))
            kl = common.kl_loss(mu, sigma) * kl_weight
            return rec + kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    batch_sds = jax.ShapeDtypeStruct(x_shape, jnp.bfloat16)
    rng_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    try:
        lowered = jax.jit(train_step).lower(params, opt_state, batch_sds, rng_sds)
        compiled = lowered.compile()
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
) -> Tuple[int, int]:
    """Batch size + grad accumulation that fit this chip (reference ladder
    semantics, configuration.py:1448-1526)."""
    assert model_type in ("2d", "3d")
    budget = budget_bytes if budget_bytes is not None else device_memory_budget()
    min_batch = 6 if model_type == "2d" else 1

    def fits(bs: int) -> bool:
        est = estimate_ae_step_memory(config, bs)
        if est is None:
            return True  # no analysis available: trust the planner default
        print(f"  batch {bs}: estimated peak {est / 1e9:.2f} GB (budget {budget / 1e9:.2f} GB)")
        return est <= budget

    batch, accum = init_batch_size, init_grad_accum
    if fits(batch):
        return batch, accum

    if model_type == "2d":
        accum = 2
        while batch > min_batch:
            batch //= 2
            if batch <= min_batch:
                break
            if fits(batch):
                return batch, accum
        batch = max(batch, min_batch)
        if not fits(batch):
            print(
                f"Warning! 2D model may not fit even at batch {batch} "
                f"(grad_accum {accum})."
            )
        return batch, accum

    batch = max(min_batch, batch // 2)
    accum = 2
    if not fits(batch):
        print(
            f"Warning! 3D model may not fit even at batch {batch} (grad_accum {accum})."
        )
    return batch, accum
