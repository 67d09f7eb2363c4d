"""Headline benchmark: 3D LDM training throughput at 128^3 on one TPU chip.

Measures the SHIPPED latent-diffusion train step — ``LDMTrainer._make_train_step``
verbatim — at the planner-derived flagship configuration for a 128^3-median
dataset (BASELINE.json north-star): device-side augmentation of the batch the
host loader actually emits — the scale-ENLARGED initial patch
(2, 128, 143, 143, 1) under the planner default ``initial_patch_enlargement:
true`` (data/patches.py compute_initial_patch_size; the step's augmentation
samples/crops back to 128^3) — then frozen KL-VAE encode, noising, the
441M-parameter strided 3D diffusion U-Net forward+backward, global-norm clip
and AdamW (bf16 first moment) — one jitted XLA program with donated state.
Params are randomly initialized (host-side, seed-fixed), not zeros.

Set MEDIMGEN_BENCH_ENLARGE=0 to A/B the reference-parity non-enlarged mode
(``initial_patch_enlargement: false`` → a (2, 128, 128, 128, 1) batch), which
is NOT the shipped default program.

Baseline bookkeeping: the reference publishes NO numbers (BASELINE.md).
``vs_baseline`` is therefore measured against the BASELINE.json target of
**3x an estimated A100 reference throughput**. The A100 estimate is
REF_A100_STEPS_PER_SEC = 1.0 steps/s for the torch-eager AMP reference at
this config (documented engineering estimate, not a measurement):
    vs_baseline = steps_per_sec / (3 * REF_A100_STEPS_PER_SEC)
so vs_baseline >= 1.0 means the >=3x-A100 target is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

# Persistent compilation cache: the flagship fwd+bwd program is large and
# the axon remote compile is slow; cache hits make reruns start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

REF_A100_STEPS_PER_SEC = 1.0  # estimated torch-eager A100 reference (see above)
TARGET_MULTIPLE = 3.0
BATCH = 2  # headline batch (reference per-GPU 3D batch, configuration.py:929)
N_MEASURE = 20
N_WARMUP = 2


def _random_params(shapes, seed: int = 0):
    """Host-side random init from an eval_shape tree: fast (no device compile
    of the 441M-param init program) and non-zero (zero weights would skip
    real data paths through the matmuls)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rng = np.random.default_rng(seed)
    out = [
        jnp.asarray(rng.normal(0.0, 0.02, s.shape).astype(np.float32), dtype=s.dtype)
        for s in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def build_trainer_step():
    """The real LDMTrainer and its exact jitted train step at the flagship
    config, with a fabricated frozen-AE checkpoint (random weights)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.data.patches import (
        compute_initial_patch_size,
    )
    from medical_image_generation_tpu.planning.planner import (
        compute_output_size,
        create_config_dict,
    )
    from medical_image_generation_tpu.training import checkpoints as ckpt
    from medical_image_generation_tpu.training import common
    from medical_image_generation_tpu.training.train_ldm import LDMTrainer
    from medical_image_generation_tpu.parallel.sharding import place_train_state

    vae_cfg, ddpm_cfg = _flagship_configs()
    ds = {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)}
    config = create_config_dict(ds, [0], 1, vae_cfg, ddpm_cfg)

    tmp = tempfile.mkdtemp(prefix="medimgen_bench_")
    config["results_path"] = os.path.join(tmp, "results")
    config["task"] = "TaskBench"

    if os.environ.get("MEDIMGEN_BENCH_ENLARGE", "1") == "0":
        # A/B mode: reference-parity non-enlarged patches (see module doc)
        config["ddpm_transformations"] = dict(
            config["ddpm_transformations"], initial_patch_enlargement=False
        )

    # the batch the host loader emits for training: the (possibly enlarged)
    # initial patch; the jitted step augments + crops back to 128^3
    initial = compute_initial_patch_size(config["ddpm_transformations"])
    sys.stderr.write(f"bench batch spatial shape: {tuple(initial)}\n")

    # fabricate the frozen stage-1 checkpoint (random weights, real format);
    # the batch is random float32 in [0,1] — what the host loader emits
    batch = jax.random.uniform(
        jax.random.PRNGKey(42), (BATCH, *initial, 1), jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL

    ae = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    ae_shapes = jax.eval_shape(lambda r: ae.init({"params": r}, batch[:1], r), rng)
    ae_params = _random_params(ae_shapes, seed=1)["params"]
    ckpt_dir = os.path.join(tmp, "ae_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt.save_checkpoint(ckpt_dir, "best_model",
                         {"epoch": 0, "g_params": ckpt.to_host(ae_params)})
    config["load_autoencoder_path"] = os.path.join(ckpt_dir, "best_model")

    trainer = LDMTrainer(config, dtype=jnp.bfloat16)

    latent = compute_output_size([128, 128, 128], vae_cfg["downsample_parameters"])
    trainer.latent_shape = (BATCH, *latent, vae_cfg["latent_channels"])
    trainer.scale_factor = 1.0  # timing-neutral; probe needs a loader

    # state exactly as LDMTrainer._build_state builds it, but with host-side
    # random params instead of the on-device init program
    z = jnp.zeros((1,) + trainer.latent_shape[1:], jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    unet_shapes = jax.eval_shape(lambda r: trainer.unet.init(r, z, t), rng)
    unet_params = _random_params(unet_shapes, seed=2)["params"]
    sched = common.make_lr_schedule(
        float(config.get("ddpm_learning_rate", 2e-5)), config.get("lr_scheduler"),
        config.get("lr_scheduler_params"), 250,
    )
    tx = common.make_optimizer(
        sched, trainer.clip, trainer.grad_accum, weight_decay=1e-2,
        mu_dtype=common.mu_dtype_from_config(config),
    )
    state = common.TrainState.create(
        apply_fn=trainer.unet.apply, params=unet_params, tx=tx
    )
    state, _ = place_train_state(state, trainer.mesh)

    step = trainer._make_train_step()
    ae_params_dev = jax.device_put(trainer.ae_params)
    return trainer, step, state, ae_params_dev, batch


def main():
    import jax

    trainer, step, state, ae_params, batch = build_trainer_step()
    rng = jax.random.PRNGKey(1)

    with trainer.mesh:
        t0 = time.time()
        for i in range(N_WARMUP):
            state, loss = step(state, ae_params, batch, jax.random.fold_in(rng, i))
        loss.block_until_ready()
        sys.stderr.write(f"warmup (incl. compile): {time.time() - t0:.1f}s\n")

        t0 = time.time()
        for i in range(N_MEASURE):
            state, loss = step(state, ae_params, batch, jax.random.fold_in(rng, 100 + i))
        loss.block_until_ready()
        elapsed = time.time() - t0

    steps_per_sec = N_MEASURE / elapsed
    enlarged = os.environ.get("MEDIMGEN_BENCH_ENLARGE", "1") != "0"
    shape_tag = "enlarged 128x143x143 patch" if enlarged else "128^3 patch"
    result = {
        "metric": "3D LDM shipped train step/sec/chip @128^3 "
                  f"(batch 2 of {shape_tag}, bf16, 441M UNet)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / (TARGET_MULTIPLE * REF_A100_STEPS_PER_SEC), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
