"""Headline benchmark: 3D LDM training throughput at 128^3 on one TPU chip.

Measures the FULL latent-diffusion train step at the planner-derived flagship
configuration for a 128^3-median dataset (BASELINE.json north-star):
frozen KL-VAE encode of the (2, 128, 128, 128, 1) bf16 batch, noising, the
441M-parameter strided 3D diffusion U-Net forward+backward, global-norm clip
and adam update — one jitted XLA program with donated state.

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
import time

# Persistent compilation cache: the flagship fwd+bwd program is large and
# the axon remote compile is slow; cache hits make reruns start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

REF_A100_STEPS_PER_SEC = 1.0  # estimated torch-eager A100 reference (see above)
TARGET_MULTIPLE = 3.0
BATCH = 2  # planner 3D default (configuration.py:927-929 in the reference)
N_MEASURE = 20
N_WARMUP = 2


def build_step():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
    from medical_image_generation_tpu.planning.planner import compute_output_size
    from medical_image_generation_tpu.training import common

    vae_cfg, ddpm_cfg = _flagship_configs()
    ae = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    unet = DiffusionUNet.from_config(ddpm_cfg, dtype=jnp.bfloat16)
    schedule = NoiseSchedule.create()

    batch = jnp.zeros((BATCH, 128, 128, 128, 1), jnp.bfloat16)
    latent = compute_output_size([128, 128, 128], vae_cfg["downsample_parameters"])
    z_probe = jnp.zeros((1, *latent, vae_cfg["latent_channels"]), jnp.float32)
    t_probe = jnp.zeros((1,), jnp.int32)

    rng = jax.random.PRNGKey(0)

    def zeros_like_shapes(shapes):
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    ae_shapes = jax.eval_shape(
        lambda r: ae.init({"params": r}, batch[:1], r), rng
    )
    ae_params = zeros_like_shapes(ae_shapes)["params"]
    unet_shapes = jax.eval_shape(lambda r: unet.init(r, z_probe, t_probe), rng)
    unet_params = zeros_like_shapes(unet_shapes)["params"]

    tx = common.make_optimizer(2e-5, 1.0, 1)
    state = common.TrainState.create(apply_fn=unet.apply, params=unet_params, tx=tx)

    def train_step(state, ae_params, batch, rng):
        enc_rng, t_rng, n_rng = jax.random.split(rng, 3)
        z = jax.lax.stop_gradient(
            ae.apply({"params": ae_params}, batch, enc_rng,
                     method=ae.encode_stage_2_inputs)
        ).astype(jnp.float32)
        t = jax.random.randint(t_rng, (z.shape[0],), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(n_rng, z.shape, jnp.float32)
        noisy = schedule.add_noise(z, noise, t)

        def loss_fn(params):
            pred = unet.apply({"params": params}, noisy, t)
            return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, loss

    step = jax.jit(train_step, donate_argnums=(0,))
    return step, state, ae_params, batch


def main():
    import jax

    step, state, ae_params, batch = build_step()
    rng = jax.random.PRNGKey(1)

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
    result = {
        "metric": "3D LDM train steps/sec/chip @128^3 (batch 2, bf16, 441M UNet)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / (TARGET_MULTIPLE * REF_A100_STEPS_PER_SEC), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
