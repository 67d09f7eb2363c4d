"""Sampling-throughput benchmark: 3D LDM volumes/min at 128^3 on one chip.

BASELINE.json's second headline metric ("sampled volumes/min"). Runs the
flagship 441M-parameter U-Net through the compiled lax.scan trajectory and
the frozen-AE decode, for both the reference protocol (full 1000-step
ancestral DDPM, train_ldm.py:351) and the DDIM-50 fast path the reference
never shipped.

Prints one JSON line per sampler variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 2


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.diffusion.sampler import (
        DDIMSampler,
        SegmentedDDPMSampler,
    )
    from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
    from medical_image_generation_tpu.planning.planner import compute_output_size

    vae_cfg, ddpm_cfg = _flagship_configs()
    ae = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    unet = DiffusionUNet.from_config(ddpm_cfg, dtype=jnp.bfloat16)
    schedule = NoiseSchedule.create()
    latent = compute_output_size([128, 128, 128], vae_cfg["downsample_parameters"])
    z_shape = (BATCH, *latent, vae_cfg["latent_channels"])

    from bench import _random_params

    rng = jax.random.PRNGKey(0)
    unet_params = _random_params(
        jax.eval_shape(
            lambda r: unet.init(r, jnp.zeros((1, *z_shape[1:])), jnp.zeros((1,), jnp.int32)),
            rng,
        ), seed=2,
    )["params"]
    ae_params = _random_params(
        jax.eval_shape(
            lambda r: ae.init({"params": r}, jnp.zeros((1, 128, 128, 128, 1)), r), rng
        ), seed=1,
    )["params"]

    def decode(p, z):
        return ae.apply({"params": p}, z, method=ae.decode_stage_2_outputs)

    # 1000-iteration single programs trip device execution limits; the
    # segmented sampler runs compiled 100-step chunks instead.
    ddpm_sampler = SegmentedDDPMSampler(
        schedule, lambda p, x, t: unet.apply({"params": p}, x, t),
        max_steps_per_call=100,
    )
    _decode_jit = jax.jit(decode)
    decode_jit = lambda z: _decode_jit(ae_params, z)

    def sample_ddpm(rng):
        return decode_jit(ddpm_sampler(unet_params, z_shape, rng))

    # trajectory and decode as SEPARATE programs — the shipped structure
    # (LDMTrainer.sample_images). The DDIMSampler object holds the ONE
    # compiled 50-step scan (apply_fn form: the UNet params ride as jit
    # arguments — the closure form embeds 441M weights as compile-time
    # constants -> compiler death). Re-creating the jit per call (the old
    # ddim_sample pattern) re-compiled every call: 94 s vs ~4 s.
    ddim_sampler = DDIMSampler(
        schedule, lambda p, x, t: unet.apply({"params": p}, x, t),
        num_inference_steps=50,
    )

    def sample_ddim(rng):
        return decode_jit(ddim_sampler(unet_params, z_shape, rng))

    import numpy as np

    def sync(out):
        # block_until_ready returns early under the axon backend; a
        # device->host fetch is the reliable fence
        np.asarray(out.ravel()[0])

    for name, fn, reps in (("ddim50", sample_ddim, 3), ("ddpm1000", sample_ddpm, 1)):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(1))
        sync(out)
        sys.stderr.write(f"{name} warmup (incl. compile): {time.time() - t0:.1f}s\n")
        t0 = time.time()
        for i in range(reps):
            out = fn(jax.random.fold_in(rng, i))
        sync(out)
        per_call = (time.time() - t0) / reps
        vols_per_min = 60.0 * BATCH / per_call
        print(json.dumps({
            "metric": f"3D LDM sampled volumes/min @128^3 ({name}, batch {BATCH}, 441M UNet)",
            "value": round(vols_per_min, 3),
            "unit": "volumes/min",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
