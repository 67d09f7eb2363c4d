"""Stage-1 autoencoder training throughput at the 3D flagship config.

Times the SHIPPED AutoEncoderTrainer jitted G+D step (L1 + fake-3D VGG
perceptual + KL + LSGAN adversarial, generator and discriminator updates in
one program) on the batch the host loader actually emits — the
rotation/scale-ENLARGED initial patch (2, 128, 165, 165, 1) under the
planner default (data/patches.py compute_initial_patch_size; the in-step
augmentation samples/crops back to 128^3). MEDIMGEN_BENCH_ENLARGE=0 times
the reference-parity non-enlarged (2, 128, 128, 128, 1) mode. The
lane-packed encoder/decoder paths (models/packed_encoder.py) engage here on
both the forward and backward.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 2
N_MEASURE = 10


def main():
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.planning.planner import create_config_dict
    from medical_image_generation_tpu.training.train_autoencoder import (
        AutoEncoderTrainer,
    )

    vae_cfg, ddpm_cfg = _flagship_configs()
    # stage-1 G+D training at batch 2 @128^3 exceeds one v5e's 16 GB HBM
    # without rematerialization (18.54 GB measured; the planner's AOT memory
    # probe picks the remat rung on real datasets) — bench with remat, as a
    # single-chip user would train. Default remat granularity is "acts"
    # (12.66 GB: inner activations saved, no conv recompute in the backward);
    # MEDIMGEN_BENCH_REMAT_POLICY=full benches the minimum-memory variant.
    vae_cfg = dict(vae_cfg, use_checkpointing=True,
                   remat_policy=os.environ.get(
                       "MEDIMGEN_BENCH_REMAT_POLICY", "acts"))
    ds = {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)}
    config = create_config_dict(ds, [0], 1, vae_cfg, ddpm_cfg)
    import tempfile

    config["results_path"] = os.path.join(
        tempfile.mkdtemp(prefix="medimgen_bench_ae_"), "results"
    )
    config["task"] = "TaskBench"

    if os.environ.get("MEDIMGEN_BENCH_ENLARGE", "1") == "0":
        config["ae_transformations"] = dict(
            config["ae_transformations"], initial_patch_enlargement=False
        )

    from medical_image_generation_tpu.data.patches import (
        compute_initial_patch_size,
    )

    initial = compute_initial_patch_size(config["ae_transformations"])
    sys.stderr.write(f"bench batch spatial shape: {tuple(initial)}\n")

    trainer = AutoEncoderTrainer(config)
    batch = np.random.default_rng(0).uniform(
        0, 1, size=(BATCH, *initial, 1)
    ).astype(np.float32)
    g_state, d_state = trainer._build_states(batch)
    # device-resident batch, as bench.py: the step PROGRAM is what is being
    # measured; a host numpy arg would re-ride the axon tunnel every call
    # and the transfer cost would swamp the A/B (trainers device_put each
    # loader batch while the previous step executes)
    batch = jax.device_put(batch)
    step = trainer._make_train_step(adv_on=True)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])  # axon: block_until_ready returns early

    rng = jax.random.PRNGKey(1)
    with trainer.mesh:
        t0 = time.time()
        for i in range(2):
            g_state, d_state, metrics = step(
                g_state, d_state, batch, jax.random.fold_in(rng, i)
            )
        sync(metrics)
        sys.stderr.write(f"warmup (incl. compile): {time.time() - t0:.1f}s\n")

        t0 = time.time()
        for i in range(N_MEASURE):
            g_state, d_state, metrics = step(
                g_state, d_state, batch, jax.random.fold_in(rng, 100 + i)
            )
        sync(metrics)
        elapsed = time.time() - t0

    enlarged = os.environ.get("MEDIMGEN_BENCH_ENLARGE", "1") != "0"
    tag = "enlarged 128x165x165 patch" if enlarged else "128^3 patch"
    print(json.dumps({
        "metric": f"3D AE (G+D) train steps/sec/chip @128^3 (batch 2 of {tag}, bf16)",
        "value": round(N_MEASURE / elapsed, 4),
        "unit": "steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
