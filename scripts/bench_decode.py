"""Profile the flagship frozen-AE decode (the sampling path's last stage) on
the real chip: time it and print the op-level xprof table.

Decode @128^3 batch 2 was measured at 118 ms (BENCH_NOTES round 3) against a
~12 ms MXU floor and a ~25 ms HBM-traffic floor — this script localizes the
gap. The decode program is jitted exactly as LDMTrainer._decode runs it
(post_quant_conv + packed decoder, bf16 compute, fp32 output).

    python scripts/bench_decode.py [--profile]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_decode():
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.planning.planner import (
        compute_output_size,
        create_autoencoder_dict,
    )

    vae_cfg = create_autoencoder_dict(
        {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)},
        [0], spatial_dims=3,
    )
    ae = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    latent = compute_output_size([128, 128, 128], vae_cfg["downsample_parameters"])
    z = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, *latent, vae_cfg["latent_channels"])),
        jnp.float32,
    )
    x = jnp.zeros((2, 128, 128, 128, 1), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)))
    rng = np.random.default_rng(0)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves],
    )

    def decode(p, zz):
        return ae.apply(p, zz, method=AutoencoderKL.decode_stage_2_outputs)

    return jax.jit(decode), params, z


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def main():
    f, params, z = build_decode()
    t0 = time.time()
    out = f(params, z)
    sync(out)
    print(f"compile+first: {time.time() - t0:.1f}s")
    for _ in range(3):
        out = f(params, z)
    sync(out)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(params, z)
    sync(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"decode @128^3 batch 2: {ms:.2f} ms")

    if "--profile" in sys.argv:
        trace_dir = os.environ.get("MEDIMGEN_PROFILE_DIR", "/tmp/medimgen_decode_prof")
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                out = f(params, z)
            sync(out)
        from profile_step import parse

        parse(trace_dir)


if __name__ == "__main__":
    main()
