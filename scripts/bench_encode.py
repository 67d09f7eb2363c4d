"""A/B the frozen-AE encode program (the LDM step's stage-2 input path) on
the real chip — in-context measurement of GroupNorm statistics variants.

The full-step profile shows the encode at ~77 ms/step with ~16 ms of
fp32 square/convert layout copies around the GN statistics; isolated GN
micro-benches (scripts/bench_micro.py gn) do NOT reproduce those copies, so
variants must be screened inside the real encoder program.

    python scripts/bench_encode.py [twostage gram ...]
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


def main():
    variants = sys.argv[1:] or ["twostage", "gram"]

    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.planning.planner import create_autoencoder_dict

    vae_cfg = create_autoencoder_dict(
        {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)},
        [0], spatial_dims=3,
    )
    ae = AutoencoderKL.from_config(vae_cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 128, 128, 128, 1)), jnp.bfloat16
    )
    params = jax.eval_shape(lambda: ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)))
    rng = np.random.default_rng(0)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.normal(0, 0.02, l.shape), l.dtype) for l in leaves],
    )

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    results = {}
    for variant in variants:
        os.environ["MEDIMGEN_GN_STATS"] = variant

        def encode(p, xx):
            mu, sigma = ae.apply(p, xx, method=AutoencoderKL.encode)
            return mu

        f = jax.jit(encode)
        t0 = time.time()
        out = f(params, x)
        sync(out)
        print(f"{variant}: compile+first {time.time() - t0:.1f}s")
        for _ in range(3):
            out = f(params, x)
        sync(out)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            out = f(params, x)
        sync(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        results[variant] = ms
        print(f"{variant}: encode {ms:.2f} ms")

    print("\n== summary ==")
    for k, v in results.items():
        print(f"  {k:10s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
