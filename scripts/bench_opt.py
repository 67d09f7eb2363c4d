"""A/B the optimizer+clip chain on the flagship 441M-param UNet tree.

The round-3 step profile attributes ~21 ms/step to the
clip_by_global_norm -> AdamW chain (bf16 mu, fp32 nu/params) against a
~12-15 ms HBM-traffic floor. This measures, in isolation on the real chip:

  chain  — the shipped optax chain exactly as make_optimizer builds it
  fused  — hand-fused single tree_map producing (mu', nu', p') per leaf
           with the clip scale, bias correction, weight decay and lr folded
           in (same math, same fp32 intermediate precision)

Usage: python scripts/bench_opt.py [chain fused ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B1, B2, EPS, WD, MAXNORM = 0.9, 0.999, 1e-8, 0.01, 1.0
LR = 1e-4


def _tree(seed, shapes_params):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.normal(0, 0.02, s.shape), s.dtype),
        shapes_params,
    )


def main():
    variants = sys.argv[1:] or ["chain", "fused"]

    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
    from medical_image_generation_tpu.training import common

    _, ddpm_cfg = _flagship_configs()
    unet = DiffusionUNet.from_config(ddpm_cfg, dtype=jnp.bfloat16)
    z = jnp.zeros((1, 32, 32, 32, 8), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda r: unet.init(r, z, jnp.zeros((1,), jnp.int32)),
        jax.random.PRNGKey(0),
    )["params"]
    n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
    print(f"param count: {n_params/1e6:.0f}M", file=sys.stderr)

    params = _tree(0, shapes)
    grads = _tree(1, shapes)

    lr_fn = lambda step: jnp.asarray(LR, jnp.float32)

    # ---- shipped chain
    tx = common.make_optimizer(
        lr_fn, grad_clip_max_norm=MAXNORM, weight_decay=WD,
        b1=B1, b2=B2, mu_dtype=jnp.bfloat16,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step_chain(p, g, opt_state):
        updates, new_state = tx.update(g, opt_state, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, updates), new_state

    # ---- hand-fused
    def fused_update(p, g, mu, nu, count):
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(g)))
        scale = jnp.where(gnorm < MAXNORM, 1.0, MAXNORM / gnorm)
        count = count + 1
        c1 = 1.0 - B1 ** count.astype(jnp.float32)
        c2 = 1.0 - B2 ** count.astype(jnp.float32)
        lr = lr_fn(count)

        def leaf(pl, gl, mul, nul):
            gc = gl * scale
            mu2 = (1 - B1) * gc + B1 * mul.astype(jnp.float32)
            nu2 = (1 - B2) * jnp.square(gc) + B2 * nul
            u = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + EPS) + WD * pl
            return pl - lr * u, mu2.astype(jnp.bfloat16), nu2

        out = jax.tree_util.tree_map(
            lambda *xs: leaf(*xs), p, g, mu, nu,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        new_p = jax.tree_util.tree_map(lambda _, o: o[0], p, out)
        new_mu = jax.tree_util.tree_map(lambda _, o: o[1], p, out)
        new_nu = jax.tree_util.tree_map(lambda _, o: o[2], p, out)
        return new_p, new_mu, new_nu, count

    step_fused = jax.jit(fused_update, donate_argnums=(0, 2, 3))

    def sync(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0].ravel()[0])

    for name in variants:
        if name == "chain":
            opt_state = tx.init(params)
            p = jax.tree_util.tree_map(jnp.copy, params)
            t0 = time.time()
            p, opt_state = step_chain(p, grads, opt_state)
            sync(p)
            print(f"chain warmup {time.time()-t0:.1f}s", file=sys.stderr)
            t0 = time.time()
            for _ in range(20):
                p, opt_state = step_chain(p, grads, opt_state)
            sync(p)
            print(f"chain: {(time.time()-t0)/20*1000:.2f} ms")
        elif name == "fused":
            mu = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
            nu = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), shapes)
            count = jnp.zeros((), jnp.int32)
            p = jax.tree_util.tree_map(jnp.copy, params)
            t0 = time.time()
            p, mu, nu, count = step_fused(p, grads, mu, nu, count)
            sync(p)
            print(f"fused warmup {time.time()-t0:.1f}s", file=sys.stderr)
            t0 = time.time()
            for _ in range(20):
                p, mu, nu, count = step_fused(p, grads, mu, nu, count)
            sync(p)
            print(f"fused: {(time.time()-t0)/20*1000:.2f} ms")

    # numeric agreement check (one step from identical state) on a SMALL
    # tree — duplicating the full 441M state for a side-by-side would OOM
    small = {"w": jax.ShapeDtypeStruct((512, 512), jnp.float32),
             "b": jax.ShapeDtypeStruct((512,), jnp.float32)}
    sp, sg = _tree(0, small), _tree(1, small)
    opt_state = tx.init(sp)
    u, _ = jax.jit(lambda g, s, p: tx.update(g, s, p))(sg, opt_state, sp)
    ref = jax.tree_util.tree_map(lambda a, b: a + b, sp, u)
    mu0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), small)
    nu0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.float32), small)
    mine, *_ = jax.jit(fused_update)(sp, sg, mu0, nu0, jnp.zeros((), jnp.int32))
    err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(mine)))
    print(f"max |chain - fused| after 1 step: {err:.3e}", file=sys.stderr)


if __name__ == "__main__":
    main()
