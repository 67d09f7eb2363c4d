"""Head-to-head: Pallas flash attention vs XLA fused attention on the real
chip, across the sequence lengths the diffusion models actually produce
(16^3 = 4096 latent tokens at the flagship; 32^3 = 32768 for a 64^3-latent /
256^3-volume configuration) — the measurement behind the size-aware dispatch
gate in ops/pallas_attention.kernel_supported (MIN_SEQ_FOR_KERNEL).

Times forward and forward+backward, bf16, single head of 512 channels
(the planner's deep-level attention shape).

    python scripts/bench_attention.py [--csv]
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


def time_fn(fn, *args, n=20, warmup=3):
    """Per-call wall time with a REAL device sync: under the axon backend
    block_until_ready returns early, so dispatch n calls and force a
    device->host fetch of one element of the last result."""
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from medical_image_generation_tpu.ops.pallas_attention import flash_attention

    csv = "--csv" in sys.argv
    B, H, D = 2, 1, 512
    rows = []
    for S in (4096, 8192, 16384, 32768):
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
        scale = D ** -0.5

        xla_fwd = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale))
        pal_fwd = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))

        def mk_grad(fwd):
            def loss(q, k, v):
                return jnp.sum(fwd(q, k, v).astype(jnp.float32) ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        xla_bwd = mk_grad(lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale))
        pal_bwd = mk_grad(lambda q, k, v: flash_attention(q, k, v, scale))

        if S == 4096:
            # on-chip numeric check of the fused backward (interpret-mode
            # tests can't validate real DMA read-modify-write semantics)
            import numpy as np
            gx = xla_bwd(q, k, v)
            gp = pal_bwd(q, k, v)
            for nm, a, b in zip("qkv", gx, gp):
                err = float(jnp.max(jnp.abs(
                    a.astype(jnp.float32) - b.astype(jnp.float32))))
                ref = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) or 1.0
                print(f"  d{nm} max abs err {err:.3e} (rel {err/ref:.2e})")
                assert err / ref < 2e-2, f"d{nm} gradient mismatch"

        r = {"S": S}
        for name, fn in (("xla_fwd", xla_fwd), ("pallas_fwd", pal_fwd),
                         ("xla_fwdbwd", xla_bwd), ("pallas_fwdbwd", pal_bwd)):
            try:
                r[name] = time_fn(fn, q, k, v) * 1e3
            except Exception as e:  # OOM etc.
                r[name] = float("nan")
                print(f"S={S} {name}: {type(e).__name__}: {str(e)[:120]}",
                      file=sys.stderr)
        rows.append(r)
        print(f"S={S:6d}  xla fwd {r['xla_fwd']:8.2f} ms  pallas fwd {r['pallas_fwd']:8.2f} ms  "
              f"xla f+b {r['xla_fwdbwd']:8.2f} ms  pallas f+b {r['pallas_fwdbwd']:8.2f} ms")

    if csv:
        print("S,xla_fwd_ms,pallas_fwd_ms,xla_fwdbwd_ms,pallas_fwdbwd_ms")
        for r in rows:
            print(f"{r['S']},{r['xla_fwd']:.3f},{r['pallas_fwd']:.3f},"
                  f"{r['xla_fwdbwd']:.3f},{r['pallas_fwdbwd']:.3f}")


if __name__ == "__main__":
    main()
