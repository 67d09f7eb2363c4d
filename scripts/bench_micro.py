"""Micro A/B benchmarks for round-3 kernel candidates on the real chip.

Each candidate is a small standalone jitted program (fast remote compiles)
at the exact flagship shapes, so variants can be screened before paying the
tens-of-minutes compile of the full train step.

Experiments:
  gn   — GroupNorm fp32-statistics strategies. The round-3 profile shows the
         current two-reduction form materializing full fp32 copies of the
         activation (convert + square show up as 610 GiB/s layout copies,
         ~14 ms/step at the AE's packed level-0). Candidate: sum-of-squares
         as an MXU Gram matmul (bf16 products are exact in fp32, fp32
         accumulation) — reads the activation once, no fp32 copy.
  up   — Upsample execution. nearest-up + 3^3 conv does 27 taps on
         duplicated voxels; the same map is a stride-2 transposed conv with
         a 4-tap-per-axis kernel built from adjacent-tap sums (8 effective
         taps per output: 3.4x fewer FLOPs, no high-res pre-conv tensor).

    python scripts/bench_micro.py [gn|up|all]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_fn(fn, *args, n=20, warmup=2):
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
    return (time.perf_counter() - t0) / n * 1e3  # ms


# ---------------------------------------------------------------- GroupNorm


def gn_stats_current(x, G):
    B, C = x.shape[0], x.shape[-1]
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    s1 = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial_axes)
    cnt = float(n_spatial * (C // G))
    mean = s1.reshape(B, G, C // G).sum(axis=-1) / cnt
    meansq = s2.reshape(B, G, C // G).sum(axis=-1) / cnt
    return mean, meansq


def gn_stats_gram(x, G):
    B, C = x.shape[0], x.shape[-1]
    n_spatial = 1
    for a in range(1, x.ndim - 1):
        n_spatial *= x.shape[a]
    xf = x.reshape(B, n_spatial, C)
    s1 = jnp.sum(xf, axis=1, dtype=jnp.float32)
    gram = lax.dot_general(
        xf, xf, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s2 = jnp.diagonal(gram, axis1=1, axis2=2)
    cnt = float(n_spatial * (C // G))
    mean = s1.reshape(B, G, C // G).sum(axis=-1) / cnt
    meansq = s2.reshape(B, G, C // G).sum(axis=-1) / cnt
    return mean, meansq


def gn_stats_twostage(x, G):
    """Reduce the two minor-most spatial axes first (small fp32 partials)."""
    B, C = x.shape[0], x.shape[-1]
    n_spatial = 1
    for a in range(1, x.ndim - 1):
        n_spatial *= x.shape[a]
    inner = tuple(range(x.ndim - 3, x.ndim - 1))
    s1p = jnp.sum(x, axis=inner, dtype=jnp.float32)
    s2p = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=inner)
    rest = tuple(range(1, s1p.ndim - 1))
    s1 = jnp.sum(s1p, axis=rest)
    s2 = jnp.sum(s2p, axis=rest)
    cnt = float(n_spatial * (C // G))
    mean = s1.reshape(B, G, C // G).sum(axis=-1) / cnt
    meansq = s2.reshape(B, G, C // G).sum(axis=-1) / cnt
    return mean, meansq


def gn_apply(x, mean, meansq, scale, bias, G, eps=1e-6, dtype=jnp.bfloat16):
    B, C = x.shape[0], x.shape[-1]
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    rinv = lax.rsqrt(var + eps)
    rinv_c = jnp.repeat(rinv, C // G, axis=1)
    mean_c = jnp.repeat(mean, C // G, axis=1)
    A = rinv_c * scale[None, :]
    b = bias[None, :] - mean_c * A
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = x.astype(dtype) * A.astype(dtype).reshape(shape)
    return y + b.astype(dtype).reshape(shape)


def bench_gn():
    shapes = [
        ((2, 128, 128, 32, 128), 16 * 4, "AE packed level-0 (pack=4, G folded)"),
        ((2, 32, 32, 32, 512), 32, "UNet 32^3 x 512"),
    ]
    variants = {
        "current": gn_stats_current,
        "gram": gn_stats_gram,
        "twostage": gn_stats_twostage,
    }
    for shape, G, label in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16) + 0.3
        scale = jnp.ones((shape[-1],), jnp.float32) * 1.1
        bias = jnp.zeros((shape[-1],), jnp.float32) + 0.05
        print(f"\n== GN {label} {shape} G={G} ==")
        ref = None
        for name, stats in variants.items():
            def full(x):
                m, ms = stats(x, G)
                return gn_apply(x, m, ms, scale, bias, G)

            fwd = jax.jit(full)
            out = fwd(x)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t_f = time_fn(fwd, x)

            def loss(x):
                return jnp.sum(full(x).astype(jnp.float32) ** 2)

            fb = jax.jit(jax.grad(loss))
            t_b = time_fn(fb, x)
            print(f"  {name:9s} fwd {t_f:7.3f} ms   fwd+bwd {t_b:7.3f} ms   max|d| vs current {err:.2e}")


# ---------------------------------------------------------------- Upsample


def up_current(x, W, b, stride):
    bdim, *spatial, c = x.shape
    h = x
    if any(s > 1 for s in stride):
        expanded = [bdim]
        for n_, s in zip(spatial, stride):
            expanded += [n_, s]
        expanded.append(c)
        h = h.reshape([bdim] + [v for n_ in spatial for v in (n_, 1)] + [c])
        h = jnp.broadcast_to(h, expanded)
        h = h.reshape([bdim] + [n_ * s for n_, s in zip(spatial, stride)] + [c])
    dn = lax.conv_dimension_numbers(h.shape, W.shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = lax.conv_general_dilated(
        h, W.astype(h.dtype), (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn
    )
    return out + b.astype(h.dtype)


def _fuse_up_axis(W, axis):
    w0, w1, w2 = (lax.index_in_dim(W, i, axis, keepdims=True) for i in range(3))
    return jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)


def up_fused(x, W, b, stride):
    K = W
    pads = []
    for ax, s in enumerate(stride):
        if s == 2:
            K = _fuse_up_axis(K, ax)
            pads.append((2, 2))
        else:
            pads.append((1, 1))
    dn = lax.conv_dimension_numbers(x.shape, K.shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = lax.conv_general_dilated(
        x, K.astype(x.dtype), (1, 1, 1), pads,
        lhs_dilation=tuple(stride), dimension_numbers=dn,
    )
    return out + b.astype(x.dtype)


def bench_up():
    cases = [
        ((2, 16, 16, 16, 512), (2, 2, 2), "Upsample_1 16^3->32^3 x512"),
        ((2, 8, 8, 8, 768), (2, 2, 2), "Upsample_0 8^3->16^3 x768"),
    ]
    for shape, stride, label in cases:
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        W = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, c, c), jnp.float32) * 0.02
        b = jnp.zeros((c,), jnp.float32)
        print(f"\n== Upsample {label} ==")
        ref = None
        for name, fn in (("current", up_current), ("fused_t", up_fused)):
            f = jax.jit(lambda x, fn=fn: fn(x, W, b, stride))
            out = f(x)
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
            t_f = time_fn(f, x)

            g = jax.jit(jax.grad(lambda x, fn=fn: jnp.sum(fn(x, W, b, stride).astype(jnp.float32) ** 2)))
            t_b = time_fn(g, x)
            print(f"  {name:8s} fwd {t_f:7.3f} ms   fwd+bwd {t_b:7.3f} ms   rel|d| {rel:.2e}")

        # exact-equivalence check in f32
        xf = x.astype(jnp.float32)
        o0 = jax.jit(lambda x: up_current(x, W, b, stride))(xf)
        o1 = jax.jit(lambda x: up_fused(x, W, b, stride))(xf)
        print(f"  f32 max|d| {float(jnp.max(jnp.abs(o0 - o1))):.2e}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}")
    if which in ("gn", "all"):
        bench_gn()
    if which in ("up", "all"):
        bench_up()


if __name__ == "__main__":
    main()
