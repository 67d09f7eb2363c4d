"""SSIM / MS-SSIM in pure JAX for 2D and 3D channels-last images.

Capability match for MONAI's SSIMMetric / MultiScaleSSIMMetric used by the
reference's generative eval (train_ldm.py:32,315-321): pairwise structural
similarity over generated samples as a diversity measure.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _mean_axis(x: jax.Array, axis: int, win: int) -> jax.Array:
    """Running mean of size `win` along one axis (valid region), via cumsum."""
    c = jnp.cumsum(x, axis=axis)
    zeros_shape = list(x.shape)
    zeros_shape[axis] = 1
    c = jnp.concatenate([jnp.zeros(zeros_shape, x.dtype), c], axis=axis)
    upper = jax.lax.slice_in_dim(c, win, c.shape[axis], axis=axis)
    lower = jax.lax.slice_in_dim(c, 0, c.shape[axis] - win, axis=axis)
    return (upper - lower) / win


def _uniform_filter(x: jax.Array, win: int, spatial_dims: int) -> jax.Array:
    """Separable mean filter over the spatial axes of (B, *spatial, C)."""
    x = x.astype(jnp.float32)
    for axis in range(1, 1 + spatial_dims):
        x = _mean_axis(x, axis, win)
    return x


def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM per batch element; inputs (B, *spatial, C)."""
    spatial_dims = a.ndim - 2
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    f = partial(_uniform_filter, win=win_size, spatial_dims=spatial_dims)
    mu_a, mu_b = f(a), f(b)
    mu_aa, mu_bb, mu_ab = f(a * a), f(b * b), f(a * b)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b

    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    s = num / den
    return jnp.mean(s, axis=tuple(range(1, s.ndim)))


def _downsample2(x: jax.Array) -> jax.Array:
    """2x average pooling over spatial axes."""
    spatial_dims = x.ndim - 2
    for axis in range(1, 1 + spatial_dims):
        size = x.shape[axis] - (x.shape[axis] % 2)
        x = jax.lax.slice_in_dim(x, 0, size, axis=axis)
        a = jax.lax.slice_in_dim(x, 0, size, stride=2, axis=axis)
        b = jax.lax.slice_in_dim(x, 1, size, stride=2, axis=axis)
        x = (a + b) / 2
    return x


def ms_ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    weights: Sequence[float] = _MS_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM; scales limited so the window still fits."""
    spatial = a.shape[1:-1]
    max_scales = 1
    m = min(spatial)
    while m // 2 >= win_size and max_scales < len(weights):
        max_scales += 1
        m //= 2
    w = jnp.asarray(weights[:max_scales])
    w = w / jnp.sum(w)

    vals = []
    x, y = a, b
    for scale in range(max_scales):
        s = ssim(x, y, data_range=data_range, win_size=win_size)
        vals.append(jnp.clip(s, 1e-6, 1.0))
        if scale < max_scales - 1:
            x, y = _downsample2(x), _downsample2(y)
    vals = jnp.stack(vals, axis=0)  # (scales, B)
    return jnp.exp(jnp.sum(w[:, None] * jnp.log(vals), axis=0))


def pairwise_metrics(
    images,
    win_size: int = 4,
    pairs_per_chunk: int = 0,
) -> dict:
    """All-C(n,2)-pairs SSIM and MS-SSIM over a sample set — the reference's
    generative-diversity protocol (train_ldm.py:315-321: every pair of the
    n sampled images, kernel_size=4) — computed as chunked jitted batches
    instead of one host dispatch per pair.

    images: (n, *spatial, C) array-like. Returns mean/std for both metrics.
    """
    from itertools import combinations

    import numpy as np

    imgs = jnp.asarray(images, jnp.float32)
    n = imgs.shape[0]
    idx = np.asarray(list(combinations(range(n), 2)), np.int32)
    n_pairs = len(idx)
    if n_pairs == 0:
        nan = float("nan")
        return {"ssim_mean": nan, "ssim_std": nan,
                "ms_ssim_mean": nan, "ms_ssim_std": nan, "n_pairs": 0}

    if pairs_per_chunk <= 0:
        # budget ~64M float32 elements of gathered pairs per chunk
        per_pair = 2 * int(np.prod(imgs.shape[1:]))
        pairs_per_chunk = max(1, min(n_pairs, (64 << 20) // max(per_pair, 1)))

    @partial(jax.jit, static_argnames=())
    def chunk_metrics(imgs, ia, ib):
        a = jnp.take(imgs, ia, axis=0)
        b = jnp.take(imgs, ib, axis=0)
        return (
            ssim(a, b, win_size=win_size),
            ms_ssim(a, b, win_size=win_size),
        )

    ssim_vals, ms_vals = [], []
    # fixed chunk shape (pad the tail) => a single compiled program
    padded = np.concatenate(
        [idx, np.repeat(idx[-1:], (-len(idx)) % pairs_per_chunk, axis=0)]
    )
    for start in range(0, len(padded), pairs_per_chunk):
        sl = padded[start : start + pairs_per_chunk]
        s, m = chunk_metrics(imgs, jnp.asarray(sl[:, 0]), jnp.asarray(sl[:, 1]))
        ssim_vals.append(np.asarray(s))
        ms_vals.append(np.asarray(m))
    ssim_all = np.concatenate(ssim_vals)[:n_pairs]
    ms_all = np.concatenate(ms_vals)[:n_pairs]
    return {
        "ssim_mean": float(ssim_all.mean()),
        "ssim_std": float(ssim_all.std()),
        "ms_ssim_mean": float(ms_all.mean()),
        "ms_ssim_std": float(ms_all.std()),
        "n_pairs": int(n_pairs),
    }
