"""Device-side batched augmentations as one jitted pure function.

The reference augments per-sample on CPU workers with batchgeneratorsv2
(data_processing.py:748-859). TPU-first redesign: the whole batch is
augmented inside the compiled train step with vmapped, branch-free ops —
probabilities become per-sample masks via `jnp.where`, so shapes stay static
and the VPU does the work while the host only streams raw patches.

Implemented set = the reference's *soft* augmentation branch
(data_processing.py:400-416 + :748-859 probabilities):
  rotation about z +-10deg            p=0.2   (in-plane bilinear resample)
  isotropic scaling 0.9-1.1           p=0.2   (same resample)
  mirror along one axis               p=0.5   (x axis: axes (2,) 3D / (1,) 2D)
  multiplicative brightness 0.9-1.1   p=0.15  (per channel)
  contrast 0.9-1.1, range-preserving  p=0.15  (per channel)
  gamma 0.9-1.1, stats-retaining      p=0.3   (per channel)
plus the heavier optional transforms gated by config switches:
  gaussian noise var 0-0.1            p=0.1
  gaussian blur sigma 0.5-1.0         p=0.2  (separable, fixed 5-tap kernel)
  simulated low resolution 0.5-1x     p=0.25

Inputs are channels-last: (B, Y, X, C) or (B, Z, Y, X, C). Rotation/scaling
act on the (Y, X) plane only — matching the reference's soft branch, which
rotates around z.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    rotation: bool = True
    scaling: bool = True
    mirror: bool = True
    brightness: bool = True
    contrast: bool = True
    gamma: bool = True
    gaussian_noise: bool = False
    gaussian_blur: bool = False
    low_resolution: bool = False

    @staticmethod
    def from_transformations(t: Dict) -> "AugmentConfig":
        return AugmentConfig(
            rotation=t.get("rotation", True),
            scaling=t.get("scaling", True),
            mirror=t.get("mirror", True),
            brightness=t.get("brightness", True),
            contrast=t.get("contrast", True),
            gamma=t.get("gamma", True),
            gaussian_noise=t.get("gaussian_noise", False),
            gaussian_blur=t.get("gaussian_blur", False),
            low_resolution=t.get("low_resolution", False),
        )


ROT_RANGE = 0.174533  # +-10 degrees (reference data_processing.py:408)
SCALE_RANGE = (0.9, 1.1)
BRIGHT_RANGE = (0.9, 1.1)
CONTRAST_RANGE = (0.9, 1.1)
GAMMA_RANGE = (0.9, 1.1)

P_ROT, P_SCALE, P_BRIGHT, P_CONTRAST, P_GAMMA = 0.2, 0.2, 0.15, 0.15, 0.3
P_NOISE, P_BLUR, P_LOWRES = 0.1, 0.2, 0.25


def _rotate_scale_plane(img: jax.Array, angle: jax.Array, scale: jax.Array) -> jax.Array:
    """Bilinear in-plane (Y, X) rotation+scale of one sample.

    img: (..., Y, X, C) with leading optional Z. Output coords map back into
    the input by the inverse transform around the plane center; outside
    voxels are zero (the reference SpatialTransform pads with 0).
    """
    *lead, H, W, C = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32) - cy
    xs = jnp.arange(W, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    inv = 1.0 / scale
    src_y = (cos * yy + sin * xx) * inv + cy
    src_x = (-sin * yy + cos * xx) * inv + cx

    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        vals = img[..., yi, xi, :]  # (..., H, W, C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _blur5(img: jax.Array, sigma: jax.Array) -> jax.Array:
    """Separable 5-tap Gaussian blur over the trailing (Y, X) axes."""
    offsets = jnp.arange(-2, 3, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (offsets / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)

    def conv_axis(x, axis):
        out = jnp.zeros_like(x)
        for i, o in enumerate(range(-2, 3)):
            out = out + k[i] * jnp.roll(x, -o, axis=axis)
        return out

    ax_y = img.ndim - 3
    ax_x = img.ndim - 2
    return conv_axis(conv_axis(img, ax_y), ax_x)


def _augment_one(img: jax.Array, rng: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """Augment one sample (Z, Y, X, C) or (Y, X, C)."""
    keys = jax.random.split(rng, 16)
    C = img.shape[-1]

    # ---- spatial: rotation about z + synchronized scaling, one resample
    do_rot = cfg.rotation & True
    do_scale = cfg.scaling & True
    rot_on = jax.random.uniform(keys[0]) < P_ROT if do_rot else jnp.array(False)
    scale_on = jax.random.uniform(keys[1]) < P_SCALE if do_scale else jnp.array(False)
    angle = jnp.where(
        rot_on, jax.random.uniform(keys[2], minval=-ROT_RANGE, maxval=ROT_RANGE), 0.0
    )
    scale = jnp.where(
        scale_on,
        jax.random.uniform(keys[3], minval=SCALE_RANGE[0], maxval=SCALE_RANGE[1]),
        1.0,
    )
    need_resample = rot_on | scale_on
    img = jax.lax.cond(
        need_resample,
        lambda x: _rotate_scale_plane(x, angle, scale),
        lambda x: x,
        img,
    )

    # ---- mirror along x (last spatial axis) with p=0.5
    if cfg.mirror:
        flip = jax.random.uniform(keys[4]) < 0.5
        img = jnp.where(flip, jnp.flip(img, axis=-2), img)

    # ---- gaussian noise
    if cfg.gaussian_noise:
        on = jax.random.uniform(keys[5]) < P_NOISE
        var = jax.random.uniform(keys[6], minval=0.0, maxval=0.1)
        noise = jax.random.normal(keys[7], img.shape) * jnp.sqrt(var)
        img = jnp.where(on, img + noise, img)

    # ---- gaussian blur
    if cfg.gaussian_blur:
        on = jax.random.uniform(keys[8]) < P_BLUR
        sigma = jax.random.uniform(keys[9], minval=0.5, maxval=1.0)
        img = jnp.where(on, _blur5(img, sigma), img)

    # ---- brightness (multiplicative, per channel)
    if cfg.brightness:
        on = jax.random.uniform(keys[10]) < P_BRIGHT
        mult = jax.random.uniform(
            keys[11], (C,), minval=BRIGHT_RANGE[0], maxval=BRIGHT_RANGE[1]
        )
        img = jnp.where(on, img * mult, img)

    # ---- contrast (range-preserving, per channel)
    if cfg.contrast:
        on = jax.random.uniform(keys[12]) < P_CONTRAST
        f = jax.random.uniform(
            keys[13], (C,), minval=CONTRAST_RANGE[0], maxval=CONTRAST_RANGE[1]
        )
        axes = tuple(range(img.ndim - 1))
        mean = jnp.mean(img, axis=axes, keepdims=True)
        mn = jnp.min(img, axis=axes, keepdims=True)
        mx = jnp.max(img, axis=axes, keepdims=True)
        contrasted = jnp.clip((img - mean) * f + mean, mn, mx)
        img = jnp.where(on, contrasted, img)

    # ---- gamma (stats-retaining, per channel)
    if cfg.gamma:
        on = jax.random.uniform(keys[14]) < P_GAMMA
        g = jax.random.uniform(keys[15], (C,), minval=GAMMA_RANGE[0], maxval=GAMMA_RANGE[1])
        axes = tuple(range(img.ndim - 1))
        mean = jnp.mean(img, axis=axes, keepdims=True)
        std = jnp.std(img, axis=axes, keepdims=True) + 1e-7
        mn = jnp.min(img, axis=axes, keepdims=True)
        rng_ = jnp.max(img, axis=axes, keepdims=True) - mn + 1e-7
        normed = (img - mn) / rng_
        gammaed = jnp.power(jnp.clip(normed, 1e-7, 1.0), g) * rng_ + mn
        # retain stats: restore original mean/std
        gmean = jnp.mean(gammaed, axis=axes, keepdims=True)
        gstd = jnp.std(gammaed, axis=axes, keepdims=True) + 1e-7
        gammaed = (gammaed - gmean) / gstd * std + mean
        img = jnp.where(on, gammaed, img)

    return jnp.clip(img, 0.0, 1.0)  # final clamp (reference :595)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(batch: jax.Array, rng: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """Vmapped per-sample augmentation of a channels-last batch."""
    rngs = jax.random.split(rng, batch.shape[0])
    return jax.vmap(lambda x, r: _augment_one(x, r, cfg))(batch, rngs)
