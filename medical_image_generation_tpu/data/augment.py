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
  simulated low resolution 0.5-1x     p=0.25 (nearest-down + linear-up,
      per-channel p=0.5, scale synchronized across axes — reference
      SimulateLowResolutionTransform, data_processing.py:812-822; under
      ``dummy_2d`` the z axis is excluded, matching ignore_axes=(0,))
  elastic deformation                 p=0.2  (smooth coarse-grid displacement
      field, in-plane; the reference exposes the CLI switch,
      configuration.py:70, with p_elastic_deform=0 by default)
  dummy_2d: in-plane-only spatial transforms for anisotropic 3D data
      (Convert3DTo2DTransform, data_processing.py:759-776). Rotation/scale
      here are ALWAYS in-plane (the soft branch rotates around z only), so
      the switch's remaining effect is the low-res z exclusion above.

Inputs are channels-last: (B, Y, X, C) or (B, Z, Y, X, C). Under the default
``soft`` preset rotation/scaling act on the (Y, X) plane only — matching the
reference's soft branch, which rotates around z; the ``nnunet`` preset
(reference heavy branch, data_processing.py:371-397) rotates about all three
axes via a trilinear resample when the data is not too anisotropic.

When ``crop_to`` is set (the loader extracted an nnU-Net-enlarged initial
patch — data/patches.py spatial_aug_params), the spatial transform samples
the FINAL output grid directly from the enlarged input and every later
transform runs at final size: rotated/zoomed-out samples have no zero-filled
corners, and the resample costs the same gathers as the unenlarged path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

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
    dummy_2d: bool = False
    elastic: bool = False
    # preset-derived geometry (data/patches.py spatial_aug_params); the
    # defaults reproduce the soft branch exactly
    rot_range: float = 0.174533  # +-10 deg (reference data_processing.py:408)
    rot_3d: bool = False  # nnunet preset, isotropic 3D: rotate all axes
    scale_range: Tuple[float, float] = (0.9, 1.1)
    bright_range: Tuple[float, float] = (0.9, 1.1)
    contrast_range: Tuple[float, float] = (0.9, 1.1)
    gamma_range: Tuple[float, float] = (0.9, 1.1)
    mirror_axes: Optional[Tuple[int, ...]] = None  # None -> x (last spatial)
    crop_to: Optional[Tuple[int, ...]] = None  # final spatial shape

    @staticmethod
    def from_transformations(t: Dict, spatial_dims: Optional[int] = None) -> "AugmentConfig":
        """Build the device-augmentation config from a transformations dict.

        ``spatial_dims``: the MODEL's spatial rank. A 2D model may carry a
        3-length ``patch_size`` in its config (the loader and trainers trim
        it, loader.py get_data_loaders); the geometry here must match the
        rank-2 batches the loader emits or ``_augment_one``'s crop_to check
        trips at trace time. None keeps the config's rank as-is."""
        base = dict(
            rotation=t.get("rotation", True),
            scaling=t.get("scaling", True),
            mirror=t.get("mirror", True),
            brightness=t.get("brightness", True),
            contrast=t.get("contrast", True),
            gamma=t.get("gamma", True),
            gaussian_noise=t.get("gaussian_noise", False),
            gaussian_blur=t.get("gaussian_blur", False),
            low_resolution=t.get("low_resolution", False),
            dummy_2d=t.get("dummy_2d", False),
            elastic=t.get("elastic", False),
        )
        if "patch_size" in t:
            from medical_image_generation_tpu.data.patches import spatial_aug_params

            patch = list(t["patch_size"])
            if spatial_dims is not None and len(patch) > spatial_dims:
                patch = patch[-spatial_dims:]
            geo = spatial_aug_params(t, patch)
            base.update(
                rot_range=geo["rot_range"],
                rot_3d=geo["rot_3d"],
                scale_range=geo["scale_range"],
                bright_range=geo["bright_range"],
                contrast_range=geo["contrast_range"],
                gamma_range=geo["gamma_range"],
                mirror_axes=geo["mirror_axes"],
                crop_to=geo["patch_size"],
                dummy_2d=geo["dummy_2d"] or base["dummy_2d"],
            )
        return AugmentConfig(**base)

    def for_patch(self, patch_size) -> "AugmentConfig":
        """This config with the final spatial shape pinned (when built
        without a transformations dict)."""
        return self._replace(crop_to=tuple(patch_size))


ROT_RANGE = 0.174533  # +-10 degrees (reference data_processing.py:408)
SCALE_RANGE = (0.9, 1.1)
BRIGHT_RANGE = (0.9, 1.1)
CONTRAST_RANGE = (0.9, 1.1)
GAMMA_RANGE = (0.9, 1.1)

P_ROT, P_SCALE, P_BRIGHT, P_CONTRAST, P_GAMMA = 0.2, 0.2, 0.15, 0.15, 0.3
P_NOISE, P_BLUR, P_LOWRES, P_ELASTIC = 0.1, 0.2, 0.25, 0.2
LOWRES_SCALE = (0.5, 1.0)  # reference data_processing.py:814
ELASTIC_MAX_FRAC = 0.08  # max displacement as a fraction of the plane size


def _bilinear_sample_plane(img: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Bilinear gather of (..., Y, X, C) at fractional plane coords
    (H, W)-shaped src_y/src_x; out-of-bounds voxels are zero (the reference
    SpatialTransform pads with 0)."""
    *lead, H, W, C = img.shape
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


def _rotate_scale_plane(
    img: jax.Array, angle: jax.Array, scale: jax.Array,
    out_hw: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Bilinear in-plane (Y, X) rotation+scale of one sample.

    img: (..., Y, X, C) with leading optional Z. The OUTPUT grid (``out_hw``,
    default = input plane) is centered on the input plane and mapped back
    into it by the inverse transform — so an enlarged input yields a
    final-size output whose rotated corners still sample real data.
    """
    *lead, H, W, C = img.shape
    Ho, Wo = out_hw if out_hw is not None else (H, W)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(Ho, dtype=jnp.float32) - (Ho - 1) / 2.0
    xs = jnp.arange(Wo, dtype=jnp.float32) - (Wo - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    inv = 1.0 / scale
    src_y = (cos * yy + sin * xx) * inv + cy
    src_x = (-sin * yy + cos * xx) * inv + cx
    return _bilinear_sample_plane(img, src_y, src_x)


def _center_crop_spatial(img: jax.Array, out_spatial: Tuple[int, ...]) -> jax.Array:
    """Static center crop of the leading spatial axes of (..spatial.., C)."""
    idx = tuple(
        slice((s - o) // 2, (s - o) // 2 + o)
        for s, o in zip(img.shape[: len(out_spatial)], out_spatial)
    ) + (Ellipsis,)
    return img[idx]


def center_crop_batch(batch, spatial: Tuple[int, ...]):
    """Static center crop of a channels-last batch (B, *spatial_in, C) down
    to (B, *spatial, C). Host (numpy) or device arrays; identity when the
    shapes already match. Used wherever a TRAINING loader batch (possibly
    enlarged for the spatial transform) is consumed outside the augmenting
    train step — e.g. the LDM latent-shape probe."""
    n = len(spatial)
    idx = (slice(None),) + tuple(
        slice((s - o) // 2, (s - o) // 2 + o)
        for s, o in zip(batch.shape[1:1 + n], spatial)
    ) + (Ellipsis,)
    return batch[idx]


def _trilinear_sample(img: jax.Array, src_z, src_y, src_x) -> jax.Array:
    """Trilinear gather of (Z, Y, X, C) at fractional coords (all of output
    grid shape); out-of-bounds voxels are zero."""
    Z, Y, X, C = img.shape
    z0 = jnp.floor(src_z).astype(jnp.int32)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wz = (src_z - z0)[..., None]
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]

    def gather(zi, yi, xi):
        valid = ((zi >= 0) & (zi < Z) & (yi >= 0) & (yi < Y)
                 & (xi >= 0) & (xi < X))
        zi = jnp.clip(zi, 0, Z - 1)
        yi = jnp.clip(yi, 0, Y - 1)
        xi = jnp.clip(xi, 0, X - 1)
        return jnp.where(valid[..., None], img[zi, yi, xi, :], 0.0)

    out = 0.0
    for dz, fz in ((0, 1 - wz), (1, wz)):
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                out = out + fz * fy * fx * gather(z0 + dz, y0 + dy, x0 + dx)
    return out


def _rotate_scale_3d(
    img: jax.Array, angles: jax.Array, scale: jax.Array,
    out_zyx: Optional[Tuple[int, int, int]] = None,
) -> jax.Array:
    """Trilinear 3D rotation (about all three axes, composed Rx·Ry·Rz as in
    batchgenerators) + synchronized 3D scale of one (Z, Y, X, C) sample —
    the nnunet preset's spatial transform for isotropic 3D data (reference
    heavy branch, data_processing.py:371-397)."""
    Z, Y, X, C = img.shape
    Zo, Yo, Xo = out_zyx if out_zyx is not None else (Z, Y, X)
    ax, ay, az = angles[0], angles[1], angles[2]

    def rot_axis(a, axis):
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(c), jnp.zeros_like(c)
        if axis == 0:  # rotate (y, x)
            rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
        elif axis == 1:  # rotate (z, x)
            rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
        else:  # rotate (z, y)
            rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
        return jnp.stack([jnp.stack(r) for r in rows])

    R = rot_axis(ax, 0) @ rot_axis(ay, 1) @ rot_axis(az, 2)
    Rinv = R.T  # orthonormal
    cz, cy, cx = (Z - 1) / 2.0, (Y - 1) / 2.0, (X - 1) / 2.0
    zs = jnp.arange(Zo, dtype=jnp.float32) - (Zo - 1) / 2.0
    ys = jnp.arange(Yo, dtype=jnp.float32) - (Yo - 1) / 2.0
    xs = jnp.arange(Xo, dtype=jnp.float32) - (Xo - 1) / 2.0
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    inv = 1.0 / scale
    src_z = (Rinv[0, 0] * zz + Rinv[0, 1] * yy + Rinv[0, 2] * xx) * inv + cz
    src_y = (Rinv[1, 0] * zz + Rinv[1, 1] * yy + Rinv[1, 2] * xx) * inv + cy
    src_x = (Rinv[2, 0] * zz + Rinv[2, 1] * yy + Rinv[2, 2] * xx) * inv + cx
    return _trilinear_sample(img, src_z, src_y, src_x)


def _elastic_plane(img: jax.Array, rng: jax.Array, grid: int = 4) -> jax.Array:
    """Smooth random in-plane displacement field: coarse (grid x grid)
    Gaussian offsets, bilinearly upsampled to (H, W), applied to the (Y, X)
    sampling coordinates of every z slice / channel (capability equivalent of
    the reference's p_elastic_deform hook, data_processing.py:766-773)."""
    *lead, H, W, C = img.shape
    k_mag, k_field = jax.random.split(rng)
    mag = jax.random.uniform(k_mag, minval=0.0, maxval=ELASTIC_MAX_FRAC) * min(H, W)
    coarse = jax.random.normal(k_field, (2, grid, grid), jnp.float32)
    dy = jax.image.resize(coarse[0], (H, W), "bilinear") * mag
    dx = jax.image.resize(coarse[1], (H, W), "bilinear") * mag
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    return _bilinear_sample_plane(img, yy + dy, xx + dx)


def _axis_lowres(x: jax.Array, s: jax.Array, axis: int) -> jax.Array:
    """Simulated low resolution along one axis, shape-statically: the
    conceptual round-trip "zoom down to N*s (nearest) then zoom back up
    (interpolated)" expressed as one composed resampling, so the traced
    scale never changes any array shape."""
    N = x.shape[axis]
    i = jnp.arange(N, dtype=jnp.float32)
    jf = (i + 0.5) * s - 0.5  # position in the virtual low-res grid
    j0 = jnp.floor(jf)
    w = jf - j0

    def src(j):
        # nearest source voxel that the down-zoom would have kept
        return jnp.clip(jnp.round((j + 0.5) / s - 0.5), 0, N - 1).astype(jnp.int32)

    a = jnp.take(x, src(j0), axis=axis)
    b = jnp.take(x, src(j0 + 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = N
    w = w.reshape(shape)
    return a * (1 - w) + b * w


def _simulate_lowres(img: jax.Array, rng: jax.Array, dummy_2d: bool) -> jax.Array:
    """SimulateLowResolutionTransform semantics (data_processing.py:812-822):
    per-channel scale in [0.5, 1) with p_per_channel=0.5, the same scale on
    every spatial axis (synchronize_axes=True), z excluded under dummy_2d
    (ignore_axes=(0,))."""
    C = img.shape[-1]
    k_s, k_on = jax.random.split(rng)
    s = jax.random.uniform(k_s, (C,), minval=LOWRES_SCALE[0], maxval=LOWRES_SCALE[1])
    chan_on = jax.random.uniform(k_on, (C,)) < 0.5

    x = jnp.moveaxis(img, -1, 0)  # (C, *spatial)
    skip_z = dummy_2d and img.ndim == 4

    def one_channel(ch, sc):
        for ax in range(ch.ndim):
            if skip_z and ax == 0:
                continue
            ch = _axis_lowres(ch, sc, ax)
        return ch

    low = jax.vmap(one_channel)(x, s)
    mask = chan_on.reshape((C,) + (1,) * (x.ndim - 1))
    out = jnp.where(mask, low, x)
    return jnp.moveaxis(out, 0, -1)


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
    """Augment one sample (Z, Y, X, C) or (Y, X, C).

    Computes in float32 (interpolation weights and intensity transforms) and
    returns the caller's dtype — mixed-precision callers (the bf16 train
    steps) would otherwise see silent fp32 promotion and dtype-mismatched
    lax.cond branches."""
    orig_dtype = img.dtype
    img = img.astype(jnp.float32)
    keys = jax.random.split(rng, 22)
    C = img.shape[-1]
    n_spatial = img.ndim - 1

    # final spatial shape: the input (no enlargement) or cfg.crop_to (the
    # loader extracted an enlarged initial patch; we sample/crop back down)
    out_spatial = tuple(cfg.crop_to) if cfg.crop_to is not None else img.shape[:-1]
    if len(out_spatial) != n_spatial:
        raise ValueError(
            f"crop_to {out_spatial} rank does not match sample spatial rank "
            f"{n_spatial} (shape {img.shape})"
        )
    if any(o > s for o, s in zip(out_spatial, img.shape)):
        raise ValueError(f"crop_to {out_spatial} larger than input {img.shape}")

    # ---- spatial: rotation + synchronized scaling, one resample onto the
    # final-size output grid (enlarged inputs -> no zero-filled corners)
    rot_on = (jax.random.uniform(keys[0]) < P_ROT
              if (cfg.rotation and cfg.rot_range > 0) else jnp.array(False))
    scale_on = jax.random.uniform(keys[1]) < P_SCALE if cfg.scaling else jnp.array(False)
    rr = float(cfg.rot_range)
    angle = jnp.where(
        rot_on, jax.random.uniform(keys[2], minval=-rr, maxval=rr), 0.0
    )
    scale = jnp.where(
        scale_on,
        jax.random.uniform(
            keys[3], minval=cfg.scale_range[0], maxval=cfg.scale_range[1]
        ),
        1.0,
    )
    need_resample = rot_on | scale_on
    use_3d = cfg.rot_3d and n_spatial == 3 and not cfg.dummy_2d
    if use_3d:
        angles3 = jnp.where(
            rot_on,
            jax.random.uniform(keys[20], (3,), minval=-rr, maxval=rr),
            jnp.zeros(3),
        )
        img = jax.lax.cond(
            need_resample,
            lambda x: _rotate_scale_3d(x, angles3, scale, out_spatial),
            lambda x: _center_crop_spatial(x, out_spatial),
            img,
        )
    else:
        out_hw = out_spatial[-2:]

        def resample(x):
            # z carries no spatial transform: crop it first, then sample the
            # final (Y, X) grid from the (possibly enlarged) plane
            x = _center_crop_spatial(x, out_spatial[:-2] + x.shape[n_spatial - 2:n_spatial])
            return _rotate_scale_plane(x, angle, scale, out_hw)

        img = jax.lax.cond(
            need_resample,
            resample,
            lambda x: _center_crop_spatial(x, out_spatial),
            img,
        )

    # ---- mirror: each allowed spatial axis flips independently with p=0.5
    # (reference MirrorTransform; soft branch allows x only — axes (2,) 3D /
    # (1,) 2D, data_processing.py:411)
    if cfg.mirror:
        axes = cfg.mirror_axes if cfg.mirror_axes is not None else (n_spatial - 1,)
        flips = jax.random.uniform(keys[4], (len(axes),)) < 0.5
        for i, ax in enumerate(axes):
            img = jnp.where(flips[i], jnp.flip(img, axis=ax), img)

    # ---- gaussian noise
    if cfg.gaussian_noise:
        on = jax.random.uniform(keys[5]) < P_NOISE
        var = jax.random.uniform(keys[6], minval=0.0, maxval=0.1)
        noise = jax.random.normal(keys[7], img.shape) * jnp.sqrt(var)
        img = jnp.where(on, img + noise, img)

    # ---- elastic deformation (off by default, reference p_elastic_deform=0)
    if cfg.elastic:
        el_on = jax.random.uniform(keys[16]) < P_ELASTIC
        img = jax.lax.cond(
            el_on,
            lambda x: _elastic_plane(x, keys[17]),
            lambda x: x,
            img,
        )

    # ---- gaussian blur
    if cfg.gaussian_blur:
        on = jax.random.uniform(keys[8]) < P_BLUR
        sigma = jax.random.uniform(keys[9], minval=0.5, maxval=1.0)
        img = jnp.where(on, _blur5(img, sigma), img)

    # ---- simulated low resolution
    if cfg.low_resolution:
        lr_on = jax.random.uniform(keys[18]) < P_LOWRES
        img = jax.lax.cond(
            lr_on,
            lambda x: _simulate_lowres(x, keys[19], cfg.dummy_2d),
            lambda x: x,
            img,
        )

    # ---- brightness (multiplicative, per channel)
    if cfg.brightness:
        on = jax.random.uniform(keys[10]) < P_BRIGHT
        mult = jax.random.uniform(
            keys[11], (C,), minval=cfg.bright_range[0], maxval=cfg.bright_range[1]
        )
        img = jnp.where(on, img * mult, img)

    # ---- contrast (range-preserving, per channel)
    if cfg.contrast:
        on = jax.random.uniform(keys[12]) < P_CONTRAST
        f = jax.random.uniform(
            keys[13], (C,), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
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
        g = jax.random.uniform(
            keys[15], (C,), minval=cfg.gamma_range[0], maxval=cfg.gamma_range[1]
        )
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

    return jnp.clip(img, 0.0, 1.0).astype(orig_dtype)  # final clamp (reference :595)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(batch: jax.Array, rng: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """Vmapped per-sample augmentation of a channels-last batch."""
    rngs = jax.random.split(rng, batch.shape[0])
    return jax.vmap(lambda x, r: _augment_one(x, r, cfg))(batch, rngs)
