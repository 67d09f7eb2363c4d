"""Perceptual (feature-space) reconstruction loss.

Capability match for MONAI's ``PerceptualLoss(network_type='vgg')`` used by
the reference generator objective (train_autoencoder.py:27,41,601, weights
configuration.py:1018-1019), including the 3D "fake-3D" mode that scores a
random fraction of 2D slices along each axis (perceptual_params
configuration.py:962-964: is_fake_3d, fake_3d_ratio=0.2).

Offline-weights design: this image has no network egress, so pretrained VGG/
LPIPS weights cannot be fetched (the reference downloads them via lpips/
torch.hub at runtime). The extractor is a VGG16-topology conv stack with
*fixed, seed-deterministic He-initialized* filters — random-feature
perceptual distances are a documented, effective proxy (they capture local
texture/structure statistics); when a converted weights file is supplied via
``MEDIMGEN_VGG_WEIGHTS`` (a .npz of the conv kernels), it is loaded instead
and the loss becomes true LPIPS-style VGG distance.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (features, n_convs) per stage; relu outputs of the last
# conv in each stage are the comparison features.
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGGFeatures(nn.Module):
    """VGG16-topology 2D feature pyramid (channels-last). ``plan`` overrides
    the stage layout — smaller plans trade perceptual-feature depth for
    compile time and step cost (used e.g. by the multi-chip dryrun, where
    the full 512-channel stack dominates the CPU compile budget)."""

    dtype: jnp.dtype = jnp.float32
    plan: Tuple[Tuple[int, int], ...] = _VGG_PLAN

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        feats = []
        h = x.astype(self.dtype)
        for stage, (ch, n_convs) in enumerate(self.plan):
            for i in range(n_convs):
                h = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{stage}_{i}",
                )(h)
                h = nn.relu(h)
            feats.append(h)
            if stage < len(self.plan) - 1:
                if min(h.shape[1:3]) < 2:
                    # small/rectangular inputs (fake-3D slice stacks) exhaust
                    # the pyramid early; pooling a size-1 axis would emit
                    # empty tensors
                    break
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return tuple(feats)


def _normalize_feat(f):
    return f * jax.lax.rsqrt(jnp.sum(f**2, axis=-1, keepdims=True) + 1e-10)


def _expand_to_rgb(x):
    """Replicate 1..N channel medical images to 3 channels."""
    c = x.shape[-1]
    if c == 3:
        return x
    if c == 1:
        return jnp.repeat(x, 3, axis=-1)
    return jnp.repeat(jnp.mean(x, axis=-1, keepdims=True), 3, axis=-1)


class PerceptualLoss:
    """Stateless perceptual loss wrapper; params are created once and frozen."""

    def __init__(
        self,
        spatial_dims: int = 2,
        network_type: str = "vgg",
        is_fake_3d: bool = True,
        fake_3d_ratio: float = 0.2,
        seed: int = 0,
        dtype=jnp.bfloat16,
        feature_plan=None,
    ):
        assert network_type in ("vgg",), "only vgg-topology features supported"
        self.spatial_dims = spatial_dims
        self.is_fake_3d = is_fake_3d
        self.fake_3d_ratio = fake_3d_ratio
        self.plan = (
            tuple(tuple(s) for s in feature_plan) if feature_plan else _VGG_PLAN
        )
        self.module = VGGFeatures(dtype=dtype, plan=self.plan)
        dummy = jnp.zeros((1, 32, 32, 3))
        self.params = self.module.init(jax.random.PRNGKey(seed), dummy)

        weights_path = os.environ.get("MEDIMGEN_VGG_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.params = self._load_npz_weights(weights_path)

    @staticmethod
    def from_config(params: dict, dtype=jnp.bfloat16) -> "PerceptualLoss":
        return PerceptualLoss(
            spatial_dims=params.get("spatial_dims", 2),
            network_type=params.get("network_type", "vgg"),
            is_fake_3d=params.get("is_fake_3d", False),
            fake_3d_ratio=params.get("fake_3d_ratio", 0.2),
            dtype=dtype,
            feature_plan=params.get("feature_plan"),
        )

    def _load_npz_weights(self, path: str):
        data = np.load(path)
        params = jax.tree_util.tree_map(lambda x: x, self.params)  # copy
        flat = dict(params["params"])
        for stage in range(len(self.plan)):
            for i in range(self.plan[stage][1]):
                name = f"conv{stage}_{i}"
                if f"{name}.kernel" in data:
                    flat[name] = {
                        "kernel": jnp.asarray(data[f"{name}.kernel"]),
                        "bias": jnp.asarray(data[f"{name}.bias"]),
                    }
        return {"params": flat}

    def _loss_2d(self, pred, target):
        """LPIPS-style: channel-normalized feature L2 per stage, averaged."""
        pf = self.module.apply(self.params, _expand_to_rgb(pred))
        tf = self.module.apply(self.params, _expand_to_rgb(target))
        total = 0.0
        for a, b in zip(pf, tf):
            total = total + jnp.mean(
                (jnp.asarray(_normalize_feat(a.astype(jnp.float32)))
                 - _normalize_feat(b.astype(jnp.float32))) ** 2
            )
        return total / len(pf)

    def _slices_along(self, x, axis, n_slices):
        """Deterministic strided slice subset along a spatial axis; returns a
        2D batch (B*n, H, W, C)."""
        # spatial axes are 1..3 for (B, Z, Y, X, C)
        size = x.shape[axis]
        idx = jnp.linspace(0, size - 1, n_slices).astype(jnp.int32)
        taken = jnp.take(x, idx, axis=axis)
        # move sliced axis next to batch and fold
        taken = jnp.moveaxis(taken, axis, 1)
        shape = taken.shape
        return taken.reshape(shape[0] * shape[1], *shape[2:])

    def __call__(self, pred, target):
        """pred/target: (B, Y, X, C) 2D or (B, Z, Y, X, C) 3D, in [0, 1]."""
        if self.spatial_dims == 2 or pred.ndim == 4:
            return self._loss_2d(pred, target)
        # fake-3D: a fraction of slices along each spatial axis
        total = 0.0
        for axis in (1, 2, 3):
            n = max(1, int(pred.shape[axis] * self.fake_3d_ratio))
            p2 = self._slices_along(pred, axis, n)
            t2 = self._slices_along(target, axis, n)
            total = total + self._loss_2d(p2, t2)
        return total / 3.0
