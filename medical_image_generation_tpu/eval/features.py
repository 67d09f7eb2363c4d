"""Feature extractors for FID evaluation.

The reference downloads RadImageNet-ResNet50 (2D) / MedicalNet-ResNet50 (3D)
from torch.hub at eval time (train_ldm.py:271-273) — impossible in this
zero-egress image. Capability-preserving design:

* a Flax ResNet50-topology extractor (2D or 3D) with deterministic random
  initialization — FID over fixed random projections/features is a valid
  *relative* metric (comparable across checkpoints of the same run);
* when converted pretrained weights are provided via
  ``MEDIMGEN_FID_WEIGHTS_{2D,3D}`` (.npz from
  tools/convert_torch_weights.py), the extractor is rebuilt with the
  reference networks' EXACT inference architecture — frozen BatchNorm
  affines and, for 3D, MedicalNet's dilated layer3/layer4 — so the metric
  matches the reference protocol (RadImageNet/MedicalNet features, incl.
  their preprocessing: BGR + mean subtraction 2D, intensity normalization
  3D — train_ldm.py:242-263).
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medical_image_generation_tpu.models.blocks import ConvND

# (features, blocks, stride, dilation) per ResNet50 stage.
# torchvision / RadImageNet: strides (1, 2, 2, 2), no dilation.
# MedicalNet (3D segmentation backbone, shortcut 'B'): layer3/4 keep
# stride 1 and dilate 2 / 4 instead.
RESNET50_STAGES = ((64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 2, 1), (512, 3, 2, 1))
MEDICALNET_STAGES = ((64, 3, 1, 1), (128, 4, 2, 1), (256, 6, 1, 2), (512, 3, 1, 4))


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: a per-channel affine folded from pretrained
    (scale, bias, running mean, running var) — torch BN eval semantics."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        return x.astype(self.dtype) * mul.astype(self.dtype) + add.astype(self.dtype)


class _Bottleneck(nn.Module):
    """ResNet50 bottleneck. ``frozen_bn=False`` (random-feature mode) uses
    per-channel instance norm; ``frozen_bn=True`` reproduces the torchvision
    block exactly (bn after every conv incl. the projection shortcut)."""

    features: int
    stride: int = 1
    dilation: int = 1
    spatial_dims: int = 2
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def _norm(self, h, features):
        if self.frozen_bn:
            return FrozenBatchNorm(features, dtype=self.dtype)(h)
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=jnp.float32)(
            h.astype(jnp.float32)
        ).astype(self.dtype)

    @nn.compact
    def __call__(self, x):
        sd = self.spatial_dims
        residual = x
        h = ConvND(self.features, 1, 1, 0, sd, use_bias=not self.frozen_bn,
                   dtype=self.dtype)(x)
        h = self._norm(h, self.features)
        h = nn.relu(h)
        h = ConvND(self.features, 3, self.stride, self.dilation, sd,
                   use_bias=not self.frozen_bn, kernel_dilation=self.dilation,
                   dtype=self.dtype)(h)
        h = self._norm(h, self.features)
        h = nn.relu(h)
        h = ConvND(self.features * 4, 1, 1, 0, sd, use_bias=not self.frozen_bn,
                   dtype=self.dtype)(h)
        if self.frozen_bn:
            h = self._norm(h, self.features * 4)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = ConvND(self.features * 4, 1, self.stride, 0, sd,
                              use_bias=not self.frozen_bn, dtype=self.dtype)(x)
            if self.frozen_bn:
                residual = self._norm(residual, self.features * 4)
        return nn.relu(h + residual)


class ResNet50Features(nn.Module):
    """ResNet50-topology global-pooled features (2048-d).

    ``stages`` selects the torchvision (RadImageNet) or MedicalNet geometry;
    ``frozen_bn`` the pretrained-exact normalization."""

    spatial_dims: int = 2
    stages: tuple = RESNET50_STAGES
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        sd = self.spatial_dims
        h = ConvND(64, 7, 2, 3, sd, use_bias=not self.frozen_bn,
                   dtype=self.dtype)(x.astype(self.dtype))
        if self.frozen_bn:
            h = FrozenBatchNorm(64, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3,) * sd, strides=(2,) * sd, padding=((1, 1),) * sd)
        for features, blocks, stride, dilation in self.stages:
            for i in range(blocks):
                h = _Bottleneck(
                    features, stride if i == 0 else 1, dilation, sd,
                    self.frozen_bn, self.dtype,
                )(h)
        return jnp.mean(h, axis=tuple(range(1, h.ndim - 1))).astype(jnp.float32)


class FeatureExtractor:
    """Frozen feature extractor with optional pretrained weights.

    Without weights: deterministic random features (instance-norm blocks).
    With ``MEDIMGEN_FID_WEIGHTS_{2D,3D}`` set: the reference protocol's
    network — torchvision-exact frozen-BN ResNet50 (2D / RadImageNet) or
    MedicalNet's dilated variant (3D)."""

    def __init__(self, spatial_dims: int = 2, seed: int = 0, dtype=None):
        self.spatial_dims = spatial_dims
        env = f"MEDIMGEN_FID_WEIGHTS_{spatial_dims}D"
        path = os.environ.get(env)
        self.pretrained = bool(path and os.path.exists(path))

        if dtype is None:
            # pretrained mode matches the reference's fp32 torch inference;
            # random-feature mode only needs relative comparisons -> bf16
            dtype = jnp.float32 if self.pretrained else jnp.bfloat16
        stages = RESNET50_STAGES
        if self.pretrained and spatial_dims == 3:
            stages = MEDICALNET_STAGES
        self.module = ResNet50Features(
            spatial_dims=spatial_dims, stages=stages,
            frozen_bn=self.pretrained, dtype=dtype,
        )
        dummy_shape = (1,) + (32,) * spatial_dims + (3 if spatial_dims == 2 else 1,)
        self.params = self.module.init(jax.random.PRNGKey(seed), jnp.zeros(dummy_shape))

        if self.pretrained:
            self._load_npz(path)

        self._apply = jax.jit(lambda p, x: self.module.apply(p, x))

    def _load_npz(self, path: str):
        import flax.traverse_util as tu

        data = np.load(path)
        flat = tu.flatten_dict(self.params, sep="/")
        missing = [k for k in flat if k not in data]
        if missing:
            raise ValueError(
                f"{path} is missing {len(missing)} arrays (e.g. {missing[:3]}); "
                "convert with tools/convert_torch_weights.py resnet50"
            )
        for key in flat:
            flat[key] = jnp.asarray(data[key])
        self.params = tu.unflatten_dict(flat, sep="/")

    def preprocess_2d(self, images: jax.Array) -> jax.Array:
        """RadImageNet-style: grayscale -> 3ch, BGR order, mean subtraction
        (reference train_ldm.py:242-255). Multi-channel inputs (e.g. joint
        image+label, C=2) collapse to grayscale first — the extractor's conv
        stack is initialized for exactly 3 input channels."""
        if images.shape[-1] == 1:
            images = jnp.repeat(images, 3, axis=-1)
        elif images.shape[-1] != 3:
            images = jnp.repeat(jnp.mean(images, axis=-1, keepdims=True), 3, axis=-1)
        images = images[..., ::-1]  # RGB -> BGR
        mean = jnp.asarray([0.406, 0.456, 0.485])
        return images - mean

    def preprocess_3d(self, images: jax.Array) -> jax.Array:
        """MedicalNet-style per-volume z-score (train_ldm.py:257-263).
        Collapses C>1 volumes to one channel (the conv kernels expect C=1)."""
        if images.shape[-1] != 1:
            images = jnp.mean(images, axis=-1, keepdims=True)
        axes = tuple(range(1, images.ndim))
        mean = jnp.mean(images, axis=axes, keepdims=True)
        std = jnp.std(images, axis=axes, keepdims=True) + 1e-7
        return (images - mean) / std

    def __call__(self, images) -> np.ndarray:
        images = jnp.asarray(images)
        if self.spatial_dims == 2:
            images = self.preprocess_2d(images)
        else:
            images = self.preprocess_3d(images)
        return np.asarray(self._apply(self.params, images))
