"""PatchGAN discriminator for adversarial autoencoder training.

Capability match for MONAI's ``PatchDiscriminator`` as used by the reference
(train_autoencoder.py:26,600: spatial_dims, in/out channels, num_channels=64,
num_layers_d=3): a conv stack with stride-2 layers, instance-style
normalization, LeakyReLU, and a 1-channel patch logit map output.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from medical_image_generation_tpu.models.blocks import ConvND, GroupNorm


class PatchDiscriminator(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    num_channels: int = 64
    num_layers_d: int = 3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(params: dict, dtype=jnp.bfloat16) -> "PatchDiscriminator":
        return PatchDiscriminator(
            spatial_dims=params["spatial_dims"],
            in_channels=params["in_channels"],
            out_channels=params["out_channels"],
            num_channels=params["num_channels"],
            num_layers_d=params["num_layers_d"],
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        sd = self.spatial_dims
        h = ConvND(self.num_channels, 4, 2, 1, sd, dtype=d)(x.astype(d))
        h = nn.leaky_relu(h, 0.2)
        ch = self.num_channels
        for i in range(1, self.num_layers_d):
            ch = min(ch * 2, 512)
            stride = 2 if i < self.num_layers_d - 1 else 1
            h = ConvND(ch, 4, stride, 1, sd, use_bias=False, dtype=d)(h)
            # instance norm == GroupNorm with one group per channel. The
            # folded blocks.GroupNorm (fp32 statistics, compute-dtype affine
            # apply) replaces flax nn.GroupNorm on an fp32-cast input, which
            # materialized full fp32 copies of the (B, *vol, C) activation —
            # same params/names, so checkpoints are interchangeable.
            h = GroupNorm(num_groups=h.shape[-1], dtype=d)(h)
            h = nn.leaky_relu(h, 0.2)
        logits = ConvND(self.out_channels, 4, 1, 1, sd, dtype=d)(h)
        return logits.astype(jnp.float32)


def least_squares_gan_loss(logits_real=None, logits_fake=None):
    """LSGAN objectives (MONAI PatchAdversarialLoss(least_squares), reference
    train_autoencoder.py:27,371-436).

    Generator loss: mean((D(fake) - 1)^2).
    Discriminator loss: 0.5 * [mean((D(real) - 1)^2) + mean(D(fake)^2)].
    """
    if logits_fake is not None and logits_real is None:
        return jnp.mean((logits_fake - 1.0) ** 2)
    loss_real = jnp.mean((logits_real - 1.0) ** 2)
    loss_fake = jnp.mean(logits_fake**2)
    return 0.5 * (loss_real + loss_fake)
