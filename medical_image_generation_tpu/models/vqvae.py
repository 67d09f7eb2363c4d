"""VQ-VAE: vector-quantized autoencoder (the 'vq' latent-space option).

Capability match for MONAI's ``VQVAE`` as used by the reference
(train_autoencoder.py:26,50-55 with latent_space_type='vq', and the LDM's VQ
codebook-range normalization train_ldm.py:85-96): an encoder/decoder conv
cascade with an EMA-free straight-through vector quantizer.

Reuses the planner-driven strided Encoder/Decoder from autoencoder_kl so the
same anisotropy-aware geometry applies.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medical_image_generation_tpu.models.autoencoder_kl import Decoder, Encoder


class VectorQuantizer(nn.Module):
    """Straight-through VQ with codebook + commitment losses."""

    num_embeddings: int = 256
    embedding_dim: int = 8
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z) -> Tuple[jax.Array, jax.Array, jax.Array]:
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.num_embeddings),
            (self.num_embeddings, self.embedding_dim),
        )
        z32 = z.astype(jnp.float32)
        flat = z32.reshape(-1, self.embedding_dim)
        d2 = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        codes = jnp.argmin(d2, axis=1)
        quantized = codebook[codes].reshape(z32.shape)
        codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(z32)) ** 2)
        commit_loss = jnp.mean((jax.lax.stop_gradient(quantized) - z32) ** 2)
        vq_loss = codebook_loss + self.commitment_cost * commit_loss
        # straight-through estimator
        quantized = z32 + jax.lax.stop_gradient(quantized - z32)
        return quantized.astype(z.dtype), vq_loss, codes.reshape(z.shape[:-1])


class VQVAE(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    num_channels: Sequence[int] = (32, 64, 128, 128)
    num_res_blocks: Sequence[int] | int = 2
    norm_num_groups: int = 16
    attention_levels: Sequence[bool] = (False, False, False, False)
    downsample_parameters: Sequence = ()
    upsample_parameters: Sequence = ()
    num_embeddings: int = 256
    embedding_dim: int = 8
    use_checkpointing: bool = False
    remat_policy: str = "acts"  # see AutoencoderKL.remat_policy
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(params: dict, dtype=jnp.bfloat16) -> "VQVAE":
        from medical_image_generation_tpu.models.packed_encoder import (
            validate_remat_policy,
        )

        validate_remat_policy(params.get("remat_policy", "acts"))
        n_levels = len(params["num_channels"])
        nrb = params.get("num_res_blocks", params.get("num_res_layers", 2))
        return VQVAE(
            spatial_dims=params["spatial_dims"],
            in_channels=params["in_channels"],
            out_channels=params["out_channels"],
            num_channels=tuple(params["num_channels"]),
            num_res_blocks=tuple(nrb) if isinstance(nrb, (list, tuple)) else (nrb,) * n_levels,
            norm_num_groups=params.get("norm_num_groups", 16),
            attention_levels=tuple(
                params.get("attention_levels", [False] * n_levels)
            ),
            downsample_parameters=tuple(
                tuple(tuple(x) for x in layer) for layer in params["downsample_parameters"]
            ),
            upsample_parameters=tuple(
                tuple(tuple(x) for x in layer) for layer in params["upsample_parameters"]
            ),
            num_embeddings=params.get("num_embeddings", 256),
            embedding_dim=params.get("embedding_dim", 8),
            use_checkpointing=params.get("use_checkpointing", False),
            remat_policy=params.get("remat_policy", "acts"),
            dtype=dtype,
        )

    def setup(self):
        nrb = self.num_res_blocks
        nrb = tuple(nrb) if isinstance(nrb, (list, tuple)) else (nrb,) * len(self.num_channels)
        self.encoder = Encoder(
            spatial_dims=self.spatial_dims,
            num_channels=self.num_channels,
            out_channels=self.embedding_dim,
            num_res_blocks=nrb,
            norm_num_groups=self.norm_num_groups,
            attention_levels=self.attention_levels,
            downsample_parameters=self.downsample_parameters,
            use_checkpointing=self.use_checkpointing,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            spatial_dims=self.spatial_dims,
            num_channels=self.num_channels,
            out_channels=self.out_channels,
            num_res_blocks=nrb,
            norm_num_groups=self.norm_num_groups,
            attention_levels=self.attention_levels,
            upsample_parameters=self.upsample_parameters,
            use_checkpointing=self.use_checkpointing,
            dtype=self.dtype,
        )
        self.quantizer = VectorQuantizer(self.num_embeddings, self.embedding_dim)

    def encode(self, x) -> jax.Array:
        from medical_image_generation_tpu.models import packed_encoder as pe

        # lane-packed execution when the geometry qualifies (see
        # models/packed_encoder.py; identical math, tested)
        return pe.module_encoder_features(self, x, with_nonlocal_attn=False)

    def quantize(self, z):
        return self.quantizer(z)

    def decode(self, zq) -> jax.Array:
        from medical_image_generation_tpu.models import packed_encoder as pe

        return pe.module_decoder_features(
            self, zq, with_nonlocal_attn=False
        ).astype(jnp.float32)

    def __call__(self, x):
        z = self.encode(x)
        zq, vq_loss, _ = self.quantize(z)
        recon = self.decode(zq)
        return recon, vq_loss

    def encode_stage_2_inputs(self, x) -> jax.Array:
        return self.encode(x)

    def decode_stage_2_outputs(self, z) -> jax.Array:
        zq, _, _ = self.quantize(z)
        return self.decode(zq)
