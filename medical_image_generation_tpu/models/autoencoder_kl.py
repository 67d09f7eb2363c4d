"""KL-regularized autoencoder (KL-VAE) with per-level per-axis strides.

Flax re-design of the capability provided by the reference's vendored MONAI
fork (autoencoderkl_with_strides.py:326-838): an encoder/decoder conv cascade
whose downsampling geometry is fully parameterized per level *and* per axis
so anisotropic medical volumes keep their thin axis intact, a diagonal
Gaussian latent with clamped log-variance, and stage-2 encode/decode hooks
for latent diffusion.

TPU-first choices: channels-last layout, bf16 compute dtype with fp32 params
and fp32 GroupNorm, optional ``nn.remat`` activation checkpointing of res
blocks (replacing torch.utils.checkpoint at reference :761-762,815-816), and
flash attention for the nonlocal blocks.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medical_image_generation_tpu.models.blocks import (
    AttentionBlock,
    ConvND,
    Downsample,
    GroupNorm,
    ResBlock,
    Upsample,
)

LOGVAR_MIN, LOGVAR_MAX = -30.0, 20.0  # reference autoencoderkl_with_strides.py:768


class Encoder(nn.Module):
    spatial_dims: int
    num_channels: Sequence[int]
    out_channels: int
    num_res_blocks: Sequence[int]
    norm_num_groups: int
    attention_levels: Sequence[bool]
    downsample_parameters: Sequence[Sequence[Sequence[int]]]
    with_nonlocal_attn: bool = False
    use_checkpointing: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        sd = self.spatial_dims
        res = nn.remat(ResBlock) if self.use_checkpointing else ResBlock

        s0, k0, p0 = self.downsample_parameters[0]
        h = ConvND(self.num_channels[0], k0, s0, p0, sd, dtype=d)(x.astype(d))

        # explicit ResBlock_{i} names keep the checkpoint format invariant
        # under the remat flag (nn.remat renames the class otherwise)
        rb = 0
        for level, ch in enumerate(self.num_channels):
            for _ in range(self.num_res_blocks[level]):
                h = res(ch, self.norm_num_groups, 1e-6, sd, dtype=d,
                        name=f"ResBlock_{rb}")(h)
                rb += 1
                if self.attention_levels[level]:
                    h = AttentionBlock(-1, self.norm_num_groups, dtype=d)(h)
            if level != len(self.num_channels) - 1:
                s, k, p = self.downsample_parameters[level + 1]
                h = Downsample(s, k, p, sd, dtype=d)(h)

        if self.with_nonlocal_attn:
            ch = self.num_channels[-1]
            h = res(ch, self.norm_num_groups, 1e-6, sd, dtype=d,
                    name=f"ResBlock_{rb}")(h)
            h = AttentionBlock(-1, self.norm_num_groups, dtype=d)(h)
            h = res(ch, self.norm_num_groups, 1e-6, sd, dtype=d,
                    name=f"ResBlock_{rb + 1}")(h)

        h = GroupNorm(self.norm_num_groups, 1e-6, d)(h)
        h = ConvND(self.out_channels, 3, 1, 1, sd, dtype=d)(h)
        return h


class Decoder(nn.Module):
    spatial_dims: int
    num_channels: Sequence[int]  # same order as encoder; reversed internally
    out_channels: int
    num_res_blocks: Sequence[int]
    norm_num_groups: int
    attention_levels: Sequence[bool]
    upsample_parameters: Sequence[Sequence[Sequence[int]]]
    with_nonlocal_attn: bool = False
    use_convtranspose: bool = False
    use_checkpointing: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        d = self.dtype
        sd = self.spatial_dims
        res = nn.remat(ResBlock) if self.use_checkpointing else ResBlock

        channels = list(reversed(self.num_channels))
        attn = list(reversed(self.attention_levels))
        res_blocks = list(reversed(self.num_res_blocks))

        h = ConvND(channels[0], 3, 1, 1, sd, dtype=d)(z.astype(d))

        rb = 0
        if self.with_nonlocal_attn:
            h = res(channels[0], self.norm_num_groups, 1e-6, sd, dtype=d,
                    name=f"ResBlock_{rb}")(h)
            h = AttentionBlock(-1, self.norm_num_groups, dtype=d)(h)
            h = res(channels[0], self.norm_num_groups, 1e-6, sd, dtype=d,
                    name=f"ResBlock_{rb + 1}")(h)
            rb += 2

        for level, ch in enumerate(channels):
            for _ in range(res_blocks[level]):
                h = res(ch, self.norm_num_groups, 1e-6, sd, dtype=d,
                        name=f"ResBlock_{rb}")(h)
                rb += 1
                if attn[level]:
                    h = AttentionBlock(-1, self.norm_num_groups, dtype=d)(h)
            if level != len(channels) - 1:
                s, k, p = self.upsample_parameters[level]
                h = Upsample(s, k, p, sd, self.use_convtranspose, dtype=d)(h)

        h = GroupNorm(self.norm_num_groups, 1e-6, d)(h)
        h = ConvND(self.out_channels, 3, 1, 1, sd, dtype=d)(h)
        return h


class AutoencoderKL(nn.Module):
    """KL-VAE. Construct with the planner's ``vae_params`` dict via
    ``AutoencoderKL.from_config``.

    Methods mirror the reference surface (autoencoderkl_with_strides.py:753-838):
    ``encode`` -> (mu, sigma), ``sampling`` reparameterization, ``decode``,
    ``encode_stage_2_inputs`` / ``decode_stage_2_outputs`` for the LDM.
    """

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    num_channels: Sequence[int] = (32, 64, 128, 128)
    latent_channels: int = 8
    num_res_blocks: Sequence[int] | int = 2
    norm_num_groups: int = 16
    attention_levels: Sequence[bool] = (False, False, False, False)
    downsample_parameters: Sequence = ()
    upsample_parameters: Sequence = ()
    with_encoder_nonlocal_attn: bool = False
    with_decoder_nonlocal_attn: bool = False
    use_convtranspose: bool = False
    use_checkpointing: bool = False
    # rematerialization granularity for the packed execution path when
    # use_checkpointing is on: "acts" saves each ResBlock's inner activations
    # (no conv recompute in the backward), "full" saves only block inputs.
    # The planner's memory ladder (planning/memory.py) picks the lightest
    # setting that fits HBM.
    remat_policy: str = "acts"
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(params: dict, dtype=jnp.bfloat16) -> "AutoencoderKL":
        """Build from a planner vae_params dict (planning/planner.py)."""
        from medical_image_generation_tpu.models.packed_encoder import (
            validate_remat_policy,
        )

        validate_remat_policy(params.get("remat_policy", "acts"))
        n_levels = len(params["num_channels"])
        nrb = params.get("num_res_blocks", 2)
        return AutoencoderKL(
            spatial_dims=params["spatial_dims"],
            in_channels=params["in_channels"],
            out_channels=params["out_channels"],
            num_channels=tuple(params["num_channels"]),
            latent_channels=params["latent_channels"],
            num_res_blocks=tuple(nrb) if isinstance(nrb, (list, tuple)) else (nrb,) * n_levels,
            norm_num_groups=params["norm_num_groups"],
            attention_levels=tuple(params["attention_levels"]),
            downsample_parameters=tuple(
                tuple(tuple(x) for x in layer) for layer in params["downsample_parameters"]
            ),
            upsample_parameters=tuple(
                tuple(tuple(x) for x in layer) for layer in params["upsample_parameters"]
            ),
            with_encoder_nonlocal_attn=params.get("with_encoder_nonlocal_attn", False),
            with_decoder_nonlocal_attn=params.get("with_decoder_nonlocal_attn", False),
            use_convtranspose=params.get("use_convtranspose", False),
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
            out_channels=self.latent_channels,
            num_res_blocks=nrb,
            norm_num_groups=self.norm_num_groups,
            attention_levels=self.attention_levels,
            downsample_parameters=self.downsample_parameters,
            with_nonlocal_attn=self.with_encoder_nonlocal_attn,
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
            with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            use_convtranspose=self.use_convtranspose,
            use_checkpointing=self.use_checkpointing,
            dtype=self.dtype,
        )
        self.quant_conv_mu = ConvND(
            self.latent_channels, 1, 1, 0, self.spatial_dims, dtype=self.dtype
        )
        self.quant_conv_log_sigma = ConvND(
            self.latent_channels, 1, 1, 0, self.spatial_dims, dtype=self.dtype
        )
        self.post_quant_conv = ConvND(
            self.latent_channels, 1, 1, 0, self.spatial_dims, dtype=self.dtype
        )

    def _encoder_features(self, x) -> jax.Array:
        """Encoder forward, via the lane-packed execution path when the
        geometry qualifies (models/packed_encoder.py: identical math, 128-lane
        tensors end-to-end — the module path lane-pads the 32-channel level-0
        4x on TPU). Falls back to the Encoder module during init or for
        geometries the packed path doesn't cover."""
        from medical_image_generation_tpu.models import packed_encoder as pe

        return pe.module_encoder_features(
            self, x, with_nonlocal_attn=self.with_encoder_nonlocal_attn
        )

    def encode(self, x) -> Tuple[jax.Array, jax.Array]:
        h = self._encoder_features(x)
        mu = self.quant_conv_mu(h).astype(jnp.float32)
        log_var = self.quant_conv_log_sigma(h).astype(jnp.float32)
        log_var = jnp.clip(log_var, LOGVAR_MIN, LOGVAR_MAX)
        sigma = jnp.exp(0.5 * log_var)
        return mu, sigma

    def sampling(self, mu, sigma, rng) -> jax.Array:
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        return mu + sigma * eps

    def _decoder_features(self, z) -> jax.Array:
        """Decoder forward via the lane-packed path when viable (the decoder
        tail is the 32-channel level at full resolution — the same 4x lane
        padding the packed encoder removes)."""
        from medical_image_generation_tpu.models import packed_encoder as pe

        return pe.module_decoder_features(
            self, z, with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            use_convtranspose=self.use_convtranspose,
        )

    def decode(self, z) -> jax.Array:
        z = self.post_quant_conv(z.astype(self.dtype))
        return self._decoder_features(z).astype(jnp.float32)

    def __call__(self, x, rng):
        mu, sigma = self.encode(x)
        z = self.sampling(mu, sigma, rng)
        recon = self.decode(z)
        return recon, mu, sigma

    def reconstruct(self, x) -> jax.Array:
        mu, _ = self.encode(x)
        return self.decode(mu)

    def encode_stage_2_inputs(self, x, rng) -> jax.Array:
        """Stochastic stage-2 encode (samples the posterior), matching the
        reference's LDM input path (autoencoderkl_with_strides.py:827-830)."""
        mu, sigma = self.encode(x)
        return self.sampling(mu, sigma, rng)

    def decode_stage_2_outputs(self, z) -> jax.Array:
        return self.decode(z)
