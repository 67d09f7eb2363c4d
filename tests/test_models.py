import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.models import (
    AutoencoderKL,
    DiffusionUNet,
    PatchDiscriminator,
    VQVAE,
)
from medical_image_generation_tpu.models.discriminator import least_squares_gan_loss
from medical_image_generation_tpu.planning.planner import (
    compute_downsample_parameters,
    compute_output_size,
    create_autoencoder_dict,
    create_ddpm_dict,
)


def small_dataset_config():
    return {
        "median_shape": (16, 48, 48),
        "min_shape": (12, 40, 40),
        "max_shape": (20, 56, 56),
    }


def small_vae_params(spatial_dims):
    p = create_autoencoder_dict(small_dataset_config(), [0], spatial_dims)
    # shrink for test speed
    p["num_channels"] = [8, 16][: len(p["num_channels"])]
    p["norm_num_groups"] = 4
    p["latent_channels"] = 4
    p["num_res_blocks"] = 1
    p["use_checkpointing"] = False
    return p


def small_ddpm_params(spatial_dims):
    p = create_ddpm_dict(small_dataset_config(), spatial_dims)
    p["num_channels"] = [8, 16, 16]
    p["num_head_channels"] = [0, 8, 8]
    p["norm_num_groups"] = 4
    p["num_res_blocks"] = 1
    p["in_channels"] = 4
    p["out_channels"] = 4
    p["use_checkpointing"] = False
    return p


class TestAutoencoderKL:
    @pytest.mark.parametrize("spatial_dims", [2, 3])
    def test_roundtrip_shapes(self, spatial_dims):
        params = small_vae_params(spatial_dims)
        model = AutoencoderKL.from_config(params, dtype=jnp.float32)
        patch = (16, 16) if spatial_dims == 2 else (8, 16, 16)
        x = jnp.ones((2, *patch, 1))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, x, rng)
        recon, mu, sigma = model.apply(variables, x, rng)
        assert recon.shape == x.shape
        latent = compute_output_size(list(patch), params["downsample_parameters"])
        assert mu.shape == (2, *latent, params["latent_channels"])
        assert sigma.shape == mu.shape
        assert np.all(np.isfinite(np.asarray(recon)))

    def test_anisotropic_strides_preserve_thin_axis(self):
        # 3D anisotropic: thin z axis must not be downsampled at level 1
        cfg = {"median_shape": (16, 96, 96), "min_shape": (16, 96, 96), "max_shape": (16, 96, 96)}
        params = create_autoencoder_dict(cfg, [0], 3)
        down = params["downsample_parameters"]
        assert down[1][0] == [1, 2, 2]  # stride: z untouched
        params["num_channels"] = [8, 16]
        params["norm_num_groups"] = 4
        params["latent_channels"] = 4
        params["num_res_blocks"] = 1
        params["use_checkpointing"] = False
        model = AutoencoderKL.from_config(params, dtype=jnp.float32)
        x = jnp.ones((1, 16, 96, 96, 1))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, x, rng)
        mu, _ = model.apply(variables, x, method=model.encode)
        assert mu.shape == (1, 16, 48, 48, 4)

    def test_encode_stage2_stochastic(self):
        params = small_vae_params(2)
        model = AutoencoderKL.from_config(params, dtype=jnp.float32)
        x = jnp.linspace(0, 1, 2 * 16 * 16).reshape(2, 16, 16, 1)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, x, rng)
        z1 = model.apply(variables, x, jax.random.PRNGKey(1), method=model.encode_stage_2_inputs)
        z2 = model.apply(variables, x, jax.random.PRNGKey(2), method=model.encode_stage_2_inputs)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))


class TestVQVAE:
    def test_roundtrip_and_vq_loss(self):
        params = small_vae_params(2)
        params["num_embeddings"] = 32
        params["embedding_dim"] = params.pop("latent_channels")
        model = VQVAE.from_config(params, dtype=jnp.float32)
        x = jnp.ones((2, 16, 16, 1)) * 0.5
        variables = model.init(jax.random.PRNGKey(0), x)
        recon, vq_loss = model.apply(variables, x)
        assert recon.shape == x.shape
        assert np.isfinite(float(vq_loss))

    def test_straight_through_gradients_flow(self):
        params = small_vae_params(2)
        params["embedding_dim"] = params.pop("latent_channels")
        model = VQVAE.from_config(params, dtype=jnp.float32)
        x = jnp.ones((1, 16, 16, 1)) * 0.3
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(v):
            recon, vq = model.apply(v, x)
            return jnp.mean((recon - x) ** 2) + vq

        grads = jax.grad(loss_fn)(variables)
        leaves = jax.tree_util.tree_leaves(grads)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


class TestDiffusionUNet:
    @pytest.mark.parametrize("spatial_dims", [2, 3])
    def test_output_shape(self, spatial_dims):
        params = small_ddpm_params(spatial_dims)
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        latent = (16, 16) if spatial_dims == 2 else (8, 16, 16)
        x = jnp.ones((2, *latent, 4))
        t = jnp.array([0, 500])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == x.shape
        # zero-init output conv => output is exactly zero at init
        assert np.allclose(np.asarray(out), 0.0)

    def test_timestep_affects_output(self):
        params = small_ddpm_params(2)
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
        variables = model.init(jax.random.PRNGKey(0), x, jnp.array([0]))
        # perturb away from zero-init output conv so timestep influence is visible
        variables = jax.tree_util.tree_map(
            lambda p: p + 0.01 * np.random.default_rng(0).normal(size=p.shape).astype(p.dtype),
            variables,
        )
        out1 = model.apply(variables, x, jnp.array([0]))
        out2 = model.apply(variables, x, jnp.array([999]))
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    @pytest.mark.parametrize("spatial_dims", [2, 3])
    def test_split_skip_matches_concat(self, spatial_dims, monkeypatch):
        """The virtual-concat up path (ResBlock pair execution) must match
        the materialized-concat form in values AND grads — including the
        group-straddling channel combos (e.g. 8+16 with 4 groups: group
        size 6 straddles the part boundary)."""
        params = small_ddpm_params(spatial_dims)
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        latent = (16, 16) if spatial_dims == 2 else (8, 16, 16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, *latent, 4))
        t = jnp.array([7, 500])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        # perturb away from zero-init so the output is non-trivial
        variables = jax.tree_util.tree_map(
            lambda p: p + 0.01 * np.random.default_rng(0).normal(size=p.shape).astype(p.dtype),
            variables,
        )

        def loss(v, xx):
            return jnp.sum(jnp.square(model.apply(v, xx, t)))

        out_split = model.apply(variables, x, t)
        g_split = jax.grad(loss, argnums=(0, 1))(variables, x)
        monkeypatch.setenv("MEDIMGEN_DISABLE_SPLIT_SKIP", "1")
        out_cat = model.apply(variables, x, t)
        g_cat = jax.grad(loss, argnums=(0, 1))(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_split), np.asarray(out_cat), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(jax.tree_util.tree_leaves(g_split), jax.tree_util.tree_leaves(g_cat)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_class_conditioning(self):
        params = small_ddpm_params(2)
        params["num_class_embeds"] = 3
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        x = jnp.ones((2, 16, 16, 4))
        t = jnp.array([10, 10])
        labels = jnp.array([0, 2])
        variables = model.init(jax.random.PRNGKey(0), x, t, None, labels)
        out = model.apply(variables, x, t, None, labels)
        assert out.shape == x.shape

    def test_cross_attention_conditioning(self):
        params = small_ddpm_params(2)
        params["with_conditioning"] = True
        params["cross_attention_dim"] = 8
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        x = jnp.ones((2, 16, 16, 4))
        t = jnp.array([10, 10])
        ctx = jnp.ones((2, 5, 8))
        variables = model.init(jax.random.PRNGKey(0), x, t, ctx)
        out = model.apply(variables, x, t, ctx)
        assert out.shape == x.shape

    def test_anisotropic_latent_grid(self):
        cfg = {"median_shape": (16, 96, 96), "min_shape": (16, 96, 96), "max_shape": (16, 96, 96)}
        params = create_ddpm_dict(cfg, 3)
        params["num_channels"] = [8, 16, 16]
        params["num_head_channels"] = [0, 8, 8]
        params["norm_num_groups"] = 4
        params["num_res_blocks"] = 1
        params["in_channels"] = 4
        params["out_channels"] = 4
        params["use_checkpointing"] = False
        # latent after 1 VAE downsample of (16,96,96) -> (16,48,48)
        model = DiffusionUNet.from_config(params, dtype=jnp.float32)
        x = jnp.ones((1, 16, 48, 48, 4))
        t = jnp.array([100])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(variables, x, t)
        assert out.shape == x.shape


class TestDiscriminator:
    @pytest.mark.parametrize("spatial_dims", [2, 3])
    def test_patch_logits(self, spatial_dims):
        model = PatchDiscriminator(
            spatial_dims=spatial_dims, in_channels=1, num_channels=8,
            num_layers_d=3, dtype=jnp.float32,
        )
        shape = (2, 32, 32, 1) if spatial_dims == 2 else (2, 16, 32, 32, 1)
        x = jnp.ones(shape)
        variables = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(variables, x)
        assert logits.shape[0] == 2 and logits.shape[-1] == 1
        assert logits.ndim == x.ndim
        # patch map is spatially smaller
        assert logits.shape[1] < x.shape[1]

    def test_lsgan_losses(self):
        fake = jnp.zeros((2, 4, 4, 1))
        real = jnp.ones((2, 4, 4, 1))
        g = least_squares_gan_loss(logits_fake=fake)
        assert g == pytest.approx(1.0)
        d = least_squares_gan_loss(logits_real=real, logits_fake=fake)
        assert d == pytest.approx(0.0)


class TestDiffusionEncoder:
    def test_classifier_logits(self):
        from medical_image_generation_tpu.models.diffusion_unet import DiffusionEncoder

        model = DiffusionEncoder(
            spatial_dims=2, in_channels=1, num_classes=3,
            num_channels=(8, 16, 16), attention_levels=(False, False, True),
            num_head_channels=(0, 0, 8), num_res_blocks=1, norm_num_groups=4,
            strides=((1, 1), (2, 2), (2, 2)),
            kernel_sizes=((3, 3), (3, 3), (3, 3)),
            paddings=((1, 1), (1, 1), (1, 1)),
        )
        x = jnp.ones((2, 32, 32, 1))
        t = jnp.array([10, 500])
        variables = model.init(jax.random.PRNGKey(0), x, t)
        logits = model.apply(variables, x, t)
        assert logits.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestThirdNormalization:
    def test_zscore_clip_minmax(self):
        from medical_image_generation_tpu.planning.preprocess import (
            normalize_zscore_then_clip_then_minmax,
        )

        rng = np.random.default_rng(0)
        img = rng.normal(5, 2, size=(1, 4, 16, 16)).astype(np.float32)
        img[0, 0, 0, 0] = 1000.0  # outlier clipped away
        out, mm = normalize_zscore_then_clip_then_minmax(img)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert mm[0][1] == pytest.approx(1000.0)
        # outlier no longer dominates: most mass not squeezed near zero
        assert np.mean(out > 0.2) > 0.3


class TestFusedUpsample:
    """blocks.Upsample executes nearest-up + 3^d conv as ONE transposed conv
    (upsample_transposed); pin exact equivalence to the two-step form."""

    @pytest.mark.parametrize("stride", [(2, 2), (1, 2)])
    def test_2d_matches_two_step(self, stride):
        from medical_image_generation_tpu.models.blocks import ConvND, Upsample

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 5, 8), jnp.float32)
        up = Upsample(stride, 3, 1, spatial_dims=2, dtype=jnp.float32)
        variables = up.init(jax.random.PRNGKey(1), x)
        got = up.apply(variables, x)

        # reference: explicit nearest repeat + SAME conv with the same params
        h = np.asarray(x)
        for ax, s in enumerate(stride):
            h = np.repeat(h, s, axis=ax + 1)
        conv = ConvND(x.shape[-1], 3, 1, 1, spatial_dims=2, dtype=jnp.float32)
        want = conv.apply({"params": variables["params"]["ConvND_0"]}, jnp.asarray(h))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_3d_matches_two_step(self):
        from medical_image_generation_tpu.models.blocks import ConvND, Upsample

        stride = (2, 2, 1)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 5, 6, 4), jnp.float32)
        up = Upsample(stride, 3, 1, spatial_dims=3, dtype=jnp.float32)
        variables = up.init(jax.random.PRNGKey(3), x)
        got = up.apply(variables, x)
        h = np.asarray(x)
        for ax, s in enumerate(stride):
            h = np.repeat(h, s, axis=ax + 1)
        conv = ConvND(x.shape[-1], 3, 1, 1, spatial_dims=3, dtype=jnp.float32)
        want = conv.apply({"params": variables["params"]["ConvND_0"]}, jnp.asarray(h))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_gradients_flow_to_kernel(self):
        from medical_image_generation_tpu.models.blocks import Upsample

        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 4), jnp.float32)
        up = Upsample((2, 2), 3, 1, spatial_dims=2, dtype=jnp.float32)
        variables = up.init(jax.random.PRNGKey(5), x)

        def loss(params):
            return jnp.sum(up.apply({"params": params}, x) ** 2)

        g = jax.grad(loss)(variables["params"])
        k = g["ConvND_0"]["Conv_0"]["kernel"]
        assert float(jnp.abs(k).max()) > 0
