import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.eval.fid import fid_from_features, frechet_distance
from medical_image_generation_tpu.eval.features import FeatureExtractor
from medical_image_generation_tpu.eval.mmd import mmd_from_features
from medical_image_generation_tpu.eval.ssim import ms_ssim, ssim


class TestSSIM:
    def test_identical_images_score_one(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
        s = ssim(x, x)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)

    def test_noise_scores_low(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 1))
        b = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
        assert float(ssim(a, b)[0]) < 0.2

    def test_3d(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
        np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)

    def test_ms_ssim_identical(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 1))
        np.testing.assert_allclose(np.asarray(ms_ssim(x, x)), 1.0, atol=1e-4)

    def test_monotonic_under_blur(self):
        from scipy import ndimage

        x = np.random.default_rng(0).uniform(size=(1, 64, 64, 1)).astype(np.float32)
        slight = ndimage.gaussian_filter(x, (0, 1, 1, 0))
        heavy = ndimage.gaussian_filter(x, (0, 3, 3, 0))
        s1 = float(ssim(jnp.asarray(x), jnp.asarray(slight))[0])
        s2 = float(ssim(jnp.asarray(x), jnp.asarray(heavy))[0])
        assert s1 > s2


class TestFID:
    def test_identical_distributions_near_zero(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(200, 16))
        fid = fid_from_features(feats, feats.copy())
        assert fid < 1e-6

    def test_shifted_distribution_positive(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(200, 16))
        b = rng.normal(size=(200, 16)) + 3.0
        assert fid_from_features(a, b) > 5.0

    def test_frechet_distance_formula(self):
        mu = np.zeros(4)
        sigma = np.eye(4)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-9)
        d = frechet_distance(mu, sigma, mu + 2.0, sigma)
        assert d == pytest.approx(16.0, rel=1e-6)


class TestMMD:
    def test_identical_near_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(100, 8))
        # unbiased estimator: O(1/n) residual for identical finite samples
        assert abs(mmd_from_features(x, x.copy())) < 0.05

    def test_shifted_positive(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(100, 8))
        b = rng.normal(size=(100, 8)) + 2.0
        assert mmd_from_features(a, b) > 0.1


class TestFeatureExtractor:
    def test_2d_features_shape(self):
        fx = FeatureExtractor(spatial_dims=2, dtype=jnp.float32)
        imgs = np.random.default_rng(0).uniform(size=(3, 64, 64, 1)).astype(np.float32)
        feats = fx(imgs)
        assert feats.shape == (3, 2048)
        assert np.all(np.isfinite(feats))

    def test_deterministic(self):
        fx1 = FeatureExtractor(spatial_dims=2, dtype=jnp.float32)
        fx2 = FeatureExtractor(spatial_dims=2, dtype=jnp.float32)
        imgs = np.random.default_rng(0).uniform(size=(1, 32, 32, 1)).astype(np.float32)
        np.testing.assert_allclose(fx1(imgs), fx2(imgs), atol=1e-5)
