import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.eval.fid import fid_from_features, frechet_distance
from medical_image_generation_tpu.eval.features import FeatureExtractor
from medical_image_generation_tpu.eval.mmd import mmd_from_features
from medical_image_generation_tpu.eval.ssim import ms_ssim, pairwise_metrics, ssim


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


class TestPairwiseProtocol:
    """Pin the reference generative-eval protocol (train_ldm.py:276-277,
    315-321): ALL C(n,2) pairs, kernel_size=4."""

    def test_all_pairs_and_values_match_per_pair_loop(self):
        from itertools import combinations

        imgs = jax.random.uniform(jax.random.PRNGKey(0), (8, 24, 24, 1))
        out = pairwise_metrics(imgs, win_size=4, pairs_per_chunk=5)
        assert out["n_pairs"] == 28
        ref = [
            float(ssim(imgs[i : i + 1], imgs[j : j + 1], win_size=4)[0])
            for i, j in combinations(range(8), 2)
        ]
        np.testing.assert_allclose(out["ssim_mean"], np.mean(ref), atol=1e-5)
        np.testing.assert_allclose(out["ssim_std"], np.std(ref), atol=1e-5)
        ref_ms = [
            float(ms_ssim(imgs[i : i + 1], imgs[j : j + 1], win_size=4)[0])
            for i, j in combinations(range(8), 2)
        ]
        np.testing.assert_allclose(out["ms_ssim_mean"], np.mean(ref_ms), atol=1e-5)

    def test_3d_pairs(self):
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 12, 12, 12, 1))
        out = pairwise_metrics(imgs, win_size=4)
        assert out["n_pairs"] == 6
        assert np.isfinite(out["ssim_mean"]) and np.isfinite(out["ms_ssim_mean"])

    def test_evaluate_generation_uses_reference_protocol(self):
        """Default sampler is the full ancestral loop; kernel 4; all pairs;
        the feature extractor is cached across calls."""
        from medical_image_generation_tpu.training.train_ldm import LDMTrainer

        assert LDMTrainer.EVAL_SSIM_KERNEL == 4

        tr = LDMTrainer.__new__(LDMTrainer)
        tr.config = {}
        tr.spatial_dims = 2
        tr.seed = 0
        tr.latent_shape = (1, 8, 8, 4)
        calls = []
        rng = np.random.default_rng(0)

        def fake_sample(state, n, key, sampler="ddpm", num_inference_steps=None):
            calls.append((sampler, num_inference_steps))
            return rng.uniform(0, 1, size=(n, 24, 24, 1)).astype(np.float32)

        tr.sample_images = fake_sample
        val_batches = [rng.uniform(0, 1, size=(4, 24, 24, 1)).astype(np.float32)
                       for _ in range(3)]
        metrics = tr.evaluate_generation(None, val_batches, n_samples=8)
        assert all(s == "ddpm" and n is None for s, n in calls)
        assert metrics["n_pairs"] == 28
        assert np.isfinite(metrics["fid"])
        first = tr.feature_extractor
        assert tr.feature_extractor is first
