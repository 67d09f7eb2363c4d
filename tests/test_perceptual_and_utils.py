import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.models.perceptual import PerceptualLoss
from medical_image_generation_tpu.utils.profiling import StepTimer, maybe_progress


class TestPerceptualLoss:
    @pytest.fixture(scope="class")
    def loss_2d(self):
        return PerceptualLoss(spatial_dims=2, dtype=jnp.float32)

    def test_identical_images_zero(self, loss_2d):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
        assert float(loss_2d(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_orders_by_distortion(self, loss_2d):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 1))
        slight = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        heavy = x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
        assert float(loss_2d(x, slight)) < float(loss_2d(x, heavy))

    def test_fake_3d_mode(self):
        loss = PerceptualLoss(
            spatial_dims=3, is_fake_3d=True, fake_3d_ratio=0.2, dtype=jnp.float32
        )
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 10, 32, 32, 1))
        y = x + 0.2 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        val = float(loss(x, y))
        assert np.isfinite(val) and val > 0
        assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_multichannel_input(self, loss_2d):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 2))
        assert np.isfinite(float(loss_2d(x, x * 0.9)))

    def test_jittable_inside_grad(self, loss_2d):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 1))

        def f(pred):
            return loss_2d(pred, x)

        g = jax.grad(f)(x + 0.1)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_feature_plan_override(self):
        # perceptual_params.feature_plan shrinks the feature stack (used by
        # the multi-chip dryrun for compile budget); it must change the
        # param tree, stay ordered by distortion, and round-trip from_config
        small = PerceptualLoss.from_config(
            {"spatial_dims": 2, "feature_plan": [[8, 1], [16, 1]]},
            dtype=jnp.float32,
        )
        assert small.plan == ((8, 1), (16, 1))
        assert set(small.params["params"]) == {"conv0_0", "conv1_0"}
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 1))
        slight = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        heavy = x + 0.3 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
        assert float(small(x, x)) == pytest.approx(0.0, abs=1e-6)
        assert float(small(x, slight)) < float(small(x, heavy))


class TestProfilingUtils:
    def test_step_timer_stats(self):
        t = StepTimer("test")
        t.start()
        for _ in range(5):
            time.sleep(0.01)
            t.tick()
        s = t.summary(skip_first=1)
        assert s["steps"] == 4
        assert 0.005 < s["p50_s"] < 0.1
        assert "steps/s" in t.report()

    def test_empty_timer(self):
        t = StepTimer("empty")
        assert t.summary() == {}
        assert "no steps" in t.report()

    def test_maybe_progress_passthrough(self):
        items = [1, 2, 3]
        assert list(maybe_progress(items, enabled=False)) == items
        assert list(maybe_progress(items, enabled=True, total=3)) == items


class TestStandalonePreprocessor:
    def test_crop_resample_contrast(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from synth import make_synthetic_dataset

        from medical_image_generation_tpu.io.nifti import load_nifti
        from medical_image_generation_tpu.planning.standalone import preprocess_dataset

        raw = make_synthetic_dataset(str(tmp_path / "raw"), n_patients=2,
                                     shape=(16, 18, 14))
        out = str(tmp_path / "out")
        preprocess_dataset(raw, out, crop=True, resample=True, contrast=True)
        files = sorted(os.listdir(out))
        assert len(files) == 2
        img = load_nifti(os.path.join(out, files[0]))
        assert img.data.ndim == 3
        assert np.all(np.isfinite(img.data))
