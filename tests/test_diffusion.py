import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.diffusion import NoiseSchedule, ddim_sample, ddpm_sample


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.create(num_train_timesteps=100)


class TestSchedule:
    def test_scaled_linear_betas(self, sched):
        betas = np.asarray(sched.betas)
        assert betas[0] == pytest.approx(0.0015, rel=1e-5)
        assert betas[-1] == pytest.approx(0.0205, rel=1e-5)
        # scaled-linear: sqrt(beta) is linear
        sq = np.sqrt(betas)
        diffs = np.diff(sq)
        assert np.allclose(diffs, diffs[0], rtol=1e-4)

    def test_add_noise_endpoints(self, sched):
        x0 = jnp.ones((2, 4, 4, 1))
        noise = jnp.zeros_like(x0)
        t0 = jnp.array([0, 0])
        out = sched.add_noise(x0, noise, t0)
        np.testing.assert_allclose(
            np.asarray(out), np.sqrt(np.asarray(sched.alphas_cumprod)[0]), rtol=1e-5
        )

    def test_pred_x0_inverts_add_noise_epsilon(self, sched):
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.uniform(rng, (2, 8, 8, 1))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([50, 10])
        xt = sched.add_noise(x0, noise, t)
        rec = sched.pred_x0(noise, xt, t)  # model predicting true eps
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)

    def test_v_prediction_roundtrip(self):
        s = NoiseSchedule.create(num_train_timesteps=100, prediction_type="v_prediction")
        x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 1))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([30, 70])
        xt = s.add_noise(x0, noise, t)
        v = s.velocity(x0, noise, t)
        rec = s.pred_x0(v, xt, t)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)

    def test_step_at_t0_is_deterministic(self, sched):
        xt = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1))
        eps = jnp.zeros_like(xt)
        big_noise = 100.0 * jnp.ones_like(xt)
        t = jnp.array([0])
        out1 = sched.step(eps, t, xt, big_noise)
        out2 = sched.step(eps, t, xt, jnp.zeros_like(xt))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_cosine_schedule_valid(self):
        s = NoiseSchedule.create(num_train_timesteps=50, schedule="cosine")
        betas = np.asarray(s.betas)
        assert np.all(betas > 0) and np.all(betas < 1)


class TestSamplers:
    def _perfect_model(self, sched, x_target):
        """Model that predicts the exact epsilon for a known x0."""

        def model_fn(x_t, t):
            a = sched.sqrt_alphas_cumprod[t].reshape(-1, *([1] * (x_t.ndim - 1)))
            s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(
                -1, *([1] * (x_t.ndim - 1))
            )
            return (x_t - a * x_target) / s

        return model_fn

    def test_ddpm_sampler_converges_to_target(self):
        sched = NoiseSchedule.create(num_train_timesteps=50)
        target = 0.5 * jnp.ones((1, 8, 8, 1))
        model_fn = self._perfect_model(sched, target)
        out = jax.jit(
            lambda rng: ddpm_sample(sched, model_fn, (1, 8, 8, 1), rng)
        )(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=0.15)

    def test_ddim_sampler_converges_deterministically(self):
        sched = NoiseSchedule.create(num_train_timesteps=100)
        target = 0.3 * jnp.ones((1, 8, 8, 1))
        model_fn = self._perfect_model(sched, target)
        f = jax.jit(
            lambda rng: ddim_sample(sched, model_fn, (1, 8, 8, 1), rng, num_inference_steps=10)
        )
        out = f(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=0.05)
        # eta=0 DDIM with the same rng is fully deterministic
        out2 = f(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2))

    def test_ddim_segmentation_is_bit_identical(self):
        """Any max_steps_per_call (segments, incl. the single-step host
        loop) reproduces the one-scan trajectory exactly — same RNG carry."""
        sched = NoiseSchedule.create(num_train_timesteps=100)
        target = 0.3 * jnp.ones((1, 8, 8, 1))
        model_fn = self._perfect_model(sched, target)
        rng = jax.random.PRNGKey(7)
        full = ddim_sample(sched, model_fn, (1, 8, 8, 1), rng,
                           num_inference_steps=10, eta=0.5)
        for seg in (1, 3, 10):
            out = ddim_sample(sched, model_fn, (1, 8, 8, 1), rng,
                              num_inference_steps=10, eta=0.5,
                              max_steps_per_call=seg)
            np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                       atol=1e-6)

    def test_seed_reproducibility(self):
        sched = NoiseSchedule.create(num_train_timesteps=20)
        model_fn = lambda x, t: jnp.zeros_like(x)
        f = jax.jit(lambda rng: ddpm_sample(sched, model_fn, (1, 4, 4, 1), rng))
        a = f(jax.random.PRNGKey(42))
        b = f(jax.random.PRNGKey(42))
        c = f(jax.random.PRNGKey(43))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestSegmentedSampler:
    def test_segmentation_matches_single_program(self):
        from medical_image_generation_tpu.diffusion.sampler import SegmentedDDPMSampler

        sched = NoiseSchedule.create(num_train_timesteps=40)
        target = 0.4 * jnp.ones((1, 8, 8, 1))

        def apply_fn(params, x_t, t):
            a = sched.sqrt_alphas_cumprod[t].reshape(-1, *([1] * (x_t.ndim - 1)))
            s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(
                -1, *([1] * (x_t.ndim - 1))
            )
            return (x_t - a * target) / s

        model_fn = lambda x, t: apply_fn(None, x, t)
        single = ddpm_sample(sched, model_fn, (1, 8, 8, 1), jax.random.PRNGKey(5),
                             max_steps_per_call=None)
        seg = SegmentedDDPMSampler(sched, apply_fn, max_steps_per_call=7)
        chunked = seg(None, (1, 8, 8, 1), jax.random.PRNGKey(5))
        np.testing.assert_allclose(np.asarray(single), np.asarray(chunked), atol=1e-5)
        # scan-free host-loop mode is bit-identical too
        host = SegmentedDDPMSampler(sched, apply_fn, max_steps_per_call=1)
        looped = host(None, (1, 8, 8, 1), jax.random.PRNGKey(5))
        np.testing.assert_allclose(np.asarray(single), np.asarray(looped), atol=1e-5)

    def test_function_segmentation_matches(self):
        sched = NoiseSchedule.create(num_train_timesteps=30)
        model_fn = lambda x, t: jnp.zeros_like(x)
        a = ddpm_sample(sched, model_fn, (1, 4, 4, 1), jax.random.PRNGKey(1),
                        max_steps_per_call=None)
        b = ddpm_sample(sched, model_fn, (1, 4, 4, 1), jax.random.PRNGKey(1),
                        max_steps_per_call=8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestEMA:
    def test_ema_state_tracks_params(self):
        import optax

        from medical_image_generation_tpu.training import common

        params = {"w": jnp.zeros((4,))}
        state = common.EMATrainState.create(
            apply_fn=lambda *a: None, params=params, tx=optax.sgd(1.0),
            ema_params=jax.tree_util.tree_map(lambda p: p, params),
        )
        grads = {"w": -jnp.ones((4,))}  # sgd(1.0) -> params become 1.0
        state = state.apply_gradients(grads=grads)
        state = state.update_ema(0.9)
        np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.1, rtol=1e-6)
        # repeated updates converge toward the params
        for _ in range(100):
            state = state.update_ema(0.9)
        assert float(jnp.abs(state.ema_params["w"] - 1.0).max()) < 1e-4

    def test_ema_skips_multisteps_microsteps(self):
        """Under grad_accum=2 the EMA must advance only on sync steps —
        updating on MultiSteps skip-steps would halve the effective decay
        horizon (VERDICT round-2 item 7)."""
        import optax

        from medical_image_generation_tpu.training import common

        params = {"w": jnp.zeros((4,))}
        tx = common.make_optimizer(1.0, grad_clip_max_norm=None,
                                   grad_accumulate_steps=2)
        state = common.EMATrainState.create(
            apply_fn=lambda *a: None, params=params, tx=tx,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )
        grads = {"w": -jnp.ones((4,))}
        decay = 0.5

        def step(state):
            state = state.apply_gradients(grads=grads)
            return state.update_ema(
                decay, synced=common.multisteps_synced(state.opt_state)
            )

        # microstep 1: accumulate only — params and EMA unchanged
        state = step(state)
        np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0)
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.0)
        # microstep 2: sync — adam applies an update, EMA takes ONE step
        state = step(state)
        p = float(state.params["w"][0])
        assert p != 0.0
        np.testing.assert_allclose(
            np.asarray(state.ema_params["w"]), (1 - decay) * p, rtol=1e-6
        )

    def test_multisteps_synced_none_without_accumulation(self):
        import optax

        from medical_image_generation_tpu.training import common

        tx = common.make_optimizer(1.0, grad_accumulate_steps=1)
        state = tx.init({"w": jnp.zeros((2,))})
        assert common.multisteps_synced(state) is None


class TestGoldenOracle:
    """Hardcoded expected values derived offline (fp64 numpy) from the MONAI
    DDPMScheduler formulas at the reference configuration — the closest
    offline evidence for BASELINE.json's 'sampler MAE < 1e-3 vs reference'
    claim (schedule: configuration.py:1012-1013; posterior step used by
    sampling at train_ldm.py:351).

    Oracle: betas = linspace(sqrt(0.0015), sqrt(0.0205), 1000)**2,
    alphas_cumprod = cumprod(1 - betas); posterior mean/var per DDPM
    (Ho et al.) with clipped x0, exactly as MONAI's step() computes them.
    """

    # fp64 oracle values (see derivation in the docstring)
    BETA_0 = 0.0015
    BETA_500 = 0.008282146368940662
    BETA_999 = 0.0205
    ACP_0 = 0.9985
    ACP_1 = 0.996994152597893
    ACP_500 = 0.10767675390060183
    ACP_999 = 9.691086681147455e-05
    SUM_BETAS = 9.183576148381146
    SUM_ACP = 271.6339194489602

    def test_table_checksums(self):
        s = NoiseSchedule.create()
        betas = np.asarray(s.betas, np.float64)
        acp = np.asarray(s.alphas_cumprod, np.float64)
        assert betas[0] == pytest.approx(self.BETA_0, rel=1e-6)
        assert betas[500] == pytest.approx(self.BETA_500, rel=1e-6)
        assert betas[999] == pytest.approx(self.BETA_999, rel=1e-6)
        assert acp[0] == pytest.approx(self.ACP_0, rel=1e-6)
        assert acp[1] == pytest.approx(self.ACP_1, rel=1e-6)
        assert acp[500] == pytest.approx(self.ACP_500, rel=1e-5)
        assert acp[999] == pytest.approx(self.ACP_999, rel=1e-4)
        assert betas.sum() == pytest.approx(self.SUM_BETAS, rel=1e-6)
        assert acp.sum() == pytest.approx(self.SUM_ACP, rel=1e-5)

    def test_add_noise_and_velocity_golden(self):
        s = NoiseSchedule.create(prediction_type="v_prediction")
        t = jnp.array([500])
        x0 = jnp.full((1, 4), 0.5)
        noise = jnp.ones((1, 4))
        noisy = s.add_noise(x0, noise, t)
        np.testing.assert_allclose(
            np.asarray(noisy), 1.1086993100074376, rtol=1e-5
        )
        v = s.velocity(x0, noise, t)
        np.testing.assert_allclose(
            np.asarray(v), -0.14417295165540528, rtol=1e-4
        )

    def test_posterior_step_golden(self):
        """One reverse step at t=500 with x_t=0.7, eps_hat=0.3: pinned
        posterior mean (with x0 clipping at 1.0 engaged — x0_raw=1.2696)
        and variance."""
        s = NoiseSchedule.create()
        t = jnp.array([500])
        x_t = jnp.full((1, 4), 0.7)
        eps = jnp.full((1, 4), 0.3)
        # zero injected noise isolates the mean; variance checked via the
        # difference of two steps with noise = +1 and 0
        out0 = s.step(eps, t, x_t, jnp.zeros_like(x_t))
        np.testing.assert_allclose(
            np.asarray(out0), 0.6994510743037623, rtol=1e-5
        )
        out1 = s.step(eps, t, x_t, jnp.ones_like(x_t))
        sigma = np.asarray(out1 - out0)[0, 0]
        np.testing.assert_allclose(
            sigma, np.sqrt(0.008273800003067953), rtol=1e-4
        )
        # x0 clipping really engaged: raw x0 exceeds 1
        raw_x0 = np.asarray(s.pred_x0(eps, x_t, t))[0, 0]
        assert raw_x0 == pytest.approx(1.2696095609487499, rel=1e-5)

    def test_t0_step_golden(self):
        """Final step (t=0): acp_prev=1, no noise injected even when noise
        is supplied."""
        s = NoiseSchedule.create()
        t = jnp.array([0])
        x_t = jnp.full((1, 2), 0.7)
        eps = jnp.full((1, 2), 0.3)
        out = s.step(eps, t, x_t, jnp.ones_like(x_t))  # noise must be ignored
        np.testing.assert_allclose(
            np.asarray(out), 0.6888979172973659, rtol=1e-5
        )

    def test_ddpm_mode_schedule_golden(self):
        """The pixel-space DDPM trainer's own schedule (reference
        train_ddpm.py:380-381): linear_beta 0.0005 -> 0.0195."""
        s = NoiseSchedule.create(schedule="linear_beta", beta_start=0.0005,
                                 beta_end=0.0195)
        betas = np.asarray(s.betas, np.float64)
        acp = np.asarray(s.alphas_cumprod, np.float64)
        assert betas[0] == pytest.approx(0.0005, rel=1e-6)
        assert betas[-1] == pytest.approx(0.0195, rel=1e-6)
        assert acp[500] == pytest.approx(0.0712551087616251, rel=1e-5)
