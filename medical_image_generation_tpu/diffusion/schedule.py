"""Pure-JAX DDPM noise schedule: precomputed tables + closed-form ops.

Capability match for MONAI's ``DDPMScheduler`` as configured by the reference
(configuration.py:1012-1013: scaled_linear_beta 0.0015->0.0205, 1000 steps,
epsilon or v_prediction — train_ldm.py:148-169, :351). Everything is a static
table + gather, so noising, loss targets, and posterior steps all live inside
jit with no host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int,
    schedule: str = "scaled_linear_beta",
    beta_start: float = 0.0015,
    beta_end: float = 0.0205,
) -> np.ndarray:
    if schedule in ("linear_beta", "linear"):
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    elif schedule in ("scaled_linear_beta", "scaled_linear"):
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
    elif schedule == "cosine":
        # Nichol & Dhariwal cosine schedule
        s = 0.008
        steps = np.arange(num_train_timesteps + 1, dtype=np.float64)
        f = np.cos(((steps / num_train_timesteps) + s) / (1 + s) * np.pi / 2) ** 2
        alphas_cumprod = f / f[0]
        betas = np.clip(1 - alphas_cumprod[1:] / alphas_cumprod[:-1], 0, 0.999)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return betas.astype(np.float64)


@dataclass(frozen=True)
class NoiseSchedule:
    """Immutable schedule tables. Construct via ``NoiseSchedule.create``."""

    num_train_timesteps: int
    prediction_type: str
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array

    @staticmethod
    def create(
        num_train_timesteps: int = 1000,
        schedule: str = "scaled_linear_beta",
        beta_start: float = 0.0015,
        beta_end: float = 0.0205,
        prediction_type: str = "epsilon",
        **_ignored,
    ) -> "NoiseSchedule":
        if prediction_type not in ("epsilon", "v_prediction", "sample"):
            raise ValueError(f"unknown prediction_type {prediction_type!r}")
        betas = make_betas(num_train_timesteps, schedule, beta_start, beta_end)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        return NoiseSchedule(
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            betas=jnp.asarray(betas, jnp.float32),
            alphas=jnp.asarray(alphas, jnp.float32),
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(acp), jnp.float32),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1 - acp), jnp.float32),
        )

    @staticmethod
    def from_config(params: dict) -> "NoiseSchedule":
        """Build from the planner's time_scheduler_params dict."""
        return NoiseSchedule.create(
            num_train_timesteps=params.get("num_train_timesteps", 1000),
            schedule=params.get("schedule", "scaled_linear_beta"),
            beta_start=params.get("beta_start", 0.0015),
            beta_end=params.get("beta_end", 0.0205),
            prediction_type=params.get("prediction_type", "epsilon"),
        )

    # -- helpers -----------------------------------------------------------

    def _gather(self, table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
        v = table[t]
        return v.reshape(v.shape + (1,) * (ndim - v.ndim))

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) forward noising (train_ldm.py:160)."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x0.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
        return a * x0 + s * noise

    def velocity(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """v-prediction target: v = sqrt(acp) eps - sqrt(1-acp) x0
        (train_ldm.py:165-169)."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x0.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x0.ndim)
        return a * noise - s * x0

    def training_target(self, x0, noise, t) -> jax.Array:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.velocity(x0, noise, t)
        return x0

    def pred_x0(self, model_out: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        """Recover x0 from the model output under the prediction type."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x_t.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        if self.prediction_type == "epsilon":
            return (x_t - s * model_out) / a
        if self.prediction_type == "v_prediction":
            return a * x_t - s * model_out
        return model_out

    def step(
        self,
        model_out: jax.Array,
        t: jax.Array,
        x_t: jax.Array,
        noise: jax.Array,
        clip_x0: bool = True,
    ) -> jax.Array:
        """One reverse (ancestral) DDPM step: x_t -> x_{t-1}.

        ``noise`` must be pre-sampled (pure function); it is only applied when
        t > 0. Matches the inferer step semantics used at train_ldm.py:332-366.
        """
        x0 = self.pred_x0(model_out, x_t, t)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)

        acp_t = self._gather(self.alphas_cumprod, t, x_t.ndim)
        prev_t = jnp.maximum(t - 1, 0)
        acp_prev = jnp.where(t > 0, self.alphas_cumprod[prev_t], 1.0)
        acp_prev = acp_prev.reshape(acp_prev.shape + (1,) * (x_t.ndim - acp_prev.ndim))
        beta_t = self._gather(self.betas, t, x_t.ndim)
        alpha_t = self._gather(self.alphas, t, x_t.ndim)

        coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
        mean = coef_x0 * x0 + coef_xt * x_t

        var = (1.0 - acp_prev) / (1.0 - acp_t) * beta_t
        var = jnp.clip(var, 1e-20, None)
        nonzero = (t > 0).astype(x_t.dtype)
        nonzero = nonzero.reshape(nonzero.shape + (1,) * (x_t.ndim - nonzero.ndim))
        return mean + nonzero * jnp.sqrt(var) * noise

    def ddim_step(
        self,
        model_out: jax.Array,
        t: jax.Array,
        t_prev: jax.Array,
        x_t: jax.Array,
        eta: float = 0.0,
        noise: jax.Array | None = None,
        clip_x0: bool = True,
    ) -> jax.Array:
        """One deterministic (eta=0) DDIM step x_t -> x_{t_prev}.

        A TPU-friendly fast sampler the reference lacks (its sampling runs all
        1000 ancestral steps, train_ldm.py:351); DDIM gives the same marginal
        with 20-50x fewer UNet evaluations.
        """
        x0 = self.pred_x0(model_out, x_t, t)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        acp_t = self._gather(self.alphas_cumprod, t, x_t.ndim)
        acp_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        acp_prev = acp_prev.reshape(acp_prev.shape + (1,) * (x_t.ndim - acp_prev.ndim))
        eps = (x_t - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
        sigma = eta * jnp.sqrt(
            (1 - acp_prev) / (1 - acp_t) * (1 - acp_t / acp_prev)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, 0.0, None)) * eps
        x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
        if eta > 0 and noise is not None:
            x_prev = x_prev + sigma * noise
        return x_prev
