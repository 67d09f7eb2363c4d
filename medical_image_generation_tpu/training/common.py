"""Shared training machinery: optimizers, LR schedules, train state.

TPU replacements for the reference's torch training plumbing:
* optax adam/adamw + global-norm clipping + ``optax.MultiSteps`` gradient
  accumulation instead of manual loops + GradScaler (train_autoencoder.py:
  426-435, train_ldm.py:171-180). bf16 on TPU needs no loss scaling.
* LR schedules matching the torch names the reference accepts
  (train_autoencoder.py:469-486: LinearLR / PolynomialLR / none), stepped
  per epoch like the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Flax TrainState; params fp32, compute dtype handled by the modules."""


class EMATrainState(train_state.TrainState):
    """TrainState carrying an exponential moving average of the params.

    EMA weights are the standard sampling/eval weights for diffusion models
    (the reference has none; enable via config ``ema_decay``)."""

    ema_params: Any = None

    def update_ema(self, decay: float, synced=None) -> "EMATrainState":
        """EMA step. ``synced`` (bool scalar or None) gates the update under
        gradient accumulation: optax.MultiSteps applies the real parameter
        update only every k-th microstep, so updating the EMA on skip-steps
        would shrink the effective decay horizon by the accumulation factor.
        Pass ``multisteps_synced(state.opt_state)`` after apply_gradients;
        None (no accumulation) updates unconditionally."""

        def do(ema):
            return jax.tree_util.tree_map(
                lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                ema,
                self.params,
            )

        if synced is None:
            return self.replace(ema_params=do(self.ema_params))
        new_ema = jax.lax.cond(synced, do, lambda e: e, self.ema_params)
        return self.replace(ema_params=new_ema)


def make_lr_schedule(
    base_lr: float,
    scheduler: Optional[str],
    params: Optional[Dict],
    steps_per_epoch: int,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Epoch-granular schedules keyed like torch.optim.lr_scheduler names."""
    params = params or {}
    if scheduler is None:
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    if scheduler == "LinearLR":
        start = params.get("start_factor", 1.0)
        end = params.get("end_factor", 0.0)
        total = params.get("total_iters", 100) * steps_per_epoch

        def fn(step):
            frac = jnp.clip(step / max(total, 1), 0.0, 1.0)
            return base_lr * (start + (end - start) * frac)

        return fn
    if scheduler == "PolynomialLR":
        total = params.get("total_iters", 100) * steps_per_epoch
        power = params.get("power", 1.0)

        def fn(step):
            frac = jnp.clip(step / max(total, 1), 0.0, 1.0)
            return base_lr * (1.0 - frac) ** power

        return fn
    raise ValueError(f"unknown lr_scheduler {scheduler!r}")


def make_optimizer(
    learning_rate,
    grad_clip_max_norm: Optional[float] = 1.0,
    grad_accumulate_steps: int = 1,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """mu_dtype: dtype of Adam's first moment — bfloat16 halves optimizer
    HBM traffic for large models with negligible quality impact (the second
    moment stays fp32)."""
    chain = []
    if grad_clip_max_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_max_norm))
    if weight_decay > 0:
        chain.append(
            optax.adamw(
                learning_rate, b1=b1, b2=b2, weight_decay=weight_decay,
                mu_dtype=mu_dtype,
            )
        )
    else:
        chain.append(optax.adam(learning_rate, b1=b1, b2=b2, mu_dtype=mu_dtype))
    tx = optax.chain(*chain)
    if grad_accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accumulate_steps)
    return tx


def multisteps_synced(opt_state):
    """After ``apply_gradients`` on a MultiSteps optimizer: True iff the
    accumulated update was just applied (``mini_step`` wrapped to 0). Returns
    None when the optimizer has no MultiSteps wrapper (every step syncs)."""
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state.mini_step == 0
    return None


def mu_dtype_from_config(config) -> Optional[jnp.dtype]:
    """Resolve the ``adam_mu_dtype`` config key ('bfloat16' | 'float32').

    The diffusion trainers default to bfloat16 — halving first-moment HBM
    traffic for the 441M-param flagship UNet (the second moment stays fp32);
    set ``adam_mu_dtype: float32`` to opt out."""
    name = str(config.get("adam_mu_dtype", "bfloat16"))
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "fp32"):
        return None
    raise ValueError(f"unknown adam_mu_dtype {name!r}")


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def kl_loss(mu, sigma):
    """KL(q||N(0,1)) summed over latent dims, averaged over batch
    (reference train_autoencoder.py:67-72)."""
    var = sigma.astype(jnp.float32) ** 2
    mu = mu.astype(jnp.float32)
    per_sample = 0.5 * jnp.sum(
        mu**2 + var - jnp.log(var + 1e-12) - 1.0,
        axis=tuple(range(1, mu.ndim)),
    )
    return jnp.mean(per_sample)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def cached_sampler(trainer, attr: str, key, build: Callable[[], Any]):
    """Per-trainer cache of compiled sampler objects.

    Sampler objects (DDIMSampler / SegmentedDDPMSampler) hold their compiled
    trajectory programs; rebuilding one per call re-traces and re-compiles
    the whole scan (measured 94 s/call at flagship scale, BENCH_NOTES.md).
    Both diffusion trainers cache them keyed on the guidance structure (and
    step count for DDIM) so chunked eval and per-epoch plots reuse one
    program."""
    cache = getattr(trainer, attr, None)
    if cache is None:
        cache = {}
        setattr(trainer, attr, cache)
    if key not in cache:
        cache[key] = build()
    return cache[key]


def save_last_best(trainer, epoch: int, val_loss: float,
                   payload_fn: Callable[[], Dict[str, Any]]) -> None:
    """last/best checkpoint cadence shared by all trainers.

    best_model saves on every val improvement; last_model saves every
    ``checkpoint_interval`` epochs and on the final epoch (default 1 =
    reference parity, train_autoencoder.py:533-560). The payload host fetch
    is the expensive part under axon (multi-GB through the tunnel), so
    ``payload_fn`` is only called when a save will actually happen.

    ``best_checkpoint_interval: k`` (default 1 = reference parity)
    additionally restricts best-model candidacy to every k-th epoch (and
    the final epoch): with the flagship 441M U-Net the best payload is a
    ~6 GB device->host fetch, and early training improves val EVERY epoch —
    measured ~6 min/epoch of checkpoint stalls on the 3D quality run.
    best_model then means "best among the sampled epochs", and
    ``trainer.best_val`` only advances when a save actually happens so a
    later sampled epoch competes against the last SAVED best."""
    from . import checkpoints as ckpt

    improved = val_loss < trainer.best_val
    interval = max(1, int(trainer.config.get("checkpoint_interval", 1)))
    best_interval = max(1, int(trainer.config.get("best_checkpoint_interval", 1)))
    last_epoch = epoch + 1 >= trainer.n_epochs
    want_last = (epoch + 1) % interval == 0 or last_epoch
    want_best = improved and ((epoch + 1) % best_interval == 0 or last_epoch)
    if not (want_best or want_last):
        return
    payload = payload_fn()
    if want_last:
        ckpt.save_checkpoint(trainer.save_dict["checkpoints"], "last_model", payload)
    if want_best:
        trainer.best_val = val_loss
        ckpt.save_checkpoint(trainer.save_dict["checkpoints"], "best_model", payload)
