"""Pixel-space DDPM training (no autoencoder).

The reference's DDPM trainer is shipped broken — it imports a symbol that no
longer exists and crashes at import (train_ddpm.py:22-23; README.md:186 says
"Will be added"). This is the working TPU-native implementation of the same
capability (train_ddpm.py:166-346 loop semantics): train a diffusion U-Net
directly on image patches with MSE vs epsilon/v targets, sample full images
via the compiled ancestral/DDIM trajectory, plot GIFs/grids, checkpoint
last/best.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_generation_tpu.config.run import (
    apply_overrides,
    create_save_path_dict,
    filter_config_by_mode,
    get_config_for_current_task,
    print_configuration,
)
from medical_image_generation_tpu.data.augment import AugmentConfig, augment_batch
from medical_image_generation_tpu.data.loader import get_data_loaders, unpack_batch
from medical_image_generation_tpu.diffusion.sampler import (
    DDIMSampler,
    SegmentedDDPMSampler,
)
from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
from medical_image_generation_tpu.parallel.mesh import (
    get_mesh,
    maybe_initialize_distributed,
    put_batch,
)
from medical_image_generation_tpu.parallel.sharding import place_train_state
from medical_image_generation_tpu.training import checkpoints as ckpt
from medical_image_generation_tpu.training import common
from medical_image_generation_tpu.training import plots
from medical_image_generation_tpu.training.train_autoencoder import count_params
from medical_image_generation_tpu.utils.profiling import (
    StepTimer,
    maybe_progress,
    profile_trace,
)


class DDPMTrainer:
    """Pixel-space diffusion trainer (reference DDPM, train_ddpm.py:166)."""

    def __init__(self, config: Dict, dtype=jnp.bfloat16, mesh=None, seed: int = 0):
        self.config = config
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else get_mesh(
            model_parallel=int(config.get("model_parallel", 1))
        )
        self.seed = seed

        ddpm_params = dict(config["ddpm_params"])
        # pixel space: in/out channels follow the data, not the latent
        n_ch = len(config.get("input_channels", [0]))
        ddpm_params["in_channels"] = n_ch
        ddpm_params["out_channels"] = n_ch
        # classifier-free guidance (see LDMTrainer for the config contract)
        self.class_cond = config.get("class_conditioning") or None
        if self.class_cond:
            self.num_classes = int(self.class_cond["num_classes"])
            self.cfg_dropout = float(self.class_cond.get("dropout_prob", 0.1))
            self.guidance_scale = float(self.class_cond.get("guidance_scale", 2.0))
            ddpm_params["num_class_embeds"] = self.num_classes + 1
        self.spatial_dims = ddpm_params["spatial_dims"]
        self.unet = DiffusionUNet.from_config(ddpm_params, dtype=dtype)
        self.schedule = NoiseSchedule.from_config(config["time_scheduler_params"])

        self.n_epochs = int(config.get("n_epochs", 100))
        self.ema_decay = config.get("ema_decay")  # e.g. 0.999; None = off
        self.grad_accum = int(config.get("grad_accumulate_step", 1))
        self.clip = float(config.get("grad_clip_max_norm", 1.0))
        self.aug_cfg = AugmentConfig.from_transformations(
            config.get("ddpm_transformations", {}), spatial_dims=self.spatial_dims
        )
        self.patch_size = tuple(config["ddpm_transformations"]["patch_size"])
        if self.spatial_dims == 2 and len(self.patch_size) == 3:
            self.patch_size = self.patch_size[-2:]
        self.image_shape = tuple(self.patch_size) + (n_ch,)

        self.save_dict, self.save_path = create_save_path_dict(config)
        self.loss_dict: Dict[str, list] = {"rec_loss": [], "val_rec_loss": []}
        self.start_epoch = 0
        self.best_val = float("inf")

    def _build_state(self, steps_per_epoch: int = 250):
        rng = jax.random.PRNGKey(self.seed)
        x = jnp.zeros((1,) + self.image_shape, jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        if self.class_cond:
            variables = self.unet.init(
                rng, x, t, class_labels=jnp.zeros((1,), jnp.int32)
            )
        else:
            variables = self.unet.init(rng, x, t)
        sched = common.make_lr_schedule(
            float(self.config.get("ddpm_learning_rate", 2e-5)),
            self.config.get("lr_scheduler"),
            self.config.get("lr_scheduler_params"),
            steps_per_epoch,
        )
        tx = common.make_optimizer(
            sched, self.clip, self.grad_accum, weight_decay=1e-2,
            mu_dtype=common.mu_dtype_from_config(self.config),
        )
        if self.ema_decay:
            state = common.EMATrainState.create(
                apply_fn=self.unet.apply, params=variables["params"], tx=tx,
                # real copies: aliasing params would double-donate buffers under
                # donate_argnums and fault the TPU runtime
                ema_params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            )
        else:
            state = common.TrainState.create(
                apply_fn=self.unet.apply, params=variables["params"], tx=tx
            )
        print(f"Diffusion U-Net parameters: {count_params(state.params):,}")
        state, self._state_sh = place_train_state(state, self.mesh)
        return state

    def _dropout_labels(self, labels, rng):
        drop = jax.random.uniform(rng, labels.shape) < self.cfg_dropout
        return jnp.where(drop, jnp.int32(self.num_classes), labels)

    def _make_train_step(self):
        T = self.schedule.num_train_timesteps

        def step(state, batch, rng):
            imgs, labels = unpack_batch(batch)
            aug_rng, t_rng, n_rng, d_rng = jax.random.split(rng, 4)
            imgs = augment_batch(imgs, aug_rng, self.aug_cfg).astype(jnp.float32)
            t = jax.random.randint(t_rng, (imgs.shape[0],), 0, T)
            noise = jax.random.normal(n_rng, imgs.shape, jnp.float32)
            noisy = self.schedule.add_noise(imgs, noise, t)
            target = self.schedule.training_target(imgs, noise, t)
            if labels is not None:
                labels_in = self._dropout_labels(labels, d_rng)

            def loss_fn(params):
                if labels is not None:
                    pred = self.unet.apply(
                        {"params": params}, noisy, t, class_labels=labels_in
                    )
                else:
                    pred = self.unet.apply({"params": params}, noisy, t)
                return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
            if self.ema_decay:
                state = state.update_ema(
                    float(self.ema_decay),
                    synced=common.multisteps_synced(state.opt_state),
                )
            return state, loss

        return jax.jit(step, donate_argnums=(0,))

    def _make_val_step(self):
        T = self.schedule.num_train_timesteps

        def step(state, batch, rng):
            imgs, labels = unpack_batch(batch)
            t_rng, n_rng = jax.random.split(rng)
            imgs = imgs.astype(jnp.float32)
            t = jax.random.randint(t_rng, (imgs.shape[0],), 0, T)
            noise = jax.random.normal(n_rng, imgs.shape, jnp.float32)
            noisy = self.schedule.add_noise(imgs, noise, t)
            target = self.schedule.training_target(imgs, noise, t)
            if labels is not None:
                pred = self.unet.apply(
                    {"params": state.params}, noisy, t, class_labels=labels
                )
            else:
                pred = self.unet.apply({"params": state.params}, noisy, t)
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        return jax.jit(step)

    def _sampling_params(self, state):
        """EMA weights when enabled, else the live params."""
        ema = getattr(state, "ema_params", None)
        return ema if ema is not None else state.params

    def sample_images(self, state, n_samples, rng, sampler="ddpm",
                      num_inference_steps: Optional[int] = None,
                      class_label=None, guidance_scale: Optional[float] = None,
                      ) -> np.ndarray:
        """Class-conditional models sample with classifier-free guidance when
        ``class_label`` is given (see LDMTrainer.sample_images)."""
        shape = (n_samples,) + self.image_shape

        sampling_params = self._sampling_params(state)
        labels = None
        g = 1.0
        if self.class_cond:
            if class_label is None:
                labels = jnp.full((n_samples,), self.num_classes, jnp.int32)
            else:
                labels = jnp.asarray(
                    np.broadcast_to(np.asarray(class_label, np.int32), (n_samples,))
                )
                g = float(self.guidance_scale if guidance_scale is None
                          else guidance_scale)

        def apply_model(params_labels, x, t):
            params, lab = params_labels
            if lab is None:
                return self.unet.apply({"params": params}, x, t)
            e_c = self.unet.apply({"params": params}, x, t, class_labels=lab)
            if g == 1.0:
                return e_c
            null = jnp.full_like(lab, self.num_classes)
            e_u = self.unet.apply({"params": params}, x, t, class_labels=null)
            return e_u + g * (e_c - e_u)

        bundle = (sampling_params, labels)
        if sampler == "ddim":
            # apply_fn form: params as jit arguments, not constants; the
            # sampler object is cached so repeated sampling reuses one
            # compiled trajectory program instead of re-jitting per call
            steps = num_inference_steps or 50
            key = (("plain",) if labels is None else ("guided", g)) + (steps,)
            z = common.cached_sampler(
                self, "_ddim_samplers", key,
                lambda: DDIMSampler(
                    self.schedule, apply_model, num_inference_steps=steps,
                    max_steps_per_call=self.config.get("ddim_steps_per_call"),
                ),
            )(bundle, shape, rng)
        else:
            key = ("plain",) if labels is None else ("guided", g)
            z = common.cached_sampler(
                self, "_ddpm_samplers", key,
                lambda: SegmentedDDPMSampler(self.schedule, apply_model),
            )(bundle, shape, rng)
        return np.asarray(jnp.clip(z, 0.0, 1.0))

    def train(self, train_loader, val_loader) -> None:
        # active mesh enables ring-attention dispatch (ops/attention.py)
        with profile_trace(self.config.get("profile_dir")), self.mesh:
            self._train_impl(train_loader, val_loader)

    def _train_impl(self, train_loader, val_loader) -> None:
        state = self._build_state(steps_per_epoch=len(train_loader))
        train_step = self._make_train_step()
        val_step = self._make_val_step()

        if self.config.get("load_model_path"):
            state = self._restore(state)

        base_rng = jax.random.PRNGKey(self.seed + 999)
        step_counter = 0
        interval = int(self.config.get("val_plot_interval", 10))

        show_bar = bool(self.config.get("progress_bar"))
        timer = StepTimer("ddpm_train")
        for epoch in range(self.start_epoch, self.n_epochs):
            t0 = time.time()
            losses = []
            timer.start()
            for batch in maybe_progress(
                train_loader, show_bar, total=len(train_loader),
                desc=f"Epoch {epoch + 1}",
            ):
                batch = put_batch(batch, self.mesh)
                rng = jax.random.fold_in(base_rng, step_counter)
                state, loss = train_step(state, batch, rng)
                losses.append(loss)
                step_counter += 1
                timer.tick()
            train_loss = float(np.mean([np.asarray(l) for l in losses]))

            val_losses = []
            for i, batch in enumerate(val_loader):
                batch = put_batch(batch, self.mesh)
                rng = jax.random.fold_in(base_rng, 10_000_000 + epoch * 1000 + i)
                val_losses.append(float(val_step(state, batch, rng)))
            val_loss = float(np.mean(val_losses))

            self.loss_dict["rec_loss"].append(train_loss)
            self.loss_dict["val_rec_loss"].append(val_loss)
            print(
                f"Epoch {epoch + 1}/{self.n_epochs} | loss {train_loss:.4f} | "
                f"val {val_loss:.4f} | {time.time() - t0:.1f}s"
            )

            self._save_epoch_artifacts(epoch, state, val_loss)
            if (epoch + 1) % interval == 0:
                rng = jax.random.fold_in(base_rng, 20_000_000 + epoch)
                n = 16 if self.spatial_dims == 2 else 1
                images = self.sample_images(state, n, rng, sampler="ddim")
                if self.spatial_dims == 2:
                    plots.save_image_grid_2d(
                        list(images),
                        os.path.join(self.save_dict["plots"], f"epoch_{epoch + 1}.png"),
                    )
                else:
                    plots.save_volume_gif(
                        images[0],
                        os.path.join(self.save_dict["plots"], f"epoch_{epoch + 1}.gif"),
                    )

    def _save_epoch_artifacts(self, epoch, state, val_loss):
        plots.save_main_losses(
            self.loss_dict["rec_loss"], self.loss_dict["val_rec_loss"],
            os.path.join(self.save_dict["plots"], "loss.png"), title="Diffusion MSE",
        )
        ckpt.save_loss_dict(self.save_path, self.loss_dict)
        common.save_last_best(self, epoch, val_loss, lambda: {
            "epoch": epoch,
            "params": ckpt.to_host(state.params),
            **(
                {"ema_params": ckpt.to_host(state.ema_params)}
                if getattr(state, "ema_params", None) is not None else {}
            ),
            "opt_state": ckpt.to_host(state.opt_state),
            "step": int(state.step),
            "validation_loss": val_loss,
        })

    def _restore(self, state):
        path = self.config["load_model_path"]
        if not os.path.exists(path):
            print(f"No checkpoint at {path}; training from scratch")
            return state
        target = {
            "epoch": 0,
            "params": ckpt.to_host(state.params),
            **(
                {"ema_params": ckpt.to_host(state.ema_params)}
                if getattr(state, "ema_params", None) is not None else {}
            ),
            "opt_state": ckpt.to_host(state.opt_state),
            "step": 0,
            "validation_loss": 0.0,
        }
        payload = ckpt.load_checkpoint(path, target=target)
        state = state.replace(
            params=payload["params"], opt_state=payload["opt_state"], step=payload["step"]
        )
        if getattr(state, "ema_params", None) is not None and "ema_params" in payload:
            state = state.replace(ema_params=payload["ema_params"])
        self.start_epoch = int(payload["epoch"]) + 1
        self.best_val = float(payload["validation_loss"])
        prior = ckpt.load_loss_dict(self.save_path)
        if prior:
            self.loss_dict = prior
        print(f"Resumed from {path} at epoch {self.start_epoch}")
        state, self._state_sh = place_train_state(state, self.mesh)
        return state


def parse_arguments():
    parser = argparse.ArgumentParser(description="Train a pixel-space DDPM.")
    parser.add_argument("dataset_id", type=str)
    parser.add_argument("splitting", choices=["train-val-test", "5-fold"])
    parser.add_argument("model_type", choices=["2d", "3d"])
    parser.add_argument("-f", "--fold", type=int, choices=range(6), default=None)
    parser.add_argument("-p", "--progress_bar", action="store_true")
    parser.add_argument("-c", "--continue_training", action="store_true")
    parser.add_argument(
        "--set", dest="overrides", action="append", default=None, metavar="KEY=VALUE",
        help="Override any config field, e.g. --set n_epochs=50 "
             "--set vae_params.num_res_blocks=3",
    )
    args = parser.parse_args()
    if args.splitting == "5-fold" and args.fold is None:
        parser.error("--fold is required when --splitting is '5-fold'")
    return args


def main():
    maybe_initialize_distributed()
    args = parse_arguments()
    config = get_config_for_current_task(
        args.dataset_id, args.model_type, "ddpm",
        progress_bar=args.progress_bar, continue_training=args.continue_training,
    )
    # filter BEFORE overrides: mode filtering swaps the DDPM-specific
    # ddpm_time_scheduler_params into time_scheduler_params, and a user's
    # --set time_scheduler_params.* must win over that swap
    config = filter_config_by_mode(config, "train_ddpm")
    config = apply_overrides(config, args.overrides)
    print_configuration(config, config["results_path"], "train", model="ddpm")
    trainer = DDPMTrainer(config)
    train_loader, val_loader = get_data_loaders(
        config, args.dataset_id, args.splitting, config["ddpm_batch_size"],
        args.model_type, config["ddpm_transformations"], args.fold,
        data_parallel=trainer.mesh.shape["data"], mesh=trainer.mesh,
    )
    trainer.train(train_loader, val_loader)


if __name__ == "__main__":
    main()
