"""Adversarial autoencoder training (KL-VAE / VQ-VAE stage 1).

Capability match for the reference trainer (train_autoencoder.py:35-838):
L1 + perceptual + KL (or VQ) + LSGAN adversarial objective with a
discriminator warm-up gate, dual optimizers, gradient accumulation and
clipping, per-epoch loss bookkeeping, val-L1 model selection, loss plots,
2D png / 3D GIF reconstruction snapshots, last/best checkpointing, resume.

TPU-first redesign:
* the whole G+D update is ONE jitted SPMD step: generator forward/backward,
  generator update, then discriminator update on the same (stop-gradient)
  reconstruction — no Python in the hot loop, no GradScaler (bf16 needs
  none), no requires_grad flipping (G/D partitioning is explicit via
  separate param trees and ``stop_gradient``);
* device-side batched augmentation fused into the same compiled step;
* batch sharded over the mesh 'data' axis, params replicated; XLA inserts
  the gradient all-reduces (reference is single-GPU, SURVEY.md §2.25).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional, Tuple

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
from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
from medical_image_generation_tpu.models.discriminator import (
    PatchDiscriminator,
    least_squares_gan_loss,
)
from medical_image_generation_tpu.models.perceptual import PerceptualLoss
from medical_image_generation_tpu.models.vqvae import VQVAE
from medical_image_generation_tpu.parallel.mesh import (
    get_mesh,
    maybe_initialize_distributed,
    put_batch,
    replicated_sharding,
)
from medical_image_generation_tpu.parallel.sharding import place_train_state
from medical_image_generation_tpu.training import common
from medical_image_generation_tpu.training import checkpoints as ckpt
from medical_image_generation_tpu.training import plots
from medical_image_generation_tpu.utils.profiling import (
    StepTimer,
    maybe_progress,
    profile_trace,
)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def parse_kl_weight(kw) -> Tuple[bool, float]:
    """(auto?, value): 'auto' defers to adapt_kl_loss_weight at train start
    (reference train_autoencoder.py:295-328); a number (or None -> 1e-6)
    pins the weight."""
    if isinstance(kw, str):
        if kw.lower() == "auto":
            return True, 1e-6
        return False, float(kw)
    return False, float(1e-6 if kw is None else kw)


class AutoEncoderTrainer:
    """Stage-1 autoencoder trainer (reference AutoEncoder, train_autoencoder.py:35)."""

    def __init__(self, config: Dict, latent_space_type: str = "vae", dtype=jnp.bfloat16,
                 mesh=None, seed: int = 0):
        self.config = config
        self.latent_space_type = latent_space_type
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else get_mesh(
            model_parallel=int(config.get("model_parallel", 1))
        )
        self.seed = seed

        if latent_space_type == "vae":
            self.model = AutoencoderKL.from_config(config["vae_params"], dtype=dtype)
            self.spatial_dims = config["vae_params"]["spatial_dims"]
            self.in_channels = config["vae_params"]["in_channels"]
        elif latent_space_type == "vq":
            params = config.get("vqvae_params") or config["vae_params"]
            self.model = VQVAE.from_config(params, dtype=dtype)
            self.spatial_dims = params["spatial_dims"]
            self.in_channels = params["in_channels"]
        else:
            raise ValueError("latent_space_type must be 'vae' or 'vq'")

        self.discriminator = PatchDiscriminator.from_config(
            config["discriminator_params"], dtype=dtype
        )
        self.perceptual = PerceptualLoss.from_config(
            config.get("perceptual_params", {"spatial_dims": self.spatial_dims}),
            dtype=dtype,
        )

        self.adv_weight = float(config.get("adv_weight", 0.01))
        self.perc_weight = float(config.get("perc_weight", 0.5))
        # kl_weight: auto -> measure the KL magnitude at train start and set
        # kl_weight = 0.001 / 10^floor(log10(mean KL)) (reference
        # train_autoencoder.py:295-328); a number pins it
        self.auto_kl_weight, self.kl_weight = parse_kl_weight(
            config.get("kl_weight", 1e-6)
        )
        self.q_weight = float(config.get("q_weight", 1.0))
        self.warm_up_epochs = int(config.get("autoencoder_warm_up_epochs", 5))
        self.n_epochs = int(config.get("n_epochs", 100))
        self.grad_accum = int(config.get("grad_accumulate_step", 1))
        self.clip = float(config.get("grad_clip_max_norm", 1.0))

        self.aug_cfg = AugmentConfig.from_transformations(
            config.get("ae_transformations", {}), spatial_dims=self.spatial_dims
        )

        self.save_dict, self.save_path = create_save_path_dict(config)
        self.loss_dict: Dict[str, list] = {
            "train_rec": [], "val_rec": [], "perc": [], "reg": [], "gen_adv": [],
            "disc": [], "lr": [],
        }
        self.start_epoch = 0
        self.best_val = float("inf")

        self._train_step = None  # built lazily per adv_on variant
        self._compiled = {}

    # ------------------------------------------------------------------ setup

    def _build_states(self, sample_batch: np.ndarray):
        rng = jax.random.PRNGKey(self.seed)
        x = jnp.asarray(sample_batch[:1])
        if self.latent_space_type == "vae":
            g_vars = self.model.init({"params": rng}, x, rng)
        else:
            g_vars = self.model.init({"params": rng}, x)
        d_vars = self.discriminator.init(jax.random.PRNGKey(self.seed + 1), x)

        steps = len_or(self.config.get("steps_per_epoch"), 250)
        g_sched = common.make_lr_schedule(
            float(self.config.get("ae_learning_rate", 5e-5)),
            self.config.get("lr_scheduler"),
            self.config.get("lr_scheduler_params"),
            steps,
        )
        d_sched = common.make_lr_schedule(
            float(self.config.get("d_learning_rate", 5e-5)),
            self.config.get("lr_scheduler"),
            self.config.get("lr_scheduler_params"),
            steps,
        )
        g_tx = common.make_optimizer(g_sched, self.clip, self.grad_accum)
        d_tx = common.make_optimizer(d_sched, self.clip, self.grad_accum)
        # kept so the per-epoch LR lands in loss_dict (persisted with the
        # losses in loss_dict.pkl; a scheduled LR is otherwise invisible)
        self._g_sched = g_sched

        g_state = common.TrainState.create(
            apply_fn=self.model.apply, params=g_vars["params"], tx=g_tx
        )
        d_state = common.TrainState.create(
            apply_fn=self.discriminator.apply, params=d_vars["params"], tx=d_tx
        )
        print(
            f"Autoencoder parameters: {count_params(g_state.params):,} | "
            f"Discriminator parameters: {count_params(d_state.params):,}"
        )
        # TP layout for the generator when the 'model' axis is >1
        # (replication otherwise); discriminator params are always
        # replicated (no matching Megatron patterns)
        g_state, self._g_sh = place_train_state(g_state, self.mesh)
        d_state = jax.device_put(d_state, replicated_sharding(self.mesh))
        return g_state, d_state

    # ------------------------------------------------------------- train step

    def _g_loss_fn(self, g_params, d_params, batch, rng, adv_on: bool):
        if self.latent_space_type == "vae":
            recon, mu, sigma = self.model.apply({"params": g_params}, batch, rng)
            reg = common.kl_loss(mu, sigma) * self.kl_weight
        else:
            recon, vq_loss = self.model.apply({"params": g_params}, batch)
            reg = vq_loss * self.q_weight
        rec = common.l1_loss(recon, batch)
        perc = self.perceptual(recon, batch) * self.perc_weight
        loss = rec + perc + reg
        gen_adv = jnp.asarray(0.0, jnp.float32)
        if adv_on:
            logits_fake = self.discriminator.apply({"params": d_params}, recon)
            gen_adv = least_squares_gan_loss(logits_fake=logits_fake) * self.adv_weight
            loss = loss + gen_adv
        aux = {"rec": rec, "perc": perc, "reg": reg, "gen_adv": gen_adv, "recon": recon}
        return loss, aux

    def _make_train_step(self, adv_on: bool):
        def step(g_state, d_state, batch, rng):
            aug_rng, samp_rng, d_rng = jax.random.split(rng, 3)
            batch = augment_batch(batch, aug_rng, self.aug_cfg)

            (g_loss, aux), g_grads = jax.value_and_grad(
                self._g_loss_fn, has_aux=True
            )(g_state.params, d_state.params, batch, samp_rng, adv_on)
            g_state = g_state.apply_gradients(grads=g_grads)

            d_loss = jnp.asarray(0.0, jnp.float32)
            if adv_on:
                recon = jax.lax.stop_gradient(aux["recon"])

                def d_loss_fn(d_params):
                    logits_fake = self.discriminator.apply({"params": d_params}, recon)
                    logits_real = self.discriminator.apply({"params": d_params}, batch)
                    return (
                        least_squares_gan_loss(logits_real=logits_real, logits_fake=logits_fake)
                        * self.adv_weight
                    )

                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
                d_state = d_state.apply_gradients(grads=d_grads)

            metrics = {
                "rec": aux["rec"], "perc": aux["perc"], "reg": aux["reg"],
                "gen_adv": aux["gen_adv"], "disc": d_loss,
            }
            return g_state, d_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def _make_val_step(self):
        def step(g_state, batch):
            if self.latent_space_type == "vae":
                recon = self.model.apply(
                    {"params": g_state.params}, batch, method=self.model.reconstruct
                )
            else:
                recon, _ = self.model.apply({"params": g_state.params}, batch)
            return common.l1_loss(recon, batch), recon

        return jax.jit(step)

    # ------------------------------------------------------------- main train

    def adapt_kl_loss_weight(self, g_state, val_loader) -> None:
        """Auto-set kl_weight from the measured KL magnitude when the config
        doesn't pin it: kl_weight = 0.001 / 10^floor(log10(mean KL))
        (reference train_autoencoder.py:295-328)."""
        import math

        if not (self.auto_kl_weight and self.latent_space_type == "vae"):
            return
        print("Setting KL loss weight from measured KL...")

        @jax.jit
        def kl_of(params, batch, rng):
            _, mu, sigma = self.model.apply({"params": params}, batch, rng)
            return common.kl_loss(mu, sigma)

        total, n = 0.0, 0
        for i, batch in enumerate(val_loader):
            batch = unpack_batch(batch)[0]  # AE ignores class labels
            batch = put_batch(batch, self.mesh)
            total += float(kl_of(g_state.params, batch, jax.random.PRNGKey(i)))
            n += 1
        mean_kl = total / max(n, 1)
        exponent = math.floor(math.log10(abs(mean_kl))) if mean_kl > 0 else 0
        self.kl_weight = 0.001 / (10**exponent)
        print(f"KL loss weight set to: {self.kl_weight}")

    def train(self, train_loader, val_loader) -> None:
        # active mesh enables ring-attention dispatch (ops/attention.py)
        with profile_trace(self.config.get("profile_dir")), self.mesh:
            self._train_impl(train_loader, val_loader)

    def _train_impl(self, train_loader, val_loader) -> None:
        sample = unpack_batch(next(iter(val_loader)))[0]
        g_state, d_state = self._build_states(sample)
        val_step = self._make_val_step()

        if self.config.get("load_model_path"):
            g_state, d_state = self._restore(g_state, d_state)

        # must run before the first train-step trace: the loss closure bakes
        # self.kl_weight in as a Python constant
        self.adapt_kl_loss_weight(g_state, val_loader)

        base_rng = jax.random.PRNGKey(self.seed + 1234)
        step_counter = 0
        show_bar = bool(self.config.get("progress_bar"))
        timer = StepTimer("ae_train")

        for epoch in range(self.start_epoch, self.n_epochs):
            t0 = time.time()
            adv_on = epoch >= self.warm_up_epochs
            if adv_on not in self._compiled:
                self._compiled[adv_on] = self._make_train_step(adv_on)
            train_step = self._compiled[adv_on]

            epoch_metrics = []
            timer.start()
            for batch in maybe_progress(
                train_loader, show_bar, total=len(train_loader),
                desc=f"Epoch {epoch + 1}",
            ):
                batch = unpack_batch(batch)[0]
                batch = put_batch(batch, self.mesh)
                rng = jax.random.fold_in(base_rng, step_counter)
                g_state, d_state, metrics = train_step(g_state, d_state, batch, rng)
                epoch_metrics.append(metrics)
                step_counter += 1
                timer.tick()

            means = {
                k: float(np.mean([np.asarray(m[k]) for m in epoch_metrics]))
                for k in epoch_metrics[0]
            }

            val_losses = []
            last_pair: Optional[Tuple[np.ndarray, np.ndarray]] = None
            for batch in val_loader:
                batch = unpack_batch(batch)[0]
                batch = put_batch(batch, self.mesh)
                loss, recon = val_step(g_state, batch)
                val_losses.append(float(loss))
                last_pair = (np.asarray(batch[0]), np.asarray(recon[0]))
            val_rec = float(np.mean(val_losses))

            self.loss_dict["train_rec"].append(means["rec"])
            self.loss_dict["val_rec"].append(val_rec)
            self.loss_dict["perc"].append(means["perc"])
            self.loss_dict["reg"].append(means["reg"])
            self.loss_dict["gen_adv"].append(means["gen_adv"])
            self.loss_dict["disc"].append(means["disc"])
            self.loss_dict.setdefault("lr", []).append(
                float(self._g_sched(int(g_state.step)))
            )

            dt = time.time() - t0
            print(
                f"Epoch {epoch + 1}/{self.n_epochs} | rec {means['rec']:.4f} | "
                f"val_rec {val_rec:.4f} | perc {means['perc']:.4f} | "
                f"reg {means['reg']:.3e} | adv {means['gen_adv']:.4f} | "
                f"disc {means['disc']:.4f} | {dt:.1f}s | {timer.report()}"
            )

            self._save_epoch_artifacts(epoch, g_state, d_state, val_rec, last_pair)

    # -------------------------------------------------------------- artifacts

    def _save_epoch_artifacts(self, epoch, g_state, d_state, val_rec, last_pair):
        plots.save_main_losses(
            self.loss_dict["train_rec"], self.loss_dict["val_rec"],
            os.path.join(self.save_dict["plots"], "loss.png"),
            title="L1 reconstruction loss",
        )
        plots.save_all_losses(
            # lr rides in loss_dict.pkl but is not a loss; the reference's
            # all-losses plot carries loss curves only (utils.py:122-124)
            {k: v for k, v in self.loss_dict.items() if k != "lr"},
            os.path.join(self.save_dict["plots"], "all_losses.png"),
        )
        ckpt.save_loss_dict(self.save_path, self.loss_dict)

        common.save_last_best(self, epoch, val_rec, lambda: {
            "epoch": epoch,
            "g_params": ckpt.to_host(g_state.params),
            "g_opt_state": ckpt.to_host(g_state.opt_state),
            "d_params": ckpt.to_host(d_state.params),
            "d_opt_state": ckpt.to_host(d_state.opt_state),
            "g_step": int(g_state.step),
            "validation_loss": val_rec,
        })

        interval = int(self.config.get("val_plot_interval", 10))
        if last_pair is not None and (epoch + 1) % interval == 0:
            img, recon = last_pair
            if self.spatial_dims == 2:
                plots.save_image_pair_2d(
                    img, recon,
                    os.path.join(self.save_dict["plots"], f"epoch_{epoch + 1}.png"),
                )
            else:
                plots.save_volume_gif(
                    img, os.path.join(self.save_dict["plots"], f"epoch_{epoch + 1}.gif"),
                    recon=recon,
                )

    def _restore(self, g_state, d_state):
        path = self.config["load_model_path"]
        if not os.path.exists(path):
            print(f"No checkpoint at {path}; training from scratch")
            return g_state, d_state
        target = {
            "epoch": 0,
            "g_params": ckpt.to_host(g_state.params),
            "g_opt_state": ckpt.to_host(g_state.opt_state),
            "d_params": ckpt.to_host(d_state.params),
            "d_opt_state": ckpt.to_host(d_state.opt_state),
            "g_step": 0,
            "validation_loss": 0.0,
        }
        payload = ckpt.load_checkpoint(path, target=target)
        g_state = g_state.replace(
            params=payload["g_params"], opt_state=payload["g_opt_state"],
            step=payload["g_step"],
        )
        d_state = d_state.replace(
            params=payload["d_params"], opt_state=payload["d_opt_state"]
        )
        self.start_epoch = int(payload["epoch"]) + 1
        self.best_val = float(payload["validation_loss"])
        prior = ckpt.load_loss_dict(self.save_path)
        if prior:
            self.loss_dict = prior
        print(f"Resumed from {path} at epoch {self.start_epoch}")
        g_state, self._g_sh = place_train_state(g_state, self.mesh)
        return g_state, jax.device_put(d_state, replicated_sharding(self.mesh))


def len_or(value, default):
    return int(value) if value else default


# --------------------------------------------------------------------- CLI


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Train an Autoencoder Model to reconstruct images."
    )
    parser.add_argument("dataset_id", type=str, help="Dataset ID")
    parser.add_argument("splitting", choices=["train-val-test", "5-fold"])
    parser.add_argument("model_type", choices=["2d", "3d"])
    parser.add_argument("-f", "--fold", type=int, choices=range(6), default=None)
    parser.add_argument("-l", "--latent_space_type", default="vae", choices=["vae", "vq"])
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
    if args.splitting == "train-val-test" and args.fold is not None:
        parser.error("--fold should not be provided with 'train-val-test'")
    return args


def main():
    maybe_initialize_distributed()
    args = parse_arguments()
    config = get_config_for_current_task(
        args.dataset_id, args.model_type, "autoencoder",
        progress_bar=args.progress_bar, continue_training=args.continue_training,
    )
    # filter BEFORE overrides (same ordering as all train CLIs; see
    # apply_overrides): latent_space_type steers the filter's vq/vae branch
    config["latent_space_type"] = args.latent_space_type
    config = filter_config_by_mode(config, "train_autoencoder")
    config = apply_overrides(config, args.overrides)
    print_configuration(config, config["results_path"], "train", model="autoencoder")
    trainer = AutoEncoderTrainer(config, latent_space_type=args.latent_space_type)
    train_loader, val_loader = get_data_loaders(
        config, args.dataset_id, args.splitting, config["ae_batch_size"],
        args.model_type, config["ae_transformations"], args.fold,
        data_parallel=trainer.mesh.shape["data"], mesh=trainer.mesh,
    )
    trainer.train(train_loader, val_loader)


if __name__ == "__main__":
    main()
