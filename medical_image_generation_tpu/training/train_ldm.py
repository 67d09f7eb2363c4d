"""Latent diffusion (LDM) training over a frozen stage-1 autoencoder.

Capability match for the reference trainer (train_ldm.py:41-676): loads the
autoencoder's best checkpoint, probes one batch to fix the latent shape and
the VAE ``scale_factor = 1/std(z)`` (:110-112) or the VQ codebook min/max
normalization (:85-96), trains the strided diffusion U-Net with MSE against
epsilon / v targets, evaluates generative quality (FID + pairwise SSIM /
MS-SSIM over sampled images, :266-328), renders sample grids / GIFs, and
keeps last/best checkpoints with resume.

TPU-first: one jitted SPMD train step (frozen AE encode fused in, batch
sharded over the mesh), and sampling as a single compiled lax.scan
trajectory + decode — no per-step host dispatch (reference loops 1000 UNet
calls in Python).
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
from medical_image_generation_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    center_crop_batch,
)
from medical_image_generation_tpu.data.loader import get_data_loaders, unpack_batch
from medical_image_generation_tpu.diffusion.sampler import (
    DDIMSampler,
    SegmentedDDPMSampler,
)
from medical_image_generation_tpu.diffusion.schedule import NoiseSchedule
from medical_image_generation_tpu.eval.fid import fid_from_features
from medical_image_generation_tpu.eval.features import FeatureExtractor
from medical_image_generation_tpu.eval.ssim import pairwise_metrics
from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
from medical_image_generation_tpu.models.vqvae import VQVAE
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


class LDMTrainer:
    """Stage-2 latent diffusion trainer (reference LDM, train_ldm.py:41)."""

    def __init__(self, config: Dict, latent_space_type: str = "vae", dtype=jnp.bfloat16,
                 mesh=None, seed: int = 0):
        self.config = config
        self.latent_space_type = latent_space_type
        self.dtype = dtype
        self.mesh = mesh if mesh is not None else get_mesh(
            model_parallel=int(config.get("model_parallel", 1))
        )
        self.seed = seed

        # frozen stage-1 autoencoder from its best checkpoint
        if latent_space_type == "vae":
            self.autoencoder = AutoencoderKL.from_config(config["vae_params"], dtype=dtype)
            self.spatial_dims = config["vae_params"]["spatial_dims"]
        else:
            params = config.get("vqvae_params") or config["vae_params"]
            self.autoencoder = VQVAE.from_config(params, dtype=dtype)
            self.spatial_dims = params["spatial_dims"]

        ae_ckpt_path = config["load_autoencoder_path"]
        print(f"Loading autoencoder checkpoint from {ae_ckpt_path}...")
        payload = ckpt.load_checkpoint(ae_ckpt_path)
        self.ae_params = jax.tree_util.tree_map(jnp.asarray, payload["g_params"])
        print(f"Autoencoder epoch: {payload.get('epoch')}")

        # classifier-free guidance (capability beyond the reference — its
        # UNet fork carries class embeddings but no trainer ever feeds them):
        # label-dropout training + guided sampling. Config:
        #   class_conditioning: {num_classes, label_map (json path or dict),
        #                        dropout_prob=0.1, guidance_scale=2.0}
        self.class_cond = config.get("class_conditioning") or None
        ddpm_params = dict(config["ddpm_params"])
        if self.class_cond:
            self.num_classes = int(self.class_cond["num_classes"])
            self.cfg_dropout = float(self.class_cond.get("dropout_prob", 0.1))
            self.guidance_scale = float(self.class_cond.get("guidance_scale", 2.0))
            # one extra embedding row: index num_classes = the unconditional
            # (null) class used for dropout and guidance
            ddpm_params["num_class_embeds"] = self.num_classes + 1
        self.unet = DiffusionUNet.from_config(ddpm_params, dtype=dtype)
        self.schedule = NoiseSchedule.from_config(config["time_scheduler_params"])

        self.n_epochs = int(config.get("n_epochs", 100))
        self.ema_decay = config.get("ema_decay")  # e.g. 0.999; None = off
        self.grad_accum = int(config.get("grad_accumulate_step", 1))
        self.clip = float(config.get("grad_clip_max_norm", 1.0))
        self.aug_cfg = AugmentConfig.from_transformations(
            config.get("ddpm_transformations", {}), spatial_dims=self.spatial_dims
        )

        self.save_dict, self.save_path = create_save_path_dict(config)
        self.loss_dict: Dict[str, list] = {"rec_loss": [], "val_rec_loss": []}
        self.start_epoch = 0
        self.best_val = float("inf")
        self.scale_factor = 1.0
        self.latent_shape: Optional[Tuple[int, ...]] = None

        if latent_space_type == "vq":
            codebook = self.ae_params["quantizer"]["codebook"]
            self.codebook_min = float(np.min(np.asarray(codebook)))
            self.codebook_max = float(np.max(np.asarray(codebook)))

    # ----------------------------------------------------------------- latent

    def _encode(self, params, batch, rng):
        """Stage-2 latent for a batch, pre-scaling."""
        if self.latent_space_type == "vae":
            return self.autoencoder.apply(
                {"params": params}, batch, rng,
                method=self.autoencoder.encode_stage_2_inputs,
            )
        return self.autoencoder.apply(
            {"params": params}, batch, method=self.autoencoder.encode
        )

    def _scale(self, z):
        if self.latent_space_type == "vae":
            return z * self.scale_factor
        return 2 * (z - self.codebook_min) / (self.codebook_max - self.codebook_min) - 1

    def _unscale(self, z):
        if self.latent_space_type == "vae":
            return z / self.scale_factor
        return (z + 1) / 2 * (self.codebook_max - self.codebook_min) + self.codebook_min

    def _decode(self, z):
        return self.autoencoder.apply(
            {"params": self.ae_params}, self._unscale(z),
            method=self.autoencoder.decode_stage_2_outputs,
        )

    def probe_latent(self, train_loader):
        """Fix latent shape + scale factor from one batch
        (reference train_ldm.py:98-118)."""
        batch = jnp.asarray(unpack_batch(next(iter(train_loader)))[0])
        if self.aug_cfg.crop_to is not None:
            # training batches may carry the enlarged initial patch; the
            # latent geometry is defined by the FINAL (post-augment) size
            batch = center_crop_batch(batch, self.aug_cfg.crop_to)
        z = self._encode(self.ae_params, batch, jax.random.PRNGKey(0))
        if self.latent_space_type == "vae":
            self.scale_factor = float(1.0 / (jnp.std(z) + 1e-8))
            print(f"Scaling factor set to {self.scale_factor}")
        self.latent_shape = tuple(z.shape)
        print(f"Latent shape: {self.latent_shape}")

    # ------------------------------------------------------------ train steps

    def _build_state(self, steps_per_epoch: int = 250):
        assert self.latent_shape is not None
        rng = jax.random.PRNGKey(self.seed)
        z = jnp.zeros((1,) + self.latent_shape[1:], jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        if self.class_cond:
            variables = self.unet.init(
                rng, z, t, class_labels=jnp.zeros((1,), jnp.int32)
            )
        else:
            variables = self.unet.init(rng, z, t)
        sched = common.make_lr_schedule(
            float(self.config.get("ddpm_learning_rate", 2e-5)),
            self.config.get("lr_scheduler"),
            self.config.get("lr_scheduler_params"),
            steps_per_epoch,
        )
        tx = common.make_optimizer(
            sched, self.clip, self.grad_accum, weight_decay=1e-2,  # AdamW (reference :121)
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
        # TP layout over the mesh 'model' axis when configured (params +
        # adam moments Megatron-partitioned); plain replication otherwise
        state, self._state_sh = place_train_state(state, self.mesh)
        return state

    def _dropout_labels(self, labels, rng):
        """Classifier-free label dropout: replace with the null class id
        (= num_classes) with probability cfg_dropout."""
        drop = jax.random.uniform(rng, labels.shape) < self.cfg_dropout
        return jnp.where(drop, jnp.int32(self.num_classes), labels)

    def _make_train_step(self):
        T = self.schedule.num_train_timesteps

        def step(state, ae_params, batch, rng):
            imgs, labels = unpack_batch(batch)
            aug_rng, enc_rng, t_rng, n_rng, d_rng = jax.random.split(rng, 5)
            imgs = augment_batch(imgs, aug_rng, self.aug_cfg)
            z = jax.lax.stop_gradient(self._encode(ae_params, imgs, enc_rng))
            z = self._scale(z).astype(jnp.float32)
            t = jax.random.randint(t_rng, (z.shape[0],), 0, T)
            noise = jax.random.normal(n_rng, z.shape, jnp.float32)
            noisy = self.schedule.add_noise(z, noise, t)
            target = self.schedule.training_target(z, noise, t)
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

        def step(state, ae_params, batch, rng):
            imgs, labels = unpack_batch(batch)
            enc_rng, t_rng, n_rng = jax.random.split(rng, 3)
            z = self._encode(ae_params, imgs, enc_rng)
            z = self._scale(z).astype(jnp.float32)
            t = jax.random.randint(t_rng, (z.shape[0],), 0, T)
            noise = jax.random.normal(n_rng, z.shape, jnp.float32)
            noisy = self.schedule.add_noise(z, noise, t)
            target = self.schedule.training_target(z, noise, t)
            if labels is not None:
                pred = self.unet.apply(
                    {"params": state.params}, noisy, t, class_labels=labels
                )
            else:
                pred = self.unet.apply({"params": state.params}, noisy, t)
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        return jax.jit(step)

    # ---------------------------------------------------------------- sampling

    def _sampling_params(self, state):
        """EMA weights when enabled, else the live params."""
        ema = getattr(state, "ema_params", None)
        return ema if ema is not None else state.params

    def sample_images(self, state, n_samples: int, rng, sampler: str = "ddpm",
                      num_inference_steps: Optional[int] = None,
                      class_label=None, guidance_scale: Optional[float] = None,
                      ) -> np.ndarray:
        """Generate n_samples images (decoded) via compiled trajectories
        (reference sample_images, train_ldm.py:332-366; caps :337-339).

        Class-conditional models: ``class_label`` (int or per-sample array)
        selects the class; sampling then uses classifier-free guidance
        ``eps = eps_null + g * (eps_class - eps_null)`` with
        g = ``guidance_scale`` (config default). Without ``class_label`` the
        null (unconditional) embedding is used."""
        assert self.latent_shape is not None
        shape = (n_samples,) + self.latent_shape[1:]

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
            steps = num_inference_steps or 50
            # params/labels ride as jit ARGUMENTS (apply_fn form): closing
            # over 441M weights embeds them as compile-time constants, which
            # TPU compile services cannot handle at flagship scale. The
            # sampler object is cached so chunked eval / per-epoch plots
            # reuse one compiled trajectory program (a fresh ddim_sample
            # call re-compiles: 94 s vs ~4 s per flagship call).
            key = (("plain",) if labels is None else ("guided", g)) + (steps,)
            z = common.cached_sampler(
                self, "_ddim_samplers", key,
                lambda: DDIMSampler(
                    self.schedule, apply_model, num_inference_steps=steps,
                    max_steps_per_call=self.config.get("ddim_steps_per_call"),
                ),
            )(bundle, shape, rng)
        else:
            # segment programs cache by guidance structure: labels ride as a
            # traced operand (one compile covers every class), g is baked
            key = ("plain",) if labels is None else ("guided", g)
            z = common.cached_sampler(
                self, "_ddpm_samplers", key,
                lambda: SegmentedDDPMSampler(self.schedule, apply_model),
            )(bundle, shape, rng)
        images = self._decode(z)
        return np.asarray(jnp.clip(images, 0.0, 1.0))

    # -------------------------------------------------------------- eval

    @property
    def feature_extractor(self) -> FeatureExtractor:
        """Cached per-trainer (the reference re-downloads its net every
        validate_main call, train_ldm.py:271-273 — here building the
        ResNet50 once per run)."""
        if getattr(self, "_extractor", None) is None:
            self._extractor = FeatureExtractor(spatial_dims=self.spatial_dims)
        return self._extractor

    # Reference protocol constants (train_ldm.py:276-277): MONAI metrics are
    # built with kernel_size=4 for both SSIM and MS-SSIM.
    EVAL_SSIM_KERNEL = 4

    def evaluate_generation(self, state, val_loader, n_samples: Optional[int] = None,
                            rng=None) -> Dict[str, float]:
        """Reference-exact generative eval (validate_main, train_ldm.py:266-328):
        n samples (100 2D / 40 3D, :513-514) generated with the FULL
        ancestral trajectory (:300,351), FID over extractor features, and
        pairwise SSIM / MS-SSIM with kernel_size=4 over ALL C(n,2) pairs
        (:315-321) — the pairwise pass as chunked jitted batches instead of
        one host dispatch per pair.

        ``eval_sampler``/``eval_num_inference_steps`` config keys can relax
        the protocol (e.g. DDIM-50 for quick in-training checks); defaults
        match the reference.
        """
        if n_samples is None:
            n_samples = 100 if self.spatial_dims == 2 else 40
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed + 777)
        sampler = str(self.config.get("eval_sampler", "ddpm"))
        num_steps = self.config.get("eval_num_inference_steps")

        cap = 16 if self.spatial_dims == 2 else 2  # reference :337-339
        samples = []
        remaining = n_samples
        while remaining > 0:
            take = min(cap, remaining)
            rng, sub = jax.random.split(rng)
            samples.append(
                self.sample_images(
                    state, take, sub, sampler=sampler,
                    num_inference_steps=num_steps,
                )
            )
            remaining -= take
        fake = np.concatenate(samples, axis=0)

        real = []
        for batch in val_loader:
            real.append(np.asarray(unpack_batch(batch)[0]))
            if sum(r.shape[0] for r in real) >= n_samples:
                break
        real = np.concatenate(real, axis=0)[:n_samples]

        extractor = self.feature_extractor
        feats_real = extractor(real)
        feats_fake = extractor(fake)
        fid = fid_from_features(feats_real, feats_fake)

        pw = pairwise_metrics(fake, win_size=self.EVAL_SSIM_KERNEL)
        metrics = {
            "fid": float(fid),
            "ssim": pw["ssim_mean"],
            "ssim_std": pw["ssim_std"],
            "ms_ssim": pw["ms_ssim_mean"],
            "ms_ssim_std": pw["ms_ssim_std"],
            "n_pairs": pw["n_pairs"],
        }
        # MMD over the same extractor features — the reference imports MONAI's
        # MMDMetric (train_ldm.py:32) but never calls it; here ``eval_mmd:
        # true`` makes it a real metric
        if self.config.get("eval_mmd"):
            from medical_image_generation_tpu.eval.mmd import mmd_from_features

            metrics["mmd"] = mmd_from_features(feats_real, feats_fake)
        print(
            f"FID: {metrics['fid']:.4f} - "
            f"MS-SSIM: {metrics['ms_ssim']:.4f} +- {metrics['ms_ssim_std']:.4f} - "
            f"SSIM: {metrics['ssim']:.4f} +- {metrics['ssim_std']:.4f} "
            f"({metrics['n_pairs']} pairs)"
            + (f" - MMD: {metrics['mmd']:.6f}" if "mmd" in metrics else "")
        )
        return metrics

    # -------------------------------------------------------------- main loop

    def train(self, train_loader, val_loader) -> None:
        # the active mesh enables ring-attention dispatch (ops/attention.py)
        # and scopes GSPMD sharding propagation for the jitted steps
        with profile_trace(self.config.get("profile_dir")), self.mesh:
            self._train_impl(train_loader, val_loader)

    def _train_impl(self, train_loader, val_loader) -> None:
        self.probe_latent(train_loader)
        state = self._build_state(steps_per_epoch=len(train_loader))
        train_step = self._make_train_step()
        val_step = self._make_val_step()
        ae_params = self.ae_params

        if self.config.get("load_model_path"):
            state = self._restore(state)

        base_rng = jax.random.PRNGKey(self.seed + 4321)
        step_counter = 0
        interval = int(self.config.get("val_plot_interval", 10))

        show_bar = bool(self.config.get("progress_bar"))
        timer = StepTimer("ldm_train")
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
                state, loss = train_step(state, ae_params, batch, rng)
                losses.append(loss)
                step_counter += 1
                timer.tick()
            train_loss = float(np.mean([np.asarray(l) for l in losses]))

            val_losses = []
            for i, batch in enumerate(val_loader):
                batch = put_batch(batch, self.mesh)
                rng = jax.random.fold_in(base_rng, 10_000_000 + epoch * 1000 + i)
                val_losses.append(float(val_step(state, ae_params, batch, rng)))
            val_loss = float(np.mean(val_losses))

            self.loss_dict["rec_loss"].append(train_loss)
            self.loss_dict["val_rec_loss"].append(val_loss)
            print(
                f"Epoch {epoch + 1}/{self.n_epochs} | loss {train_loss:.4f} | "
                f"val {val_loss:.4f} | {time.time() - t0:.1f}s | {timer.report()}"
            )

            self._save_epoch_artifacts(epoch, state, val_loss)

            if (epoch + 1) % interval == 0:
                n = 16 if self.spatial_dims == 2 else 2
                rng = jax.random.fold_in(base_rng, 20_000_000 + epoch)
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
                        recon=images[1] if len(images) > 1 else None,
                    )
                if self.config.get("run_generation_eval", self.spatial_dims == 2):
                    self.evaluate_generation(state, val_loader)

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
            "scale_factor": self.scale_factor,
            "latent_shape": list(self.latent_shape),
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
            "scale_factor": 0.0,
            "latent_shape": list(self.latent_shape),
        }
        payload = ckpt.load_checkpoint(path, target=target)
        state = state.replace(
            params=payload["params"], opt_state=payload["opt_state"], step=payload["step"]
        )
        if getattr(state, "ema_params", None) is not None and "ema_params" in payload:
            state = state.replace(ema_params=payload["ema_params"])
        self.start_epoch = int(payload["epoch"]) + 1
        self.best_val = float(payload["validation_loss"])
        self.scale_factor = float(payload["scale_factor"])
        prior = ckpt.load_loss_dict(self.save_path)
        if prior:
            self.loss_dict = prior
        print(f"Resumed from {path} at epoch {self.start_epoch}")
        state, self._state_sh = place_train_state(state, self.mesh)
        return state


# --------------------------------------------------------------------- CLI


def parse_arguments():
    parser = argparse.ArgumentParser(description="Train a Latent Diffusion Model.")
    parser.add_argument("dataset_id", type=str)
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
    return args


def main():
    maybe_initialize_distributed()
    args = parse_arguments()
    config = get_config_for_current_task(
        args.dataset_id, args.model_type, "ldm",
        progress_bar=args.progress_bar, continue_training=args.continue_training,
    )
    # filter BEFORE overrides (same ordering as all train CLIs): the user's
    # --set must win over mode filtering, and apply_overrides warns when an
    # override targets a key the mode dropped. latent_space_type comes from
    # its own CLI arg and steers the filter's vq/vae branch, so it is set
    # first.
    config["latent_space_type"] = args.latent_space_type
    config = filter_config_by_mode(config, "train_ldm")
    config = apply_overrides(config, args.overrides)
    # LDM consumes the AE's best checkpoint (reference train_ldm.py:631-636)
    results_root = os.getenv("medimgen_results")
    ae_best = os.path.join(
        results_root, config["task"], args.model_type, "autoencoder",
        "checkpoints", "best_model",
    )
    if not os.path.exists(ae_best):
        raise FileNotFoundError(
            f"Train the autoencoder first: no checkpoint at {ae_best}"
        )
    config["load_autoencoder_path"] = ae_best
    print_configuration(config, config["results_path"], "train", model="ldm")
    trainer = LDMTrainer(config, latent_space_type=args.latent_space_type)
    train_loader, val_loader = get_data_loaders(
        config, args.dataset_id, args.splitting, config["ddpm_batch_size"],
        args.model_type, config["ddpm_transformations"], args.fold,
        data_parallel=trainer.mesh.shape["data"], mesh=trainer.mesh,
    )
    trainer.train(train_loader, val_loader)


if __name__ == "__main__":
    main()
