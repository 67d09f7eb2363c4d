"""End-to-end smoke: plan -> preprocess -> AE -> LDM -> DDPM -> sample.

Exercises the full reference workflow (README.md usage: plan_and_preprocess,
train_autoencoder, train_ldm, sampling) on a tiny synthetic dataset with
shrunken networks, on the virtual 8-device CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from medical_image_generation_tpu.config.run import get_config_for_current_task
from medical_image_generation_tpu.data.loader import get_data_loaders
from medical_image_generation_tpu.planning.cli import plan_and_preprocess
from medical_image_generation_tpu.training.train_autoencoder import AutoEncoderTrainer
from medical_image_generation_tpu.training.train_ddpm import DDPMTrainer
from medical_image_generation_tpu.training.train_ldm import LDMTrainer

from synth import make_synthetic_dataset


def _shrink(config):
    """Make the planner's config tiny for CPU test speed."""
    config = dict(config)
    vae = dict(config["vae_params"])
    n_levels = len(vae["num_channels"])
    vae["num_channels"] = [8, 16, 16, 16][:n_levels]
    vae["norm_num_groups"] = 4
    vae["latent_channels"] = 4
    vae["num_res_blocks"] = 1
    vae["use_checkpointing"] = False
    config["vae_params"] = vae
    ddpm = dict(config["ddpm_params"])
    ddpm["num_channels"] = [8, 16, 16]
    ddpm["num_head_channels"] = [0, 8, 8]
    ddpm["norm_num_groups"] = 4
    ddpm["num_res_blocks"] = 1
    ddpm["in_channels"] = 4
    ddpm["out_channels"] = 4
    ddpm["use_checkpointing"] = False
    config["ddpm_params"] = ddpm
    disc = dict(config["discriminator_params"])
    disc["num_channels"] = 8
    config["discriminator_params"] = disc
    ts = dict(config["time_scheduler_params"])
    ts["num_train_timesteps"] = 10
    config["time_scheduler_params"] = ts
    config["n_epochs"] = 2
    config["autoencoder_warm_up_epochs"] = 1
    config["ae_batch_size"] = 2
    config["ddpm_batch_size"] = 2
    config["val_plot_interval"] = 2
    config["run_generation_eval"] = False
    return config


@pytest.mark.slow
class TestEndToEnd:
    @pytest.fixture(scope="class")
    def workspace(self, tmp_path_factory, monkeypatch_class=None):
        tmp = tmp_path_factory.mktemp("e2e")
        raw = make_synthetic_dataset(str(tmp / "raw"), n_patients=5,
                                     shape=(20, 24, 18), n_classes=1)
        pre_root = str(tmp / "preprocessed")
        res_root = str(tmp / "results")
        os.makedirs(pre_root)
        os.makedirs(res_root)
        ds_path = plan_and_preprocess(
            raw, preprocessed_root=pre_root, max_workers=0, probe_memory=False
        )
        return {"pre": pre_root, "res": res_root, "ds": ds_path}

    def _config(self, workspace, model_name, model_type="2d", continue_training=False):
        cfg = get_config_for_current_task(
            "099", model_type, model_name,
            preprocessed_root=workspace["pre"], results_root=workspace["res"],
            continue_training=continue_training,
        )
        return _shrink(cfg)

    def _loaders(self, workspace, cfg, key, steps=(3, 2)):
        # per-chip batch x mesh 'data' size = global batch (production
        # semantics: every sample an independent draw, no duplicate tiling)
        return get_data_loaders(
            cfg, "099", "train-val-test", cfg["ae_batch_size"], "2d",
            cfg[key], preprocessed_root=workspace["pre"],
            num_threads=2, train_steps=steps[0], val_steps=steps[1],
            data_parallel=jax.device_count(),
        )

    def test_full_pipeline_2d(self, workspace):
        # ---- stage 1: adversarial autoencoder
        cfg = self._config(workspace, "autoencoder")
        train_loader, val_loader = self._loaders(workspace, cfg, "ae_transformations")
        trainer = AutoEncoderTrainer(cfg, dtype=jnp.float32)
        trainer.train(train_loader, val_loader)

        run_dir = cfg["results_path"]
        assert os.path.exists(os.path.join(run_dir, "checkpoints", "last_model"))
        assert os.path.exists(os.path.join(run_dir, "checkpoints", "best_model"))
        assert os.path.exists(os.path.join(run_dir, "plots", "loss.png"))
        assert os.path.exists(os.path.join(run_dir, "loss_dict.pkl"))
        assert os.path.exists(os.path.join(run_dir, "config.yaml"))
        assert len(trainer.loss_dict["train_rec"]) == 2
        assert all(np.isfinite(v) for v in trainer.loss_dict["train_rec"])

        # ---- stage 2: latent diffusion over the frozen AE
        cfg2 = self._config(workspace, "ldm")
        cfg2["load_autoencoder_path"] = os.path.join(
            run_dir, "checkpoints", "best_model"
        )
        train_loader2, val_loader2 = self._loaders(workspace, cfg2, "ddpm_transformations")
        ldm = LDMTrainer(cfg2, dtype=jnp.float32)
        ldm.train(train_loader2, val_loader2)

        run2 = cfg2["results_path"]
        assert os.path.exists(os.path.join(run2, "checkpoints", "best_model"))
        assert len(ldm.loss_dict["rec_loss"]) == 2
        assert all(np.isfinite(v) for v in ldm.loss_dict["rec_loss"])
        # sample grid written at epoch 2 (interval 2)
        assert os.path.exists(os.path.join(run2, "plots", "epoch_2.png"))

        # ---- sampling API direct (checkpoint -> DDIM -> decode)
        state = type("S", (), {"params": _to_params(ldm)})()
        images = ldm.sample_images(
            state, 2, jax.random.PRNGKey(0), sampler="ddim", num_inference_steps=5
        )
        assert images.shape[0] == 2
        assert np.all(np.isfinite(images))

    def test_ae_resume(self, workspace):
        cfg = self._config(workspace, "autoencoder", continue_training=True)
        cfg["n_epochs"] = 3
        train_loader, val_loader = self._loaders(workspace, cfg, "ae_transformations")
        trainer = AutoEncoderTrainer(cfg, dtype=jnp.float32)
        trainer.train(train_loader, val_loader)
        # resumed from epoch 2 -> exactly one more epoch appended
        assert trainer.start_epoch == 2
        assert len(trainer.loss_dict["train_rec"]) == 3

    def test_ddpm_pixel_space(self, workspace):
        cfg = self._config(workspace, "ddpm")
        train_loader, val_loader = self._loaders(workspace, cfg, "ddpm_transformations")
        trainer = DDPMTrainer(cfg, dtype=jnp.float32)
        trainer.train(train_loader, val_loader)
        run_dir = cfg["results_path"]
        assert os.path.exists(os.path.join(run_dir, "checkpoints", "best_model"))
        assert all(np.isfinite(v) for v in trainer.loss_dict["rec_loss"])


def _to_params(ldm):
    """Pull current trained params from the LDM's last checkpoint."""
    import jax
    import jax.numpy as jnp

    from medical_image_generation_tpu.training import checkpoints as ckpt

    payload = ckpt.load_checkpoint(
        os.path.join(ldm.save_dict["checkpoints"], "last_model")
    )
    return jax.tree_util.tree_map(jnp.asarray, payload["params"])
