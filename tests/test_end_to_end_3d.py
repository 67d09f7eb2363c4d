"""3D end-to-end smoke: plan -> preprocess -> AE -> LDM -> sample -> NIfTI.

The 2D chain is covered by test_end_to_end.py; this mirrors it with
``model_type="3d"`` so the TPU-verified 3D CLI chain (GIF fly-through plots,
NIfTI sample export) can't silently regress on the CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.config.run import get_config_for_current_task
from medical_image_generation_tpu.data.loader import get_data_loaders
from medical_image_generation_tpu.io.nifti import load_nifti
from medical_image_generation_tpu.planning.cli import plan_and_preprocess
from medical_image_generation_tpu.training.sample import _write_outputs
from medical_image_generation_tpu.training.train_autoencoder import AutoEncoderTrainer
from medical_image_generation_tpu.training.train_ldm import LDMTrainer

from synth import make_synthetic_dataset


def _shrink(config):
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
    n_levels = len(ddpm["num_channels"])
    ddpm["num_channels"] = [8, 16, 16][:n_levels]
    ddpm["num_head_channels"] = [0, 8, 8][:n_levels]
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
    config["ae_batch_size"] = 1
    config["ddpm_batch_size"] = 1
    config["val_plot_interval"] = 2
    config["run_generation_eval"] = False
    # small patches keep the CPU-mesh compile fast; geometry stays 3D
    for key in ("ae_transformations", "ddpm_transformations"):
        t = dict(config[key])
        t["patch_size"] = [16, 16, 16]
        config[key] = t
    return config


@pytest.mark.slow
class TestEndToEnd3D:
    @pytest.fixture(scope="class")
    def workspace(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("e2e3d")
        raw = make_synthetic_dataset(str(tmp / "raw"), n_patients=5,
                                     shape=(20, 24, 18), n_classes=1)
        pre_root = str(tmp / "preprocessed")
        res_root = str(tmp / "results")
        os.makedirs(pre_root)
        os.makedirs(res_root)
        plan_and_preprocess(
            raw, preprocessed_root=pre_root, max_workers=0, probe_memory=False
        )
        return {"pre": pre_root, "res": res_root}

    def _config(self, workspace, model_name):
        cfg = get_config_for_current_task(
            "099", "3d", model_name,
            preprocessed_root=workspace["pre"], results_root=workspace["res"],
        )
        return _shrink(cfg)

    def _loaders(self, workspace, cfg, key, steps=(2, 1)):
        return get_data_loaders(
            cfg, "099", "train-val-test", cfg["ae_batch_size"], "3d",
            cfg[key], preprocessed_root=workspace["pre"],
            num_threads=2, train_steps=steps[0], val_steps=steps[1],
            data_parallel=jax.device_count(),
        )

    def test_full_pipeline_3d(self, workspace, tmp_path):
        # ---- stage 1: 3D adversarial autoencoder
        cfg = self._config(workspace, "autoencoder")
        train_loader, val_loader = self._loaders(workspace, cfg, "ae_transformations")
        trainer = AutoEncoderTrainer(cfg, dtype=jnp.float32)
        trainer.train(train_loader, val_loader)

        run_dir = cfg["results_path"]
        assert os.path.exists(os.path.join(run_dir, "checkpoints", "best_model"))
        assert all(np.isfinite(v) for v in trainer.loss_dict["train_rec"])
        # 3D validation plots are GIF fly-throughs
        assert os.path.exists(os.path.join(run_dir, "plots", "epoch_2.gif"))

        # ---- stage 2: 3D latent diffusion
        cfg2 = self._config(workspace, "ldm")
        cfg2["load_autoencoder_path"] = os.path.join(
            run_dir, "checkpoints", "best_model"
        )
        train_loader2, val_loader2 = self._loaders(workspace, cfg2, "ddpm_transformations")
        ldm = LDMTrainer(cfg2, dtype=jnp.float32)
        ldm.train(train_loader2, val_loader2)

        run2 = cfg2["results_path"]
        assert os.path.exists(os.path.join(run2, "checkpoints", "best_model"))
        assert all(np.isfinite(v) for v in ldm.loss_dict["rec_loss"])
        assert os.path.exists(os.path.join(run2, "plots", "epoch_2.gif"))

        # ---- sampling: DDIM trajectory -> decode -> NIfTI export
        from medical_image_generation_tpu.training import checkpoints as ckpt

        payload = ckpt.load_checkpoint(
            os.path.join(ldm.save_dict["checkpoints"], "last_model")
        )
        state = type("S", (), {"params": jax.tree_util.tree_map(
            jnp.asarray, payload["params"]
        )})()
        images = ldm.sample_images(
            state, 2, jax.random.PRNGKey(0), sampler="ddim", num_inference_steps=5
        )
        assert images.ndim == 5 and images.shape[0] == 2
        assert np.all(np.isfinite(images))

        out_dir = str(tmp_path / "samples")
        _write_outputs(images, out_dir, "3d", "ldm_sample")
        nii = os.path.join(out_dir, "ldm_sample_000.nii.gz")
        assert os.path.exists(nii)
        img = load_nifti(nii)
        # (Z, Y, X, 1) sample -> (X, Y, Z) NIfTI spatial order
        assert tuple(img.shape[:3]) == tuple(reversed(images.shape[1:4]))
