"""Classifier-free guidance: label-conditioned loaders, dropout training,
guided sampling — a capability beyond the reference (its UNet fork carries
class embeddings, diffusion_model_unet_with_strides.py:1837-1839, but no
trainer or sampler ever feeds them)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.data.loader import (
    PatchDataset,
    PrefetchLoader,
    get_data_loaders,
    unpack_batch,
)
from medical_image_generation_tpu.io.volstore import write_volume
from medical_image_generation_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_batch_to_devices,
)
from medical_image_generation_tpu.planning.preprocess import save_properties


@pytest.fixture
def dataset_root(tmp_path):
    root = tmp_path / "pre"
    ds = root / "Task099_Synth"
    images = ds / "imagesTr"
    images.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        pid = f"p{i:03d}"
        vol = rng.uniform(0, 1, size=(1, 4, 16, 16)).astype(np.float32)
        write_volume(str(images / f"{pid}.vs"), vol, chunk_shape=(1, 1, 16, 16))
        locs = {1: [(z, 8, 8) for z in range(4)]}
        save_properties(str(images), pid, {"class_locations": locs,
                                           "min_max": [(0.0, 1.0)]})
    with open(ds / "dataset.json", "w") as f:
        json.dump({"n_patients": 6}, f)
    label_map = {f"p{i:03d}": i % 2 for i in range(6)}
    with open(ds / "class_labels.json", "w") as f:
        json.dump(label_map, f)
    return str(root), label_map


class TestConditionalLoader:
    def test_dict_batches_with_labels(self, dataset_root):
        root, label_map = dataset_root
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        ids = sorted(label_map)
        ds = PatchDataset(images, ids, batch_size=3, patch_size=(2, 8, 8),
                          class_map=label_map)
        loader = PrefetchLoader(ds, number_of_steps=2, num_threads=2)
        batch = next(iter(loader))
        assert set(batch) == {"image", "class"}
        assert batch["image"].shape == (3, 2, 8, 8, 1)
        assert batch["class"].shape == (3,)
        assert batch["class"].dtype == np.int32
        assert set(batch["class"]) <= {0, 1}
        imgs, labels = unpack_batch(batch)
        assert imgs is batch["image"] and labels is batch["class"]

    def test_class_map_missing_id_raises(self, dataset_root):
        root, label_map = dataset_root
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        bad = dict(label_map)
        bad.pop("p000")
        with pytest.raises(KeyError):
            PatchDataset(images, sorted(label_map), batch_size=2,
                         patch_size=(2, 8, 8), class_map=bad)

    def test_get_data_loaders_label_map_file(self, dataset_root):
        root, label_map = dataset_root
        config = {
            "num_workers": 2, "input_channels": [0],
            "class_conditioning": {"num_classes": 2,
                                   "label_map": "class_labels.json"},
        }
        train_loader, _ = get_data_loaders(
            config, "099", "train-val-test", batch_size=2, model_type="3d",
            transformations={"patch_size": [2, 8, 8]},
            preprocessed_root=root, train_steps=1, val_steps=1,
        )
        batch = next(iter(train_loader))
        assert isinstance(batch, dict) and "class" in batch

    def test_pad_batch_handles_dicts(self):
        mesh = get_mesh(n_devices=8, model_parallel=1)
        batch = {"image": np.zeros((6, 4, 4, 1), np.float32),
                 "class": np.arange(6, dtype=np.int32)}
        padded = pad_batch_to_devices(batch, mesh)
        assert padded["image"].shape[0] == 8
        assert padded["class"].shape[0] == 8
        arr = jax.device_put(padded, batch_sharding(mesh))
        assert arr["class"].shape == (8,)


def _tiny_ldm_trainer(tmp_path, dataset_root, class_cond):
    from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
    from medical_image_generation_tpu.training import checkpoints as ckpt
    from medical_image_generation_tpu.training.train_ldm import LDMTrainer

    from medical_image_generation_tpu.planning.planner import (
        create_autoencoder_dict,
        create_ddpm_dict,
    )

    ds = {"median_shape": (4, 16, 16), "min_shape": (4, 16, 16),
          "max_shape": (4, 16, 16)}
    vae_params = create_autoencoder_dict(ds, [0], spatial_dims=2)
    vae_params.update(
        num_channels=[8, 16][: len(vae_params["num_channels"])],
        norm_num_groups=4, latent_channels=4, num_res_blocks=1,
        use_checkpointing=False,
    )
    ddpm_params = create_ddpm_dict(ds, spatial_dims=2)
    n_lv = len(ddpm_params["num_channels"])
    ddpm_params.update(
        num_channels=[8, 16, 16][:n_lv],
        num_head_channels=[0, 8, 8][:n_lv],
        norm_num_groups=4, num_res_blocks=1, in_channels=4, out_channels=4,
        use_checkpointing=False,
    )
    ae = AutoencoderKL.from_config(vae_params, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    ae_vars = ae.init({"params": rng}, x, rng)
    ckpt_dir = str(tmp_path / "ae_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt.save_checkpoint(ckpt_dir, "best_model",
                         {"epoch": 0, "g_params": ckpt.to_host(ae_vars["params"])})
    config = {
        "task": "Task099_Synth",
        "vae_params": vae_params,
        "ddpm_params": ddpm_params,
        "time_scheduler_params": {
            "num_train_timesteps": 10, "schedule": "scaled_linear_beta",
            "beta_start": 0.0015, "beta_end": 0.0205,
        },
        "load_autoencoder_path": os.path.join(ckpt_dir, "best_model"),
        "results_path": str(tmp_path / "results" / "ldm"),
        "n_epochs": 1,
        "class_conditioning": class_cond,
    }
    return LDMTrainer(config, dtype=jnp.float32)


class TestCFGTraining:
    def test_train_step_and_guided_sampling(self, tmp_path, dataset_root):
        root, label_map = dataset_root
        cc = {"num_classes": 2, "label_map": label_map, "dropout_prob": 0.5,
              "guidance_scale": 3.0}
        trainer = _tiny_ldm_trainer(tmp_path, dataset_root, cc)

        # embed table has the +1 null row
        assert trainer.unet.num_class_embeds == 3

        config = {"num_workers": 2, "input_channels": [0],
                  "class_conditioning": cc}
        train_loader, _ = get_data_loaders(
            config, "099", "train-val-test", batch_size=2, model_type="2d",
            transformations={"patch_size": [16, 16]},
            preprocessed_root=root, train_steps=1, val_steps=1,
        )
        with trainer.mesh:
            trainer.probe_latent(train_loader)
            state = trainer._build_state(steps_per_epoch=1)
            # the class embedding table exists in the params
            flat = jax.tree_util.tree_leaves_with_path(state.params)
            assert any("Embed" in jax.tree_util.keystr(kp) for kp, _ in flat)

            step = trainer._make_train_step()
            batch = next(iter(train_loader))
            batch = jax.device_put(
                pad_batch_to_devices(batch, trainer.mesh),
                batch_sharding(trainer.mesh),
            )
            state, loss = step(state, trainer.ae_params, batch, jax.random.PRNGKey(1))
            assert np.isfinite(float(loss))

            val_step = trainer._make_val_step()
            vloss = val_step(state, trainer.ae_params, batch, jax.random.PRNGKey(2))
            assert np.isfinite(float(vloss))

            # guided sampling differs from unconditional sampling
            uncond = trainer.sample_images(
                state, 2, jax.random.PRNGKey(3), sampler="ddim",
                num_inference_steps=3,
            )
            guided = trainer.sample_images(
                state, 2, jax.random.PRNGKey(3), sampler="ddim",
                num_inference_steps=3, class_label=1,
            )
            assert uncond.shape == guided.shape == (2, 16, 16, 1)
            assert np.isfinite(uncond).all() and np.isfinite(guided).all()
            assert np.abs(uncond - guided).max() > 1e-7

            # the DDIM trajectory program is cached per (guidance, steps) —
            # repeated sampling must REUSE the compiled sampler (re-jitting
            # per call costs 94 s/call on the flagship), and reuse must be
            # bit-identical
            # class-conditional trainers sample "unconditional" via the null
            # label (labels is not None), so both calls take the guided key
            assert set(trainer._ddim_samplers) == {
                ("guided", 1.0, 3), ("guided", 3.0, 3)}
            uncond2 = trainer.sample_images(
                state, 2, jax.random.PRNGKey(3), sampler="ddim",
                num_inference_steps=3,
            )
            assert len(trainer._ddim_samplers) == 2
            np.testing.assert_array_equal(uncond, uncond2)

            # ddpm path: labels ride as traced operands (cache keyed once)
            g0 = trainer.sample_images(state, 1, jax.random.PRNGKey(4),
                                       sampler="ddpm", class_label=0)
            g1 = trainer.sample_images(state, 1, jax.random.PRNGKey(4),
                                       sampler="ddpm", class_label=1)
            assert len(trainer._ddpm_samplers) == 1  # one compile for all classes
            assert np.abs(g0 - g1).max() > 1e-7

    def test_label_dropout_uses_null_class(self, tmp_path, dataset_root):
        cc = {"num_classes": 2, "label_map": {}, "dropout_prob": 1.0}
        trainer = _tiny_ldm_trainer(tmp_path, dataset_root, cc)
        labels = jnp.asarray([0, 1, 0, 1], jnp.int32)
        dropped = trainer._dropout_labels(labels, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(dropped), [2, 2, 2, 2])
        trainer.cfg_dropout = 0.0
        kept = trainer._dropout_labels(labels, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(kept), [0, 1, 0, 1])
