import json
import os

import numpy as np
import pytest
import yaml

from medical_image_generation_tpu.io.volstore import open_volume
from medical_image_generation_tpu.planning import preprocess as pp
from medical_image_generation_tpu.planning.cli import plan_and_preprocess
from medical_image_generation_tpu.planning.fingerprint import (
    compute_laplacian_variance,
    otsu_threshold,
)

from synth import make_synthetic_dataset


class TestNormalization:
    def test_zscore_minmax_range_and_minmax_record(self):
        rng = np.random.default_rng(0)
        img = rng.normal(10, 5, size=(2, 4, 8, 8)).astype(np.float32)
        out, mm = pp.normalize_zscore_then_minmax(img)
        assert out.shape == img.shape
        for c in range(2):
            assert out[c].min() == pytest.approx(0.0, abs=1e-6)
            assert out[c].max() == pytest.approx(1.0, abs=1e-6)
            assert mm[c][0] == pytest.approx(float(img[c].min()))
            assert mm[c][1] == pytest.approx(float(img[c].max()))

    def test_constant_channel_no_nan(self):
        img = np.full((1, 2, 4, 4), 7.0, dtype=np.float32)
        out, _ = pp.normalize_zscore_then_minmax(img)
        assert np.all(np.isfinite(out))

    def test_foreground_percentiles_preserves_background(self):
        img = np.zeros((1, 4, 6, 6), dtype=np.float32)
        img[0, 1:3, 1:5, 1:5] = np.linspace(1, 100, 32).reshape(2, 4, 4)
        out, mm = pp.normalize_foreground_percentiles(img)
        assert np.all(out[img == 0] == 0)
        assert out.max() <= 1.0


class TestResample:
    def test_isotropic_upsample_shape(self):
        img = np.random.default_rng(1).normal(size=(10, 10, 10))
        out = pp.resample_image(img, [2.0, 2.0, 2.0], [1.0, 1.0, 1.0])
        assert out.shape == (20, 20, 20)

    def test_no_resample_when_spacing_matches(self):
        img = np.ones((5, 5, 5))
        out = pp.resample_image(img, [1, 1, 1], [1, 1, 1])
        assert out is img

    def test_anisotropic_lowres_axis_nearest(self):
        # low-res axis uses order 0: values come from nearest slices only
        img = np.zeros((4, 16, 16))
        img[1] = 1.0
        out = pp.resample_image(img, [5.0, 1.0, 1.0], [2.5, 1.0, 1.0])
        vals = np.unique(np.round(out, 6))
        assert set(vals).issubset({0.0, 1.0})

    def test_label_resample_classes_preserved(self):
        lbl = np.zeros((8, 8, 8), dtype=np.int32)
        lbl[2:5, 2:5, 2:5] = 1
        lbl[5:7, 5:7, 5:7] = 2
        out = pp.resample_label(lbl, [2, 2, 2], [1, 1, 1])
        assert out.shape == (16, 16, 16)
        assert set(np.unique(out)).issubset({0, 1, 2})
        assert (out == 1).sum() > 0 and (out == 2).sum() > 0

    def test_crop_to_nonzero(self):
        img = np.zeros((10, 10, 10))
        img[2:5, 3:7, 1:9] = 1.0
        cropped, _, (mins, maxs) = pp.crop_to_nonzero(img)
        assert cropped.shape == (3, 4, 8)
        assert list(mins) == [2, 3, 1]


class TestClassLocations:
    def test_sampling_caps_per_slice(self):
        lbl = np.zeros((3, 30, 30), dtype=np.uint8)
        lbl[0] = 1  # 900 voxels in slice 0
        lbl[1, :2, :2] = 2
        locs = pp.get_sampled_class_locations(lbl, samples_per_slice=50)
        assert len(locs[1]) == 50
        assert len(locs[2]) == 4
        for z, y, x in locs[1]:
            assert z == 0 and lbl[z, y, x] == 1


class TestQuality:
    def test_laplacian_variance_sharper_is_higher(self):
        rng = np.random.default_rng(2)
        sharp = rng.normal(size=(64, 64))
        from scipy import ndimage

        blurred = ndimage.gaussian_filter(sharp, 3.0)
        assert compute_laplacian_variance(sharp) > compute_laplacian_variance(blurred)

    def test_otsu_separates_bimodal(self):
        rng = np.random.default_rng(3)
        low = rng.normal(1, 0.1, 100)
        high = rng.normal(10, 0.1, 100)
        t = otsu_threshold(np.concatenate([low, high]))
        # threshold is a bin center, so the topmost low sample may sit just
        # above it (same granularity as skimage); allow 1 straggler
        assert np.sum(low > t) <= 1 and np.all(high > t)


@pytest.mark.slow
class TestEndToEndPlan:
    def test_plan_and_preprocess(self, tmp_path):
        raw = make_synthetic_dataset(str(tmp_path / "raw"), n_patients=4)
        out_root = str(tmp_path / "preprocessed")
        os.makedirs(out_root)
        ds_path = plan_and_preprocess(
            raw, preprocessed_root=out_root, max_workers=0, probe_memory=False
        )

        # dataset.json contract (reference configuration.py:1606-1619)
        with open(os.path.join(ds_path, "dataset.json")) as f:
            dj = json.load(f)
        for key in (
            "median_shape", "min_shape", "max_shape", "median_spacing",
            "channel_mins", "channel_maxs", "n_classes", "class_labels",
            "n_channels", "n_patients",
        ):
            assert key in dj
        assert dj["n_patients"] == 4
        assert dj["n_channels"] == 1
        assert set(dj["class_labels"]) == {1, 2}

        # medimgen_config.yaml {2D,3D} schema (configuration.py:1657-1674)
        with open(os.path.join(ds_path, "medimgen_config.yaml")) as f:
            cfg = yaml.safe_load(f)
        assert set(cfg.keys()) == {"2D", "3D"}
        for mode in ("2D", "3D"):
            c = cfg[mode]
            assert "vae_params" in c and "ddpm_params" in c
            assert "ae_transformations" in c and "time_scheduler_params" in c

        # preprocessed volumes + properties exist and are loadable
        imgs = sorted(os.listdir(os.path.join(ds_path, "imagesTr")))
        vs_files = [f for f in imgs if f.endswith(".vs")]
        pkl_files = [f for f in imgs if f.endswith(".pkl")]
        assert len(vs_files) == 4 and len(pkl_files) == 4
        vol = open_volume(os.path.join(ds_path, "imagesTr", vs_files[0]))
        assert vol.ndim == 4  # (C, Z, Y, X)
        data = vol.read_full()
        assert data.min() >= 0.0 and data.max() <= 1.0

        props = pp.load_properties(
            os.path.join(ds_path, "imagesTr"), vs_files[0].replace(".vs", "")
        )
        assert "class_locations" in props and "min_max" in props

    def test_memory_plan_written_into_config(self, tmp_path, monkeypatch):
        """With probing on, the chosen batch/accum/remat/policy land in the
        emitted YAML (vae_params.use_checkpointing + remat_policy)."""
        from medical_image_generation_tpu.planning import memory

        def fake_select(config, model_type, init_batch_size, **kw):
            if model_type == "2d":
                return memory.MemoryPlan(12, 2, True, "acts")
            return memory.MemoryPlan(1, 2, True, "full")

        monkeypatch.setattr(memory, "auto_select_hyperparams", fake_select)
        raw = make_synthetic_dataset(str(tmp_path / "raw"), n_patients=3)
        out_root = str(tmp_path / "preprocessed")
        os.makedirs(out_root)
        ds_path = plan_and_preprocess(
            raw, preprocessed_root=out_root, max_workers=0, probe_memory=True
        )
        with open(os.path.join(ds_path, "medimgen_config.yaml")) as f:
            cfg = yaml.safe_load(f)
        c2, c3 = cfg["2D"], cfg["3D"]
        assert (c2["ae_batch_size"], c2["grad_accumulate_step"]) == (12, 2)
        assert c2["vae_params"]["use_checkpointing"] is True
        assert c2["vae_params"]["remat_policy"] == "acts"
        assert (c3["ae_batch_size"], c3["grad_accumulate_step"]) == (1, 2)
        assert c3["ddpm_batch_size"] == 2
        assert c3["vae_params"]["remat_policy"] == "full"


class TestConfigOverrides:
    def test_apply_overrides(self):
        from medical_image_generation_tpu.config.run import apply_overrides

        cfg = {"n_epochs": 100, "vae_params": {"num_res_blocks": 2},
               "ae_transformations": {"mirror": True}}
        out = apply_overrides(cfg, [
            "n_epochs=50",
            "vae_params.num_res_blocks=3",
            "ae_transformations.mirror=false",
            "ae_transformations.patch_size=[32, 32]",
        ])
        assert out["n_epochs"] == 50
        assert out["vae_params"]["num_res_blocks"] == 3
        assert out["ae_transformations"]["mirror"] is False
        assert out["ae_transformations"]["patch_size"] == [32, 32]

    def test_bad_override_raises(self):
        import pytest as _pytest

        from medical_image_generation_tpu.config.run import apply_overrides

        with _pytest.raises(ValueError):
            apply_overrides({}, ["no_equals_sign"])


class TestFilterConfigByMode:
    def _cfg(self):
        return {
            "vae_params": {"spatial_dims": 2}, "kl_weight": 1e-6,
            "ddpm_params": {"spatial_dims": 2}, "time_scheduler_params": {},
            "ddpm_learning_rate": 2e-5, "adv_weight": 0.01,
            "perceptual_params": {}, "discriminator_params": {},
            "g_learning_rate": 5e-5,
        }

    def test_autoencoder_mode_drops_ddpm(self):
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        out = filter_config_by_mode(self._cfg(), "train_autoencoder")
        assert "ddpm_params" not in out and "time_scheduler_params" not in out
        assert "vae_params" in out and "kl_weight" in out

    def test_ldm_mode_drops_ae_losses(self):
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        out = filter_config_by_mode(self._cfg(), "train_ldm")
        assert "adv_weight" not in out and "perceptual_params" not in out
        assert "ddpm_params" in out and "vae_params" in out

    def test_vq_without_vqvae_params_keeps_vae_geometry(self):
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        cfg = dict(self._cfg(), latent_space_type="vq")
        out = filter_config_by_mode(cfg, "train_autoencoder")
        assert "vae_params" in out  # planner emits no vqvae_params
        assert "kl_weight" not in out

    def test_vq_with_vqvae_params_drops_vae(self):
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        cfg = dict(self._cfg(), latent_space_type="vq", vqvae_params={"x": 1})
        out = filter_config_by_mode(cfg, "train_autoencoder")
        assert "vae_params" not in out and "vqvae_params" in out

    def test_ddpm_mode_swaps_in_ddpm_schedule(self):
        """medimgen_train_ddpm defaults to the reference DDPM trainer's own
        schedule (train_ddpm.py:380-381: linear_beta 0.0005->0.0195), not
        the LDM's scaled-linear ramp — emitted by the planner as
        ddpm_time_scheduler_params and swapped in by mode filtering."""
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        cfg = dict(
            self._cfg(),
            time_scheduler_params={"schedule": "scaled_linear_beta",
                                   "beta_start": 0.0015, "beta_end": 0.0205},
            ddpm_time_scheduler_params={"schedule": "linear_beta",
                                        "beta_start": 0.0005,
                                        "beta_end": 0.0195},
        )
        out = filter_config_by_mode(cfg, "train_ddpm")
        assert out["time_scheduler_params"]["beta_start"] == 0.0005
        assert out["time_scheduler_params"]["schedule"] == "linear_beta"
        assert "ddpm_time_scheduler_params" not in out
        # other modes keep the LDM schedule and drop the DDPM-specific key
        out_ldm = filter_config_by_mode(cfg, "train_ldm")
        assert out_ldm["time_scheduler_params"]["beta_start"] == 0.0015
        assert "ddpm_time_scheduler_params" not in out_ldm

    def test_ddpm_mode_without_planner_key_keeps_schedule(self):
        from medical_image_generation_tpu.config.run import filter_config_by_mode

        cfg = dict(self._cfg(),
                   time_scheduler_params={"beta_start": 0.0015})
        out = filter_config_by_mode(cfg, "train_ddpm")
        assert out["time_scheduler_params"]["beta_start"] == 0.0015

    def test_override_after_filter_wins_over_schedule_swap(self, capsys):
        # all train CLIs filter FIRST, then apply --set (round-4 advisor:
        # train_ddpm diverged from ldm/ae); the user's override must land on
        # the post-swap key the trainer actually reads
        from medical_image_generation_tpu.config.run import (
            apply_overrides,
            filter_config_by_mode,
        )

        cfg = dict(self._cfg(),
                   time_scheduler_params={"beta_start": 0.0015},
                   ddpm_time_scheduler_params={"beta_start": 0.0005,
                                               "schedule": "linear_beta"})
        out = filter_config_by_mode(cfg, "train_ddpm")
        out = apply_overrides(out, ["time_scheduler_params.beta_start=0.01"])
        assert out["time_scheduler_params"]["beta_start"] == 0.01
        assert "WARNING" not in capsys.readouterr().out

    def test_override_of_mode_dropped_key_warns(self, capsys):
        from medical_image_generation_tpu.config.run import (
            apply_overrides,
            filter_config_by_mode,
        )

        cfg = dict(self._cfg(),
                   ddpm_time_scheduler_params={"beta_start": 0.0005})
        out = filter_config_by_mode(cfg, "train_ddpm")
        # the swap pops the planner key; targeting it post-filter is inert
        # for the trainer and must be called out
        out = apply_overrides(
            out, ["ddpm_time_scheduler_params.beta_start=0.01"])
        assert "WARNING" in capsys.readouterr().out
        assert out["ddpm_time_scheduler_params"]["beta_start"] == 0.01

    def test_planner_emits_ddpm_schedule(self):
        from medical_image_generation_tpu.planning.planner import (
            create_autoencoder_dict,
            create_config_dict,
            create_ddpm_dict,
        )

        ds = {"median_shape": (64, 64, 64), "max_shape": (64, 64, 64)}
        vae = create_autoencoder_dict(ds, [0], spatial_dims=3)
        ddpm = create_ddpm_dict(ds, spatial_dims=3)
        cfg = create_config_dict(ds, [0], 1, vae, ddpm)
        assert cfg["ddpm_time_scheduler_params"]["beta_start"] == 0.0005
        assert cfg["ddpm_time_scheduler_params"]["beta_end"] == 0.0195
        assert cfg["time_scheduler_params"]["beta_start"] == 0.0015
