import numpy as np
import pytest

from medical_image_generation_tpu.planning.planner import (
    VALID_2D_SIZES,
    VALID_3D_SIZES,
    compute_downsample_parameters,
    compute_output_size,
    create_autoencoder_dict,
    create_config_dict,
    create_ddpm_dict,
    epochs_multiplier,
    snap_patch_size,
)


class TestDownsampleParameters:
    def test_isotropic_3d_two_layers(self):
        params = compute_downsample_parameters([64, 64, 64], 2)
        # layer 0: no downsampling, full 3x3x3
        assert params[0] == [[1, 1, 1], [3, 3, 3], [1, 1, 1]]
        # layer 1: stride-2 everywhere
        assert params[1] == [[2, 2, 2], [3, 3, 3], [1, 1, 1]]

    def test_anisotropic_first_layer_kernel_1(self):
        # thin axis (<= 0.5 * max other) gets kernel 1 on the first layer
        params = compute_downsample_parameters([16, 64, 64], 2)
        assert params[0] == [[1, 1, 1], [1, 3, 3], [0, 1, 1]]
        # layer 1: thin axis is not downsampled
        assert params[1] == [[1, 2, 2], [1, 3, 3], [0, 1, 1]]

    def test_anisotropic_axis_catches_up(self):
        # after enough halvings of the big axes the thin axis starts striding
        params = compute_downsample_parameters([16, 64, 64], 4)
        sizes = compute_output_size([16, 64, 64], params)
        # 64 -> 32 -> 16 -> 8 while 16 stays until it is no longer "thin"
        assert params[3][0][0] == 2  # z eventually strides
        assert sizes == [8, 8, 8]

    def test_output_size_matches_conv_arithmetic(self):
        params = compute_downsample_parameters([48, 192, 192], 3)
        out = compute_output_size([48, 192, 192], params)
        # verify against explicit conv arithmetic
        size = [48, 192, 192]
        for stride, kernel, padding in params:
            size = [
                (s + 2 * p - k) // st + 1
                for s, st, k, p in zip(size, stride, kernel, padding)
            ]
        assert out == size

    def test_2d(self):
        params = compute_downsample_parameters([256, 256], 3)
        assert compute_output_size([256, 256], params) == [64, 64]


class TestSnapping:
    def test_2d_uses_max_shape_minus_leading_axis(self):
        ps = snap_patch_size([32, 100, 100], [40, 250, 260], spatial_dims=2)
        assert ps == [256, 256]

    def test_3d_uses_median_shape(self):
        ps = snap_patch_size([30, 100, 100], [40, 250, 260], spatial_dims=3)
        assert ps == [32, 96, 96]

    def test_all_snapped_values_valid(self):
        for s in range(20, 600, 37):
            v2 = min(VALID_2D_SIZES, key=lambda x: abs(x - s))
            v3 = min(VALID_3D_SIZES, key=lambda x: abs(x - s))
            assert v2 in VALID_2D_SIZES and v3 in VALID_3D_SIZES


@pytest.fixture
def dataset_config():
    return {
        "median_shape": (24, 120, 130),
        "min_shape": (20, 100, 110),
        "max_shape": (30, 140, 150),
        "n_patients": 50,
    }


class TestConfigDicts:
    def test_autoencoder_dict_3d(self, dataset_config):
        d = create_autoencoder_dict(dataset_config, [0], spatial_dims=3)
        assert d["spatial_dims"] == 3
        assert d["in_channels"] == 1 and d["out_channels"] == 1
        assert d["latent_channels"] == 8
        n_levels = len(d["num_channels"])
        assert len(d["downsample_parameters"]) == n_levels
        assert len(d["upsample_parameters"]) == n_levels - 1
        assert len(d["attention_levels"]) == n_levels
        # latent stays manageable
        patch = snap_patch_size(
            dataset_config["median_shape"], dataset_config["max_shape"], 3
        )
        latent = compute_output_size(patch, d["downsample_parameters"])
        assert max(latent) <= 96

    def test_ddpm_dict_strides_match_latent(self, dataset_config):
        ae = create_autoencoder_dict(dataset_config, [0], spatial_dims=3)
        dd = create_ddpm_dict(dataset_config, spatial_dims=3)
        assert dd["in_channels"] == ae["latent_channels"]
        assert len(dd["strides"]) == 3
        assert dd["num_channels"] == [256, 512, 768]
        assert dd["attention_levels"] == [False, True, True]

    def test_config_dict_defaults(self, dataset_config):
        ae = create_autoencoder_dict(dataset_config, [0], spatial_dims=3)
        dd = create_ddpm_dict(dataset_config, spatial_dims=3)
        cfg = create_config_dict(dataset_config, [0], 1, ae, dd)
        assert cfg["ae_batch_size"] == 2
        assert cfg["ddpm_batch_size"] == 4
        assert cfg["n_epochs"] == 300
        assert cfg["kl_weight"] == 1e-7
        assert cfg["perc_weight"] == 0.125
        assert cfg["adv_weight"] == 0.01
        assert cfg["time_scheduler_params"]["num_train_timesteps"] == 1000
        assert cfg["time_scheduler_params"]["beta_start"] == 0.0015
        assert cfg["ae_transformations"]["rotation"] is True
        assert cfg["ddpm_transformations"]["rotation"] is False

    def test_config_dict_2d(self, dataset_config):
        ae = create_autoencoder_dict(dataset_config, [0, 1], spatial_dims=2)
        dd = create_ddpm_dict(dataset_config, spatial_dims=2)
        cfg = create_config_dict(dataset_config, [0, 1], 2, ae, dd)
        assert cfg["ae_batch_size"] == 24
        assert cfg["n_epochs"] == 400
        assert cfg["kl_weight"] == 1e-6
        assert cfg["perc_weight"] == 0.5
        assert ae["num_channels"][0] == 64

    def test_epochs_multiplier(self):
        assert epochs_multiplier(50) == 1
        assert epochs_multiplier(300) == 2
        assert epochs_multiplier(1000) == 3
