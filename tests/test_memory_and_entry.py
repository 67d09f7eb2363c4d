"""Tests for AOT memory-based batch selection and the driver entry points."""

import jax
import numpy as np
import pytest

from medical_image_generation_tpu.planning.memory import (
    auto_select_hyperparams,
    device_memory_budget,
    estimate_ae_step_memory,
)
from medical_image_generation_tpu.planning.planner import (
    create_autoencoder_dict,
    create_config_dict,
    create_ddpm_dict,
)


def tiny_config():
    ds = {"median_shape": (16, 32, 32), "max_shape": (16, 32, 32), "n_patients": 10}
    vae = create_autoencoder_dict(ds, [0], spatial_dims=2)
    vae["num_channels"] = [8, 16]
    vae["norm_num_groups"] = 4
    vae["latent_channels"] = 4
    vae["num_res_blocks"] = 1
    vae["use_checkpointing"] = False
    ddpm = create_ddpm_dict(ds, spatial_dims=2)
    return create_config_dict(ds, [0], 1, vae, ddpm)


class TestMemoryAnalysis:
    def test_budget_positive(self):
        assert device_memory_budget() > 1e9

    def test_estimate_scales_with_batch(self):
        cfg = tiny_config()
        small = estimate_ae_step_memory(cfg, 2)
        if small is None:
            pytest.skip("backend exposes no memory analysis")
        big = estimate_ae_step_memory(cfg, 8)
        assert big > small

    def test_ladder_accepts_fitting_batch(self):
        cfg = tiny_config()
        bs, accum = auto_select_hyperparams(cfg, "2d", init_batch_size=8,
                                            budget_bytes=10**12)
        assert (bs, accum) == (8, 1)

    def test_ladder_halves_on_tight_budget(self):
        cfg = tiny_config()
        est = estimate_ae_step_memory(cfg, 24)
        if est is None:
            pytest.skip("backend exposes no memory analysis")
        # budget below the batch-24 requirement forces the ladder down
        bs, accum = auto_select_hyperparams(cfg, "2d", init_batch_size=24,
                                            budget_bytes=est - 1)
        assert bs < 24 and accum == 2


class TestGraftEntry:
    def test_entry_shapes(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        params, x, t = args
        out_shape = jax.eval_shape(fn, params, x, t)
        assert out_shape.shape == x.shape

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
