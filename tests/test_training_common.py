"""Shared training machinery: optimizer construction, mu_dtype policy,
LR schedules (training/common.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medical_image_generation_tpu.training import common


def _mu_leaves(opt_state):
    leaves = []
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if hasattr(leaf, "dtype") and leaf.ndim > 0:
            leaves.append(leaf)
    return leaves


class TestMuDtype:
    def test_default_is_bfloat16(self):
        assert common.mu_dtype_from_config({}) == jnp.bfloat16
        assert common.mu_dtype_from_config({"adam_mu_dtype": "bf16"}) == jnp.bfloat16

    def test_opt_out_and_invalid(self):
        assert common.mu_dtype_from_config({"adam_mu_dtype": "float32"}) is None
        with pytest.raises(ValueError):
            common.mu_dtype_from_config({"adam_mu_dtype": "fp8"})

    def test_first_moment_dtype_flows_into_state(self):
        params = {"w": jnp.zeros((4, 4), jnp.float32)}
        tx = common.make_optimizer(1e-3, 1.0, 1, weight_decay=1e-2,
                                   mu_dtype=jnp.bfloat16)
        state = tx.init(params)
        dtypes = {str(leaf.dtype) for leaf in _mu_leaves(state)}
        assert "bfloat16" in dtypes  # adam mu
        assert "float32" in dtypes  # adam nu stays fp32

    def test_updates_still_fp32(self):
        params = {"w": jnp.ones((4,), jnp.float32)}
        tx = common.make_optimizer(1e-3, 1.0, 1, mu_dtype=jnp.bfloat16)
        state = tx.init(params)
        grads = {"w": jnp.full((4,), 0.5, jnp.float32)}
        updates, state = tx.update(grads, state, params)
        assert updates["w"].dtype == jnp.float32
        new = optax.apply_updates(params, updates)
        assert np.all(np.isfinite(np.asarray(new["w"])))


class TestLRSchedules:
    def test_linear_uses_steps_per_epoch(self):
        fn = common.make_lr_schedule(
            1.0, "LinearLR",
            {"start_factor": 1.0, "end_factor": 0.0, "total_iters": 10},
            steps_per_epoch=7,
        )
        # decay completes exactly at 10 epochs x 7 steps
        assert float(fn(0)) == pytest.approx(1.0)
        assert float(fn(35)) == pytest.approx(0.5)
        assert float(fn(70)) == pytest.approx(0.0)
        assert float(fn(100)) == pytest.approx(0.0)

    def test_polynomial(self):
        fn = common.make_lr_schedule(
            2.0, "PolynomialLR", {"total_iters": 4, "power": 1.0},
            steps_per_epoch=1,
        )
        assert float(fn(2)) == pytest.approx(1.0)

    def test_none_is_constant(self):
        fn = common.make_lr_schedule(3e-4, None, None, 250)
        assert float(fn(0)) == pytest.approx(3e-4)
        assert float(fn(10**6)) == pytest.approx(3e-4)
