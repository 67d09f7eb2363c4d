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


class TestCheckpointGroupNormMigration:
    """Pre-round-2 checkpoints nest GroupNorm params one level deeper
    (.../GroupNorm_k/GroupNorm_0/{scale,bias}); loading must collapse that
    transparently (ADVICE round-2)."""

    def _legacy_and_target(self):
        legacy = {
            "g_params": {
                "encoder": {
                    "GroupNorm_0": {"GroupNorm_0": {
                        "scale": np.ones((8,), np.float32),
                        "bias": np.zeros((8,), np.float32),
                    }},
                    "Conv_0": {"kernel": np.ones((3, 3, 2, 8), np.float32)},
                },
            },
            "epoch": 3,
        }
        target = {
            "g_params": {
                "encoder": {
                    "GroupNorm_0": {
                        "scale": np.zeros((8,), np.float32),
                        "bias": np.zeros((8,), np.float32),
                    },
                    "Conv_0": {"kernel": np.zeros((3, 3, 2, 8), np.float32)},
                },
            },
            "epoch": 0,
        }
        return legacy, target

    def test_migration_collapses_nesting(self, tmp_path):
        from medical_image_generation_tpu.training import checkpoints as ckpt

        legacy, target = self._legacy_and_target()
        ckpt.save_checkpoint(str(tmp_path), "legacy_model", legacy)
        out = ckpt.load_checkpoint(
            str(tmp_path / "legacy_model"), target=target
        )
        np.testing.assert_allclose(
            out["g_params"]["encoder"]["GroupNorm_0"]["scale"], 1.0
        )
        assert int(out["epoch"]) == 3

    def test_migrate_fn_counts(self):
        from medical_image_generation_tpu.training.checkpoints import (
            _migrate_groupnorm_params,
        )

        legacy, _ = self._legacy_and_target()
        migrated, n = _migrate_groupnorm_params(legacy)
        assert n == 1
        assert "scale" in migrated["g_params"]["encoder"]["GroupNorm_0"]
        # already-migrated trees pass through untouched
        again, n2 = _migrate_groupnorm_params(migrated)
        assert n2 == 0

    def test_current_layout_loads_unchanged(self, tmp_path):
        from medical_image_generation_tpu.training import checkpoints as ckpt

        _, target = self._legacy_and_target()
        current = jax.tree_util.tree_map(lambda x: x, target)
        current["epoch"] = 7
        ckpt.save_checkpoint(str(tmp_path), "cur_model", current)
        out = ckpt.load_checkpoint(str(tmp_path / "cur_model"), target=target)
        assert int(out["epoch"]) == 7


class TestAutoKLWeight:
    """kl_weight: auto wiring (reference train_autoencoder.py:295-328)."""

    def test_parse_kl_weight(self):
        from medical_image_generation_tpu.training.train_autoencoder import (
            parse_kl_weight,
        )

        assert parse_kl_weight("auto") == (True, 1e-6)
        assert parse_kl_weight("AUTO") == (True, 1e-6)
        assert parse_kl_weight(1e-7) == (False, 1e-7)
        assert parse_kl_weight("1e-7") == (False, 1e-7)
        assert parse_kl_weight(None) == (False, 1e-6)

    def test_adapt_measures_and_sets_weight(self):
        from medical_image_generation_tpu.models import AutoencoderKL
        from medical_image_generation_tpu.parallel.mesh import get_mesh
        from medical_image_generation_tpu.training.train_autoencoder import (
            AutoEncoderTrainer,
        )

        from medical_image_generation_tpu.planning.planner import (
            create_autoencoder_dict,
        )

        p = create_autoencoder_dict(
            {
                "median_shape": (16, 48, 48), "min_shape": (12, 40, 40),
                "max_shape": (20, 56, 56),
            },
            [0], 2,
        )
        p["num_channels"] = [8, 16][: len(p["num_channels"])]
        p.update(norm_num_groups=4, latent_channels=2, num_res_blocks=1,
                 use_checkpointing=False)
        model = AutoencoderKL.from_config(p, dtype=jnp.float32)
        x = jnp.ones((2, 16, 16, 1))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, x, rng)

        tr = AutoEncoderTrainer.__new__(AutoEncoderTrainer)
        tr.config = {"kl_weight": "auto"}
        tr.auto_kl_weight = True
        tr.kl_weight = 1e-6
        tr.latent_space_type = "vae"
        tr.model = model
        tr.mesh = get_mesh()

        state = type("S", (), {"params": variables["params"]})()
        batches = [np.random.default_rng(0).uniform(size=(8, 16, 16, 1)).astype(np.float32)]
        with tr.mesh:
            tr.adapt_kl_loss_weight(state, batches)
        # weight = 0.001 / 10^floor(log10(mean KL)): a positive power of ten
        assert tr.kl_weight > 0
        import math

        log_w = math.log10(tr.kl_weight)
        assert abs(log_w - round(log_w)) < 1e-9

    def test_pinned_weight_skips_measurement(self):
        from medical_image_generation_tpu.training.train_autoencoder import (
            AutoEncoderTrainer,
        )

        tr = AutoEncoderTrainer.__new__(AutoEncoderTrainer)
        tr.config = {"kl_weight": 1e-7}
        tr.auto_kl_weight = False
        tr.kl_weight = 1e-7
        tr.latent_space_type = "vae"
        tr.adapt_kl_loss_weight(None, None)  # must not touch loader/state
        assert tr.kl_weight == 1e-7


class TestCheckpointInterval:
    """checkpoint_interval gates the multi-GB last_model host fetch:
    last_model saves every Nth epoch and on the final epoch, best_model on
    every val improvement; nothing is fetched on skipped, non-improving
    epochs."""

    def _mk_trainer(self, tmp_path, interval, n_epochs):
        from medical_image_generation_tpu.training.train_ldm import LDMTrainer

        tr = LDMTrainer.__new__(LDMTrainer)
        tr.config = {"checkpoint_interval": interval}
        tr.n_epochs = n_epochs
        tr.best_val = float("inf")
        tr.loss_dict = {"rec_loss": [0.5], "val_rec_loss": [0.5]}
        tr.save_path = str(tmp_path)
        tr.save_dict = {"plots": str(tmp_path), "checkpoints": str(tmp_path)}
        tr.scale_factor = 1.0
        tr.latent_shape = (4, 4, 4)
        return tr

    def test_interval_and_best_gating(self, tmp_path, monkeypatch):
        from medical_image_generation_tpu.training import train_ldm as mod

        saves = []
        monkeypatch.setattr(mod.plots, "save_main_losses",
                            lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "save_loss_dict", lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "to_host", lambda t: t)
        monkeypatch.setattr(
            mod.ckpt, "save_checkpoint",
            lambda _dir, name, _payload: saves.append(name))

        tr = self._mk_trainer(tmp_path, interval=3, n_epochs=6)
        state = type("S", (), {"params": {}, "opt_state": {}, "step": 0,
                               "ema_params": None})()
        # epoch 0: improves (inf -> 1.0) => best only (interval skips last)
        tr._save_epoch_artifacts(0, state, 1.0)
        # epoch 1: no improvement, not on interval => nothing
        tr._save_epoch_artifacts(1, state, 2.0)
        # epoch 2: on interval (3rd epoch) => last only
        tr._save_epoch_artifacts(2, state, 2.0)
        # epoch 5: final epoch + improvement => last + best
        tr._save_epoch_artifacts(5, state, 0.5)
        assert saves == ["best_model", "last_model", "last_model",
                         "best_model"]

    def test_best_interval_gates_best_saves(self, tmp_path, monkeypatch):
        """best_checkpoint_interval restricts best-model candidacy to every
        k-th (and the final) epoch; best_val only advances on actual saves
        so a later sampled epoch competes against the last SAVED best."""
        from medical_image_generation_tpu.training import train_ldm as mod

        saves = []
        monkeypatch.setattr(mod.plots, "save_main_losses",
                            lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "save_loss_dict", lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "to_host", lambda t: t)
        monkeypatch.setattr(
            mod.ckpt, "save_checkpoint",
            lambda _dir, name, _payload: saves.append(name))

        tr = self._mk_trainer(tmp_path, interval=10, n_epochs=8)
        tr.config["best_checkpoint_interval"] = 3
        state = type("S", (), {"params": {}, "opt_state": {}, "step": 0,
                               "ema_params": None})()
        # epochs 1-2 improve but are off-interval => nothing saved
        tr._save_epoch_artifacts(0, state, 1.0)
        tr._save_epoch_artifacts(1, state, 0.9)
        assert saves == [] and tr.best_val == float("inf")
        # epoch 3 improves and is on interval => best saved, best_val set
        tr._save_epoch_artifacts(2, state, 0.8)
        assert saves == ["best_model"] and tr.best_val == 0.8
        # epoch 6: on interval but WORSE than last saved best => nothing
        tr._save_epoch_artifacts(5, state, 0.85)
        assert saves == ["best_model"]
        # final epoch improves => last (final) + best
        tr._save_epoch_artifacts(7, state, 0.7)
        assert saves == ["best_model", "last_model", "best_model"]
        assert tr.best_val == 0.7

    def test_default_saves_every_epoch(self, tmp_path, monkeypatch):
        from medical_image_generation_tpu.training import train_ldm as mod

        saves = []
        monkeypatch.setattr(mod.plots, "save_main_losses",
                            lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "save_loss_dict", lambda *a, **k: None)
        monkeypatch.setattr(mod.ckpt, "to_host", lambda t: t)
        monkeypatch.setattr(
            mod.ckpt, "save_checkpoint",
            lambda _dir, name, _payload: saves.append(name))

        tr = self._mk_trainer(tmp_path, interval=1, n_epochs=3)
        tr.config = {}  # reference parity: no key => every epoch
        state = type("S", (), {"params": {}, "opt_state": {}, "step": 0,
                               "ema_params": None})()
        tr._save_epoch_artifacts(0, state, 2.0)
        tr._save_epoch_artifacts(1, state, 3.0)
        assert saves == ["last_model", "best_model", "last_model"]
