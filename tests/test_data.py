import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.data.augment import AugmentConfig, augment_batch
from medical_image_generation_tpu.data.loader import (
    BatchScheduler,
    PatchDataset,
    PrefetchLoader,
    get_data_loaders,
)
from medical_image_generation_tpu.data.patches import (
    crop_and_pad,
    get_bbox,
    oversample_last_fraction,
)
from medical_image_generation_tpu.data.splits import (
    create_split_files,
    generate_crossval_split,
    get_data_ids,
)
from medical_image_generation_tpu.io.volstore import write_volume
from medical_image_generation_tpu.planning.preprocess import save_properties


# (preprocessed_dataset fixture lives in conftest.py — shared with
# test_patch_parity.py)


class TestSplits:
    def test_kfold_partitions(self):
        ids = [f"s{i}" for i in range(10)]
        splits = generate_crossval_split(ids, n_splits=5)
        assert len(splits) == 5
        for s in splits:
            assert len(s["train"]) == 8 and len(s["val"]) == 2
            assert set(s["train"]) | set(s["val"]) == set(ids)

    def test_train_val_test_file(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        path = create_split_files(dsid, "train-val-test", preprocessed_root=root)
        with open(path) as f:
            data = json.load(f)
        assert set(data.keys()) == {"train", "val", "test"}
        total = len(data["train"]) + len(data["val"]) + len(data["test"])
        assert total == 6
        # reused if exists
        assert create_split_files(dsid, "train-val-test", preprocessed_root=root) == path

    def test_5fold_file_and_fold_access(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        path = create_split_files(dsid, "5-fold", preprocessed_root=root)
        ids = get_data_ids(path, fold=2)
        assert len(ids["train"]) + len(ids["val"]) == 6


class TestBBox:
    def test_oversample_positions(self):
        # batch 6, ratio 0.33 -> last 2 positions forced fg
        flags = [oversample_last_fraction(i, 6, 0.33) for i in range(6)]
        assert flags == [False, False, False, False, True, True]

    def test_bbox_shape_and_bounds(self):
        rng = np.random.default_rng(0)
        lbs, ubs = get_bbox((12, 24, 24), (4, 16, 16), False, None, rng)
        assert [u - l for l, u in zip(lbs, ubs)] == [4, 16, 16]
        # H/W: center +- 10 jitter
        assert abs((lbs[1] + ubs[1]) / 2 - 12) <= 10.5
        assert abs((lbs[2] + ubs[2]) / 2 - 12) <= 10.5

    def test_force_fg_z_from_class_locations(self):
        rng = np.random.default_rng(0)
        locs = {1: [(5, 10, 10)]}
        for _ in range(5):
            lbs, ubs = get_bbox((12, 24, 24), (4, 16, 16), True, locs, rng)
            assert lbs[0] <= 5 <= ubs[0]

    def test_2d_force_fg_takes_exact_slice(self):
        rng = np.random.default_rng(0)
        locs = {1: [(7, 10, 10)]}
        lbs, ubs = get_bbox((12, 24, 24), (1, 16, 16), True, locs, rng, is_2d=True)
        assert lbs[0] == 7 and ubs[0] == 8

    def test_crop_and_pad_ndarray(self):
        arr = np.arange(27).reshape(3, 3, 3).astype(np.float32)
        out = crop_and_pad(arr, [-1, 0, 1], [2, 2, 4])
        assert out.shape == (3, 2, 3)
        assert out[0].sum() == 0  # padded region
        np.testing.assert_array_equal(out[1, :, :2], arr[0, 0:2, 1:3])
        assert np.all(out[1, :, 2] == 0)  # x index 3 is out of bounds


class TestScheduler:
    def test_fixed_steps_and_coverage(self):
        s = BatchScheduler(n_samples=5, batch_size=2, number_of_steps=10)
        batches = s.epoch_batches()
        assert len(batches) == 10
        assert all(len(b) == 2 for b in batches)
        # reference semantics (CustomBatchSampler.define_indices): the pool
        # refills fresh whenever < one batch remains, DISCARDING the residue
        # — so with n=5, bs=2 each refill uses 4 of 5 samples; every sample
        # still appears (shuffled refills rotate the discarded one) and no
        # batch contains a duplicate
        flat = [i for b in batches for i in b]
        assert set(flat) == set(range(5))
        assert all(len(set(b)) == len(b) for b in batches)

    def test_epochs_rebuild_fresh_pools(self):
        # reference parity: define_indices() runs per __iter__, so an
        # unshuffled (validation) schedule yields IDENTICAL epochs
        s = BatchScheduler(n_samples=7, batch_size=2, number_of_steps=5,
                           shuffle=False)
        e1, e2 = s.epoch_batches(), s.epoch_batches()
        assert e1 == e2

    def test_small_dataset_fills_batches(self):
        # datasets smaller than one batch must still fill every batch
        s = BatchScheduler(n_samples=2, batch_size=5, number_of_steps=4)
        batches = s.epoch_batches()
        assert all(len(b) == 5 for b in batches)


class TestLoader:
    def test_patch_dataset_3d(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        ds = PatchDataset(images, [f"p{i:03d}" for i in range(6)], batch_size=2,
                          patch_size=(8, 16, 16))
        patch = ds.sample_patch(0, 0, np.random.default_rng(0))
        assert patch.shape == (8, 16, 16, 1)
        assert patch.min() >= 0 and patch.max() <= 1

    def test_patch_dataset_2d(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        ds = PatchDataset(images, ["p000"], batch_size=2, patch_size=(16, 16))
        patch = ds.sample_patch(1, 0, np.random.default_rng(0))
        assert patch.shape == (16, 16, 1)

    def test_prefetch_loader_epoch(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        ds = PatchDataset(images, [f"p{i:03d}" for i in range(6)], batch_size=3,
                          patch_size=(4, 16, 16))
        loader = PrefetchLoader(ds, number_of_steps=5, num_threads=2)
        batches = list(loader)
        assert len(batches) == 5
        assert all(b.shape == (3, 4, 16, 16, 1) for b in batches)

    def test_prefetch_loader_abandoned_iterator_stops_producer(
        self, preprocessed_dataset
    ):
        # probe_latent does next(iter(loader)) and abandons the generator;
        # the producer thread must terminate instead of blocking on q.put
        import threading
        import time

        root, dsid = preprocessed_dataset
        images = os.path.join(root, "Task099_Synth", "imagesTr")
        ds = PatchDataset(images, [f"p{i:03d}" for i in range(6)], batch_size=2,
                          patch_size=(4, 16, 16))
        loader = PrefetchLoader(ds, number_of_steps=50, num_threads=2,
                                prefetch_depth=1)
        it0 = iter(loader)
        next(it0)
        it0.close()
        # the executor's worker threads persist by design; baseline with
        # them warm so only a leaked producer thread can raise the count
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # triggers GeneratorExit -> finally -> stop/join
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_get_data_loaders(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        config = {"oversample_ratio": 0.33, "input_channels": [0], "num_workers": 2}
        train_loader, val_loader = get_data_loaders(
            config, dsid, "train-val-test", batch_size=2, model_type="3d",
            transformations={"patch_size": [4, 16, 16]}, preprocessed_root=root,
        )
        assert len(train_loader) == 250
        assert len(val_loader) == 50
        batch = next(iter(val_loader))
        assert batch.shape == (2, 4, 16, 16, 1)


class TestAugment:
    def test_shapes_and_range_3d(self):
        cfg = AugmentConfig()
        batch = jnp.clip(
            jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 16, 16, 1)), 0, 1
        )
        out = augment_batch(batch, jax.random.PRNGKey(1), cfg)
        assert out.shape == batch.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_shapes_2d(self):
        cfg = AugmentConfig(gaussian_noise=True, gaussian_blur=True)
        batch = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 2))
        out = augment_batch(batch, jax.random.PRNGKey(1), cfg)
        assert out.shape == batch.shape

    def test_deterministic_given_rng(self):
        cfg = AugmentConfig()
        batch = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 1))
        a = augment_batch(batch, jax.random.PRNGKey(7), cfg)
        b = augment_batch(batch, jax.random.PRNGKey(7), cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_no_op_config_changes_little(self):
        cfg = AugmentConfig(False, False, False, False, False, False)
        batch = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 1))
        out = augment_batch(batch, jax.random.PRNGKey(1), cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(batch), atol=1e-6)

    @staticmethod
    def _off():
        return AugmentConfig(rotation=False, scaling=False, mirror=False,
                             brightness=False, contrast=False, gamma=False)

    def test_low_resolution_changes_output(self):
        # the switch must actually do something when enabled (it was a
        # silent no-op in round 1)
        cfg_off = self._off()
        cfg_on = cfg_off._replace(low_resolution=True)
        ramp = jnp.tile(
            jnp.linspace(0, 1, 32)[None, :, None, None], (32, 1, 32, 1)
        )[None]  # (1, 32, 32, 32, 1) smooth in y
        batch = jnp.tile(ramp, (16, 1, 1, 1, 1))
        key = jax.random.PRNGKey(3)
        out_off = augment_batch(batch, key, cfg_off)
        out_on = augment_batch(batch, key, cfg_on)
        np.testing.assert_allclose(np.asarray(out_off), np.asarray(batch), atol=1e-6)
        assert float(jnp.abs(out_on - batch).max()) > 1e-4

    def test_low_resolution_dummy_2d_excludes_z(self):
        # volume varying ONLY along z: in-plane-only low-res (dummy_2d)
        # leaves it untouched; full 3D low-res degrades it
        cfg3d = self._off()._replace(low_resolution=True)
        cfg2d = cfg3d._replace(dummy_2d=True)
        # alternating z pattern: any z-axis downsampling destroys it, while
        # it is constant in-plane so in-plane-only low-res is the identity
        zpat = (jnp.arange(32) % 2).astype(jnp.float32)[:, None, None, None]
        batch = jnp.tile(jnp.tile(zpat, (1, 8, 8, 1))[None], (16, 1, 1, 1, 1))
        key = jax.random.PRNGKey(0)
        out_3d = augment_batch(batch, key, cfg3d)
        out_2d = augment_batch(batch, key, cfg2d)
        np.testing.assert_allclose(np.asarray(out_2d), np.asarray(batch), atol=1e-5)
        assert float(jnp.abs(out_3d - batch).max()) > 1e-4

    def test_elastic_changes_output(self):
        cfg_off = self._off()
        cfg_on = cfg_off._replace(elastic=True)
        ramp = jnp.tile(jnp.linspace(0, 1, 32)[:, None, None], (1, 32, 1))[None]
        batch = jnp.tile(ramp, (32, 1, 1, 1))  # (32, 32, 32, 1) 2D
        key = jax.random.PRNGKey(11)
        out_off = augment_batch(batch, key, cfg_off)
        out_on = augment_batch(batch, key, cfg_on)
        np.testing.assert_allclose(np.asarray(out_off), np.asarray(batch), atol=1e-6)
        assert float(jnp.abs(out_on - batch).max()) > 1e-4

    def test_every_planner_switch_is_honored(self):
        """Every key the planner writes into ae_transformations must map to
        an AugmentConfig field (no silently-ignored switches)."""
        from medical_image_generation_tpu.planning.planner import (
            create_autoencoder_dict,
            create_config_dict,
            create_ddpm_dict,
        )

        ds = {"median_shape": (16, 48, 48), "min_shape": (12, 40, 40),
              "max_shape": (20, 56, 56)}
        vae = create_autoencoder_dict(ds, [0], spatial_dims=3)
        ddpm = create_ddpm_dict(ds, spatial_dims=3)
        cfg = create_config_dict(ds, [0], 1, vae, ddpm)
        # aug_preset / initial_patch_enlargement are consumed by
        # patches.spatial_aug_params (geometry), not AugmentConfig switches
        geometry_keys = {"patch_size", "aug_preset", "initial_patch_enlargement"}
        keys = set(cfg["ae_transformations"]) - geometry_keys
        assert keys <= set(AugmentConfig._fields), (
            keys - set(AugmentConfig._fields)
        )
        from medical_image_generation_tpu.data.patches import spatial_aug_params

        geo = spatial_aug_params(cfg["ae_transformations"])
        assert geo["patch_size"] == tuple(cfg["ae_transformations"]["patch_size"])

    def test_rotation_moves_pixels(self):
        # force rotation by sampling many rngs; at least one should rotate
        cfg = AugmentConfig(rotation=True, scaling=False, mirror=False,
                            brightness=False, contrast=False, gamma=False)
        img = jnp.zeros((1, 32, 32, 1)).at[:, 8:12, :, :].set(1.0)
        changed = False
        for seed in range(30):
            out = augment_batch(img, jax.random.PRNGKey(seed), cfg)
            if not np.allclose(np.asarray(out), np.asarray(img), atol=1e-3):
                changed = True
                break
        assert changed


class TestJointImageLabel:
    def test_include_labels_adds_channel(self, preprocessed_dataset):
        root, dsid = preprocessed_dataset
        ds_dir = os.path.join(root, "Task099_Synth")
        images = os.path.join(ds_dir, "imagesTr")
        labels = os.path.join(ds_dir, "labelsTr")
        os.makedirs(labels, exist_ok=True)
        rng = np.random.default_rng(1)
        for i in range(6):
            pid = f"p{i:03d}"
            lbl = rng.integers(0, 3, size=(12, 24, 24)).astype(np.uint8)
            write_volume(os.path.join(labels, f"{pid}.vs"), lbl,
                         chunk_shape=(1, 24, 24))
        ds = PatchDataset(images, ["p000"], batch_size=2, patch_size=(4, 16, 16),
                          include_labels=True, n_classes=2)
        patch = ds.sample_patch(0, 0, np.random.default_rng(0))
        assert patch.shape == (4, 16, 16, 2)  # image + label channel
        label_chan = patch[..., 1]
        assert set(np.round(np.unique(label_chan) * 2).astype(int)).issubset({0, 1, 2})
