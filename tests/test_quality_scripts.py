"""Smoke tests for the quality-evidence scripts (scripts/quality_run.py's
dataset generator and scripts/diversity_baseline.py's metric path) — these
produce the repo's quality artifacts and must not rot between the real
on-chip runs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestStructuredDataset:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        from scripts.quality_run import make_structured_dataset

        root = tmp_path_factory.mktemp("phantom")
        ds = make_structured_dataset(str(root), n_patients=3, seed=7)
        return ds

    def test_files_and_layout(self, dataset):
        imgs = sorted(os.listdir(os.path.join(dataset, "imagesTr")))
        lbls = sorted(os.listdir(os.path.join(dataset, "labelsTr")))
        assert len(imgs) == len(lbls) == 3
        assert imgs[0].endswith(".nii.gz")

    def test_anatomy_and_labels(self, dataset):
        from medical_image_generation_tpu.io.nifti import load_nifti

        img = load_nifti(
            os.path.join(dataset, "imagesTr", "phantom_000.nii.gz")).data
        lbl = load_nifti(
            os.path.join(dataset, "labelsTr", "phantom_000.nii.gz")).data
        assert img.shape == lbl.shape == (48, 64, 64)
        assert set(np.unique(lbl)).issubset({0, 1, 2})
        head_frac = float((lbl >= 1).mean())
        # (4/3)*pi*17*24*22 / 48*64*64 ~= 0.19 nominal ellipsoid fill
        assert 0.1 < head_frac < 0.5  # a head ellipsoid, not noise
        assert float((lbl == 2).sum()) > 0  # the lesion exists
        assert img.min() >= 0.0 and np.isfinite(img).all()

    def test_patients_differ(self, dataset):
        from medical_image_generation_tpu.io.nifti import load_nifti

        a = load_nifti(
            os.path.join(dataset, "imagesTr", "phantom_000.nii.gz")).data
        b = load_nifti(
            os.path.join(dataset, "imagesTr", "phantom_001.nii.gz")).data
        assert not np.allclose(a, b)  # patient-specific pose/intensity


class TestScriptRotGuard:
    @pytest.mark.parametrize("module", [
        "scripts.bench_ae", "scripts.bench_attention", "scripts.bench_decode",
        "scripts.bench_encode", "scripts.bench_micro", "scripts.bench_opt",
        "scripts.bench_sampler", "scripts.diversity_baseline",
        "scripts.dump_decode_hlo", "scripts.probe_ae_memory",
        "scripts.profile_step", "scripts.quality_run",
        "tools.convert_torch_weights", "tools.fetch_pretrained_weights",
    ])
    def test_importable(self, module):
        """Every operational script imports cleanly (main() guarded) — the
        scripts are the repo's measurement/evidence machinery and have no
        other test coverage; an API drift in the package must fail HERE,
        not on the chip mid-benchmark."""
        import importlib

        mod = importlib.import_module(module)  # import success IS the test
        assert hasattr(mod, "main")


class TestDiversityBaselineMetricPath:
    def test_pairwise_bound_interpretation(self):
        # the baseline's core claim: identical samples score ~1, independent
        # noise scores ~0 — so a real-data pairwise mean is a meaningful
        # lower bound for generated-sample similarity (quality/3d analysis)
        from medical_image_generation_tpu.eval.ssim import pairwise_metrics

        rng = np.random.default_rng(0)
        same = np.repeat(rng.uniform(0, 1, (1, 24, 24, 1)), 4, axis=0)
        pw_same = pairwise_metrics(same.astype(np.float32), win_size=4)
        assert pw_same["ssim_mean"] > 0.99
        noise = rng.uniform(0, 1, (4, 24, 24, 1)).astype(np.float32)
        pw_noise = pairwise_metrics(noise, win_size=4)
        assert pw_noise["ssim_mean"] < 0.2
        assert pw_same["n_pairs"] == pw_noise["n_pairs"] == 6
