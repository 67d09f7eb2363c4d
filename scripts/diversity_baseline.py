"""Intrinsic pairwise-similarity baseline of the quality-phantom dataset.

Round-4 verdict (Weak #4): the 3D quality run's generated samples scored
pairwise MS-SSIM 0.795 vs the 2D chain's 0.495, read as "weak sample
diversity". But in this protocol pairwise similarity of PERFECT samples is
bounded below by the similarity of the data distribution itself: if every
real phantom shares the same global anatomy, real volumes also score high.

This script measures that bound: it draws one patch per DISTINCT training
patient through the shipped extraction path (PatchDataset.sample_patch —
fixed-center for 3D volumes; the training section's random-z crop for 2D
slices, since 100 distinct 2D samples span z positions, exactly as a
perfectly-diverse 2D generator's would) and runs the exact same pairwise
metric (eval/ssim.pairwise_metrics, kernel_size=4 — reference
train_ldm.py:276-277,315-321) over all C(n,2) pairs — 40 volumes for 3D,
100 slices for 2D, matching the reference sample counts
(train_ldm.py:513-514). Distinct patients matter: the 6-patient validation
split would put duplicate crops in the pool and overstate similarity.

Interpretation: generated-sample pairwise MS-SSIM ~ at-or-below the real
baseline = the samples are as diverse as the dataset allows; far above it =
mode-seeking / undertraining.

Usage: python scripts/diversity_baseline.py [--work /tmp/medimgen_diversity]
       [--out quality/DIVERSITY_BASELINE.json] [--patients 60]
Runs fine on CPU (pass MEDIMGEN_FORCE_CPU=1 to keep the chip free).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/medimgen_diversity")
    ap.add_argument("--out", default="quality/DIVERSITY_BASELINE.json")
    ap.add_argument("--patients", type=int, default=60)
    args = ap.parse_args()

    if os.environ.get("MEDIMGEN_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from medical_image_generation_tpu.config.run import get_config_for_current_task
    from medical_image_generation_tpu.data.loader import PatchDataset
    from medical_image_generation_tpu.data.splits import (
        create_split_files,
        get_data_ids,
    )
    from medical_image_generation_tpu.eval.ssim import pairwise_metrics
    from medical_image_generation_tpu.planning.cli import plan_and_preprocess
    from scripts.quality_run import make_structured_dataset

    t0 = time.time()
    raw = os.path.join(args.work, "raw")
    pre = os.path.join(args.work, "preprocessed")
    ds_dir = os.path.join(raw, "Task097_QualityPhantom")
    if not os.path.exists(os.path.join(pre, "Task097_QualityPhantom")):
        if not os.path.exists(ds_dir):
            print("== generating structured dataset (same generator/seed as "
                  "quality_run)")
            make_structured_dataset(raw, n_patients=args.patients)
        os.makedirs(pre, exist_ok=True)
        plan_and_preprocess(ds_dir, preprocessed_root=pre, max_workers=0,
                            probe_memory=False)

    split_path = create_split_files("097", "train-val-test",
                                    preprocessed_root=pre)
    train_ids = get_data_ids(split_path, None)["train"]
    ds_path = os.path.join(pre, "Task097_QualityPhantom", "imagesTr")

    results = {}
    for model_type, n_samples in (("3d", 40), ("2d", 100)):
        cfg = get_config_for_current_task(
            "097", model_type, "ldm", preprocessed_root=pre,
            results_root=os.path.join(args.work, "results_" + model_type),
        )
        patch = list(cfg["ddpm_transformations"]["patch_size"])
        if model_type == "2d" and len(patch) == 3:
            patch = patch[-2:]
        # 3D: one fixed-center volume per distinct patient (validation-style
        # crop). 2D: training-style crops (random z) so 100 samples span
        # distinct slices of the 42 training patients.
        section = "validation" if model_type == "3d" else "training"
        ds = PatchDataset(
            data_path=ds_path, data_ids=train_ids, batch_size=1,
            patch_size=patch, section=section, channel_ids=[0],
        )
        rng = np.random.default_rng(1234)
        real = np.stack([
            ds.sample_patch(0, i % len(train_ids), rng)
            for i in range(n_samples)
        ])
        print(f"== {model_type}: {real.shape[0]} real volumes "
              f"{real.shape[1:]} -> all-pairs SSIM/MS-SSIM (k=4)")
        pw = pairwise_metrics(real, win_size=4)
        results[model_type] = {
            "real_ssim": pw["ssim_mean"], "real_ssim_std": pw["ssim_std"],
            "real_ms_ssim": pw["ms_ssim_mean"],
            "real_ms_ssim_std": pw["ms_ssim_std"],
            "n_pairs": pw["n_pairs"], "n_samples": int(real.shape[0]),
            "sample_shape": list(real.shape[1:]),
        }
        print(json.dumps(results[model_type], indent=2))

    results["wall_clock_s"] = round(time.time() - t0, 1)
    results["note"] = (
        "Pairwise similarity of REAL validation volumes under the exact "
        "generation-eval protocol: the intrinsic lower bound for generated-"
        "sample pairwise SSIM/MS-SSIM on this dataset. Generated samples "
        "scoring at/below this bound are as diverse as the data; only the "
        "excess above it indicates mode-seeking."
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
