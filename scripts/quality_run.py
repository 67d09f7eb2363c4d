"""End-to-end QUALITY run on the real TPU: train the 2D or 3D chain to
convergence on a structured synthetic dataset and score it under the
reference evaluation protocol.

The reference's quality contract is validate_main
(/root/reference/medimgen/train_ldm.py:266-328): n generated samples via the
full ancestral trajectory, FID over extractor features, pairwise
SSIM/MS-SSIM over all C(n,2) pairs. This script drives the SHIPPED planner →
preprocess → AutoEncoderTrainer → LDMTrainer chain (planner-derived network
sizes, no shrinking) on a dataset with learnable anatomy — nested
ellipsoids ("head" / "cortex" / "ventricles") plus a variable "lesion" — and
records metrics + artifacts under quality/.

Usage:
    python scripts/quality_run.py [--out quality/] [--epochs-ae N]
        [--epochs-ldm N] [--patients N] [--resume]

Runs on whatever jax.devices() provides (the real chip under axon); budget
~1-2 h wall clock for the defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# --------------------------------------------------------------- dataset
def make_structured_dataset(root, task="Task097_QualityPhantom", n_patients=60,
                            seed=0):
    """Brain-phantom-style volumes: every patient shares the anatomy model
    (outer head ellipsoid, darker cortex shell, two bright ventricles, one
    variable hyperintense lesion) with patient-specific pose/size/intensity,
    so a generative model has real structure to learn and pairwise
    SSIM/MS-SSIM between samples is meaningful."""
    from medical_image_generation_tpu.io.nifti import save_nifti

    rng = np.random.default_rng(seed)
    ds = os.path.join(root, task)
    os.makedirs(os.path.join(ds, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(ds, "labelsTr"), exist_ok=True)
    shape = (48, 64, 64)
    zz, yy, xx = np.meshgrid(*(np.arange(s, dtype=np.float32) for s in shape),
                             indexing="ij")

    def ellipsoid(c, r):
        return (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                + ((xx - c[2]) / r[2]) ** 2)

    for i in range(n_patients):
        c = np.array([24.0, 32.0, 32.0]) + rng.normal(0, 1.5, 3)
        rr = np.array([17.0, 24.0, 22.0]) * rng.uniform(0.9, 1.1, 3)
        d_head = ellipsoid(c, rr)
        head = d_head <= 1.0
        cortex = (d_head > 0.62) & head
        # two ventricles, mirrored about the mid-sagittal plane
        voff = np.array([rng.normal(0, 1.0), rng.normal(-1, 1.0),
                         8.5 + rng.normal(0, 0.8)])
        vr = np.array([4.5, 7.5, 3.2]) * rng.uniform(0.85, 1.15, 3)
        vl = ellipsoid(c + voff * np.array([1, 1, -1]), vr) <= 1.0
        vrt = ellipsoid(c + voff, vr) <= 1.0
        # lesion: one bright sphere inside the head, variable position/size
        while True:
            lc = c + rng.uniform(-0.45, 0.45, 3) * rr
            lr = rng.uniform(2.5, 5.0)
            if ellipsoid(lc, rr * 0.999)[
                    tuple(np.clip(lc.astype(int), 0, np.array(shape) - 1))] < 0.5:
                break
        lesion = ellipsoid(lc, np.full(3, lr)) <= 1.0

        img = np.zeros(shape, np.float32)
        img[head] = 0.55
        img[cortex] = 0.38
        img[vl | vrt] = 0.16
        img[lesion & head] = 0.85
        # smooth patient-specific bias field + acquisition noise
        bias = (1.0 + 0.12 * np.sin(zz / 17 + rng.uniform(0, 6))
                * np.cos(yy / 23 + rng.uniform(0, 6)))
        img = img * bias + rng.normal(0, 0.022, shape).astype(np.float32)
        img = np.clip(img, 0, None)

        lbl = np.zeros(shape, np.uint8)
        lbl[head] = 1
        lbl[lesion & head] = 2

        pid = f"phantom_{i:03d}"
        aff = np.diag([1.0, 1.0, 1.0, 1.0])
        save_nifti(os.path.join(ds, "imagesTr", pid + ".nii.gz"), img, aff)
        save_nifti(os.path.join(ds, "labelsTr", pid + ".nii.gz"), lbl, aff)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="quality")
    ap.add_argument("--work", default="/tmp/medimgen_quality")
    ap.add_argument("--patients", type=int, default=60)
    ap.add_argument("--epochs-ae", type=int, default=40)
    ap.add_argument("--epochs-ldm", type=int, default=80)
    ap.add_argument("--model-type", choices=["2d", "3d"], default="2d")
    ap.add_argument("--eval-samples", type=int, default=None,
                    help="default: reference protocol (100 2D / 40 3D)")
    ap.add_argument("--resume", action="store_true",
                    help="continue AE/LDM training from existing run dirs")
    ap.add_argument("--skip-ae", action="store_true")
    args = ap.parse_args()
    if args.eval_samples is None:
        args.eval_samples = 100 if args.model_type == "2d" else 40

    import jax
    import jax.numpy as jnp

    from medical_image_generation_tpu.config.run import get_config_for_current_task
    from medical_image_generation_tpu.data.loader import get_data_loaders
    from medical_image_generation_tpu.planning.cli import plan_and_preprocess
    from medical_image_generation_tpu.training.train_autoencoder import AutoEncoderTrainer
    from medical_image_generation_tpu.training.train_ldm import LDMTrainer

    t_start = time.time()
    work = args.work
    raw = os.path.join(work, "raw")
    pre = os.path.join(work, "preprocessed")
    res = os.path.join(work, "results")
    os.makedirs(work, exist_ok=True)

    ds_dir = os.path.join(raw, "Task097_QualityPhantom")
    if not os.path.exists(os.path.join(pre, "Task097_QualityPhantom")):
        if not os.path.exists(ds_dir):
            print("== generating structured dataset")
            make_structured_dataset(raw, n_patients=args.patients)
        os.makedirs(pre, exist_ok=True)
        print("== plan_and_preprocess")
        plan_and_preprocess(ds_dir, preprocessed_root=pre, max_workers=0,
                            probe_memory=False)
    os.makedirs(res, exist_ok=True)

    def cfg_for(name, n_epochs, continue_training=False):
        cfg = get_config_for_current_task(
            "097", args.model_type, name, preprocessed_root=pre,
            results_root=res, continue_training=continue_training,
        )
        cfg["progress_bar"] = False
        cfg["val_plot_interval"] = 10
        # last_model is 1.5 GB for the planner-sized U-Net: fetching it
        # through the axon tunnel every epoch costs ~2 min/epoch on this
        # 1-CPU host (best_model still saves on every val improvement)
        cfg["checkpoint_interval"] = 5
        # best-model candidacy every 5 epochs too: early training improves
        # val EVERY epoch and each best save is the same multi-GB fetch
        cfg["best_checkpoint_interval"] = 5
        cfg["n_epochs"] = n_epochs
        if isinstance(cfg.get("lr_scheduler_params"), dict):
            cfg["lr_scheduler_params"] = dict(
                cfg["lr_scheduler_params"], total_iters=n_epochs)
        return cfg

    out = args.out
    os.makedirs(out, exist_ok=True)

    def stash(src, dst):
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, dst))

    # ---- stage 1: adversarial KL autoencoder (planner-sized, full losses)
    cfg = cfg_for("autoencoder", args.epochs_ae, continue_training=args.resume)
    ae_run = cfg["results_path"]
    if not args.skip_ae:
        print(f"== stage 1: AE for {args.epochs_ae} epochs -> {ae_run}")
        tl, vl = get_data_loaders(
            cfg, "097", "train-val-test", cfg["ae_batch_size"],
            args.model_type, cfg["ae_transformations"], preprocessed_root=pre,
            num_threads=2, data_parallel=jax.device_count(),
        )
        AutoEncoderTrainer(cfg, dtype=jnp.bfloat16).train(tl, vl)
    # stash stage-1 artifacts immediately so a wall-clock-bounded run still
    # leaves evidence even if stage 2 cannot finish
    stash(os.path.join(ae_run, "plots", "loss.png"), "ae_loss.png")
    stash(os.path.join(ae_run, "plots", "all_losses.png"), "ae_all_losses.png")
    t_ae_done = time.time()

    # ---- stage 2: latent diffusion over the frozen AE
    cfg2 = cfg_for("ldm", args.epochs_ldm, continue_training=args.resume)
    cfg2["load_autoencoder_path"] = os.path.join(
        ae_run, "checkpoints", "best_model")
    cfg2["run_generation_eval"] = False  # we run the protocol once, below
    ldm_run = cfg2["results_path"]
    print(f"== stage 2: LDM for {args.epochs_ldm} epochs -> {ldm_run}")
    tl2, vl2 = get_data_loaders(
        cfg2, "097", "train-val-test", cfg2["ddpm_batch_size"],
        args.model_type, cfg2["ddpm_transformations"], preprocessed_root=pre,
        num_threads=2, data_parallel=jax.device_count(),
    )
    trainer = LDMTrainer(cfg2, dtype=jnp.bfloat16)
    trainer.train(tl2, vl2)

    # ---- reference-protocol eval (full ancestral DDPM, FID + pairwise SSIM)
    print("== reference-protocol generation eval")
    from medical_image_generation_tpu.training import checkpoints as ckpt

    payload = ckpt.load_checkpoint(
        os.path.join(trainer.save_dict["checkpoints"], "best_model"))
    state = type("S", (), {"params": jax.tree_util.tree_map(
        jnp.asarray, payload["params"])})()
    metrics = trainer.evaluate_generation(
        state, vl2, n_samples=args.eval_samples)
    metrics["wall_clock_s"] = round(time.time() - t_start, 1)
    metrics["stage1_wall_clock_s"] = round(t_ae_done - t_start, 1)
    metrics["epochs_ae"] = args.epochs_ae
    metrics["epochs_ldm"] = args.epochs_ldm
    metrics["n_patients"] = args.patients
    metrics["model_type"] = args.model_type
    metrics["final_train_loss"] = (
        trainer.loss_dict["rec_loss"][-1] if trainer.loss_dict["rec_loss"] else None)
    metrics["final_val_loss"] = (
        trainer.loss_dict["val_rec_loss"][-1] if trainer.loss_dict["val_rec_loss"] else None)

    # ---- persist artifacts into the repo
    with open(os.path.join(out, "METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    stash(os.path.join(ldm_run, "plots", "loss.png"), "ldm_loss.png")
    # the newest epoch sample grid, as the qualitative artifact
    plots_dir = os.path.join(ldm_run, "plots")
    grids = sorted(
        (f for f in os.listdir(plots_dir) if f.startswith("epoch_")),
        key=lambda f: int(f.split("_")[1].split(".")[0]),
    ) if os.path.isdir(plots_dir) else []
    if grids:
        shutil.copy(os.path.join(plots_dir, grids[-1]),
                    os.path.join(out, "samples_" + grids[-1]))
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
