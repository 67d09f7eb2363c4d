"""Sampling CLIs: ``medimgen_sample_ddpm`` / ``medimgen_sample_ldm``.

The reference *declares* these entry points but never shipped the modules
(pyproject.toml:44-45; README.md:240 "Will be added"). This implements them
for real: load the trained checkpoint, run the compiled DDPM/DDIM trajectory
(+ decode for LDM), and write NIfTI volumes / PNG grids.
"""

from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_generation_tpu.config.run import load_config, resolve_preprocessed_dataset
from medical_image_generation_tpu.io.nifti import save_nifti
from medical_image_generation_tpu.training import checkpoints as ckpt
from medical_image_generation_tpu.training import plots


def _common_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("dataset_id", type=str)
    p.add_argument("model_type", choices=["2d", "3d"])
    p.add_argument("-n", "--n_samples", type=int, default=4)
    p.add_argument("-o", "--output_dir", type=str, default=None)
    p.add_argument("-s", "--sampler", choices=["ddpm", "ddim"], default="ddim")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", choices=["best", "last"], default="best")
    p.add_argument("-l", "--latent_space_type", default="vae", choices=["vae", "vq"])
    p.add_argument("--class_label", type=int, default=None,
                   help="class index for class-conditional models "
                        "(classifier-free guided sampling)")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="CFG scale g: eps_null + g*(eps_class - eps_null); "
                        "defaults to the config's guidance_scale")
    return p


def _run_config(dataset_id: str, model_type: str, model_name: str, which: str):
    results_root = os.getenv("medimgen_results")
    if not results_root:
        raise EnvironmentError("set the 'medimgen_results' environment variable")
    ds_path = resolve_preprocessed_dataset(dataset_id)
    task = os.path.basename(ds_path)
    run_dir = os.path.join(results_root, task, model_type, model_name)
    config = load_config(os.path.join(run_dir, "config.yaml"))
    ckpt_path = os.path.join(run_dir, "checkpoints", f"{which}_model")
    return config, run_dir, ckpt_path


def _write_outputs(images: np.ndarray, output_dir: str, model_type: str, tag: str):
    os.makedirs(output_dir, exist_ok=True)
    for i, img in enumerate(images):
        if model_type == "3d":
            vol = np.squeeze(img, axis=-1) if img.shape[-1] == 1 else img
            # back to NIfTI (X, Y, Z[, C]) order from (Z, Y, X[, C]):
            # only the spatial axes reverse; channels stay trailing (NIfTI dim 4)
            if vol.ndim == 4:
                vol = np.transpose(vol, (2, 1, 0, 3))
            else:
                vol = np.transpose(vol, (2, 1, 0))
            save_nifti(os.path.join(output_dir, f"{tag}_{i:03d}.nii.gz"), vol.astype(np.float32))
        else:
            plots.save_image_grid_2d([img], os.path.join(output_dir, f"{tag}_{i:03d}.png"), ncols=1)
    if model_type == "2d":
        plots.save_image_grid_2d(list(images), os.path.join(output_dir, f"{tag}_grid.png"))
    print(f"Wrote {len(images)} samples to {output_dir}")


def main_ldm():
    args = _common_parser("Sample images from a trained LDM.").parse_args()
    from medical_image_generation_tpu.training.train_ldm import LDMTrainer

    config, run_dir, ckpt_path = _run_config(
        args.dataset_id, args.model_type, "ldm", args.checkpoint
    )
    config["results_path"] = os.path.join(run_dir, "sampling")
    config.setdefault("load_model_path", None)
    trainer = LDMTrainer(config, latent_space_type=args.latent_space_type)
    payload = ckpt.load_checkpoint(ckpt_path)
    trainer.scale_factor = float(payload["scale_factor"])
    trainer.latent_shape = tuple(int(v) for v in payload["latent_shape"])
    state = SimpleNamespace(
        params=jax.tree_util.tree_map(jnp.asarray, payload["params"])
    )
    images = trainer.sample_images(
        state, args.n_samples, jax.random.PRNGKey(args.seed),
        sampler=args.sampler, num_inference_steps=args.num_inference_steps,
        class_label=args.class_label, guidance_scale=args.guidance_scale,
    )
    out = args.output_dir or os.path.join(run_dir, "samples")
    _write_outputs(images, out, args.model_type, "ldm_sample")


def main_ddpm():
    args = _common_parser("Sample images from a trained pixel-space DDPM.").parse_args()
    from medical_image_generation_tpu.training.train_ddpm import DDPMTrainer

    config, run_dir, ckpt_path = _run_config(
        args.dataset_id, args.model_type, "ddpm", args.checkpoint
    )
    config["results_path"] = os.path.join(run_dir, "sampling")
    config.setdefault("load_model_path", None)
    trainer = DDPMTrainer(config)
    payload = ckpt.load_checkpoint(ckpt_path)
    state = SimpleNamespace(
        params=jax.tree_util.tree_map(jnp.asarray, payload["params"])
    )
    images = trainer.sample_images(
        state, args.n_samples, jax.random.PRNGKey(args.seed),
        sampler=args.sampler, num_inference_steps=args.num_inference_steps,
        class_label=args.class_label, guidance_scale=args.guidance_scale,
    )
    out = args.output_dir or os.path.join(run_dir, "samples")
    _write_outputs(images, out, args.model_type, "ddpm_sample")


if __name__ == "__main__":
    main_ldm()
