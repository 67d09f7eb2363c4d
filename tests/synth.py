"""Synthetic MSD-style dataset generation for tests and smoke runs."""

import os

import numpy as np

from medical_image_generation_tpu.io.nifti import save_nifti


def make_synthetic_dataset(
    root,
    task="Task099_Synth",
    n_patients=6,
    shape=(24, 28, 20),
    spacing=(1.0, 1.0, 1.5),
    n_classes=2,
    seed=0,
):
    """Write a TaskXXX_Name raw dataset: imagesTr/ + labelsTr/ with spheres."""
    rng = np.random.default_rng(seed)
    ds = os.path.join(root, task)
    os.makedirs(os.path.join(ds, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(ds, "labelsTr"), exist_ok=True)
    affine = np.diag(list(spacing) + [1.0])

    for i in range(n_patients):
        img = rng.normal(0.4, 0.1, size=shape).astype(np.float32)
        lbl = np.zeros(shape, dtype=np.uint8)
        xs, ys, zs = np.meshgrid(
            np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]), indexing="ij"
        )
        for cls in range(1, n_classes + 1):
            cx = rng.integers(shape[0] // 4, 3 * shape[0] // 4)
            cy = rng.integers(shape[1] // 4, 3 * shape[1] // 4)
            cz = rng.integers(shape[2] // 4, 3 * shape[2] // 4)
            r = rng.integers(3, max(4, min(shape) // 4))
            mask = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2 <= r**2
            img[mask] += 0.4 * cls
            lbl[mask] = cls
        # border of zeros so nonzero-cropping does something
        img[:2], img[-2:] = 0, 0
        img = np.clip(img, 0, None)
        pid = f"synth_{i:03d}"
        save_nifti(os.path.join(ds, "imagesTr", pid + ".nii.gz"), img, affine)
        save_nifti(os.path.join(ds, "labelsTr", pid + ".nii.gz"), lbl, affine)
    return ds
