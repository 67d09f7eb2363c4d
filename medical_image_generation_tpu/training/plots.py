"""Plotting artifacts: loss curves, reconstruction grids, volume GIFs.

Same artifact contract as the reference (utils.py:15-145,
train_autoencoder.py:488-531, train_ldm.py:400-464): ``plots/loss.png`` /
``all_losses.png`` curves, ``epoch_N.png`` image/reconstruction grids in 2D,
animated ``epoch_N.gif`` slice fly-throughs in 3D (200 ms/frame).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from PIL import Image


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float32)
    mn, mx = float(img.min()), float(img.max())
    denom = (mx - mn) if mx > mn else 1.0
    return ((img - mn) / denom * 255.0).astype(np.uint8)


def save_main_losses(train_losses: List[float], val_losses: List[float], path: str,
                     title: str = "Loss") -> None:
    """loss.png with train/val curves (reference utils.py:86-113)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(train_losses, label="train")
    ax.plot(val_losses, label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_all_losses(loss_dict: Dict[str, List[float]], path: str, log_scale: bool = False) -> None:
    """Multi-curve loss plot (reference utils.py:116-145)."""
    fig, ax = plt.subplots(figsize=(10, 6))
    for name, values in loss_dict.items():
        if values:
            ax.plot(values, label=name)
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_image_pair_2d(image: np.ndarray, recon: np.ndarray, path: str) -> None:
    """Side-by-side original/reconstruction png (reference utils.py:32-56)."""
    image = np.squeeze(np.asarray(image))
    recon = np.squeeze(np.asarray(recon))
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, img, name in zip(axes, (image, recon), ("image", "reconstruction")):
        ax.imshow(_to_uint8(img if img.ndim == 2 else img[..., 0]), cmap="gray")
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_image_grid_2d(images: Sequence[np.ndarray], path: str, ncols: int = 4) -> None:
    """Grid of generated samples (reference train_ldm.py:400-430)."""
    n = len(images)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 3 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            img = np.squeeze(np.asarray(images[i]))
            ax.imshow(_to_uint8(img if img.ndim == 2 else img[..., 0]), cmap="gray")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def save_volume_gif(volume: np.ndarray, path: str, recon: Optional[np.ndarray] = None,
                    duration_ms: int = 200) -> None:
    """Animated per-slice GIF of a 3D volume, optionally side-by-side with a
    reconstruction (reference utils.py:59-83, train_autoencoder.py:488-520)."""
    volume = np.squeeze(np.asarray(volume))
    if volume.ndim == 4:  # (Z, Y, X, C) -> first channel
        volume = volume[..., 0]
    frames = []
    if recon is not None:
        recon = np.squeeze(np.asarray(recon))
        if recon.ndim == 4:
            recon = recon[..., 0]
    for z in range(volume.shape[0]):
        frame = volume[z]
        if recon is not None:
            frame = np.concatenate([frame, recon[z]], axis=1)
        frames.append(Image.fromarray(_to_uint8(frame)))
    if frames:
        frames[0].save(
            path, save_all=True, append_images=frames[1:], duration=duration_ms, loop=0
        )
