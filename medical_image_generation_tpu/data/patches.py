"""Patch bounding-box selection with foreground oversampling.

Reproduces the reference sampler's semantics (data_processing.py:426-528):

* batch-position oversampling — the last ``oversample_ratio`` fraction of
  every batch is forced to contain foreground (``_oversample_last_XX_percent``);
* z (slice/depth) position comes from a sampled foreground voxel when forced,
  else uniform over the padded valid range;
* H/W are center crops with a random jitter of up to +-10 voxels;
* boxes may extend past the volume; the VolStore bbox read zero-pads.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def oversample_last_fraction(batch_pos: int, batch_size: int, oversample_ratio: float) -> bool:
    """True when this batch position must contain foreground
    (reference data_processing.py:426-429)."""
    return batch_pos >= round(batch_size * (1 - oversample_ratio))


def get_bbox(
    data_shape: Sequence[int],
    patch_size: Sequence[int],
    force_fg: bool,
    class_locations: Optional[Dict[int, List[Tuple[int, int, int]]]],
    rng: np.random.Generator,
    is_2d: bool = False,
    jitter: int = 10,
) -> Tuple[List[int], List[int]]:
    """Lower/upper bbox corners for one patch (reference
    data_processing.py:473-528)."""
    dim = len(data_shape)
    patch_size = list(patch_size)

    need_to_pad = [0] * dim
    for d in range(dim):
        if data_shape[d] < patch_size[d]:
            need_to_pad[d] = patch_size[d] - data_shape[d]

    lbs = [-need_to_pad[d] // 2 for d in range(dim)]
    ubs = [
        data_shape[d] + need_to_pad[d] // 2 + need_to_pad[d] % 2 - patch_size[d]
        for d in range(dim)
    ]

    bbox_lbs = [int(rng.integers(lbs[d], ubs[d] + 1)) for d in range(dim)]

    if force_fg and class_locations:
        eligible = [c for c, locs in class_locations.items() if len(locs) > 0]
        if eligible:
            cls = eligible[int(rng.integers(len(eligible)))]
            voxels = class_locations[cls]
            vz, vy, vx = voxels[int(rng.integers(len(voxels)))]
            voxel = (vz, vy, vx)
            if is_2d:
                bbox_lbs[0] = int(vz)  # take exactly that slice
            else:
                for d in range(dim):
                    bbox_lbs[d] = int(
                        max(lbs[d], min(voxel[d] - patch_size[d] // 2, ubs[d]))
                    )

    # H/W (last two axes): center crop with bounded random jitter
    for d in range(dim - 2, dim):
        crop = patch_size[d]
        size = data_shape[d]
        center = size // 2
        if size < crop:
            bbox_lbs[d] = center - crop // 2
        else:
            max_offset = min(jitter, center - crop // 2, size - center - (crop - crop // 2))
            offset = int(rng.integers(-max_offset, max_offset + 1)) if max_offset > 0 else 0
            bbox_lbs[d] = center + offset - crop // 2

    bbox_ubs = [bbox_lbs[d] + patch_size[d] for d in range(dim)]
    return bbox_lbs, bbox_ubs


def crop_and_pad(array_like, lbs: Sequence[int], ubs: Sequence[int]) -> np.ndarray:
    """Zero-padded bbox extraction from either a VolStore (lazy, native
    decode) or an in-memory ndarray (reference crop_and_pad_nd,
    data_processing.py:148-225)."""
    if hasattr(array_like, "read_bbox"):
        return array_like.read_bbox(lbs, ubs)
    arr = np.asarray(array_like)
    out_shape = tuple(u - l for l, u in zip(lbs, ubs))
    out = np.zeros(out_shape, dtype=arr.dtype)
    src, dst = [], []
    for d, (l, u) in enumerate(zip(lbs, ubs)):
        cl, cu = max(l, 0), min(u, arr.shape[d])
        if cl >= cu:
            return out
        src.append(slice(cl, cu))
        dst.append(slice(cl - l, cu - l))
    out[tuple(dst)] = arr[tuple(src)]
    return out
