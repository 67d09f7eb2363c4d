"""Host pipeline throughput guard at flagship patch size.

Measured on this image: ~17 batches/s of (2, 128^3) patches (295 MB/s
decoded) on one CPU core — 7x what the TPU train step consumes (2.5/s).
The test asserts a generous floor so CI noise doesn't flake it while still
catching order-of-magnitude regressions in the native codec / loader path.
"""

import os
import time

import numpy as np
import pytest

from medical_image_generation_tpu.data.loader import PatchDataset, PrefetchLoader
from medical_image_generation_tpu.io.volstore import write_volume
from medical_image_generation_tpu.planning.preprocess import save_properties


@pytest.mark.slow
def test_flagship_patch_throughput(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    for i in range(4):
        pid = f"v{i:02d}"
        vol = rng.normal(0.5, 0.2, size=(1, 144, 144, 144)).astype(np.float32).clip(0, 1)
        write_volume(os.path.join(root, pid + ".vs"), vol, chunk_shape=(1, 1, 144, 144))
        locs = {1: [(z, 72, 72) for z in range(40, 100, 10)]}
        save_properties(root, pid, {"class_locations": locs, "min_max": [(0.0, 1.0)]})

    ds = PatchDataset(root, [f"v{i:02d}" for i in range(4)], batch_size=2,
                      patch_size=(128, 128, 128))
    loader = PrefetchLoader(ds, number_of_steps=12, num_threads=4, prefetch_depth=2)
    it = iter(loader)
    next(it)  # warm
    t0 = time.time()
    n = sum(1 for _ in it)
    rate = n / (time.time() - t0)
    assert rate > 1.0, f"loader produced only {rate:.2f} batches/s at 128^3"
