"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This image pre-registers an 'axon' TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon, so plain env-var overrides are ignored; jax.config is the
reliable switch. XLA_FLAGS must carry the host-device count before the CPU
client initializes. The real-TPU paths (bench.py, __graft_entry__.py) run
outside pytest and keep the axon backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: a fresh full-suite run is ~50 min, dominated
# by CPU compiles; cached re-runs cut most of that. CPU compiles DO populate
# the local cache (unlike the axon remote path). Harmless for correctness —
# keys cover the HLO, so env-flag variants (packed/unpacked, GN backends)
# cache separately.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def preprocessed_dataset(tmp_path):
    """A tiny preprocessed dataset: 6 patients, (1, 12, 24, 24) volumes."""
    from medical_image_generation_tpu.io.volstore import write_volume
    from medical_image_generation_tpu.planning.preprocess import save_properties

    root = tmp_path / "pre"
    ds = root / "Task099_Synth"
    images = ds / "imagesTr"
    images.mkdir(parents=True)
    (ds / "labelsTr").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        pid = f"p{i:03d}"
        vol = rng.uniform(0, 1, size=(1, 12, 24, 24)).astype(np.float32)
        write_volume(str(images / f"{pid}.vs"), vol, chunk_shape=(1, 1, 24, 24))
        locs = {1: [(z, 12, 12) for z in range(3, 9)]}
        save_properties(str(images), pid, {"class_locations": locs, "min_max": [(0.0, 1.0)]})
    with open(ds / "dataset.json", "w") as f:
        json.dump({"n_patients": 6}, f)
    return str(root), "099"
