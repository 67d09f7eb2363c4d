"""AOT memory analysis of the flagship stage-1 AE G+D step per remat setting.

Answers "does the packed no-remat step fit one v5e at batch 2?" — the input
to choosing between rematerialization (recompute cost ~= one extra forward
in the backward) and plain execution for stage-1 training.

Usage: python scripts/probe_ae_memory.py [batch ...] (default: 2)
"""

from __future__ import annotations

import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.planning.memory import (
        device_memory_budget,
        estimate_ae_step_memory,
    )
    from medical_image_generation_tpu.planning.planner import create_config_dict

    vae_cfg, ddpm_cfg = _flagship_configs()
    ds = {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)}
    config = create_config_dict(ds, [0], 1, vae_cfg, ddpm_cfg)
    config["results_path"] = os.path.join(
        tempfile.mkdtemp(prefix="medimgen_probe_"), "results"
    )
    config["task"] = "TaskProbe"

    budget = device_memory_budget()
    print(f"budget: {budget / 1e9:.2f} GB")
    batches = [int(a) for a in sys.argv[1:]] or [2]
    for bs in batches:
        for remat, policy in ((False, "acts"), (True, "acts"), (True, "full")):
            est = estimate_ae_step_memory(config, bs, use_checkpointing=remat,
                                          remat_policy=policy)
            tag = f"remat({policy})" if remat else "no-remat"
            if est is None:
                print(f"batch {bs} {tag}: analysis unavailable")
            else:
                fits = "FITS" if est <= budget else "OOM"
                print(f"batch {bs} {tag}: {est / 1e9:.2f} GB -> {fits}")


if __name__ == "__main__":
    main()
