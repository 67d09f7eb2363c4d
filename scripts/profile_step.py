"""Capture an xplane trace of the flagship train step and print the top HLO
ops by self-time — the measurement loop behind BENCH_NOTES.md's profile
breakdown (layout copies / cast fusions / conv fusions).

Usage:
    python scripts/profile_step.py [n_steps] [--parse-only DIR] [--ae]

``--ae`` profiles the stage-1 AutoEncoderTrainer G+D step (bench_ae.py's
program, remat on) instead of the LDM step.

Writes the trace under /tmp/medimgen_profile (or $MEDIMGEN_PROFILE_DIR) and
parses it with xprof's converter into an op-level table.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def capture(trace_dir: str, n_steps: int = 5) -> None:
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_trainer_step

    trainer, step, state, ae_params, batch = build_trainer_step()
    rng = jax.random.PRNGKey(1)
    with trainer.mesh:
        for i in range(3):  # warmup + compile
            state, loss = step(state, ae_params, batch, jax.random.fold_in(rng, i))
        loss.block_until_ready()

        with jax.profiler.trace(trace_dir):
            for i in range(n_steps):
                state, loss = step(
                    state, ae_params, batch, jax.random.fold_in(rng, 100 + i)
                )
            loss.block_until_ready()
    print(f"trace written to {trace_dir}")


def capture_ae(trace_dir: str, n_steps: int = 5) -> None:
    """Profile the stage-1 adversarial AE step exactly as bench_ae.py runs it
    (flagship 128^3 batch 2, remat on, packed encoder/decoder)."""
    import tempfile

    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_configs
    from medical_image_generation_tpu.planning.planner import create_config_dict
    from medical_image_generation_tpu.training.train_autoencoder import (
        AutoEncoderTrainer,
    )

    vae_cfg, ddpm_cfg = _flagship_configs()
    vae_cfg = dict(vae_cfg, use_checkpointing=True,
                   remat_policy=os.environ.get(
                       "MEDIMGEN_BENCH_REMAT_POLICY", "acts"))
    ds = {"median_shape": (128, 128, 128), "max_shape": (128, 128, 128)}
    config = create_config_dict(ds, [0], 1, vae_cfg, ddpm_cfg)
    config["results_path"] = os.path.join(
        tempfile.mkdtemp(prefix="medimgen_prof_ae_"), "results"
    )
    config["task"] = "TaskBench"

    if os.environ.get("MEDIMGEN_BENCH_ENLARGE", "1") == "0":
        config["ae_transformations"] = dict(
            config["ae_transformations"], initial_patch_enlargement=False
        )
    from medical_image_generation_tpu.data.patches import (
        compute_initial_patch_size,
    )

    initial = compute_initial_patch_size(config["ae_transformations"])
    print(f"profiling AE step on batch (2, {initial[0]}, {initial[1]}, "
          f"{initial[2]}, 1)")

    trainer = AutoEncoderTrainer(config)
    batch = np.random.default_rng(0).uniform(
        0, 1, size=(2, *initial, 1)
    ).astype(np.float32)
    g_state, d_state = trainer._build_states(batch)
    step = trainer._make_train_step(adv_on=True)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    rng = jax.random.PRNGKey(1)
    with trainer.mesh:
        for i in range(2):
            g_state, d_state, metrics = step(
                g_state, d_state, batch, jax.random.fold_in(rng, i)
            )
        sync(metrics)
        with jax.profiler.trace(trace_dir):
            for i in range(n_steps):
                g_state, d_state, metrics = step(
                    g_state, d_state, batch, jax.random.fold_in(rng, 100 + i)
                )
            sync(metrics)
    print(f"trace written to {trace_dir}")


def parse(trace_dir: str, top: int = 40) -> None:
    """Op-level table from the newest xplane.pb via xprof's HLO op stats."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane.pb found"); return
    xplane = paths[-1]
    print(f"parsing {xplane}")

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data) if isinstance(data, str) else data
    # gviz table: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[c.get("v") if c else None for c in r["c"]] for r in obj["rows"]]

    def col(name):
        for i, c in enumerate(cols):
            if c and name.lower() == str(c).lower():
                return i
        raise KeyError(name)

    i_cat = col("HLO op category")
    i_fw = col("Framework op name")
    i_self = col("Total self time (us)")
    i_occ = col("#Occurrences")
    i_bound = col("Bound by")
    i_gflops = col("Normalized GFLOP/s")
    i_bw = col("HBM BW (GiB/s)")

    # aggregate by category
    cats = {}
    for r in rows:
        t = float(r[i_self] or 0)
        cats[r[i_cat]] = cats.get(r[i_cat], 0.0) + t
    total = sum(cats.values())
    print(f"\n== by category (total {total/1e3:.1f} ms across capture) ==")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:10.2f} ms  {100*t/total:5.1f}%  {cat}")

    print(f"\n== top {top} ops by self time ==")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    for r in rows[:top]:
        print(
            f"{float(r[i_self] or 0)/1e3:9.2f} ms x{int(float(r[i_occ] or 0)):>4} "
            f"[{r[i_cat]}|{r[i_bound]}] {float(r[i_gflops] or 0):8.0f} GF/s "
            f"{float(r[i_bw] or 0):7.1f} GiB/s  {str(r[i_fw])[:95]}"
        )


def main():
    args = sys.argv[1:]
    trace_dir = os.environ.get("MEDIMGEN_PROFILE_DIR", "/tmp/medimgen_profile")
    if "--parse-only" in args:
        parse(args[args.index("--parse-only") + 1])
        return
    ae = "--ae" in args
    args = [a for a in args if not a.startswith("--")]
    n_steps = int(args[0]) if args else 5
    (capture_ae if ae else capture)(trace_dir, n_steps)
    parse(trace_dir)


if __name__ == "__main__":
    main()
