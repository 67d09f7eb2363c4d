"""Capture an xplane trace of the flagship train step and print the top HLO
ops by self-time — the measurement loop behind BENCH_NOTES.md's profile
breakdown (layout copies / cast fusions / conv fusions).

Usage:
    python scripts/profile_step.py [n_steps] [--parse-only DIR]

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
    n_steps = int(args[0]) if args else 5
    capture(trace_dir, n_steps)
    parse(trace_dir)


if __name__ == "__main__":
    main()
