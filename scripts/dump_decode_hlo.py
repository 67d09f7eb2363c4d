"""Dump the post-optimization HLO (with layouts) of the flagship decode
program, to localize what the GroupNorm-stats `copy` ops are normalizing.

    python scripts/dump_decode_hlo.py [out.txt]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax

from bench_decode import build_decode


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_hlo.txt"
    f, params, z = build_decode()
    compiled = f.lower(params, z).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
