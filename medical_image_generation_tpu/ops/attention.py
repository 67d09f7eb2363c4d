"""Attention over flattened 2D/3D token grids.

The reference relies on xformers ``memory_efficient_attention`` when
available (autoencoderkl_with_strides.py:262-269,
diffusion_model_unet_with_strides.py:120-131). The TPU-native equivalent is a
Pallas flash-attention kernel (ops/pallas_attention.py) for the MXU, with
``jax.nn.dot_product_attention`` as the portable fallback (CPU tests,
interpret mode, or shapes the kernel doesn't cover).

All entry points take (batch, seq, heads, head_dim) — "BSHD" — matching
jax.nn.dot_product_attention.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ring_min_seq() -> int:
    """Token count above which sequence-parallel ring attention pays off:
    one chip handles the flagship 32^3-latent grids comfortably, so the
    ring engages only for >32^3 latents (CLAUDE.md roadmap). The gate below
    compares with strict '>' so exactly-32^3 grids stay on the single-chip
    kernels."""
    return int(os.environ.get("MEDIMGEN_RING_MIN_SEQ", 32768))


def _active_model_mesh():
    """The mesh installed by a trainer's ``with self.mesh:`` scope, when its
    'model' axis is wide enough for sequence sharding."""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - jax internals moved
        return None
    if (
        m is not None
        and not m.empty
        and "model" in m.axis_names
        and m.shape["model"] > 1
    ):
        return m
    return None


def _use_pallas(q_shape, dtype) -> bool:
    if os.environ.get("MEDIMGEN_DISABLE_PALLAS_ATTN"):
        return False
    if not _on_tpu():
        return False
    from medical_image_generation_tpu.ops.pallas_attention import kernel_supported

    return kernel_supported(q_shape, dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Scaled dot-product attention, BSHD layout, no masking.

    Image-generation attention here is always full (no causal mask): tokens
    are flattened spatial grids (reference autoencoderkl_with_strides.py:295-298).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # sequence-parallel ring attention for very long token grids when the
    # active mesh has a 'model' axis to shard them over (SURVEY.md §5
    # long-context row — a capability the reference lacks entirely)
    mesh = _active_model_mesh()
    if (
        mesh is not None
        and q.shape[1] > _ring_min_seq()
        and q.shape[1] % mesh.shape["model"] == 0
        and q.shape == k.shape == v.shape
    ):
        from medical_image_generation_tpu.ops.ring_attention import ring_attention

        return ring_attention(q, k, v, mesh, axis_name="model", scale=float(scale))
    if _use_pallas(q.shape, q.dtype):
        try:
            from medical_image_generation_tpu.ops.pallas_attention import flash_attention

            return flash_attention(q, k, v, float(scale))
        except Exception:  # pragma: no cover - fall back on any kernel issue
            pass
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
