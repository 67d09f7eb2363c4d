"""Pallas TPU flash attention over flattened 2D/3D token grids.

The hot attention sites in this framework are the diffusion U-Net's deep
levels (16^3 = 4096 and 8^3 = 512 tokens with single heads of 512/768
channels — planner configuration) and the VAE nonlocal blocks. The reference
leans on xformers' memory-efficient attention for the same role
(diffusion_model_unet_with_strides.py:120-131).

Kernel design (forward):
* inputs reshaped to (B*H, S, D); grid = (B*H, S/BLOCK_Q);
* the full K/V for one (batch, head) stay resident in VMEM (gated: the
  kernel only engages when 2*S*D*bytes fits the VMEM budget — true for all
  planner-derived grids), the Q block is streamed by the pipeline;
* online softmax over K blocks with float32 (m, l, acc) carries on the MXU:
  one jax.lax.fori_loop, no data-dependent shapes.

Backward: custom VJP that recomputes attention with plain XLA einsums —
correct gradients with the S^2 matrix living in HBM; a fused backward
kernel is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256
VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # of ~16 MB/core, leave room for blocks
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    """One Q block vs the full K/V of this (batch*head)."""
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    S = k_ref.shape[1]
    D = q.shape[-1]
    num_kb = S // block_k

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_forward(q3, k3, v3, scale: float):
    """q3/k3/v3: (BH, S, D)."""
    BH, S, D = q3.shape

    def divisor_block(pref):
        for b in (pref, 128, 64, 32, 16, 8):
            if S % b == 0:
                return b
        return S

    block_k = divisor_block(BLOCK_K)
    block_q = divisor_block(BLOCK_Q)

    grid = (BH, S // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, block_k=block_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q3.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=BH * S * D * (3 + 1) * q3.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
        interpret=not _on_tpu(),  # CPU tests exercise the same kernel code
    )(q3, k3, v3)


def kernel_supported(shape, dtype) -> bool:
    """Engage only where the kernel's residency/tiling assumptions hold."""
    B, S, H, D = shape
    itemsize = jnp.dtype(dtype).itemsize
    if D % 128 != 0:
        return False
    if S % 256 != 0 and S % 128 != 0:
        return False
    if 2 * S * D * itemsize > VMEM_BUDGET_BYTES:
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """BSHD full attention. Forward via the Pallas kernel, backward via an
    XLA recomputation VJP."""
    return _fwd_impl(q, k, v, scale)


def _fwd_impl(q, k, v, scale):
    B, S, H, D = q.shape
    q3 = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    k3 = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    v3 = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    o3 = _flash_forward(q3, k3, v3, scale)
    return o3.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))


def _flash_fwd(q, k, v, scale):
    out = _fwd_impl(q, k, v, scale)
    return out, (q, k, v)


def _flash_bwd(scale, residuals, g):
    q, k, v = residuals

    def f(q, k, v):
        return _xla_attention(q, k, v, scale).astype(q.dtype)

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
