"""Pallas TPU flash attention over flattened 2D/3D token grids.

The hot attention sites in this framework are the diffusion U-Net's deep
levels (16^3 = 4096 and 8^3 = 512 tokens with single heads of 512/768
channels — planner configuration) and the VAE nonlocal blocks. The reference
leans on xformers' memory-efficient attention for the same role
(diffusion_model_unet_with_strides.py:120-131).

Kernel design (forward):
* inputs reshaped to (B*H, S, D); grid = (B*H, S/BLOCK_Q); the Q block and
  output are pipelined through VMEM by pallas_call;
* K and V stay in HBM (`memory_space=ANY`) and stream through a 2-slot
  double-buffered VMEM scratch via manual async DMA — VMEM stays bounded
  regardless of sequence length (holding full K/V resident OOMs scoped vmem
  at S=4096, D=512 once the pipeline double-buffers it);
* online softmax over K blocks with float32 (m, l, acc) carries on the MXU:
  one jax.lax.fori_loop, no data-dependent shapes.

Backward: FlashAttention-2-style fused kernels (dQ pass + dK/dV pass) that
recompute p blockwise from the saved row logsumexp — no S^2 materialization.
All matmuls keep operands in the model dtype (bf16) with f32 MXU
accumulation; only p/ds round to bf16 before their matmuls (noise below the
bf16 output precision).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 256
# backward blocks are tunable independently (MEDIMGEN_ATTN_BWD_BLOCK):
# the bwd kernels run ~36% MFU at 256 — larger tiles amortize the
# per-iteration DMA waits and loop overhead
BWD_BLOCK = int(os.environ.get("MEDIMGEN_ATTN_BWD_BLOCK", "512"))
NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, k_buf, v_buf, sem,
                  *, scale: float, block_k: int, seq_len: int):
    """One Q block against K/V streamed from HBM with double buffering.

    q_ref/o_ref: (1, BQ, D) VMEM blocks; k_ref/v_ref: (BH, S, D) in HBM;
    lse_ref: (1, BQ) VMEM block receiving the row logsumexp (saved for the
    fused backward); k_buf/v_buf: (2, BK, D) VMEM scratch; sem: (2, 2) DMA
    semaphores.
    """
    b = pl.program_id(0)
    # Keep operands in their native dtype (bf16 in training): the MXU computes
    # bf16 x bf16 products exactly with f32 accumulation, so dotting bf16
    # operands with preferred_element_type=f32 is BIT-IDENTICAL to upcasting
    # first — and ~4x faster (fp32 matmuls multi-pass on the MXU). The scale
    # is applied to the f32 logits (exact), not to q.
    q = q_ref[0]  # (BQ, D)
    D = q.shape[-1]
    num_kb = seq_len // block_k

    def k_dma(slot, kb):
        return pltpu.make_async_copy(
            k_ref.at[b, pl.ds(kb * block_k, block_k), :], k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, kb):
        return pltpu.make_async_copy(
            v_ref.at[b, pl.ds(kb * block_k, block_k), :], v_buf.at[slot],
            sem.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(kb, 2)
        next_slot = jax.lax.rem(kb + 1, 2)

        @pl.when(kb + 1 < num_kb)
        def _():
            k_dma(next_slot, kb + 1).start()
            v_dma(next_slot, kb + 1).start()

        k_dma(slot, kb).wait()
        v_dma(slot, kb).wait()

        k = k_buf[slot]
        v = v_buf[slot]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) f32
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        # p rounds to the compute dtype for the MXU; the rounding noise is
        # below the (bf16) output precision, and l stays exact f32.
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros((q.shape[0], D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # row logsumexp, replicated over 8 sublanes (TPU block tiling needs the
    # second-to-last block dim divisible by 8)
    lse_row = (m + jnp.log(l))[:, 0]
    lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _divisor_block(S: int, pref: int) -> int:
    for b in (pref, 128, 64, 32, 16, 8):
        if S % b == 0:
            return b
    return S


def _flash_forward(q3, k3, v3, scale: float):
    """q3/k3/v3: (BH, S, D)."""
    BH, S, D = q3.shape
    block_k = _divisor_block(S, BLOCK_K)
    block_q = _divisor_block(S, BLOCK_Q)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, seq_len=S
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), q3.dtype),
            jax.ShapeDtypeStruct((BH, 8, S), jnp.float32),  # logsumexp (8 sublanes)
        ),
        grid=(BH, S // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, D), q3.dtype),
            pltpu.VMEM((2, block_k, D), q3.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * D,
            bytes_accessed=BH * S * D * (3 + 1) * q3.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
        interpret=not _on_tpu(),  # CPU tests exercise the same kernel code
    )(q3, k3, v3)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref,
                   k_buf, v_buf, sem, *, scale: float, block_k: int, seq_len: int):
    """dQ for one Q block; K/V streamed from HBM (FlashAttention-2 backward).

    p = exp(scale * q k^T - L); dp = dO v^T; ds = p * (dp - delta);
    dq = scale * ds @ k, with delta = rowsum(dO * O).
    """
    b = pl.program_id(0)
    q = q_ref[0]   # native (bf16) — MXU f32-accumulates exactly
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    D = q.shape[-1]
    num_kb = seq_len // block_k

    def k_dma(slot, kb):
        return pltpu.make_async_copy(
            k_ref.at[b, pl.ds(kb * block_k, block_k), :], k_buf.at[slot],
            sem.at[slot, 0],
        )

    def v_dma(slot, kb):
        return pltpu.make_async_copy(
            v_ref.at[b, pl.ds(kb * block_k, block_k), :], v_buf.at[slot],
            sem.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(kb, dq):
        slot = jax.lax.rem(kb, 2)
        next_slot = jax.lax.rem(kb + 1, 2)

        @pl.when(kb + 1 < num_kb)
        def _():
            k_dma(next_slot, kb + 1).start()
            v_dma(next_slot, kb + 1).start()

        k_dma(slot, kb).wait()
        v_dma(slot, kb).wait()
        k = k_buf[slot]
        v = v_buf[slot]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (scale * (p * (dp - delta))).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((q.shape[0], D), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_blk_ref, v_blk_ref, lse_ref, delta_ref, q_ref, do_ref,
                    dk_ref, dv_ref, q_buf, do_buf, sem,
                    *, scale: float, block_q: int, seq_len: int):
    """dK/dV for one K block; Q/dO streamed from HBM.

    dv = sum_q p^T dO ; dk = scale * sum_q ds^T q. lse/delta arrive as full
    (1, S) rows in VMEM (a few KB)."""
    b = pl.program_id(0)
    k = k_blk_ref[0]  # native (bf16) — MXU f32-accumulates exactly
    v = v_blk_ref[0]
    D = k.shape[-1]
    num_qb = seq_len // block_q

    def q_dma(slot, qb):
        return pltpu.make_async_copy(
            q_ref.at[b, pl.ds(qb * block_q, block_q), :], q_buf.at[slot],
            sem.at[slot, 0],
        )

    def do_dma(slot, qb):
        return pltpu.make_async_copy(
            do_ref.at[b, pl.ds(qb * block_q, block_q), :], do_buf.at[slot],
            sem.at[slot, 1],
        )

    q_dma(0, 0).start()
    do_dma(0, 0).start()

    def body(qb, carry):
        dk, dv = carry
        slot = jax.lax.rem(qb, 2)
        next_slot = jax.lax.rem(qb + 1, 2)

        @pl.when(qb + 1 < num_qb)
        def _():
            q_dma(next_slot, qb + 1).start()
            do_dma(next_slot, qb + 1).start()

        q_dma(slot, qb).wait()
        do_dma(slot, qb).wait()
        q = q_buf[slot]
        do = do_buf[slot]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) f32
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        ds = (scale * (p * (dp - delta))).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, D)
        return dk, dv

    zero = jnp.zeros((k.shape[0], D), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (zero, zero))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q3, k3, v3, o3, lse, do3, scale: float):
    """Fused backward: returns (dq, dk, dv), all (BH, S, D)."""
    BH, S, D = q3.shape
    block_k = _divisor_block(S, BWD_BLOCK)
    block_q = _divisor_block(S, BWD_BLOCK)
    interpret = not _on_tpu()

    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (BH, 8, S))  # match lse layout

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, seq_len=S),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q3.dtype),
        grid=(BH, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, D), q3.dtype),
            pltpu.VMEM((2, block_k, D), q3.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(q3, do3, lse, delta, k3, v3)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q, seq_len=S),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), q3.dtype),
            jax.ShapeDtypeStruct((BH, S, D), q3.dtype),
        ),
        grid=(BH, S // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, S), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, S), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, D), q3.dtype),
            pltpu.VMEM((2, block_q, D), q3.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(k3, v3, lse, delta, q3, do3)

    return dq, dk, dv


MIN_SEQ_FOR_KERNEL = 8192
MAX_SEQ_FOR_KERNEL = 16384


def kernel_supported(shape, dtype) -> bool:
    """Engage only where the kernel's tiling assumptions hold AND it beats
    XLA's fused attention.

    Measured head-to-head on v5e (B=2, H=1, D=512, bf16; scripts/
    bench_attention.py, fwd / fwd+bwd ms — round 3, native-bf16 matmuls +
    512-wide backward blocks):

        S=4096   xla  2.43 /   3.52   pallas  2.23 /   3.49
        S=8192   xla 57.98 /  62.57   pallas  3.84 /  10.20
        S=16384  xla 11.04 /  28.34   pallas 10.76 /  33.22
        S=32768  xla 42.40 / 115.17   pallas 38.70 / 127.24

    The streaming kernel wins decisively in the [8192, 16384) window
    (anisotropic latents like 16x16x32), where XLA's S^2 path degenerates
    6x. At the flagship 4096 grid the two are within noise (~1%), so the
    gate keeps XLA there: engaging pallas_call would pin operand layouts
    inside the U-Net with no measured upside (the same pinning cost 3x on
    the packed-encoder convs when the Pallas GroupNorm was tried —
    ops/pallas_groupnorm.py). On the backward from 16384 up XLA stays
    ahead (33.2 vs 28.3 at 16384). Sequence-parallel ring attention takes
    over above 32^3 tokens on multi-chip meshes (ops/attention.py).
    """
    B, S, H, D = shape
    if D % 128 != 0:
        return False
    if S % 128 != 0:
        return False
    # VMEM footprint is bounded by blocks, not S; cap D so the f32
    # accumulator + two double-buffered K/V slots stay comfortable.
    if D > 1024:
        return False
    if not (MIN_SEQ_FOR_KERNEL <= S < MAX_SEQ_FOR_KERNEL):
        return False
    return True


def _to_3d(x):
    B, S, H, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, S, D)


def _from_3d(x3, B, H):
    BH, S, D = x3.shape
    return x3.reshape(B, H, S, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """BSHD full attention; forward and backward both run as Pallas kernels
    (FlashAttention-2 style: forward saves the row logsumexp, backward
    recomputes p blockwise — no S^2 materialization in either direction)."""
    out, _ = _flash_fwd(q, k, v, scale)
    return out


def _fwd_impl(q, k, v, scale):
    B, S, H, D = q.shape
    o3, lse = _flash_forward(_to_3d(q), _to_3d(k), _to_3d(v), scale)
    return _from_3d(o3, B, H), lse


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))


def _flash_fwd(q, k, v, scale):
    out, lse = _fwd_impl(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, residuals, g):
    q, k, v, out, lse = residuals
    B, S, H, D = q.shape
    dq3, dk3, dv3 = _flash_backward(
        _to_3d(q), _to_3d(k), _to_3d(v), _to_3d(out), lse, _to_3d(g.astype(q.dtype)),
        scale,
    )
    return (_from_3d(dq3, B, H), _from_3d(dk3, B, H), _from_3d(dv3, B, H))


flash_attention.defvjp(_flash_fwd, _flash_bwd)
