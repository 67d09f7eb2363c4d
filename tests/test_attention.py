"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.ops.pallas_attention import (
    _xla_attention,
    flash_attention,
    kernel_supported,
)


def _make_qkv(rng, B, S, H, D, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (B, S, H, D), dtype)
    k = jax.random.normal(ks[1], (B, S, H, D), dtype)
    v = jax.random.normal(ks[2], (B, S, H, D), dtype)
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize("B,S,H,D", [(2, 256, 1, 128), (1, 512, 2, 128)])
    def test_matches_xla_reference(self, B, S, H, D):
        q, k, v = _make_qkv(jax.random.PRNGKey(0), B, S, H, D)
        scale = D**-0.5
        out = flash_attention(q, k, v, scale)
        ref = _xla_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # S=384/640 -> 3/5 blocks of 128: exercises the fused backward's dq
    # HBM read-modify-write across >2 grid steps (slot-recycle waits)
    @pytest.mark.parametrize("S", [256, 384, 640])
    def test_gradients_match_xla(self, S):
        q, k, v = _make_qkv(jax.random.PRNGKey(1), 1, S, 1, 128)
        scale = 128**-0.5

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_bf16_inputs(self):
        q, k, v = _make_qkv(jax.random.PRNGKey(2), 1, 256, 1, 128, jnp.bfloat16)
        out = flash_attention(q, k, v, 128**-0.5)
        ref = _xla_attention(q, k, v, 128**-0.5)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_kernel_supported_gating(self):
        # measured wins: 8192 (7x) and 32768 — see BENCH_NOTES.md table
        assert kernel_supported((2, 8192, 1, 512), jnp.bfloat16)
        assert kernel_supported((2, 32768, 1, 512), jnp.bfloat16)
        # below: XLA's fused attention measured faster on v5e
        assert not kernel_supported((2, 4096, 1, 512), jnp.bfloat16)
        # at exactly 16384 XLA keeps a 4% fwd+bwd edge
        assert not kernel_supported((2, 16384, 1, 512), jnp.bfloat16)
        # fused backward VMEM: D capped at 512
        assert not kernel_supported((2, 8192, 1, 768), jnp.bfloat16)
        assert not kernel_supported((2, 8192, 1, 100), jnp.bfloat16)  # D not lane-aligned
        assert not kernel_supported((2, 8300, 1, 128), jnp.bfloat16)  # S not tileable

    def test_nonuniform_seq_block(self):
        # S = 384 exercises the 128-divisor block path
        q, k, v = _make_qkv(jax.random.PRNGKey(3), 1, 384, 1, 128)
        out = flash_attention(q, k, v, 128**-0.5)
        ref = _xla_attention(q, k, v, 128**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
