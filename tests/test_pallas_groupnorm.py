"""Pallas packed-GroupNorm kernels (ops/pallas_groupnorm.py): value and
gradient equivalence against the staged-reduction JAX path, on shapes that
do / do not qualify for the kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.ops import pallas_groupnorm as pgn


@pytest.fixture(autouse=True)
def _enable_kernels(monkeypatch):
    monkeypatch.setenv("MEDIMGEN_ENABLE_PALLAS_GN", "1")


def _mk(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0.7, 1.3, shape).astype(np.float32)
    )


class TestPallasGroupNorm:
    # (2, 8, 8, 16, 128): M=1024 -> block_rows 1024 >= 512, Cp=128 => kernels
    QUAL = (2, 8, 8, 16, 128)

    @pytest.mark.parametrize("fuse_silu", [False, True])
    @pytest.mark.parametrize("pack,groups", [(4, 4), (2, 8), (1, 32)])
    def test_kernel_matches_jax_path(self, pack, groups, fuse_silu):
        h = _mk(self.QUAL)
        C = h.shape[-1] // pack
        scale = _mk((C,), 1) * 0.1 + 1.0
        bias = _mk((C,), 2) * 0.1
        assert pgn.kernel_supported(h)
        out = pgn.group_norm_packed(
            h, scale, bias, groups, pack, 1e-6, jnp.float32, fuse_silu)
        ref = pgn._jax_impl(
            h, scale, bias, groups, pack, 1e-6, jnp.float32, fuse_silu)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("mode", ["analytic", "analytic-flat"])
    @pytest.mark.parametrize("fuse_silu", [False, True])
    @pytest.mark.parametrize("pack,groups", [(4, 4), (2, 8), (1, 32)])
    def test_analytic_bwd_matches_autodiff(self, pack, groups, fuse_silu,
                                           mode, monkeypatch):
        """The analytic VJP == jax.grad through the pure-JAX forward, for
        grads wrt activation, scale and bias (groups straddling lane blocks
        at every pack)."""
        monkeypatch.setenv("MEDIMGEN_GN_BWD", mode)
        h = _mk(self.QUAL)
        C = h.shape[-1] // pack
        scale = _mk((C,), 1) * 0.1 + 1.0
        bias = _mk((C,), 2) * 0.1
        w = _mk(self.QUAL, 3)  # non-uniform cotangent via weighted sum

        def f_analytic(hh, ss, bb):
            return jnp.sum(w * pgn.group_norm_packed(
                hh, ss, bb, groups, pack, 1e-6, jnp.float32, fuse_silu))

        def f_ref(hh, ss, bb):
            return jnp.sum(w * pgn._jax_impl(
                hh, ss, bb, groups, pack, 1e-6, jnp.float32, fuse_silu))

        ga = jax.grad(f_analytic, argnums=(0, 1, 2))(h, scale, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(h, scale, bias)
        for a, b in zip(ga, gr):
            # rtol 2e-3: fp32 reductions over 8k elements in different
            # summation orders (matmul/flat vs staged autodiff)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)

    def test_bwd_modes_agree(self, monkeypatch):
        """The default recompute backward and the analytic variant compute
        the same gradient."""
        h = _mk(self.QUAL)
        scale = _mk((32,), 1) * 0.1 + 1.0
        bias = _mk((32,), 2) * 0.1

        def f(hh):
            return jnp.sum(jnp.square(pgn.group_norm_packed(
                hh, scale, bias, 8, 4, 1e-6, jnp.float32, True)))

        g_recompute = jax.grad(f)(h)  # default mode
        monkeypatch.setenv("MEDIMGEN_GN_BWD", "analytic")
        g_analytic = jax.grad(f)(h)
        np.testing.assert_allclose(
            np.asarray(g_analytic), np.asarray(g_recompute),
            rtol=2e-4, atol=2e-4)

    def test_gradients_match_jax_path(self):
        h = _mk(self.QUAL)
        scale = _mk((32,), 1) * 0.1 + 1.0
        bias = _mk((32,), 2) * 0.1

        def f_pallas(hh, ss, bb):
            return jnp.sum(jnp.square(pgn.group_norm_packed(
                hh, ss, bb, 4, 4, 1e-6, jnp.float32, True)))

        def f_ref(hh, ss, bb):
            return jnp.sum(jnp.square(pgn._jax_impl(
                hh, ss, bb, 4, 4, 1e-6, jnp.float32, True)))

        gp = jax.grad(f_pallas, argnums=(0, 1, 2))(h, scale, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(h, scale, bias)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_unqualified_shapes_fall_back(self):
        # Cp=64 (not a 128 multiple) and tiny M both fall back, same math
        for shape in [(2, 8, 8, 16, 64), (2, 2, 2, 2, 128)]:
            h = _mk(shape)
            C = h.shape[-1] // 2
            scale, bias = jnp.ones((C,)), jnp.zeros((C,))
            assert not pgn.kernel_supported(h)
            out = pgn.group_norm_packed(
                h, scale, bias, 4, 2, 1e-6, jnp.float32, False)
            ref = pgn._jax_impl(
                h, scale, bias, 4, 2, 1e-6, jnp.float32, False)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("stats", ["gram", "matmul"])
    def test_stats_variants_match_twostage(self, stats):
        h = _mk(self.QUAL).astype(jnp.bfloat16)
        scale = _mk((32,), 1) * 0.1 + 1.0
        bias = _mk((32,), 2) * 0.1
        ref = pgn._jax_impl(
            h, scale, bias, 8, 4, 1e-6, jnp.float32, True, stats="twostage")
        out = pgn._jax_impl(
            h, scale, bias, 8, 4, 1e-6, jnp.float32, True, stats=stats)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_env_gate_disables_kernels(self, monkeypatch):
        monkeypatch.setenv("MEDIMGEN_DISABLE_PALLAS_GN", "1")
        assert not pgn.kernel_supported(_mk(self.QUAL))

    def test_matches_blocks_groupnorm_at_pack_1(self):
        """pack=1 semantics == the module GroupNorm (fp32 dtype, fused
        affine): pins the stats/fold math against blocks.GroupNorm."""
        from flax import linen as nn

        from medical_image_generation_tpu.models.blocks import GroupNorm

        h = _mk(self.QUAL)
        gn = GroupNorm(num_groups=8, epsilon=1e-6, dtype=jnp.float32)
        variables = gn.init(jax.random.PRNGKey(0), h)
        scale = variables["params"]["scale"] + 0.3
        bias = variables["params"]["bias"] - 0.1
        ref = gn.apply({"params": {"scale": scale, "bias": bias}}, h)
        out = pgn.group_norm_packed(
            h, scale, bias, 8, 1, 1e-6, jnp.float32, False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
