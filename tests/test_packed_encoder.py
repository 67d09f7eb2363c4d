"""Lane-packed encoder execution == Encoder module math, exactly.

The packed path (models/packed_encoder.py) is a TPU execution strategy for
the same parameters; these tests pin numerical equivalence (values and
gradients) across the geometries the planner emits, and the dispatch /
fallback behavior of AutoencoderKL.encode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_generation_tpu.models.autoencoder_kl import (
    AutoencoderKL,
    Decoder,
    Encoder,
)
from medical_image_generation_tpu.models.packed_encoder import (
    _pack_conv_kernel,
    decoder_forward_packed,
    encoder_forward_packed,
    packed_conv,
    packing_viable,
    upsample_packing_viable,
)


def _encoder(num_channels, down, nrb=1, groups=4, sd=3):
    return Encoder(
        spatial_dims=sd,
        num_channels=list(num_channels),
        out_channels=3,
        num_res_blocks=[nrb] * len(num_channels),
        norm_num_groups=groups,
        attention_levels=[False] * len(num_channels),
        downsample_parameters=down,
        dtype=jnp.float32,
    )


def _run_both(enc, x, seed=0):
    params = enc.init(jax.random.PRNGKey(seed), x)["params"]
    ref = enc.apply({"params": params}, x)
    packed = encoder_forward_packed(
        params, x,
        num_channels=tuple(enc.num_channels),
        num_res_blocks=tuple(enc.num_res_blocks),
        norm_num_groups=enc.norm_num_groups,
        downsample_parameters=enc.downsample_parameters,
        dtype=jnp.float32,
    )
    return np.asarray(ref), np.asarray(packed), params


ISO3 = (((1, 1, 1), (3, 3, 3), (1, 1, 1)),
        ((2, 2, 2), (3, 3, 3), (1, 1, 1)),
        ((2, 2, 2), (3, 3, 3), (1, 1, 1)))


class TestPackedKernel:
    def test_packed_conv_matches_plain(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 6, 8, 16, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 8))
        b = jax.random.normal(jax.random.PRNGKey(2), (8,))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn) + b
        for pack in (2, 4):
            xp = x.reshape(2, 6, 8, 16 // pack, pack * 4)
            out = packed_conv(xp, w, b, (1, 1, 1), (1, 1, 1), pack, pack,
                              jnp.float32)
            out = out.reshape(ref.shape)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4, rtol=1e-5)

    def test_packed_strided_conv_matches_plain(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 16, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 4))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn)
        xp = x.reshape(1, 6, 8, 4, 16)  # pack_in 4
        out = packed_conv(xp, w, None, (2, 2, 2), (1, 1, 1), 4, 2, jnp.float32)
        out = out.reshape(ref.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5)

    def test_kernel_block_structure(self):
        # (ky=1, kx=3, Cin=2, Cout=3), pack 4, stride 1, pad 1
        w = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, 3))
        Wp, (lp, rp) = _pack_conv_kernel(w, 4, 4, 1, 1)
        assert Wp.shape == (1, 3, 8, 12)
        assert (lp, rp) == (1, 1)


class TestEncoderEquivalence:
    def test_flagship_like_3d(self):
        enc = _encoder((8, 16, 32), ISO3, nrb=2)
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 16, 16, 1))
        ref, packed, _ = _run_both(enc, x)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_anisotropic_3d(self):
        down = (((1, 1, 1), (3, 3, 3), (1, 1, 1)),
                ((1, 2, 2), (1, 3, 3), (0, 1, 1)),
                ((2, 2, 2), (3, 3, 3), (1, 1, 1)))
        enc = _encoder((8, 16, 32), down, nrb=1)
        x = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 16, 16, 1))
        ref, packed, _ = _run_both(enc, x)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_2d(self):
        down = (((1, 1), (3, 3), (1, 1)),
                ((2, 2), (3, 3), (1, 1)))
        enc = _encoder((8, 16), down, nrb=1, sd=2)
        x = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 1))
        ref, packed, _ = _run_both(enc, x)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_strided_stem(self):
        down = (((2, 2, 2), (3, 3, 3), (1, 1, 1)),
                ((2, 2, 2), (3, 3, 3), (1, 1, 1)))
        enc = _encoder((8, 16), down, nrb=1)
        x = jax.random.uniform(jax.random.PRNGKey(6), (1, 8, 16, 16, 1))
        ref, packed, _ = _run_both(enc, x)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_gradients_match(self):
        enc = _encoder((8, 16), ISO3[:2], nrb=1)
        x = jax.random.uniform(jax.random.PRNGKey(7), (1, 8, 8, 8, 1))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def loss_mod(p):
            return jnp.sum(enc.apply({"params": p}, x) ** 2)

        def loss_packed(p):
            out = encoder_forward_packed(
                p, x, num_channels=(8, 16), num_res_blocks=(1, 1),
                norm_num_groups=4, downsample_parameters=ISO3[:2],
                dtype=jnp.float32)
            return jnp.sum(out ** 2)

        g1 = jax.grad(loss_mod)(params)
        g2 = jax.grad(loss_packed)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)

    def test_checkpointing_path_matches(self):
        enc = _encoder((8, 16), ISO3[:2], nrb=1)
        x = jax.random.uniform(jax.random.PRNGKey(8), (1, 8, 8, 8, 1))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        a = encoder_forward_packed(
            params, x, num_channels=(8, 16), num_res_blocks=(1, 1),
            norm_num_groups=4, downsample_parameters=ISO3[:2],
            dtype=jnp.float32, use_checkpointing=True)
        b = encoder_forward_packed(
            params, x, num_channels=(8, 16), num_res_blocks=(1, 1),
            norm_num_groups=4, downsample_parameters=ISO3[:2],
            dtype=jnp.float32, use_checkpointing=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @pytest.mark.parametrize("policy", ["acts", "full"])
    def test_remat_policies_preserve_gradients(self, policy):
        """Both rematerialization granularities are pure execution
        strategies: values and parameter gradients match the no-remat
        packed path bit-for-bit (same primitives, different scheduling)."""
        enc = _encoder((8, 16), ISO3[:2], nrb=1)
        x = jax.random.uniform(jax.random.PRNGKey(9), (2, 8, 8, 8, 1))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, remat, pol):
            out = encoder_forward_packed(
                p, x, num_channels=(8, 16), num_res_blocks=(1, 1),
                norm_num_groups=4, downsample_parameters=ISO3[:2],
                dtype=jnp.float32, use_checkpointing=remat,
                remat_policy=pol)
            return jnp.sum(out ** 2)

        v0, g0 = jax.value_and_grad(loss)(params, False, "acts")
        v1, g1 = jax.value_and_grad(loss)(params, True, policy)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


UP3 = (((2, 2, 2), (3, 3, 3), (1, 1, 1)),
       ((2, 2, 2), (3, 3, 3), (1, 1, 1)))


class TestDecoderEquivalence:
    def _decoder(self, num_channels, up, nrb=1, groups=4, sd=3):
        return Decoder(
            spatial_dims=sd,
            num_channels=list(num_channels),
            out_channels=1,
            num_res_blocks=[nrb] * len(num_channels),
            norm_num_groups=groups,
            attention_levels=[False] * len(num_channels),
            upsample_parameters=up,
            dtype=jnp.float32,
        )

    def _run_both(self, dec, z, seed=0):
        params = dec.init(jax.random.PRNGKey(seed), z)["params"]
        ref = dec.apply({"params": params}, z)
        packed = decoder_forward_packed(
            params, z,
            num_channels=tuple(dec.num_channels),
            num_res_blocks=tuple(dec.num_res_blocks),
            norm_num_groups=dec.norm_num_groups,
            upsample_parameters=dec.upsample_parameters,
            dtype=jnp.float32,
        )
        return np.asarray(ref), np.asarray(packed)

    def test_flagship_like_3d(self):
        dec = self._decoder((8, 16, 32), UP3, nrb=2)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4, 4, 3))
        ref, packed = self._run_both(dec, z)
        assert ref.shape == packed.shape
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_anisotropic_3d(self):
        up = (((2, 2, 2), (3, 3, 3), (1, 1, 1)),
              ((1, 2, 2), (1, 3, 3), (0, 1, 1)))
        dec = self._decoder((8, 16, 32), up, nrb=1)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4, 3))
        ref, packed = self._run_both(dec, z)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_2d(self):
        up = (((2, 2), (3, 3), (1, 1)),)
        dec = self._decoder((8, 16), up, nrb=1, sd=2)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
        ref, packed = self._run_both(dec, z)
        np.testing.assert_allclose(packed, ref, atol=1e-4, rtol=1e-5)

    def test_decode_dispatches_packed(self, monkeypatch):
        vae_params = {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
            "num_channels": [8, 16, 32], "latent_channels": 4,
            "num_res_blocks": 1, "norm_num_groups": 4,
            "attention_levels": [False, False, False],
            "downsample_parameters": [list(list(t) for t in lay) for lay in ISO3],
            "upsample_parameters": [list(list(t) for t in lay) for lay in UP3],
        }
        ae = AutoencoderKL.from_config(vae_params, dtype=jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 16, 16, 1))
        rng = jax.random.PRNGKey(1)
        variables = ae.init({"params": rng}, x, rng)
        z = ae.apply(variables, x, rng, method=ae.encode_stage_2_inputs)

        import medical_image_generation_tpu.models.packed_encoder as pe
        calls = {"n": 0}
        orig = pe.decoder_forward_packed

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(pe, "decoder_forward_packed", spy)
        out1 = ae.apply(variables, z, method=ae.decode)
        assert calls["n"] == 1
        monkeypatch.setenv("MEDIMGEN_DISABLE_PACKED_ENCODER", "1")
        out2 = ae.apply(variables, z, method=ae.decode)
        assert calls["n"] == 1
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-4, rtol=1e-5)

    def test_upsample_viability_guard(self):
        assert upsample_packing_viable(
            attention_levels=[False], with_nonlocal_attn=False,
            upsample_parameters=UP3, use_convtranspose=False)
        assert not upsample_packing_viable(
            attention_levels=[False], with_nonlocal_attn=False,
            upsample_parameters=UP3, use_convtranspose=True)


class TestDispatch:
    def _vae_params(self):
        return {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
            "num_channels": [8, 16, 32], "latent_channels": 4,
            "num_res_blocks": 1, "norm_num_groups": 4,
            "attention_levels": [False, False, False],
            "downsample_parameters": [list(list(t) for t in lay) for lay in ISO3],
            "upsample_parameters": [
                [[2, 2, 2], [3, 3, 3], [1, 1, 1]],
                [[2, 2, 2], [3, 3, 3], [1, 1, 1]],
            ],
        }

    def test_encode_uses_packed_path_and_matches(self, monkeypatch):
        ae = AutoencoderKL.from_config(self._vae_params(), dtype=jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 16, 16, 1))
        rng = jax.random.PRNGKey(1)
        variables = ae.init({"params": rng}, x, rng)

        import medical_image_generation_tpu.models.packed_encoder as pe
        calls = {"n": 0}
        orig = pe.encoder_forward_packed

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(pe, "encoder_forward_packed", spy)
        mu1, sig1 = ae.apply(variables, x, method=ae.encode)
        assert calls["n"] == 1

        monkeypatch.setenv("MEDIMGEN_DISABLE_PACKED_ENCODER", "1")
        mu2, sig2 = ae.apply(variables, x, method=ae.encode)
        assert calls["n"] == 1  # module path this time
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig2), atol=1e-4, rtol=1e-5)

    def test_viability_guard(self):
        assert packing_viable(
            attention_levels=[False], with_nonlocal_attn=False,
            downsample_parameters=ISO3)
        assert not packing_viable(
            attention_levels=[True], with_nonlocal_attn=False,
            downsample_parameters=ISO3)
        even_kernel = (((1, 1, 1), (4, 4, 4), (1, 1, 1)),)
        assert not packing_viable(
            attention_levels=[False], with_nonlocal_attn=False,
            downsample_parameters=even_kernel)


class TestRematPolicyValidation:
    """An invalid remat_policy must surface as a config error at model
    construction, NOT be swallowed by the packed-path geometry fallback
    (which would silently run the unpacked module path — at flagship size
    that does not fit HBM)."""

    VAE_CFG = {
        "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
        "latent_channels": 3, "num_res_blocks": 1, "norm_num_groups": 4,
        "num_channels": [8, 8], "attention_levels": [False, False],
        "downsample_parameters": [list(list(x) for x in lay) for lay in ISO3[:2]],
        "upsample_parameters": [list(list(x) for x in ISO3[1])],
        "use_checkpointing": True,
    }

    def test_from_config_rejects_typo(self):
        cfg = dict(self.VAE_CFG, remat_policy="actss")
        with pytest.raises(ValueError, match="remat_policy"):
            AutoencoderKL.from_config(cfg)

    def test_vqvae_from_config_rejects_typo(self):
        from medical_image_generation_tpu.models.vqvae import VQVAE

        cfg = dict(self.VAE_CFG, remat_policy="ful")
        with pytest.raises(ValueError, match="remat_policy"):
            VQVAE.from_config(cfg)

    def test_dispatch_raises_instead_of_silent_fallback(self):
        """Even when the model is built directly (bypassing from_config),
        the packed dispatch validates the policy before its geometry try."""
        ae = AutoencoderKL(
            spatial_dims=3, in_channels=1, out_channels=1,
            num_channels=(8, 8), latent_channels=3, num_res_blocks=(1, 1),
            norm_num_groups=4, attention_levels=(False, False),
            downsample_parameters=ISO3[:2], upsample_parameters=(ISO3[1],),
            use_checkpointing=True, remat_policy="nope", dtype=jnp.float32,
        )
        x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
        variables = ae.init({"params": jax.random.PRNGKey(0)}, x,
                            jax.random.PRNGKey(1))
        with pytest.raises(ValueError, match="remat_policy"):
            ae.apply(variables, x, method=ae.encode)
