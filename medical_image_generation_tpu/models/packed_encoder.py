"""Lane-packed (space-to-depth) execution of the VAE encoder.

Why: the planner's encoder opens with 32-channel convolutions at full volume
resolution (vae num_channels[0]=32 at 128^3). TPU vector lanes and MXU tiles
are 128 wide, so every level-0 tensor is lane-padded 4x — the round-2 profile
showed the frozen-AE encode costing ~77 ms of a 361 ms LDM step: 45 ms of
11%-MFU convolutions plus ~30 ms of layout copies shuffling 4x-padded
activations (BENCH_NOTES.md).

Fix: execute the encoder with the last spatial axis *packed into the channel
dim* — x of shape (..., X, C) viewed as (..., X/p, p*C), which is a FREE
contiguous reshape in channels-last layout. A 3x3x3 convolution on the packed
view is still exactly one lax.conv: its kernel is a block-sparse rearrangement
of the original weights,

    Wp[kz, ky, b, (q, ci), (p, co)] = W[kz, ky, dx, ci, co]
        where  pack_in*b + q = x_stride*p + dx - x_pad,

valid whenever pack_in == x_stride * pack_out (block offsets then cancel, so
the packed conv strides 1 along the packed axis). GroupNorm statistics and the
elementwise chain run on the packed view directly (per-true-channel stats via
a grouped reshape). The result is bitwise the same math — the pure function
here is tested against the Encoder module path — with 128-lane tensors
end-to-end: no padding, no layout copies, full MXU tiles.

This is an execution strategy, not a model change: parameters, checkpoint
format, and numerics are the Encoder's. AutoencoderKL.encode dispatches here
when the geometry qualifies (set MEDIMGEN_DISABLE_PACKED_ENCODER=1 to force
the module path).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name


def _repack(h: jax.Array, pack_from: int, pack_to: int) -> jax.Array:
    """Change the lane-packing factor — a pure (free) reshape."""
    if pack_from == pack_to:
        return h
    lead = h.shape[:-2]
    xb, cp = h.shape[-2], h.shape[-1]
    X = xb * pack_from
    C = cp // pack_from
    if X % pack_to:
        raise ValueError(f"X={X} not divisible by pack {pack_to}")
    return h.reshape(*lead, X // pack_to, pack_to * C)


def _pack_conv_kernel(W: jax.Array, pack_in: int, pack_out: int,
                      x_stride: int, x_pad: int):
    """Block-sparse packed kernel + required packed-axis padding.

    W: (*k_lead, kx, Cin, Cout) -> (*k_lead, KB, pack_in*Cin, pack_out*Cout).
    """
    *k_lead, kx, Cin, Cout = W.shape
    rmin = -x_pad
    rmax = x_stride * (pack_out - 1) + kx - 1 - x_pad
    bmin = rmin // pack_in
    bmax = rmax // pack_in
    KB = bmax - bmin + 1
    Wp = jnp.zeros((*k_lead, KB, pack_in * Cin, pack_out * Cout), W.dtype)
    for p in range(pack_out):
        for dx in range(kx):
            r = x_stride * p + dx - x_pad
            b = r // pack_in
            q = r - b * pack_in
            Wp = Wp.at[
                ..., b - bmin, q * Cin:(q + 1) * Cin, p * Cout:(p + 1) * Cout
            ].set(W[..., dx, :, :])
    return Wp, (-bmin, bmax)


def _dim_numbers(ndim: int):
    if ndim == 5:
        return ("NDHWC", "DHWIO", "NDHWC")
    if ndim == 4:
        return ("NHWC", "HWIO", "NHWC")
    raise ValueError(f"unsupported input rank {ndim}")


def packed_conv(h: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
                strides: Sequence[int], pads: Sequence[int],
                pack_in: int, pack_out: int, dtype) -> jax.Array:
    """Convolution on a lane-packed input. ``h`` is packed by ``pack_in``;
    output comes packed by ``pack_out``. Requires
    pack_in == strides[-1] * pack_out."""
    *lead_strides, sx = strides
    *lead_pads, px = pads
    assert pack_in == sx * pack_out, (pack_in, sx, pack_out)
    Wp, (lp, rp) = _pack_conv_kernel(kernel.astype(dtype), pack_in, pack_out,
                                     sx, px)
    dn = lax.conv_dimension_numbers(h.shape, Wp.shape, _dim_numbers(h.ndim))
    out = lax.conv_general_dilated(
        h.astype(dtype), Wp,
        window_strides=(*lead_strides, 1),
        padding=[(p, p) for p in lead_pads] + [(lp, rp)],
        dimension_numbers=dn,
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(dtype), pack_out)
    return out


def packed_group_norm(h: jax.Array, scale: jax.Array, bias: jax.Array,
                      num_groups: int, pack: int, eps: float, dtype,
                      fuse_silu: bool = False) -> jax.Array:
    """blocks.GroupNorm semantics (fp32 fast-variance stats, folded affine)
    on a lane-packed view — packed x positions are just more spatial
    elements of each true channel.

    Executes via the exact-traffic Pallas stats/apply kernels when the
    geometry qualifies (ops/pallas_groupnorm.py — the XLA lowering cost
    ~5.6 ms/instance in fp32 convert copies at the 128^3 level-0, the
    kernels ~1.3 ms), else via the staged-reduction JAX path. ``fuse_silu``
    folds the SiLU that follows every ResBlock GroupNorm into the apply
    pass."""
    from medical_image_generation_tpu.ops.pallas_groupnorm import (
        group_norm_packed,
    )

    return group_norm_packed(h, scale, bias, num_groups, pack, eps, dtype,
                             fuse_silu)


def _res_block(h: jax.Array, p: Dict, num_groups: int, eps: float,
               pack: int, dtype) -> jax.Array:
    """ResBlock math (blocks.ResBlock, no time embedding) on the packed view.

    The three inner activations carry the checkpoint name ``ae_act`` — under
    the "acts" rematerialization policy (see _remat) they are SAVED for the
    backward, so conv gradients never recompute a convolution and each
    GroupNorm VJP finds its saved input; backward recompute is confined to
    the GroupNorm VJP's own internals (ops/pallas_groupnorm.py)."""
    hin = h
    h = packed_group_norm(h, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
                          num_groups, pack, eps, dtype, fuse_silu=True)
    h = checkpoint_name(h, "ae_act")
    k = p["ConvND_0"]["Conv_0"]
    nd = h.ndim - 2
    h = packed_conv(h, k["kernel"], k["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)
    h = checkpoint_name(h, "ae_act")
    h = packed_group_norm(h, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
                          num_groups, pack, eps, dtype, fuse_silu=True)
    h = checkpoint_name(h, "ae_act")
    k = p["ConvND_1"]["Conv_0"]
    h = packed_conv(h, k["kernel"], k["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)
    if "ConvND_2" in p:  # 1x1 shortcut on channel change
        k = p["ConvND_2"]["Conv_0"]
        hin = packed_conv(hin, k["kernel"], k["bias"], (1,) * nd, (0,) * nd,
                          pack, pack, dtype)
    return hin + h


VALID_REMAT_POLICIES = ("acts", "full")


def validate_remat_policy(remat_policy: str) -> str:
    """Eager config validation. Must be called OUTSIDE the packed-path
    ``try: ... except ValueError`` geometry fallback in
    module_encoder_features/module_decoder_features: a typo'd policy in a
    hand-edited YAML must surface as a config error, not silently route the
    model onto the unpacked module path (which at flagship size does not
    fit HBM)."""
    if remat_policy not in VALID_REMAT_POLICIES:
        raise ValueError(
            f"unknown remat_policy {remat_policy!r}; "
            f"valid: {VALID_REMAT_POLICIES}"
        )
    return remat_policy


def _remat(remat_policy: str):
    """ResBlock rematerialization wrapper for ``use_checkpointing``.

    * ``"acts"`` (default): save the named inner activations (3 tensors per
      block) — the backward recomputes NO convolutions; only the GroupNorm
      VJPs recompute their (cheap) internals. Costs ~3x the activation
      memory of full remat per block (12.66 vs 10.52 GB at the 128^3
      flagship, batch 2); the planner's memory ladder (planning/memory.py)
      falls back to "full" before halving the batch. Measured +21% stage-1
      steps/s over "full" (BENCH_NOTES round 3b).
    * ``"full"``: plain jax.checkpoint — only block inputs live across the
      forward; the backward recomputes each block's convs + norms (the
      round-3 stage-1 profile priced that at ~25% of the step).
    """
    validate_remat_policy(remat_policy)
    if remat_policy == "full":
        return jax.checkpoint(_res_block, static_argnums=(2, 3, 4, 5))
    return jax.checkpoint(
        _res_block, static_argnums=(2, 3, 4, 5),
        policy=jax.checkpoint_policies.save_only_these_names("ae_act"),
    )


def _pack_for(channels: int, X: int) -> int:
    """Largest pack in {4, 2, 1} filling the 128 lanes without exceeding them."""
    for pack in (4, 2):
        if channels * pack <= 128 and X % pack == 0:
            return pack
    return 1


def packing_viable(*, attention_levels, with_nonlocal_attn,
                   downsample_parameters) -> bool:
    """Geometry guard: the packed path covers attention-free encoders whose
    conv x-geometry is odd-kernel, stride 1 or 2, SAME-padded."""
    if os.environ.get("MEDIMGEN_DISABLE_PACKED_ENCODER"):
        return False
    if any(attention_levels) or with_nonlocal_attn:
        return False
    for layer in downsample_parameters:
        (_, *_, sx), (_, *_, kx), (_, *_, px) = (
            tuple(layer[0]), tuple(layer[1]), tuple(layer[2])
        )
        if sx not in (1, 2) or kx % 2 == 0 or px != kx // 2:
            return False
    return True


def encoder_forward_packed(
    params: Dict,
    x: jax.Array,
    *,
    num_channels: Sequence[int],
    num_res_blocks: Sequence[int],
    norm_num_groups: int,
    downsample_parameters: Sequence,
    use_checkpointing: bool = False,
    remat_policy: str = "acts",
    dtype=jnp.float32,
    eps: float = 1e-6,
) -> jax.Array:
    """Pure-function Encoder forward (models.autoencoder_kl.Encoder) with
    lane packing. ``params``: the encoder's param sub-tree."""
    h = x.astype(dtype)
    nd = h.ndim - 2

    def geo(layer):
        s, k, p = (tuple(layer[0]), tuple(layer[1]), tuple(layer[2]))
        return s, k, p

    res_fn = _remat(remat_policy) if use_checkpointing else _res_block

    # stem: plain input (pack 1) -> level-0 pack
    s, k, p = geo(downsample_parameters[0])
    X0 = x.shape[-2] // s[-1]
    pack = _pack_for(num_channels[0], X0)
    stem = params["ConvND_0"]["Conv_0"]
    h = _repack(h, 1, s[-1] * pack)
    h = packed_conv(h, stem["kernel"], stem["bias"], s, p, s[-1] * pack, pack, dtype)

    rb = 0
    for level, ch in enumerate(num_channels):
        for _ in range(num_res_blocks[level]):
            h = res_fn(h, params[f"ResBlock_{rb}"], norm_num_groups, eps,
                       pack, dtype)
            rb += 1
        if level != len(num_channels) - 1:
            s, k, p = geo(downsample_parameters[level + 1])
            X_out = (h.shape[-2] * pack) // s[-1]
            new_pack = _pack_for(num_channels[level + 1], X_out)
            ds = params[f"Downsample_{level}"]["ConvND_0"]["Conv_0"]
            h = _repack(h, pack, s[-1] * new_pack)
            h = packed_conv(h, ds["kernel"], ds["bias"], s, p,
                            s[-1] * new_pack, new_pack, dtype)
            pack = new_pack

    # final norm + out conv at pack 1 (full-width channels by now)
    h = _repack(h, pack, 1)
    h = packed_group_norm(h, params["GroupNorm_0"]["scale"],
                          params["GroupNorm_0"]["bias"],
                          norm_num_groups, 1, eps, dtype)
    out = params["ConvND_1"]["Conv_0"]
    h = packed_conv(h, out["kernel"], out["bias"], (1,) * nd, (1,) * nd,
                    1, 1, dtype)
    return h


def _nrb(parent) -> tuple:
    nrb = parent.num_res_blocks
    return (tuple(nrb) if isinstance(nrb, (list, tuple))
            else (nrb,) * len(parent.num_channels))


def module_encoder_features(parent, x, *, with_nonlocal_attn: bool) -> jax.Array:
    """Shared dispatch for AutoencoderKL / VQVAE: run ``parent.encoder`` via
    the lane-packed path when the geometry qualifies, else the module path
    (always during init, which must create the params)."""
    if not parent.is_initializing() and packing_viable(
        attention_levels=parent.attention_levels,
        with_nonlocal_attn=with_nonlocal_attn,
        downsample_parameters=parent.downsample_parameters,
    ):
        params = parent.variables.get("params", {}).get("encoder")
        if params is not None:
            if parent.use_checkpointing:  # before the try: config errors
                validate_remat_policy(getattr(parent, "remat_policy", "acts"))
            try:
                return encoder_forward_packed(
                    params, x,
                    num_channels=tuple(parent.num_channels),
                    num_res_blocks=_nrb(parent),
                    norm_num_groups=parent.norm_num_groups,
                    downsample_parameters=parent.downsample_parameters,
                    use_checkpointing=parent.use_checkpointing,
                    remat_policy=getattr(parent, "remat_policy", "acts"),
                    dtype=parent.dtype,
                )
            except ValueError:  # e.g. indivisible extents
                pass
    return parent.encoder(x)


def module_decoder_features(parent, z, *, with_nonlocal_attn: bool,
                            use_convtranspose: bool = False) -> jax.Array:
    """Shared decoder dispatch (see module_encoder_features)."""
    if not parent.is_initializing() and upsample_packing_viable(
        attention_levels=parent.attention_levels,
        with_nonlocal_attn=with_nonlocal_attn,
        upsample_parameters=parent.upsample_parameters,
        use_convtranspose=use_convtranspose,
    ):
        params = parent.variables.get("params", {}).get("decoder")
        if params is not None:
            if parent.use_checkpointing:
                validate_remat_policy(getattr(parent, "remat_policy", "acts"))
            try:
                return decoder_forward_packed(
                    params, z,
                    num_channels=tuple(parent.num_channels),
                    num_res_blocks=_nrb(parent),
                    norm_num_groups=parent.norm_num_groups,
                    upsample_parameters=parent.upsample_parameters,
                    use_checkpointing=parent.use_checkpointing,
                    remat_policy=getattr(parent, "remat_policy", "acts"),
                    dtype=parent.dtype,
                )
            except ValueError:
                pass
    return parent.decoder(z)


def _pack_upsample_kernel_x(K: jax.Array, pack_in: int) -> jax.Array:
    """Packed kernel of the x2 fused transposed upsample-conv along the
    packed axis (see blocks.fuse_upsample_kernel_axis for the 4-tap K4
    derivation). Output comes packed by ``2*pack_in``:

    The fused map is out[x'] = sum_x K4[2x - x' + 2] * in[x]; with
    out x' = 2p*b' + p', in x = p*b + q and conv block offset b - b' = kb - 1
    (kernel block kb, SAME pad 1) the tap index is

        t = 2p*(kb - 1) + 2q - p' + 2,  kept when 0 <= t < 4.

    K: (*k_lead, 3, Ci, Co) -> (*k_lead, 3, pack_in*Ci, 2*pack_in*Co)."""
    from medical_image_generation_tpu.models.blocks import (
        fuse_upsample_kernel_axis,
    )

    K4 = fuse_upsample_kernel_axis(K, K.ndim - 3)  # (*k_lead, 4, Ci, Co)
    *k_lead, _, Ci, Co = K4.shape
    P = 2 * pack_in
    Wp = jnp.zeros((*k_lead, 3, pack_in * Ci, P * Co), K4.dtype)
    for kb in range(3):
        for q in range(pack_in):
            for pp in range(P):
                t = 2 * pack_in * (kb - 1) + 2 * q - pp + 2
                if 0 <= t < 4:
                    Wp = Wp.at[
                        ..., kb, q * Ci:(q + 1) * Ci, pp * Co:(pp + 1) * Co
                    ].set(K4[..., t, :, :])
    return Wp


def _packed_upsample(h: jax.Array, p: Dict, stride: Sequence[int],
                     pack: int, dtype) -> tuple:
    """blocks.Upsample math on the packed view, with no materialized
    nearest-repeat and no dilation zero-waste: leading strided axes are
    parity-decomposed into dense stride-1 subpixel convs
    (blocks._parity_taps — lhs_dilation on TPU executes 2x zero MACs per
    dilated axis), the packed x axis upsamples through the pack-doubling
    packed kernel (_pack_upsample_kernel_x), and the parity outputs are
    interleaved with one reshape/transpose.
    Returns (out, out_pack) — out_pack is 2*pack when the x axis upsamples."""
    import itertools

    from medical_image_generation_tpu.models.blocks import _parity_taps

    if any(s not in (1, 2) for s in stride):
        raise ValueError(
            f"packed upsample handles strides 1/2 only, got {tuple(stride)}; "
            "upsample_packing_viable should have routed this geometry to "
            "the plain blocks.Upsample path"
        )
    *lead_s, sx = stride
    k = p["ConvND_0"]["Conv_0"]
    K0 = k["kernel"]
    outs = []
    out_pack = pack
    combos = list(itertools.product(
        *[((0, 1) if s == 2 else (None,)) for s in lead_s]
    ))
    for combo in combos:
        K = K0
        pads = []
        for ax, pr in enumerate(combo):
            if pr is None:
                pads.append((1, 1))
            else:
                K, pad = _parity_taps(K, ax, pr)
                pads.append(pad)
        if sx == 2:
            Kp = _pack_upsample_kernel_x(K, pack)
            out_pack = 2 * pack
            pads.append((1, 1))
        else:
            Kp, (lp, rp) = _pack_conv_kernel(K, pack, pack, 1, 1)
            out_pack = pack
            pads.append((lp, rp))
        dn = lax.conv_dimension_numbers(h.shape, Kp.shape,
                                        _dim_numbers(h.ndim))
        outs.append(lax.conv_general_dilated(
            h.astype(dtype), Kp.astype(dtype),
            window_strides=(1,) * (h.ndim - 2),
            padding=pads,
            dimension_numbers=dn,
        ))
    B, *S, _ = outs[0].shape
    Cp = outs[0].shape[-1]
    nd_lead = len(lead_s)
    t = jnp.stack(outs, axis=-2)  # (B, *S, P, Cp)
    par = [2 if s == 2 else 1 for s in lead_s]
    t = t.reshape(B, *S, *par, 1, Cp)  # trailing 1: packed x has no parity
    perm = [0]
    for i in range(nd_lead):
        perm += [1 + i, 2 + nd_lead + i]
    perm += [1 + nd_lead, 2 + 2 * nd_lead, 3 + 2 * nd_lead]
    t = t.transpose(perm)
    out = t.reshape(
        B, *[S[i] * par[i] for i in range(nd_lead)], S[nd_lead], Cp
    )
    out = out + jnp.tile(k["bias"].astype(dtype), out_pack)
    return out, out_pack


def upsample_packing_viable(*, attention_levels, with_nonlocal_attn,
                            upsample_parameters, use_convtranspose) -> bool:
    if os.environ.get("MEDIMGEN_DISABLE_PACKED_ENCODER"):
        return False
    if any(attention_levels) or with_nonlocal_attn or use_convtranspose:
        return False
    for layer in upsample_parameters:
        strides, (_, *_, kx) = tuple(layer[0]), tuple(layer[1])
        # _packed_upsample parity-decomposes stride 2 and passes stride 1
        # through; any other factor (e.g. anisotropic 3x) must take the
        # plain jnp.repeat path in blocks.Upsample
        if any(s not in (1, 2) for s in strides) or kx % 2 == 0:
            return False
    return True


def decoder_forward_packed(
    params: Dict,
    z: jax.Array,
    *,
    num_channels: Sequence[int],
    num_res_blocks: Sequence[int],
    norm_num_groups: int,
    upsample_parameters: Sequence,
    use_checkpointing: bool = False,
    remat_policy: str = "acts",
    dtype=jnp.float32,
    eps: float = 1e-6,
) -> jax.Array:
    """Pure-function Decoder forward (models.autoencoder_kl.Decoder) with
    lane packing — the mirror of encoder_forward_packed: the decoder ENDS at
    the 32-channel level at full resolution, so its tail is where the 4x
    lane padding lives. ``params``: the decoder's param sub-tree;
    ``num_channels``/``num_res_blocks`` in ENCODER order (reversed here,
    exactly as the Decoder module does)."""
    channels = list(reversed(list(num_channels)))
    res_blocks = list(reversed(list(num_res_blocks)))
    h = z.astype(dtype)
    nd = h.ndim - 2

    res_fn = _remat(remat_policy) if use_checkpointing else _res_block

    # conv_in at the deep (wide-channel) level: plain
    cin = params["ConvND_0"]["Conv_0"]
    pack = _pack_for(channels[0], h.shape[-2])
    h = _repack(h, 1, pack)
    h = packed_conv(h, cin["kernel"], cin["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)

    rb = 0
    for level, ch in enumerate(channels):
        X = h.shape[-2] * pack
        new_pack = _pack_for(ch, X)
        h = _repack(h, pack, new_pack)
        pack = new_pack
        for _ in range(res_blocks[level]):
            h = res_fn(h, params[f"ResBlock_{rb}"], norm_num_groups, eps,
                       pack, dtype)
            rb += 1
        if level != len(channels) - 1:
            s = tuple(upsample_parameters[level][0])
            h, pack = _packed_upsample(
                h, params[f"Upsample_{level}"], s, pack, dtype
            )

    h = packed_group_norm(h, params["GroupNorm_0"]["scale"],
                          params["GroupNorm_0"]["bias"],
                          norm_num_groups, pack, eps, dtype)
    out = params["ConvND_1"]["Conv_0"]
    h = packed_conv(h, out["kernel"], out["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)
    return _repack(h, pack, 1)
