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
                      num_groups: int, pack: int, eps: float, dtype) -> jax.Array:
    """blocks.GroupNorm semantics (fp32 fast-variance stats, folded affine in
    the compute dtype) on a lane-packed view — packed x positions are just
    more spatial elements of each true channel."""
    B = h.shape[0]
    C = h.shape[-1] // pack
    G = num_groups
    Cg = C // G
    xg = h.reshape(B, -1, pack, G, Cg).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4))
    meansq = jnp.mean(jnp.square(xg), axis=(1, 2, 4))
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    rinv = lax.rsqrt(var + eps)  # (B, G)

    A = rinv[:, :, None] * scale.reshape(G, Cg)[None]  # (B, G, Cg)
    b = bias.reshape(G, Cg)[None] - mean[:, :, None] * A
    A = jnp.tile(A.reshape(B, C), (1, pack))
    b = jnp.tile(b.reshape(B, C), (1, pack))
    shape = (B,) + (1,) * (h.ndim - 2) + (pack * C,)
    return (h.astype(dtype) * A.astype(dtype).reshape(shape)
            + b.astype(dtype).reshape(shape))


def _res_block(h: jax.Array, p: Dict, num_groups: int, eps: float,
               pack: int, dtype) -> jax.Array:
    """ResBlock math (blocks.ResBlock, no time embedding) on the packed view."""
    hin = h
    h = packed_group_norm(h, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"],
                          num_groups, pack, eps, dtype)
    h = jax.nn.silu(h)
    k = p["ConvND_0"]["Conv_0"]
    nd = h.ndim - 2
    h = packed_conv(h, k["kernel"], k["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)
    h = packed_group_norm(h, p["GroupNorm_1"]["scale"], p["GroupNorm_1"]["bias"],
                          num_groups, pack, eps, dtype)
    h = jax.nn.silu(h)
    k = p["ConvND_1"]["Conv_0"]
    h = packed_conv(h, k["kernel"], k["bias"], (1,) * nd, (1,) * nd,
                    pack, pack, dtype)
    if "ConvND_2" in p:  # 1x1 shortcut on channel change
        k = p["ConvND_2"]["Conv_0"]
        hin = packed_conv(hin, k["kernel"], k["bias"], (1,) * nd, (0,) * nd,
                          pack, pack, dtype)
    return hin + h


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

    res_fn = _res_block
    if use_checkpointing:
        res_fn = jax.checkpoint(
            _res_block, static_argnums=(2, 3, 4, 5),
        )

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
