"""Dimension-generic Flax building blocks for 2D/3D generative networks.

Channels-last layout throughout — (B, *spatial, C) — which is what XLA:TPU
convolutions natively tile onto the MXU. Per-level, per-axis strides /
kernels / paddings (the reference forks' key feature,
autoencoderkl_with_strides.py:52-135, diffusion_model_unet_with_strides.py:
1759-1763) are first-class arguments, driven by the planner's
``compute_downsample_parameters`` output.

Norms run in float32 regardless of the compute dtype (bf16-safe); attention
uses the shared ops.attention entry point (Pallas flash attention on TPU).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medical_image_generation_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


def _per_axis(value, ndim: int) -> Tuple[int, ...]:
    if isinstance(value, int):
        return (value,) * ndim
    return tuple(int(v) for v in value)


def _pad_pairs(padding, ndim: int):
    p = _per_axis(padding, ndim)
    return [(v, v) for v in p]


class ConvND(nn.Module):
    """Conv with per-axis kernel/stride/padding over N spatial dims.

    ``__call__(x, x2)`` applies the conv to the VIRTUAL channel
    concatenation ``[x, x2]`` without materializing it: the kernel is
    sliced on its input-channel axis and the two partial convolutions are
    summed. Parameter shapes/names are identical to the concat form (the
    init path builds them from a real concat), so checkpoints are
    interchangeable; only the execution differs — no concat buffer, no
    layout copies around it, in forward or backward."""

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    spatial_dims: int = 3
    use_bias: bool = True
    kernel_dilation: Sequence[int] | int = 1
    dtype: Dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, x2: Optional[jax.Array] = None):
        conv = nn.Conv(
            features=self.features,
            kernel_size=_per_axis(self.kernel_size, self.spatial_dims),
            strides=_per_axis(self.strides, self.spatial_dims),
            padding=_pad_pairs(self.padding, self.spatial_dims),
            use_bias=self.use_bias,
            kernel_dilation=_per_axis(self.kernel_dilation, self.spatial_dims),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
        )
        if x2 is None:
            return conv(x)
        if self.is_initializing():
            return conv(jnp.concatenate([x, x2], axis=-1))
        p = self.variables["params"]["Conv_0"]
        K = p["kernel"]
        c1 = x.shape[-1]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, K[..., :c1, :].shape, _conv_dim_numbers(x.ndim)
        )
        strides = _per_axis(self.strides, self.spatial_dims)
        pads = _pad_pairs(self.padding, self.spatial_dims)
        dil = _per_axis(self.kernel_dilation, self.spatial_dims)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), K[..., :c1, :].astype(self.dtype),
            strides, pads, rhs_dilation=dil, dimension_numbers=dn,
        ) + jax.lax.conv_general_dilated(
            x2.astype(self.dtype), K[..., c1:, :].astype(self.dtype),
            strides, pads, rhs_dilation=dil, dimension_numbers=dn,
        )
        if self.use_bias:
            out = out + p["bias"].astype(self.dtype)
        return out


def _conv_dim_numbers(ndim: int):
    if ndim == 5:
        return ("NDHWC", "DHWIO", "NDHWC")
    if ndim == 4:
        return ("NHWC", "HWIO", "NHWC")
    return ("NWC", "WIO", "NWC")


class GroupNorm(nn.Module):
    """GroupNorm with float32 statistics and compute-dtype application.

    Mean / E[x^2] are accumulated in fp32 (the upcast fuses into the
    reduction — no fp32 copy of the activation is materialized), then scale,
    bias, mean and rsqrt(var) fold into ONE per-(batch, channel) affine pair
    applied in the compute dtype:

        y = x * A + b,  A = scale * rsqrt(var + eps),  b = bias - mean * A

    so the elementwise pass reads bf16 and writes bf16. The round-1 profile
    showed 64 ms/step of dtype-convert fusions from fp32-output GroupNorms
    (flax computes ``x - mean`` in fp32 for the whole activation); folding
    keeps all fp32 math at (B, C) size. The affine coefficients stay fp32
    until the final broadcast multiply, matching bf16-matmul rounding
    semantics elsewhere in the model."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2: Optional[jax.Array] = None):
        """``__call__(x, x2)`` normalizes the VIRTUAL channel concatenation
        ``[x, x2]`` and returns the (y, y2) pair: per-part spatial sums are
        joined at tiny (B, C) size, group statistics (including groups that
        straddle the part boundary) come out identical to the concat form,
        and the folded affine is applied per part. No concatenated
        activation ever exists."""
        parts = [x] if x2 is None else [x, x2]
        C = sum(p.shape[-1] for p in parts)
        G = self.num_groups
        assert C % G == 0, f"channels {C} not divisible by {G} groups"
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        B = x.shape[0]
        # reduce the spatial axes FIRST, in the native channels-last layout:
        # reshaping to (..., G, C/G) before reducing would put the narrow
        # per-group dim in the TPU lanes, padding the fp32 stats
        # intermediates up to 16x and forcing layout copies around them
        spatial_axes = tuple(range(1, x.ndim - 1))
        n_spatial = 1
        for a in spatial_axes:
            n_spatial *= x.shape[a]
        # two independent reductions, each fusing its own upcast: a shared
        # x.astype(f32) has two consumers, which makes XLA materialize a
        # full fp32 copy of the activation (536 MB at the AE's level-0)
        s1 = jnp.concatenate(
            [jnp.sum(p, axis=spatial_axes, dtype=jnp.float32) for p in parts],
            axis=-1,
        )  # (B, C)
        s2 = jnp.concatenate(
            [
                jnp.sum(jnp.square(p.astype(jnp.float32)), axis=spatial_axes)
                for p in parts
            ],
            axis=-1,
        )
        cnt = float(n_spatial * (C // G))
        mean = s1.reshape(B, G, C // G).sum(axis=-1) / cnt  # (B, G)
        meansq = s2.reshape(B, G, C // G).sum(axis=-1) / cnt
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        rinv = jax.lax.rsqrt(var + self.epsilon)

        # per-(B, C) folded affine
        rinv_c = jnp.repeat(rinv, C // G, axis=1)
        mean_c = jnp.repeat(mean, C // G, axis=1)
        A = rinv_c * scale[None, :]
        b = bias[None, :] - mean_c * A

        outs, off = [], 0
        for p in parts:
            cp = p.shape[-1]
            shape = (B,) + (1,) * (x.ndim - 2) + (cp,)
            Ap = A[:, off:off + cp].astype(self.dtype).reshape(shape)
            bp = b[:, off:off + cp].astype(self.dtype).reshape(shape)
            outs.append(p.astype(self.dtype) * Ap + bp)
            off += cp
        return outs[0] if x2 is None else tuple(outs)


class ResBlock(nn.Module):
    """GN -> SiLU -> conv -> GN -> SiLU -> conv with 1x1 shortcut on channel
    change; optional additive time embedding after the first conv
    (reference autoencoderkl_with_strides.py:136-204,
    diffusion_model_unet_with_strides.py:591-701)."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_dims: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        temb: Optional[jax.Array] = None,
        skip: Optional[jax.Array] = None,
    ):
        """With ``skip``, the block runs on the VIRTUAL concatenation
        ``[x, skip]`` (the U-Net up-path pattern, reference
        diffusion_model_unet_with_strides.py:1987-2010) without ever
        materializing it: the pair-aware GroupNorm/ConvND below carry the
        two parts separately through norm -> silu -> conv and the 1x1
        shortcut. Identical params/checkpoint layout to the concat form;
        saves the concat buffer + layout copies in fwd and bwd."""
        in_channels = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        gn1 = GroupNorm(self.norm_num_groups, self.norm_eps, self.dtype)
        conv1 = ConvND(
            self.out_channels, 3, 1, 1, self.spatial_dims, dtype=self.dtype,
            kernel_init=nn.initializers.lecun_normal(),
        )
        if skip is None:
            h = conv1(nn.silu(gn1(x)))
        else:
            h1, h2 = gn1(x, skip)
            h = conv1(nn.silu(h1), nn.silu(h2))
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32)(
                nn.silu(temb)
            )
            h = h + t.reshape(t.shape[0], *([1] * self.spatial_dims), t.shape[-1])
        h = GroupNorm(self.norm_num_groups, self.norm_eps, self.dtype)(h)
        h = nn.silu(h)
        h = ConvND(self.out_channels, 3, 1, 1, self.spatial_dims, dtype=self.dtype)(h)
        if in_channels != self.out_channels:
            sc = ConvND(self.out_channels, 1, 1, 0, self.spatial_dims, dtype=self.dtype)
            x = sc(x) if skip is None else sc(x, skip)
        elif skip is not None:
            raise ValueError("skip path requires a channel-changing shortcut")
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over the flattened spatial grid.

    The 3D "long sequence" case (Z*Y*X tokens) flattens to one sequence and
    runs flash attention (reference autoencoderkl_with_strides.py:207-323
    used xformers; here: Pallas / XLA fused attention via ops.attention).
    """

    num_head_channels: int = -1  # -1 => single head over all channels
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        num_heads = channels // self.num_head_channels if self.num_head_channels > 0 else 1
        head_dim = channels // num_heads

        spatial = x.shape[1:-1]
        b = x.shape[0]
        h = GroupNorm(self.norm_num_groups, self.norm_eps, self.dtype)(x)
        seq = h.reshape(b, -1, channels)

        qkv = nn.Dense(3 * channels, dtype=self.dtype, param_dtype=jnp.float32)(seq)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, -1, num_heads, head_dim)
        k = k.reshape(b, -1, num_heads, head_dim)
        v = v.reshape(b, -1, num_heads, head_dim)

        out = dot_product_attention(q, k, v)
        out = out.reshape(b, -1, channels)
        out = nn.Dense(channels, dtype=self.dtype, param_dtype=jnp.float32)(out)
        return x + out.reshape(b, *spatial, channels)


class Downsample(nn.Module):
    """Strided conv downsample with per-axis geometry
    (reference autoencoderkl_with_strides.py:109-133)."""

    stride: Sequence[int] | int
    kernel_size: Sequence[int] | int
    padding: Sequence[int] | int
    spatial_dims: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return ConvND(
            x.shape[-1], self.kernel_size, self.stride, self.padding,
            self.spatial_dims, dtype=self.dtype,
        )(x)


def fuse_upsample_kernel_axis(W: jax.Array, axis: int) -> jax.Array:
    """Fold a x2 nearest-neighbor upsample into a 3-tap conv kernel along
    ``axis``, producing the 4-tap kernel of the equivalent stride-2
    transposed convolution.

    nearest-up-x2 + 3-tap conv touches only TWO distinct input voxels per
    output along each upsampled axis (the 3 taps land on duplicated values):
        out[2x]   = w0*in[x-1] + (w1+w2)*in[x]
        out[2x+1] = (w0+w1)*in[x] + w2*in[x+1]
    which is exactly a lhs-dilation-2 conv with taps [w0, w0+w1, w1+w2, w2]
    and padding (2, 2) — 8 effective taps per 3D output instead of 27
    (3.4x fewer MACs) and no materialized high-resolution pre-conv tensor.
    """
    w0, w1, w2 = (
        jax.lax.index_in_dim(W, i, axis, keepdims=True) for i in range(3)
    )
    return jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)


def upsample_transposed(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        stride: Sequence[int], dtype) -> jax.Array:
    """Apply nearest-up-by-``stride`` + SAME 3^nd conv as one fused
    transposed conv (see fuse_upsample_kernel_axis). ``kernel``: the plain
    (3,..,3,C,C) conv params; combos are built in fp32 before the compute-
    dtype cast. Exactly equal in real arithmetic; differs from the two-step
    form only by one fp rounding of the adjacent-tap sums."""
    K = kernel
    pads = []
    for ax, s in enumerate(stride):
        if s == 2:
            K = fuse_upsample_kernel_axis(K, ax)
            pads.append((2, 2))
        else:
            pads.append((1, 1))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, K.shape,
        ("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5 else ("NHWC", "HWIO", "NHWC"),
    )
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), K.astype(dtype), (1,) * len(stride), pads,
        lhs_dilation=tuple(stride), dimension_numbers=dn,
    )
    return out + bias.astype(dtype)


def _parity_taps(W: jax.Array, axis: int, p: int):
    """2-tap kernel + padding of output parity ``p`` along an upsampled
    axis (see fuse_upsample_kernel_axis for the tap algebra):
        p=0: out[2x]   = w0*in[x-1] + (w1+w2)*in[x]   -> taps [w0, w1+w2], pad (1,0)
        p=1: out[2x+1] = (w0+w1)*in[x] + w2*in[x+1]   -> taps [w0+w1, w2], pad (0,1)
    """
    w0, w1, w2 = (
        jax.lax.index_in_dim(W, i, axis, keepdims=True) for i in range(3)
    )
    if p == 0:
        return jnp.concatenate([w0, w1 + w2], axis=axis), (1, 0)
    return jnp.concatenate([w0 + w1, w2], axis=axis), (0, 1)


def upsample_subpixel(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                      stride: Sequence[int], dtype) -> jax.Array:
    """nearest-up-by-``stride`` + SAME 3^nd conv, executed as 2^u dense
    stride-1 parity convolutions + one interleave (subpixel / depth-to-space
    decomposition of the equivalent transposed conv).

    Why not lhs_dilation (upsample_transposed): XLA:TPU lowers base-dilated
    convs by materializing the zero-dilated input, so the MXU spends 8x of
    its MACs on zeros — measured 59 GF/s on the flagship UNet Upsample_1
    (round-3 profile). The parity decomposition runs the same useful MACs as
    dense stride-1 convs (2 effective taps per upsampled axis, zero waste)
    and pays only one HBM-bandwidth interleave copy for the output.
    Exactly equal to the two-step form in real arithmetic (same tap sums as
    fuse_upsample_kernel_axis)."""
    import itertools

    nd = len(stride)
    B, *S, C = x.shape
    xc = x.astype(dtype)
    outs = []
    combos = list(itertools.product(
        *[((0, 1) if s == 2 else (None,)) for s in stride]
    ))
    for combo in combos:
        K = kernel
        pads = []
        for ax, p in enumerate(combo):
            if p is None:
                pads.append((1, 1))
            else:
                K, pad = _parity_taps(K, ax, p)
                pads.append(pad)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, K.shape,
            ("NDHWC", "DHWIO", "NDHWC") if x.ndim == 5 else ("NHWC", "HWIO", "NHWC"),
        )
        outs.append(jax.lax.conv_general_dilated(
            xc, K.astype(dtype), (1,) * nd, pads, dimension_numbers=dn,
        ))
    t = jnp.stack(outs, axis=-2)  # (B, *S, P, C), P lexicographic parities
    par = [2 if s == 2 else 1 for s in stride]
    t = t.reshape(B, *S, *par, C)
    # interleave each parity factor behind its spatial axis
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm.append(1 + 2 * nd)
    t = t.transpose(perm)
    out = t.reshape(B, *[S[i] * par[i] for i in range(nd)], C)
    return out + bias.astype(dtype)


class Upsample(nn.Module):
    """Nearest-neighbor upsample by per-axis stride factors + 3x3 conv, or
    transposed conv (reference autoencoderkl_with_strides.py:52-106).

    The nearest+conv pair executes as ONE subpixel-decomposed transposed
    conv when every stride is 1 or 2 (upsample_subpixel: 3.4x fewer MACs
    than nearest+conv and zero dilation waste); parameter layout is the
    module's ConvND_0/Conv_0 either way.
    MEDIMGEN_DISABLE_FUSED_UPSAMPLE=1 restores the two-step execution."""

    stride: Sequence[int] | int
    kernel_size: Sequence[int] | int = 3
    padding: Sequence[int] | int = 1
    spatial_dims: int = 3
    use_convtranspose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = _per_axis(self.stride, self.spatial_dims)
        if self.use_convtranspose:
            return nn.ConvTranspose(
                features=x.shape[-1],
                kernel_size=_per_axis(self.kernel_size, self.spatial_dims),
                strides=stride,
                padding=_pad_pairs(self.padding, self.spatial_dims),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        import os as _os
        if (not self.is_initializing() and all(s in (1, 2) for s in stride)
                and _os.environ.get("MEDIMGEN_DISABLE_FUSED_UPSAMPLE") != "1"):
            p = (self.variables.get("params", {})
                 .get("ConvND_0", {}).get("Conv_0"))
            if p is not None:
                return upsample_subpixel(
                    x, p["kernel"], p["bias"], stride, self.dtype
                )
        # init / fallback: nearest upsample as ONE reshape->broadcast->
        # reshape, then the SAME-padded conv (creates the params)
        h = x
        if any(s > 1 for s in stride):
            b, *spatial, c = x.shape
            expanded = [b]
            for n, s in zip(spatial, stride):
                expanded += [n, s]
            expanded.append(c)
            bshape = list(expanded)
            h = h.reshape([b] + [v for n in spatial for v in (n, 1)] + [c])
            h = jnp.broadcast_to(h, bshape)
            h = h.reshape([b] + [n * s for n, s in zip(spatial, stride)] + [c])
        return ConvND(x.shape[-1], 3, 1, 1, self.spatial_dims, dtype=self.dtype)(h)


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding
    (reference diffusion_model_unet_with_strides.py:461-480)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
