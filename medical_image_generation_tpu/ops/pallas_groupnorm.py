"""Pallas TPU GroupNorm for lane-packed activations — exact-traffic stats
and apply passes.

Motivation (round-3 profile, BENCH_NOTES.md): at the AE encoder's level-0
(128^3 x 32ch lane-packed to (2,128,128,32,128) bf16, 268 MB) each GroupNorm
instance cost ~5.6 ms/step in XLA: the fp32 convert+square feeding the
variance reduction materialized as two ~610 GiB/s layout copies (~3.6 ms)
plus a 2.0 ms affine/silu loop fusion that moved ~1.25 GB. The arithmetic
is trivial — the op is pure HBM traffic — so the only win is to touch the
bytes exactly once per pass:

* ``_stats`` kernel: reads the bf16 activation ONCE, accumulates per-lane
  sum and sum-of-squares in fp32 VMEM registers, emits tiny per-block
  partials. No fp32 copy of the activation ever exists.
* ``_affine`` kernel: reads the activation ONCE, applies the folded
  per-(batch, lane) affine in fp32 registers, optionally fuses the SiLU
  that always follows GroupNorm inside ResBlocks, writes bf16 ONCE.

Minimum traffic: read M + (read M + write M) ~= 3 passes over the
activation vs ~12.7 passes measured for the XLA lowering — ~1.3 ms vs
5.6 ms per level-0 instance.

Group semantics (including pack-folding and groups straddling lane blocks)
stay in plain JAX on the tiny (B, pack*C) statistics vectors — the kernels
are group-agnostic, which keeps them 10 lines and trivially testable.

Gradients: ``group_norm_packed`` is a ``jax.custom_vjp``. The default
backward recomputes through the pure-JAX forward ("twostage" stats) and
autodiffs it — measured FASTEST in-context on the stage-1 AE step under the
"acts" remat policy (1.398 steps/s vs 1.279 for the closed-form backward:
the analytic form's explicit cotangent materialization + MXU reduction
passes cost more HBM traffic than XLA's fused autodiff of the staged
reductions). ``MEDIMGEN_GN_BWD`` selects alternatives for A/B:
``analytic`` (closed-form gradient, lane reductions as ones-matvec + Gram
diagonal on the MXU) and ``analytic-flat`` (same closed form, single-shot
jnp reductions). All three are exact GroupNorm gradients; equivalence is
pinned by tests/test_pallas_groupnorm.py.

Reference semantics: GroupNorm with fp32 statistics and compute-dtype
affine apply (blocks.GroupNorm; reference autoencoderkl_with_strides.py
uses torch GroupNorm in fp32 via autocast exclusion).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BLOCK_ROWS = 4096


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _block_rows(M: int, Cp: int) -> int:
    """Largest power-of-2 divisor of M, capped so a block stays ~1 MB."""
    cap = max(8, (MAX_BLOCK_ROWS * 128) // max(Cp, 128))
    b = 1
    while M % (b * 2) == 0 and b * 2 <= cap:
        b *= 2
    return b


def kernel_supported(h: jax.Array) -> bool:
    # OPT-IN (round-3 measurement): in isolation the kernels hit exact
    # traffic (~1.3 ms vs 5.6 ms per level-0 instance), but pallas_call
    # pins default layouts on its operands, and inside the full encoder
    # that layout constraint degraded the adjacent packed convolutions
    # from 191 GF/s to ~61 GF/s (6.0 -> 14.6 ms each) — a large net loss.
    # Until kernels can follow XLA's chosen activation layouts, the staged
    # JAX reduction path stays the default.
    if os.environ.get("MEDIMGEN_ENABLE_PALLAS_GN") != "1":
        return False
    if os.environ.get("MEDIMGEN_DISABLE_PALLAS_GN"):
        return False
    Cp = h.shape[-1]
    M = 1
    for s in h.shape[1:-1]:
        M *= s
    if Cp % 128 != 0 or Cp > 512:
        return False
    return _block_rows(M, Cp) >= 512


def _stats_kernel(x_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)  # (bm, Cp)
    s1 = jnp.sum(x, axis=0)
    s2 = jnp.sum(x * x, axis=0)
    pad = jnp.zeros_like(s1)
    out_ref[0, 0] = jnp.stack([s1, s2, pad, pad, pad, pad, pad, pad], axis=0)


def lane_stats(x2: jax.Array) -> jax.Array:
    """x2: (B, M, Cp) -> fp32 (B, 2, Cp): per-lane [sum, sum-of-squares]."""
    B, M, Cp = x2.shape
    bm = _block_rows(M, Cp)
    nb = M // bm
    partials = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((B, nb, 8, Cp), jnp.float32),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, bm, Cp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, Cp), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * M * Cp,
            bytes_accessed=B * M * Cp * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=not _on_tpu(),
    )(x2)
    return jnp.sum(partials, axis=1)[:, :2, :]


def _stats_any_kernel(x_ref, out_ref, x_buf, sem, *, bm: int, nblk: int):
    """Per-lane [sum, sum-of-squares] with the activation in HBM
    (memory_space=ANY) and manual double-buffered DMA — no VMEM BlockSpec on
    the big operand, so XLA keeps full layout freedom around the kernel (the
    VMEM-blocked variant pinned operand layouts and degraded the adjacent
    packed convolutions 3x; see kernel_supported)."""
    b = pl.program_id(0)
    Cp = out_ref.shape[-1]

    def dma(slot, i):
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * bm, bm), :], x_buf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()

    def body(i, carry):
        s1, s2 = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblk)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        x = x_buf[slot].astype(jnp.float32)  # (bm, Cp)
        return s1 + jnp.sum(x, axis=0), s2 + jnp.sum(x * x, axis=0)

    zero = jnp.zeros((Cp,), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, nblk, body, (zero, zero))
    pad = jnp.zeros_like(s1)
    out_ref[0] = jnp.stack([s1, s2, pad, pad, pad, pad, pad, pad], axis=0)


def lane_stats_any(x2: jax.Array) -> jax.Array:
    """x2: (B, M, Cp) in HBM -> fp32 (B, 2, Cp) per-lane [sum, sum-of-sq]."""
    B, M, Cp = x2.shape
    bm = min(_block_rows(M, Cp), 2048)
    nblk = M // bm
    out = pl.pallas_call(
        functools.partial(_stats_any_kernel, bm=bm, nblk=nblk),
        out_shape=jax.ShapeDtypeStruct((B, 8, Cp), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, Cp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bm, Cp), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * B * M * Cp,
            bytes_accessed=B * M * Cp * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=not _on_tpu(),
    )(x2)
    return out[:, :2, :]


def _affine_kernel(x_ref, ab_ref, y_ref, *, act: str):
    x = x_ref[0].astype(jnp.float32)  # (bm, Cp)
    y = x * ab_ref[0, 0][None, :] + ab_ref[0, 1][None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def affine_act(x2: jax.Array, A: jax.Array, b: jax.Array, act: str,
               out_dtype) -> jax.Array:
    """x2: (B, M, Cp); A/b: fp32 (B, Cp). y = act(x * A + b) in fp32
    registers, one read + one write of the activation."""
    B, M, Cp = x2.shape
    bm = _block_rows(M, Cp)
    ab = jnp.concatenate(
        [A[:, None, :], b[:, None, :],
         jnp.zeros((B, 6, Cp), jnp.float32)], axis=1)  # (B, 8, Cp)
    return pl.pallas_call(
        functools.partial(_affine_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((B, M, Cp), out_dtype),
        grid=(B, M // bm),
        in_specs=[
            pl.BlockSpec((1, bm, Cp), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Cp), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, Cp), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=(2 if act == "none" else 6) * B * M * Cp,
            bytes_accessed=B * M * Cp
            * (x2.dtype.itemsize + jnp.dtype(out_dtype).itemsize),
            transcendentals=0 if act == "none" else B * M * Cp,
        ),
        interpret=not _on_tpu(),
    )(x2, ab)


def _fold_affine(s1, s2, scale, bias, num_groups, pack, n_spatial, eps):
    """Group statistics + folded affine from per-lane sums — all on tiny
    (B, pack*C) arrays. Lane layout is pack-major blocks of C (jnp.tile
    convention of the packed execution path)."""
    B, Cp = s1.shape
    C = Cp // pack
    G = num_groups
    Cg = C // G
    cnt = float(n_spatial * pack * Cg)
    mean = s1.reshape(B, pack, G, Cg).sum(axis=(1, 3)) / cnt  # (B, G)
    meansq = s2.reshape(B, pack, G, Cg).sum(axis=(1, 3)) / cnt
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    rinv = jax.lax.rsqrt(var + eps)  # (B, G)
    A = rinv[:, :, None] * scale.reshape(G, Cg)[None]  # (B, G, Cg)
    b = bias.reshape(G, Cg)[None] - mean[:, :, None] * A
    return jnp.tile(A.reshape(B, C), (1, pack)), jnp.tile(b.reshape(B, C), (1, pack))


def _lane_sums(h, stats: str | None = None):
    """Per-lane fp32 [sum, sum-of-squares] of ``h`` over batchless-spatial:
    (B, *spatial, Cp) -> two (B, Cp) arrays. ``stats`` picks the reduction
    strategy (see _jax_impl docstring); shared by the forward value path and
    the VJP residuals so XLA CSEs the two into one computation."""
    B = h.shape[0]
    Cp = h.shape[-1]
    spatial_axes = tuple(range(1, h.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= h.shape[a]
    if stats is None:
        # "matmul" measured fastest in-context on v5e (round 3):
        # encode 70.06 ms vs twostage 78.33; decode 113.80 vs 116.66 —
        # the only variant that removes the fp32 convert/square staging
        # copies without losing more elsewhere.
        stats = os.environ.get("MEDIMGEN_GN_STATS", "matmul")
    if stats == "pallas" and Cp % 128 == 0:
        x2 = h.reshape(B, n_spatial, Cp)
        st = lane_stats_any(x2)
        return st[:, 0], st[:, 1]
    if stats in ("gram", "matmul"):
        x2 = h.reshape(B, n_spatial, Cp)
        if stats == "matmul":
            ones = jnp.ones((B, 8, n_spatial), h.dtype)  # 8 sublanes
            s1 = jax.lax.dot_general(
                ones, x2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :]
        else:
            s1 = jnp.sum(x2, axis=1, dtype=jnp.float32)
        gram = jax.lax.dot_general(
            x2, x2, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s2 = jnp.diagonal(gram, axis1=1, axis2=2)
        return s1, s2
    if stats == "flat":
        # single-shot all-spatial reduces: keeps exactly (batch, lane) dims,
        # which on the packed-conv layouts ({4,2,3,1,0}: packed-batch in
        # sublanes, channels in lanes) is already the reduce-friendly
        # orientation — the twostage form's intermediate (keeping one
        # spatial dim) made XLA relayout the fp32 convert/square to
        # {4,1,3,2,0}, a full-tensor copy per reduction.
        s1 = jnp.sum(h, axis=spatial_axes, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=spatial_axes)
        return s1, s2
    inner = tuple(range(h.ndim - 3, h.ndim - 1))
    s1p = jnp.sum(h, axis=inner, dtype=jnp.float32)
    s2p = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=inner)
    rest = tuple(range(1, s1p.ndim - 1))
    return jnp.sum(s1p, axis=rest), jnp.sum(s2p, axis=rest)  # (B, pack*C)


def _jax_impl(h, scale, bias, num_groups, pack, eps, dtype, fuse_silu,
              stats: str | None = None):
    """Pure-JAX reference path (and VJP recompute target): staged fp32
    reductions in the native packed layout, bf16 folded-affine apply.

    ``stats`` ("twostage" default / "gram" / "matmul", env MEDIMGEN_GN_STATS)
    picks the reduction strategy: "gram" computes the sum-of-squares as a
    Gram-matmul diagonal on the MXU (bf16 x bf16 products are exact under f32
    accumulation — same values as the staged f32 reduction up to summation
    order), reading the activation in the model dtype with no materialized
    fp32 square; "matmul" additionally rides s1 on the MXU as a ones-matvec,
    so NEITHER reduction stages an fp32 convert copy of the activation (the
    dominant GroupNorm cost at level-0 geometry — 2 x ~2 ms/instance of
    615 GiB/s data-formatting copies in the round-3 decode profile). The VJP
    recompute pins "twostage" (the gram backward is slower)."""
    B = h.shape[0]
    spatial_axes = tuple(range(1, h.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= h.shape[a]
    s1, s2 = _lane_sums(h, stats)
    A, b = _fold_affine(s1, s2, scale, bias, num_groups, pack, n_spatial, eps)
    shape = (B,) + (1,) * (h.ndim - 2) + (h.shape[-1],)
    y = (h.astype(dtype) * A.astype(dtype).reshape(shape)
         + b.astype(dtype).reshape(shape))
    return jax.nn.silu(y) if fuse_silu else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def group_norm_packed(h, scale, bias, num_groups, pack, eps, dtype,
                      fuse_silu=False):
    """GroupNorm (+ optional fused SiLU) on a lane-packed activation.

    Dispatches to the exact-traffic Pallas kernels when the geometry
    qualifies (kernel_supported), else to the staged-reduction JAX path.
    Backward recomputes through the JAX path (exact gradients).
    """
    return _gn_fwd_value(h, scale, bias, num_groups, pack, eps, dtype,
                         fuse_silu)[0]


def _gn_fwd_value(h, scale, bias, num_groups, pack, eps, dtype, fuse_silu):
    """Forward value + the (B, Cp) fp32 lane sums it was computed from."""
    if not kernel_supported(h):
        s1, s2 = _lane_sums(h)
        B = h.shape[0]
        n_spatial = 1
        for s in h.shape[1:-1]:
            n_spatial *= s
        A, b = _fold_affine(s1, s2, scale, bias, num_groups, pack,
                            n_spatial, eps)
        shape = (B,) + (1,) * (h.ndim - 2) + (h.shape[-1],)
        y = (h.astype(dtype) * A.astype(dtype).reshape(shape)
             + b.astype(dtype).reshape(shape))
        return (jax.nn.silu(y) if fuse_silu else y), s1, s2
    B = h.shape[0]
    Cp = h.shape[-1]
    M = 1
    for s in h.shape[1:-1]:
        M *= s
    x2 = h.reshape(B, M, Cp)
    stats = lane_stats(x2)
    s1, s2 = stats[:, 0], stats[:, 1]
    A, b = _fold_affine(s1, s2, scale, bias, num_groups, pack, M, eps)
    y2 = affine_act(x2, A, b, "silu" if fuse_silu else "none", dtype)
    return y2.reshape(*h.shape[:-1], Cp), s1, s2


def _gn_vjp_fwd(h, scale, bias, num_groups, pack, eps, dtype, fuse_silu):
    out, s1, s2 = _gn_fwd_value(h, scale, bias, num_groups, pack, eps, dtype,
                                fuse_silu)
    return out, (h, scale, bias, s1, s2)


def _gn_vjp_bwd(num_groups, pack, eps, dtype, fuse_silu, res, g):
    """Analytic GroupNorm(+SiLU) gradient on the lane-packed view.

    Standard form, per (batch, group) of size n: with xhat = (x - mean)*rinv
    and gxhat = gz * scale,

        dx = rinv * (gxhat - mean_n(gxhat) - xhat * mean_n(gxhat * xhat))

    realized with per-LANE reductions t1 = sum(gz), t2 = sum(gz * x) —
    either riding the MXU like the forward's "matmul" stats (ones-matvec +
    Gram diagonal) or as single-shot jnp reductions ("analytic-flat") —
    then folded to per-group coefficients at (B, G) size so the elementwise
    pass is one fused  gz*A + x*P + Q.  The SiLU cotangent (fuse_silu)
    rebuilds z = x*A + b from the saved lane sums — no forward recompute.

    NOT the default: the recompute-and-autodiff backward measured faster
    in-context (module docstring); this stays available for future
    re-measurement when surrounding programs change."""
    h, scale, bias, s1, s2 = res
    mode = os.environ.get("MEDIMGEN_GN_BWD", "recompute")
    if mode == "recompute":
        _, vjp = jax.vjp(
            lambda hh, ss, bb: _jax_impl(hh, ss, bb, num_groups, pack, eps,
                                         dtype, fuse_silu, stats="twostage"),
            h, scale, bias,
        )
        return vjp(g)

    B = h.shape[0]
    Cp = h.shape[-1]
    C = Cp // pack
    G = num_groups
    Cg = C // G
    M = 1
    for s in h.shape[1:-1]:
        M *= s
    n = float(M * pack * Cg)

    # group stats from the saved lane sums (all (B, G)-sized math)
    mean = s1.reshape(B, pack, G, Cg).sum(axis=(1, 3)) / n
    meansq = s2.reshape(B, pack, G, Cg).sum(axis=(1, 3)) / n
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    rinv = jax.lax.rsqrt(var + eps)

    def lanes(v):  # (B, G) -> (B, Cp), pack-major lane blocks of C
        return jnp.tile(jnp.repeat(v, Cg, axis=1), (1, pack))

    scale_l = jnp.tile(scale.astype(jnp.float32), pack)[None]  # (1, Cp)
    mean_l = lanes(mean)
    rinv_l = lanes(rinv)
    A_l = rinv_l * scale_l

    x2 = h.reshape(B, M, Cp)
    g2 = g.reshape(B, M, Cp)
    # gzf: the effective cotangent in fp32 — used by the flat reductions and
    # the dx assembly so bf16 inputs don't lose cotangent precision through an
    # h.dtype round-trip. gz (h.dtype) exists only to feed the MXU dot path.
    if fuse_silu:
        b_l = jnp.tile(bias.astype(jnp.float32), pack)[None] - mean_l * A_l
        z = (x2.astype(dtype) * A_l.astype(dtype)[:, None, :]
             + b_l.astype(dtype)[:, None, :])
        zf = z.astype(jnp.float32)
        sig = jax.nn.sigmoid(zf)
        gzf = g2.astype(jnp.float32) * sig * (1.0 + zf * (1.0 - sig))
        gz = gzf.astype(h.dtype)
    else:
        gzf = g2.astype(jnp.float32)
        gz = g2.astype(h.dtype)

    if mode == "analytic-flat":
        t1 = jnp.sum(gzf, axis=1)  # (B, Cp)
        t2 = jnp.sum(gzf * x2.astype(jnp.float32), axis=1)
    else:
        ones = jnp.ones((B, 8, M), gz.dtype)  # 8 sublanes, as the fwd stats
        t1 = jax.lax.dot_general(
            ones, gz, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # (B, Cp): sum(gz) per lane
        t2 = jnp.diagonal(
            jax.lax.dot_general(
                gz, x2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ),
            axis1=1, axis2=2,
        )  # (B, Cp): sum(gz * x) per lane
    u2 = t2 - mean_l * t1  # sum(gz * (x - mean)) per lane

    S1 = (t1 * scale_l).reshape(B, pack, G, Cg).sum(axis=(1, 3))  # sum gxhat
    S2h = ((u2 * scale_l).reshape(B, pack, G, Cg).sum(axis=(1, 3))
           * rinv)  # sum(gxhat * xhat)
    P = lanes(-(rinv**2) * S2h / n)  # (B, Cp)
    Q = lanes((-rinv * S1 + mean * (rinv**2) * S2h) / n)

    dx = (gzf * A_l[:, None, :]
          + x2.astype(jnp.float32) * P[:, None, :]
          + Q[:, None, :])
    dh = dx.reshape(h.shape).astype(h.dtype)
    dscale = (u2 * rinv_l).reshape(B, pack, C).sum(axis=(0, 1))  # (C,)
    dbias = t1.reshape(B, pack, C).sum(axis=(0, 1))
    return dh, dscale.astype(scale.dtype), dbias.astype(bias.dtype)


group_norm_packed.defvjp(_gn_vjp_fwd, _gn_vjp_bwd)
