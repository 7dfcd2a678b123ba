"""Pallas TPU kernel for the generator's 3x3x3 stride-1 convolutions.

Why: XLA's rank-5 conv lowering runs the nf=20 generator stack at ~1.9
effective TFLOP/s on v5e — ~30x below even the 20/128-lane-limited MXU
ceiling (docs/DESIGN.md round-3 findings; tools/conv_probe.py). A 3x3x3
conv is exactly an im2col matmul with K = 27*C_in (540 at nf=20), which the
MXU executes well: this kernel builds the patch matrix for one (batch, z)
slab in VMEM and issues a single (Y*X, 27C) @ (27C, C_out) dot per program.

Forward and both backward passes ride the same building blocks:
  dx = conv(dy, flip(W) with in/out swapped)   -> the forward kernel again
  dW = sum_slabs patches^T @ dy                -> grid-accumulated kernel
wrapped in a custom_vjp (`conv3x3`). Only kernel_size (3,3,3), stride 1,
dilation 1, NDHWC is supported — the generator's dominant conv shape
(models/generator.py); other shapes stay on lax.conv_general_dilated.

Reference parity: this replaces torch Conv3d(k=3, s=1, p=1)
(/root/reference/torch/model.py:183-191) bit-for-math (f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(dz, dy, dx) for dz in range(3) for dy in range(3) for dx in range(3)]


def _patches_from_slab(slab, Y, X, C):
    """(3, Y+2, X+2, >=C) slab -> (Y*X, 27*C) patch matrix (tap-major).

    The slab's lane dim may be padded past C (Mosaic DMA alignment); only
    the first C channels are real."""
    cols = [
        slab[dz, dy:dy + Y, dx:dx + X, :C].reshape(Y * X, C)
        for dz, dy, dx in _TAPS
    ]
    return jnp.concatenate(cols, axis=-1)


_VMEM_BUDGET = 10 * 1024 * 1024  # per-program footprint cap (tests override)


def _pad_halo(x):
    """Zero-pad the 1-voxel conv halo, then pad X up to a multiple of 8 and
    C up to a multiple of 128: Mosaic requires HBM slices along the
    sublane-tiled (second-minor) dim to be 8-aligned and along the lane
    (minor) dim to be 128-aligned, and the per-program DMA implicitly
    slices the full X+2 and C extents (measured failures: 'Slice shape
    along dimension 3 must be aligned to tiling (8), but is 66' and
    'Slice shape along dimension 4 must be aligned to tiling (128), but is
    20', docs/evidence/bench_r4). The lane padding costs no real HBM
    bandwidth — XLA already stores the activation 128-lane padded
    (tools/memcheck.py round-3 finding) — and the in-kernel patch slices
    read only the first C lanes."""
    X, C = x.shape[3], x.shape[4]
    x2 = -(-(X + 2) // 8) * 8
    c2 = -(-C // 128) * 128
    return jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (1, x2 - X - 1), (0, c2 - C))
    ), x2, c2


def _pick_ystrip(Y, X, C, Cout, itemsize, budget=None, c_pad=None):
    """Largest divisor of Y whose per-program VMEM footprint (slab + patch
    matrix + output strip + weights) fits the budget. At real shapes some
    generator layers reach C_in=80 at full 64x64 resolution — an unstripped
    (4096, 27*80) patch matrix alone would overflow the ~16 MB VMEM."""
    if budget is None:
        budget = _VMEM_BUDGET
    if c_pad is None:
        c_pad = C
    for ys in sorted({d for d in range(1, Y + 1) if Y % d == 0}, reverse=True):
        slab = 3 * (ys + 2) * (X + 2) * c_pad * itemsize
        # 2x: the 27 tap slices materialize as relayout copies before the
        # concatenate (measured scoped-vmem OOM at the naive estimate:
        # 22.2M actual vs 8.4M modeled, docs/evidence/bench_r4/pallas_repro)
        patches = 2 * ys * X * 27 * C * itemsize
        out = ys * X * Cout * (itemsize + 4)  # stored block + f32 dot result
        w = 27 * C * Cout * itemsize
        if slab + patches + out + w <= budget:
            return ys
    return 1


def _fwd_kernel(x_hbm, w_ref, o_ref, slab, sem, *, YS, X, C, out_dtype):
    b = pl.program_id(0)
    z = pl.program_id(1)
    sy = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(z, 3), pl.ds(sy * YS, YS + 2)], slab, sem
    )
    cp.start()
    cp.wait()
    patches = _patches_from_slab(slab[:], YS, X, C)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.reshape(YS, X, -1).astype(out_dtype)


def _dw_kernel(x_hbm, dy_ref, ow_ref, slab, sem, *, YS, X, C):
    b = pl.program_id(0)
    z = pl.program_id(1)
    sy = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(z, 3), pl.ds(sy * YS, YS + 2)], slab, sem
    )
    cp.start()
    cp.wait()

    @pl.when((b == 0) & (z == 0) & (sy == 0))
    def _():
        ow_ref[:] = jnp.zeros_like(ow_ref)

    patches = _patches_from_slab(slab[:], YS, X, C)
    dy = dy_ref[0, 0].reshape(YS * X, -1)
    ow_ref[:] += jax.lax.dot_general(
        patches, dy,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conv3x3_fwd_impl(x, w, interpret=False):
    """x (B,Z,Y,X,Cin), w (3,3,3,Cin,Cout) -> (B,Z,Y,X,Cout), pad 1."""
    B, Z, Y, X, C = x.shape
    Cout = w.shape[-1]
    xp, x2, c2 = _pad_halo(x)
    # weights as the (27*Cin, Cout) patch-matmul matrix (tap-major like
    # _patches_from_slab)
    wm = w.reshape(27 * C, Cout).astype(x.dtype)
    ys = _pick_ystrip(Y, X, C, Cout, x.dtype.itemsize, c_pad=c2)
    kern = functools.partial(_fwd_kernel, YS=ys, X=X, C=C, out_dtype=x.dtype)
    return pl.pallas_call(
        kern,
        grid=(B, Z, Y // ys),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27 * C, Cout), lambda b, z, sy: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ys, X, Cout), lambda b, z, sy: (b, z, sy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Z, Y, X, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, ys + 2, x2, c2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wm)


def _conv3x3_dw_impl(x, dy, interpret=False):
    """dW (3,3,3,Cin,Cout) = correlation of x with dy (both NDHWC)."""
    B, Z, Y, X, C = x.shape
    Cout = dy.shape[-1]
    xp, x2, c2 = _pad_halo(x)
    ys = _pick_ystrip(Y, X, C, Cout, x.dtype.itemsize, c_pad=c2)
    kern = functools.partial(_dw_kernel, YS=ys, X=X, C=C)
    out = pl.pallas_call(
        kern,
        grid=(B, Z, Y // ys),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, ys, X, Cout), lambda b, z, sy: (b, z, sy, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27 * C, Cout), lambda b, z, sy: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((27 * C, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ys + 2, x2, c2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, dy)
    return out.reshape(3, 3, 3, C, Cout)


def _auto_interpret() -> bool:
    # Pallas TPU kernels only compile for real TPUs; interpret everywhere
    # else (CPU tests / virtual-device meshes). Decided at trace time.
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x, w, interpret=None):
    """3x3x3 stride-1 pad-1 NDHWC convolution as a Pallas im2col matmul.

    ``interpret=None`` auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = _auto_interpret()
    return _conv3x3_fwd_impl(x, w, interpret)


def _conv3x3_vjp_fwd(x, w, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    return _conv3x3_fwd_impl(x, w, interpret), (x, w)


def _conv3x3_vjp_bwd(interpret, res, dy):
    if interpret is None:
        interpret = _auto_interpret()
    x, w = res
    # dx = conv(dy, spatially-flipped W with Cin/Cout swapped)
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3x3_fwd_impl(dy, w_flip.astype(dy.dtype), interpret).astype(x.dtype)
    dw = _conv3x3_dw_impl(x, dy, interpret).astype(w.dtype)
    return dx, dw


conv3x3.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


# ---------------------------------------------------------------------------
# fused conv + bias + LeakyReLU(0.2) + BatchNorm-statistics kernel
# ---------------------------------------------------------------------------
#
# The round-3 trace of the full train step shows the op histogram dominated
# by thousands of tiny f32[C] BatchNorm-vector DMAs interleaved with the conv
# stack (docs/DESIGN.md §5). This kernel computes, in ONE pass over the
# input: the conv matmul (MXU), the bias add, the LeakyReLU, and the
# per-channel batch statistics (sum, sum-of-squares) that training-mode
# BatchNorm needs — so the activation is read/written exactly once and the
# stats reduction costs no extra HBM traffic. The normalize itself stays
# plain jnp (one elementwise op XLA fuses into the consumer).
#
# Matches the reference block Conv3d -> LeakyReLU(0.2) -> BatchNorm3d
# (/root/reference/torch/model.py:183-195) with flax BatchNorm statistics
# semantics (biased variance via E[x^2] - E[x]^2, like flax _compute_stats).


def _fwd_act_stats_kernel(x_hbm, w_ref, b_ref, o_ref, s_ref, ss_ref, slab, sem,
                          *, YS, X, C, out_dtype):
    b = pl.program_id(0)
    z = pl.program_id(1)
    sy = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(z, 3), pl.ds(sy * YS, YS + 2)], slab, sem
    )
    cp.start()
    cp.wait()

    @pl.when((b == 0) & (z == 0) & (sy == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        ss_ref[:] = jnp.zeros_like(ss_ref)

    patches = _patches_from_slab(slab[:], YS, X, C)
    out = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    out = out + b_ref[0].astype(jnp.float32)
    out = jnp.where(out > 0, out, 0.2 * out)  # LeakyReLU(0.2)
    yq = out.astype(out_dtype)
    o_ref[0, 0] = yq.reshape(YS, X, -1)
    # statistics of the STORED values (what BN actually sees downstream)
    yf = yq.astype(jnp.float32)
    s_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
    ss_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _conv3x3_act_stats_impl(x, w, b, interpret=False):
    """x (B,Z,Y,X,Cin), w (3,3,3,Cin,Cout), b (Cout,) ->
    (y_act (B,Z,Y,X,Cout), sum (Cout,), sumsq (Cout,)) — fp32 stats."""
    B, Z, Y, X, C = x.shape
    Cout = w.shape[-1]
    xp, x2, c2 = _pad_halo(x)
    wm = w.reshape(27 * C, Cout).astype(x.dtype)
    ys = _pick_ystrip(Y, X, C, Cout, x.dtype.itemsize, c_pad=c2)
    kern = functools.partial(_fwd_act_stats_kernel, YS=ys, X=X, C=C, out_dtype=x.dtype)
    y, s, ss = pl.pallas_call(
        kern,
        grid=(B, Z, Y // ys),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27 * C, Cout), lambda b, z, sy: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, z, sy: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ys, X, Cout), lambda b, z, sy: (b, z, sy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, z, sy: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, z, sy: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Z, Y, X, Cout), x.dtype),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, ys + 2, x2, c2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wm, b.astype(x.dtype)[None, :])
    return y, s[0], ss[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_act_stats(x, w, b, interpret=None):
    """Fused 3x3x3 conv + bias + LeakyReLU(0.2) + BN batch statistics.

    Returns (y_act, sum, sumsq) with fp32 per-channel stats of y_act over
    all (B,Z,Y,X) positions. ``interpret=None`` auto-selects off-TPU."""
    if interpret is None:
        interpret = _auto_interpret()
    return _conv3x3_act_stats_impl(x, w, b, interpret)


def _act_stats_vjp_fwd(x, w, b, interpret):
    if interpret is None:
        interpret = _auto_interpret()
    y, s, ss = _conv3x3_act_stats_impl(x, w, b, interpret)
    return (y, s, ss), (x, w, y)


def _act_stats_vjp_bwd(interpret, res, cts):
    if interpret is None:
        interpret = _auto_interpret()
    x, w, y = res
    dy, ds, dss = cts
    # cotangents through the stats: s = sum(y), ss = sum(y^2)
    dy_total = (
        dy.astype(jnp.float32)
        + ds[None, None, None, None, :]
        + 2.0 * y.astype(jnp.float32) * dss[None, None, None, None, :]
    )
    # through LeakyReLU: slope from the sign of y (slope 0.2 > 0 preserves it)
    dconv = jnp.where(y > 0, dy_total, 0.2 * dy_total).astype(y.dtype)
    db = jnp.sum(dconv.astype(jnp.float32), axis=(0, 1, 2, 3))
    w_flip = jnp.flip(w, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3x3_fwd_impl(dconv, w_flip.astype(dconv.dtype), interpret).astype(x.dtype)
    dw = _conv3x3_dw_impl(x, dconv, interpret).astype(w.dtype)
    return dx, dw, db.astype(jnp.float32)


conv3x3_act_stats.defvjp(_act_stats_vjp_fwd, _act_stats_vjp_bwd)
