"""Output-folded 3x3x3 stride-1 conv: a (gy, gx) block of output pixels
per MXU matmul row.

XLA lowers an NDHWC conv to a matmul whose lane (N) dimension is the output
channel count. The generator's nf=20 channels fill 20 of the MXU's 128
lanes (the "conv ceiling" — the stack measured ~1.9 effective TFLOP/s,
docs/DESIGN.md §5). This formulation widens the lane dim by computing a
(gy, gx) block of output pixels per row:

    P (B·Z·Ty·Tx, 3·(gy+2)·(gx+2)·C)  @  W' (K, gy·gx·F)

where P holds the *union* input patch of the gy·gx output phases and W' is
the 3x3x3 kernel scattered block-Toeplitz-style: output phase (jy, jx)
reads union taps (uy, ux) = (jy+dy, jx+dx), zero elsewhere. The structural
zeros ride the MXU for free, which is the right trade while F < 128
lanes: per-output-pixel MXU work drops from 27·C·128 (lane-padded) to
3·(gy+2)·(gx+2)·C·128/(gy·gx) — a 9·gy·gx/((gy+2)(gx+2))× reduction
(1.5x at (1,2) up to 5.8x at (8,8)), and the patch tensor is
3·(gy+2)·(gx+2)/(gy·gx)x the input (9x at (2,4)) versus im2col's 27x.

Semantics match torch Conv3d(kernel 3, stride 1, pad 1) / flax nn.Conv
exactly as the reference generator uses them (reference
torch/model.py:183-341); equivalence and gradient tests live in
tests/test_folded_conv.py. TPU A/B via tools/conv_probe.py (`folded` row)
and `bench.py --folded_conv`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pick_fold", "fold_win", "conv3x3_folded", "conv_folded"]


def fold_win(gy: int, gx: int, k: int = 3) -> float:
    """Theoretical MXU-time reduction factor vs a lane-padded F<128 conv:
    baseline k^3*C*128 per output pixel vs k*(gy+k-1)*(gx+k-1)*C*128/(gy*gx)
    for the folded union-patch matmul."""
    return k * k * gy * gx / ((gy + k - 1) * (gx + k - 1))


def pick_fold(
    y_dim: int, x_dim: int, features: int, max_lanes: int = 128,
    folds: Tuple[int, ...] = (1, 2, 4, 8), k: int = 3,
) -> Tuple[int, int]:
    """Choose (gy, gx) maximizing fold_win subject to divisibility and the
    lane budget gy*gx*features <= max_lanes. Returns (1, 1) when no fold
    helps (e.g. features >= 128 already fills the lanes)."""
    best, best_win = (1, 1), 1.0
    for gy in folds:
        if y_dim % gy:
            continue
        for gx in folds:
            if x_dim % gx or gy * gx == 1:
                continue
            if gy * gx * features > max_lanes:
                continue
            w = fold_win(gy, gx, k)
            if w > best_win + 1e-9:
                best, best_win = (gy, gx), w
    return best


@functools.lru_cache(maxsize=None)
def _selector(g: int, k: int) -> np.ndarray:
    """S[u, j, d] = 1 where union tap u == output phase j + kernel tap d."""
    s = np.zeros((g + k - 1, g, k), np.float32)
    for j in range(g):
        for d in range(k):
            s[j + d, j, d] = 1.0
    return s


def _fold_weights(kernel: jax.Array, gy: int, gx: int) -> jax.Array:
    """(kz,ky,kx,C,F) kernel -> ((gx+kx-1)*(gy+ky-1)*kz*C, gy*gx*F) matrix.

    Row index order (ux, uy, dz, c) matches _extract's patch layout; column
    index order (jy, jx, f) matches the output phase unfold in
    conv_folded."""
    kz, ky, kx, c, f = kernel.shape
    sy = jnp.asarray(_selector(gy, ky), kernel.dtype)
    sx = jnp.asarray(_selector(gx, kx), kernel.dtype)
    w = jnp.einsum("zyxcf,ujy,vkx->vuzcjkf", kernel, sy, sx)
    return w.reshape((gx + kx - 1) * (gy + ky - 1) * kz * c, gy * gx * f)


def _extract(
    xp: jax.Array, gy: int, gx: int, kz: int, ky: int, kx: int
) -> jax.Array:
    """Union patches of a SAME-padded (B, Z+kz-1, Y+ky-1, X+kx-1, C) input.

    Returns (B, Z, Ty, Tx, (gx+kx-1)*(gy+ky-1)*kz*C) with patch index (ux,
    uy, dz, c). Built from kz + (gy+ky-1) + (gx+kx-1) strided slices
    (hierarchical unfold, z then y then x) — cheap dense copies whose VJP
    is pad+add."""
    b, zp, yp, xp_dim, c = xp.shape
    z, y, x = zp - (kz - 1), yp - (ky - 1), xp_dim - (kx - 1)
    ty, tx = y // gy, x // gx
    # z unfold: (B, Z, Y+ky-1, X+kx-1, kz*C), channel index (dz, c)
    v = jnp.concatenate([xp[:, dz : dz + z] for dz in range(kz)], axis=-1)
    # y unfold (strided): (B, Z, Ty, X+kx-1, (gy+ky-1)*kz*C), index (uy, dz, c)
    v = jnp.concatenate(
        [v[:, :, uy : uy + gy * (ty - 1) + 1 : gy] for uy in range(gy + ky - 1)],
        axis=-1,
    )
    # x unfold (strided): index (ux, uy, dz, c)
    v = jnp.concatenate(
        [v[:, :, :, ux : ux + gx * (tx - 1) + 1 : gx] for ux in range(gx + kx - 1)],
        axis=-1,
    )
    return v


def conv_folded(
    x: jax.Array, kernel: jax.Array, fold: Tuple[int, int]
) -> jax.Array:
    """Odd-kernel stride-1 SAME conv of NDHWC `x` with `kernel`
    (kz,ky,kx,C,F), computed as one patch-matmul with gy*gx*F output lanes.
    `fold` = (gy, gx) must divide (Y, X) — use pick_fold. Bias is the
    caller's job (the flax module adds it, mirroring _ConvPallas)."""
    gy, gx = fold
    b, z, y, x_dim, c = x.shape
    kz, ky, kx, _, f = kernel.shape
    if kz % 2 == 0 or ky % 2 == 0 or kx % 2 == 0:
        raise ValueError(f"conv_folded needs odd kernel dims, got {(kz, ky, kx)}")
    if y % gy or x_dim % gx:
        raise ValueError(f"fold {fold} does not divide spatial dims {(y, x_dim)}")
    ty, tx = y // gy, x_dim // gx
    xp = jnp.pad(
        x,
        ((0, 0), (kz // 2, kz // 2), (ky // 2, ky // 2), (kx // 2, kx // 2), (0, 0)),
    )
    # The patch tensor is kz*(gy+ky-1)*(gx+kx-1)/(gy*gx) x the input:
    # rematerialize it in the backward instead of saving it as a dot residual.
    patches = jax.checkpoint(
        functools.partial(_extract, gy=gy, gx=gx, kz=kz, ky=ky, kx=kx)
    )(xp)
    w = _fold_weights(kernel, gy, gx)
    ymat = jnp.matmul(patches, w)  # (B, Z, Ty, Tx, gy*gx*F)
    yblk = ymat.reshape(b, z, ty, tx, gy, gx, f)
    return yblk.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, z, y, x_dim, f)


def conv3x3_folded(
    x: jax.Array, kernel: jax.Array, fold: Tuple[int, int]
) -> jax.Array:
    """3x3x3 alias of conv_folded (the original entry point)."""
    return conv_folded(x, kernel, fold)
