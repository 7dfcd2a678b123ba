"""Z-slab conv: a rank-5 NDHWC conv computed as ONE rank-4 NHWC conv by
folding the kz kernel taps into the channel dimension.

XLA's rank-5 conv lowering is the generator's dominant cost (the stack
measured 2.35 effective TFLOP/s on v5e, tools/conv_probe.py `conv` row,
docs/evidence/bench_r4/conv_probe.log). Re-expressing the same conv as

    x_slab (B*Zo, Y, X, kz*C)  =  concat_dz x_padded[:, dz :: sz]
    y = conv2d(x_slab, W (ky, kx, kz*C, F), strides (sy, sx))

hits XLA's far better rank-4 path AND widens the contraction channel dim
kz-fold (nf=20 fills 20/128 MXU lanes; 3*20=60): measured **15.17 effective
TFLOP/s fwd+bwd — 6.4x over lax.conv** at the generator's operating point
(B=2, 128x64x64, nf=20, bf16, same probe log). The z-neighbor stack is a
pad + kz strided slices + concat, all layout-friendly; its transient is
kz*C channels (3x the activation for a 3x3x3 conv), freed after the conv.

Generalizes to every conv in the generator (reference
torch/model.py:183-341): odd/even kernels (5x5x5 pad 2, 4x4x4 stride 2
pad 1, 3x3x3 pad 1), anisotropic strides, and kernel dilation (geo_1d's
dilated 3x3x3) — output z index zo reads input taps zo*sz - pz + dz*dil.
Semantics match torch Conv3d / flax nn.Conv bit-for-bit in f32 up to
matmul accumulation order; equivalence + gradient tests in
tests/test_zslab_conv.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv3d_zslab"]

_IntOr3 = Union[int, Sequence[int]]


def _tup3(v: _IntOr3) -> Tuple[int, int, int]:
    return (v, v, v) if isinstance(v, int) else tuple(v)  # type: ignore


def conv3d_zslab(
    x: jax.Array,
    w: jax.Array,
    strides: _IntOr3 = 1,
    padding: _IntOr3 = 1,
    dilation: _IntOr3 = 1,
) -> jax.Array:
    """3D conv (NDHWC x DHWIO -> NDHWC, zero padding) via one rank-4 conv.

    Args:
      x: (B, Z, Y, X, C) input.
      w: (kz, ky, kx, C, F) kernel (flax nn.Conv parameter layout).
      strides/padding/dilation: int or (z, y, x) ints; padding is symmetric
        per dim (torch Conv3d-style), dilation is kernel (rhs) dilation.
    Returns: (B, Zo, Yo, Xo, F), identical to lax.conv_general_dilated with
      dimension_numbers ("NDHWC", "DHWIO", "NDHWC").
    """
    B, Z, Y, X, C = x.shape
    kz, ky, kx, ci, F = w.shape
    if ci != C:
        raise ValueError(f"kernel in-channels {ci} != input channels {C}")
    sz, sy, sx = _tup3(strides)
    pz, py, px = _tup3(padding)
    dz, dy, dx = _tup3(dilation)

    zo = (Z + 2 * pz - ((kz - 1) * dz + 1)) // sz + 1
    xp = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0))) if pz else x
    # tap dz of output zo reads padded-input z = zo*sz + dz*dil
    slabs = [
        lax.slice_in_dim(xp, t * dz, t * dz + sz * (zo - 1) + 1, sz, axis=1)
        for t in range(kz)
    ]
    xs = jnp.concatenate(slabs, axis=-1).reshape(B * zo, Y, X, kz * C)
    # kernel z taps concatenate along the INPUT-channel dim in slab order
    w4 = jnp.concatenate([w[t] for t in range(kz)], axis=2)  # (ky,kx,kz*C,F)
    y = lax.conv_general_dilated(
        xs,
        w4,
        (sy, sx),
        [(py, py), (px, px)],
        rhs_dilation=(dy, dx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(B, zo, y.shape[1], y.shape[2], F)
