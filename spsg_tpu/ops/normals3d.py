"""SDF-gradient normals on dense voxel grids (reference torch/loss.py:261-306).

The reference builds a dense grid from sparse surface voxels (zeros
elsewhere), takes unscaled central differences, zeroes boundary voxels, maps
into camera space with the grid->camera rotation, and returns the *negated*
L2-normalized result. We keep everything dense and channel-last."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdf_gradient(sdf: jax.Array) -> jax.Array:
    """Unscaled central differences of a (B, Z, Y, X) grid -> (B, Z, Y, X, 3)
    in (x, y, z) component order (reference compute_normals_dense,
    loss.py:261-267). Boundary voxels are zero (the reference pads them with
    -inf and later zeroes them, loss.py:272-275)."""
    # interior central differences, zero-padded back to full shape: pads and
    # slices stay elementwise-fused on TPU, whereas .at[interior].set() lowers
    # to a real scatter (measured 425 ms for B2 at 128x64x64 — vs ~2 ms here)
    pad = ((0, 0), (1, 1), (1, 1), (1, 1))
    gx = sdf[:, 1:-1, 1:-1, 2:] - sdf[:, 1:-1, 1:-1, :-2]
    gy = sdf[:, 1:-1, 2:, 1:-1] - sdf[:, 1:-1, :-2, 1:-1]
    gz = sdf[:, 2:, 1:-1, 1:-1] - sdf[:, :-2, 1:-1, 1:-1]
    return jnp.stack(
        [jnp.pad(gx, pad), jnp.pad(gy, pad), jnp.pad(gz, pad)], axis=-1
    )


def surface_normals(
    sdf: jax.Array,
    valid: jax.Array,
    rotation: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense surface normals of a sparsified SDF grid.

    Args:
      sdf:      (B, Z, Y, X) SDF values.
      valid:    (B, Z, Y, X) bool — surface voxels; non-surface voxels are
                treated as SDF 0 like the reference's sparse scatter
                (compute_normals_sparse, loss.py:285-289).
      rotation: optional (B, 3, 3) grid->camera rotation applied before
                normalization (the reference passes
                ``inverse(view_matrix)[:3,:3]``, train.py:542-544).

    Returns (B, Z, Y, X, 3) normals: ``-normalize(R @ grad)``, zero where the
    gradient is zero."""
    masked = jnp.where(valid, sdf, 0.0)
    g = sdf_gradient(masked)
    if rotation is not None:
        g = jnp.einsum("bij,bzyxj->bzyxi", rotation, g)
    # safe norm: sqrt(max(|g|^2, eps^2)) has a finite gradient at g = 0,
    # unlike norm(g) whose backward is 0 * inf = NaN there (this op is inside
    # the generator's differentiable path via the raycaster's normal grid)
    norm2 = jnp.sum(g * g, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(norm2, 1e-10))
    return -g / norm
