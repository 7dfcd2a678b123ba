"""Depth-image preprocessing ops (TPU-native rebuild of the reference CUDA
extension torch/utils/depth_utils/depth_utils_cuda_kernel.cu).

All ops are pixel-parallel stencils, expressed as vectorized shifted-window
reductions that XLA fuses — no scalar loops, no data-dependent shapes. The
iterated median hole-fill uses a ``lax.while_loop`` (data-dependent *trip
count* is fine on TPU; data-dependent shapes are not), mirroring the
reference's early-exit loop (depth_utils.py:84-94).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _window_stack(img: jax.Array, radius: int, fill: float) -> jax.Array:
    """(B, H, W) -> (B, H, W, K*K) stack of the (2r+1)^2 neighborhood, padded
    with ``fill`` outside the image."""
    k = 2 * radius + 1
    padded = jnp.pad(img, ((0, 0), (radius, radius), (radius, radius)), constant_values=fill)
    H, W = img.shape[1], img.shape[2]
    slabs = [
        padded[:, i : i + H, j : j + W]
        for i in range(k)
        for j in range(k)
    ]
    return jnp.stack(slabs, axis=-1)


def bilateral_filter(depth: jax.Array, sigma_d: float = 2.0, sigma_r: float = 0.1) -> jax.Array:
    """Bilateral depth filter (reference bilateral_filter_floatmap_kernel,
    depth_utils_cuda_kernel.cu:41-86). depth: (B, H, W), 0 = hole. Holes stay
    0; valid pixels get the range-weighted Gaussian average of valid
    neighbors."""
    radius = int(math.ceil(2.0 * sigma_d))
    k = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    w_spatial = jnp.exp(-(ox**2 + oy**2) / (2.0 * sigma_d**2)).reshape(-1)

    win = _window_stack(depth, radius, 0.0)
    valid_win = win != 0.0
    center = depth[..., None]
    w_range = jnp.exp(-((win - center) ** 2) / (2.0 * sigma_r**2))
    w = w_spatial * w_range * valid_win
    wsum = jnp.sum(w, axis=-1)
    num = jnp.sum(w * win, axis=-1)
    out = jnp.where(wsum > 0.0, num / jnp.maximum(wsum, 1e-12), 0.0)
    return jnp.where(depth != 0.0, out, 0.0)


def median_fill(depth: jax.Array, structure_radius: int = 5) -> jax.Array:
    """One hole-filling pass: invalid (0) pixels get the reference's
    quasi-median of valid neighbors in an 11x11 window
    (median_fill_depthmap_kernel, depth_utils_cuda_kernel.cu:89-140: sort
    ascending, pick the element ``(numValid+1)//2`` past the start of the
    valid run — i.e. the upper median, in millimeter quantization)."""
    win = _window_stack(depth, structure_radius, 0.0)
    # reference quantizes to int millimeters (cu:116)
    q = jnp.where(win != 0.0, jnp.floor(1000.0 * win + 0.5), jnp.inf)
    s = jnp.sort(q, axis=-1)
    num_valid = jnp.sum(win != 0.0, axis=-1)
    pick = jnp.minimum((num_valid + 1) // 2, jnp.maximum(num_valid - 1, 0))
    val = jnp.take_along_axis(s, pick[..., None], axis=-1)[..., 0]
    filled = jnp.where(jnp.isfinite(val) & (num_valid > 0), 0.001 * val, 0.0)
    return jnp.where(depth != 0.0, depth, filled)


def fill_depth_holes(depth: jax.Array, max_iters: int = 40):
    """Iterated median fill seeded from the bilateral-filtered map, stopping
    early when no holes remain (reference Depth2Normals.forward,
    depth_utils.py:84-94). Returns (filled_depth, all_valid (B,) bool).

    Like the reference, a depth map with no holes passes through untouched."""
    has_hole0 = jnp.any(depth == 0.0)

    def no_hole_branch(d):
        return d

    def hole_branch(d):
        seed = bilateral_filter(d)

        def cond(c):
            it, cur = c
            return (it < max_iters) & jnp.any(cur == 0.0)

        def body(c):
            it, cur = c
            return it + 1, median_fill(cur)

        _, filled = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), median_fill(seed)))
        return filled

    out = jax.lax.cond(has_hole0, hole_branch, no_hole_branch, depth)
    all_valid = ~jnp.any(out.reshape(out.shape[0], -1) == 0.0, axis=-1)
    return out, all_valid


def depth_to_camera_space(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unproject (B, H, W) depth to camera-space points (B, H, W, 3)
    (reference convert_depth_to_cameraspace_kernel, cu:142-170).
    intrinsics: (B, 4) = [fx, fy, mx, my]."""
    B, H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    fx = intrinsics[:, 0][:, None, None]
    fy = intrinsics[:, 1][:, None, None]
    mx = intrinsics[:, 2][:, None, None]
    my = intrinsics[:, 3][:, None, None]
    px = depth * (gx[None] - mx) / fx
    py = depth * (gy[None] - my) / fy
    pts = jnp.stack([px, py, depth], axis=-1)
    return jnp.where(depth[..., None] != 0.0, pts, 0.0)


def camera_space_normals(pts: jax.Array) -> jax.Array:
    """Cross-product normals from camera-space neighbors (reference
    compute_normals_kernel, cu:172-211). pts: (B, H, W, 3) -> (B, H, W, 3),
    zero where undefined."""
    cc = pts
    pc = jnp.roll(pts, -1, axis=1)  # y+1
    mc = jnp.roll(pts, 1, axis=1)  # y-1
    cp = jnp.roll(pts, -1, axis=2)  # x+1
    cm = jnp.roll(pts, 1, axis=2)  # x-1
    n = jnp.cross(pc - mc, cp - cm)
    l2 = jnp.sum(n * n, axis=-1, keepdims=True)
    l = jnp.sqrt(jnp.maximum(l2, 1e-24))
    some_valid = (
        (cc[..., 0] != 0)
        | (pc[..., 0] != 0)
        | (cp[..., 0] != 0)
        | (mc[..., 0] != 0)
        | (cm[..., 0] != 0)
    )
    out = jnp.where((l2 > 0.0) & some_valid[..., None], n / -l, 0.0)
    # border pixels undefined (cu:189)
    B, H, W, _ = pts.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    interior = (ys > 0) & (ys < H - 1) & (xs > 0) & (xs < W - 1)
    return jnp.where(interior[..., None], out, 0.0)


@partial(jax.jit, static_argnames=("max_fill_iters",))
def depth_to_normals(depth: jax.Array, intrinsics: jax.Array, max_fill_iters: int = 40):
    """Full Depth2Normals chain (reference depth_utils.py:66-99):
    bilateral-seeded median hole fill -> camera-space unprojection -> cross
    normals. Returns (normals (B, H, W, 3), filled_depth (B, H, W),
    all_valid (B,) bool — the reference skips the sample when holes remain)."""
    if max_fill_iters > 0:
        filled, all_valid = fill_depth_holes(depth, max_fill_iters)
    else:
        filled = depth
        all_valid = ~jnp.any(depth.reshape(depth.shape[0], -1) == 0.0, axis=-1)
    pts = depth_to_camera_space(filled, intrinsics)
    normals = camera_space_normals(pts)
    return normals, filled, all_valid
