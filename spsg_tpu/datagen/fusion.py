"""TSDF fusion (offline dataset generation) — JAX rebuild of the reference
datagen VoxelGrid integration (datagen/src/VoxelGrid.cpp:7-114,
VoxelGrid.h:20-733) that defines the training data formats.

Per-frame integration math (VoxelGrid.cpp:29-98), replicated exactly:
  - project every voxel center into the frame, nearest-pixel depth lookup;
  - valid depth in [0.4, 4.0] m; free-space counter++ where voxel is in
    front of the observation;
  - sdf = d - p.z, adaptive truncation ``3*voxel + d*voxel``
    (VoxelGrid.h:32-34, 660-662); integrate when sdf > -truncation after
    clamping to +-truncation;
  - depth-dependent weight ``max(4.5 * (1 - (d - 0.4)/3.6), 1)``;
  - first observation sets sdf/color; later ones fold in with the running
    weighted average (color: fixed 0.5/0.5 blend with +0.5 rounding);
    weight accumulates, capped at 255.

The whole frame integrates as one vectorized grid-wide update under jit —
the TPU-native replacement of the reference's triple voxel loop."""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import formats


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    voxelsize: float = 0.02
    depth_min: float = 0.4  # Fuser.cpp:75 VoxelGrid(..., 0.4f, 4.0f)
    depth_max: float = 4.0
    scene_pad: int = 3  # GlobalAppState s_scenePadding (zParametersScanMP)
    height_pad: int = 3

    @property
    def truncation_m(self) -> float:
        return 3.0 * self.voxelsize  # VoxelGrid.h:32

    def adaptive_truncation(self, d):
        return self.truncation_m + d * self.voxelsize  # VoxelGrid.h:660-662


def make_grid(dims_zyx: Tuple[int, int, int]) -> Dict[str, jnp.ndarray]:
    z, y, x = dims_zyx
    return dict(
        sdf=jnp.full((z, y, x), -jnp.inf, jnp.float32),  # meters
        weight=jnp.zeros((z, y, x), jnp.float32),
        color=jnp.zeros((z, y, x, 3), jnp.float32),
        free_ctr=jnp.zeros((z, y, x), jnp.int32),
    )


def grid_from_bounds(bounds_min, bounds_max, cfg: FusionConfig):
    """Grid dims + world2grid from world bounds (Fuser.cpp:48-52): dims =
    round(extent/voxel) + 2*pad; world2grid = scale(1/voxel) *
    translate(-min + pad*voxel)."""
    bounds_min = np.asarray(bounds_min, np.float64)
    bounds_max = np.asarray(bounds_max, np.float64)
    extent = bounds_max - bounds_min
    dims_xyz = np.round(extent / cfg.voxelsize).astype(int) + np.array(
        [2 * cfg.scene_pad, 2 * cfg.scene_pad, 2 * cfg.height_pad]
    )
    world2grid = np.eye(4, dtype=np.float32)
    pad = np.array([cfg.scene_pad, cfg.scene_pad, cfg.height_pad], np.float64)
    world2grid[:3, :3] *= 1.0 / cfg.voxelsize
    world2grid[:3, 3] = (-bounds_min + pad * cfg.voxelsize) / cfg.voxelsize
    dims_zyx = (int(dims_xyz[2]), int(dims_xyz[1]), int(dims_xyz[0]))
    return dims_zyx, world2grid


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("grid",))
def integrate(
    grid: Dict[str, jnp.ndarray],
    depth: jnp.ndarray,  # (H, W) meters, 0/NaN = invalid
    color: Optional[jnp.ndarray],  # (H, W, 3) float [0,255] or None
    intrinsics: jnp.ndarray,  # (4,) fx, fy, mx, my
    cam2world: jnp.ndarray,  # (4, 4)
    world2grid: jnp.ndarray,  # (4, 4)
    cfg: FusionConfig,
) -> Dict[str, jnp.ndarray]:
    """Integrate one RGB-D frame into the grid."""
    Z, Y, X = grid["sdf"].shape
    H, W = depth.shape
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Z, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(X, dtype=jnp.float32),
        indexing="ij",
    )
    grid2world = jnp.linalg.inv(world2grid)
    world2cam = jnp.linalg.inv(cam2world)
    M = world2cam @ grid2world  # voxel -> camera
    px = M[0, 0] * xx + M[0, 1] * yy + M[0, 2] * zz + M[0, 3]
    py = M[1, 0] * xx + M[1, 1] * yy + M[1, 2] * zz + M[1, 3]
    pz = M[2, 0] * xx + M[2, 1] * yy + M[2, 2] * zz + M[2, 3]

    fx, fy, mx, my = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    safe_z = jnp.where(jnp.abs(pz) > 1e-9, pz, 1e-9)
    u = jnp.round(fx * px / safe_z + mx).astype(jnp.int32)
    v = jnp.round(fy * py / safe_z + my).astype(jnp.int32)
    in_img = (u >= 0) & (v >= 0) & (u < W) & (v < H) & (pz > 0)

    flat = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)
    d = jnp.take(depth.reshape(-1), flat.reshape(-1), mode="clip").reshape(Z, Y, X)
    d_ok = in_img & jnp.isfinite(d) & (d >= cfg.depth_min) & (d <= cfg.depth_max)

    free = d_ok & (pz < d)
    new_free = grid["free_ctr"] + free.astype(jnp.int32)

    sdf = d - pz
    trunc = cfg.adaptive_truncation(d)
    upd = d_ok & (sdf > -trunc)
    sdf = jnp.clip(sdf, -trunc, trunc)
    depth01 = (d - 0.4) / 3.6
    w_upd = jnp.maximum(3.0 * 1.5 * (1.0 - depth01), 1.0)

    first = ~jnp.isfinite(grid["sdf"])
    old_w = grid["weight"]
    merged = (grid["sdf"] * old_w + sdf * w_upd) / (old_w + w_upd)
    new_sdf = jnp.where(upd, jnp.where(first, sdf, merged), grid["sdf"])
    new_w = jnp.where(upd, jnp.minimum(old_w + w_upd, 255.0), old_w)

    new_color = grid["color"]
    if color is not None:
        c = jnp.take(
            color.reshape(-1, 3), flat.reshape(-1), axis=0, mode="clip"
        ).reshape(Z, Y, X, 3)
        blend = jnp.floor(0.5 + 0.5 * grid["color"] + 0.5 * c)  # VoxelGrid.cpp:96
        cnew = jnp.where(first[..., None], c, blend)
        new_color = jnp.where(upd[..., None], cnew, grid["color"])

    return dict(sdf=new_sdf, weight=new_w, color=new_color, free_ctr=new_free)


def known_encoding(sdf_m: np.ndarray, voxelsize: float) -> np.ndarray:
    """.knw encoding (VoxelGrid.h saveKnownToFile:321-340):
    0 = known-empty (sdf > voxel), 1 = known-occupied (|sdf| <= voxel),
    >=2 = unknown-by-distance (clamped 255); unobserved -> 255."""
    sdf_m = np.asarray(sdf_m)
    known = np.zeros(sdf_m.shape, np.uint8)
    behind = sdf_m < -voxelsize
    with np.errstate(invalid="ignore"):
        dist = np.where(np.isfinite(sdf_m), -sdf_m / voxelsize, 254.0)
    known[behind] = np.clip(dist[behind] + 1.0, 2, 255).astype(np.uint8)
    known[(sdf_m >= -voxelsize) & (sdf_m <= voxelsize)] = 1
    known[~np.isfinite(sdf_m)] = 255
    return known


def save_grid(
    prefix: str,
    grid: Dict[str, jnp.ndarray],
    world2grid: np.ndarray,
    cfg: FusionConfig,
    save_trunc_factor: float = 6.0,  # Fuser.cpp:35
    save_colors: bool = True,
    save_known: bool = True,
) -> None:
    """Write <prefix>.sdf (+.colors, +.knw) in the reference formats."""
    sdf_m = np.asarray(grid["sdf"])
    dims = sdf_m.shape
    with np.errstate(invalid="ignore"):
        mask = np.isfinite(sdf_m) & (np.abs(sdf_m) <= save_trunc_factor * cfg.voxelsize)
    locs = np.argwhere(mask).astype(np.int32)
    vals_m = sdf_m[mask]
    formats.save_sdf(
        prefix + ".sdf",
        dims,
        cfg.voxelsize,
        world2grid,
        locs,
        vals_m / cfg.voxelsize,  # save_sdf re-multiplies by voxelsize
    )
    if save_colors:
        colors = np.clip(np.asarray(grid["color"]), 0, 255).astype(np.uint8)
        formats.save_colors_sparse(prefix + ".colors", dims, colors[mask])
    if save_known:
        formats.save_known(
            prefix + ".knw", known_encoding(sdf_m, cfg.voxelsize), cfg.voxelsize, world2grid
        )


def fuse_frames(
    dims_zyx,
    world2grid,
    frames,  # iterable of (depth (H,W) m, color (H,W,3) u8 or None, intrinsics (4,), cam2world (4,4))
    cfg: FusionConfig = FusionConfig(),
) -> Dict[str, jnp.ndarray]:
    """Fuse a frame sequence into a fresh grid (Fuser::fuse inner loop,
    Fuser.cpp:82-95)."""
    grid = make_grid(dims_zyx)
    w2g = jnp.asarray(world2grid, jnp.float32)
    for depth, color, intrinsics, cam2world in frames:
        grid = integrate(
            grid,
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(color, jnp.float32) if color is not None else None,
            jnp.asarray(intrinsics, jnp.float32),
            jnp.asarray(cam2world, jnp.float32),
            w2g,
            cfg,
        )
    return grid
