"""Virtual scanning: render depth/color frames from meshes and drive the
incomplete/complete fusion pipeline (rebuild of the reference's Win32/D3D11
datagen app, datagen/src/Visualizer.cpp:99-219 + Scene.cpp:169-287 +
Fuser.cpp:21-186 — redesigned as a vectorized point-splat renderer that runs
anywhere JAX runs).

Pipeline (Visualizer::process): per room, take the trajectory frames viewing
the room, randomly drop ``chance_drop_frames`` of them for the *incomplete*
scan (Visualizer.h:37-51, default 0.8 from zParametersScanMP.txt:48), fuse
the kept frames, save ``__inc__``; continue fusing the remaining frames and
save ``__cmp__``."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import fusion
from ..ops import mesh as mesh_ops


@dataclasses.dataclass
class ScanConfig:
    width: int = 320
    height: int = 256
    fx: float = 269.112
    fy: float = 269.297
    depth_min: float = 0.4
    depth_max: float = 4.0
    chance_drop_frames: float = 0.8  # zParametersScanMP.txt:48
    samples_per_area: float = 8000.0  # surface samples per square meter
    # randomized directional lighting of rendered colors (reference
    # datagen/src/Lighting.h randomizes a light per frame); 0 disables
    lighting_strength: float = 0.0
    lighting_seed: int = 0


def render_depth_from_points(
    points: np.ndarray,  # (N, 3) world
    colors: Optional[np.ndarray],  # (N, 3) uint8
    cam2world: np.ndarray,
    cfg: ScanConfig,
    normals: Optional[np.ndarray] = None,  # (N, 3) world, for lighting
    frame_id: int = 0,
):
    """Z-buffer point-splat rendering: project surface samples, keep the
    nearest per pixel (replaces the reference's D3D11 rasterization,
    Scene.cpp:169-227). With ``normals`` and lighting_strength > 0, applies
    per-frame randomized Lambertian directional lighting (reference
    datagen/src/Lighting.h). Returns (depth (H,W) m with 0 holes,
    color (H,W,3) u8 or None)."""
    world2cam = np.linalg.inv(cam2world)
    p = points @ world2cam[:3, :3].T + world2cam[:3, 3]
    z = p[:, 2]
    ok = (z > cfg.depth_min) & (z < cfg.depth_max)
    u = np.round(cfg.fx * p[:, 0] / np.maximum(z, 1e-9) + cfg.width / 2).astype(int)
    v = np.round(cfg.fy * p[:, 1] / np.maximum(z, 1e-9) + cfg.height / 2).astype(int)
    ok &= (u >= 0) & (v >= 0) & (u < cfg.width) & (v < cfg.height)
    u, v, z = u[ok], v[ok], z[ok]
    flat = v * cfg.width + u
    depth = np.full(cfg.height * cfg.width, np.inf, np.float32)
    np.minimum.at(depth, flat, z)
    out_color = None
    if colors is not None:
        csel = colors[ok].astype(np.float32)
        if cfg.lighting_strength > 0 and normals is not None:
            rng = np.random.default_rng(cfg.lighting_seed * 100003 + frame_id)
            light = rng.standard_normal(3)
            light[2] = -abs(light[2])  # from above
            light /= np.linalg.norm(light)
            lambert = np.abs(normals[ok] @ light)
            shade = (1.0 - cfg.lighting_strength) + cfg.lighting_strength * lambert
            csel = csel * shade[:, None]
        # winner-take-all by re-checking the z-buffer
        win = z <= depth[flat] + 1e-6
        out_color = np.zeros((cfg.height * cfg.width, 3), np.uint8)
        out_color[flat[win]] = np.clip(csel[win], 0, 255).astype(np.uint8)
        out_color = out_color.reshape(cfg.height, cfg.width, 3)
    depth = np.where(np.isfinite(depth), depth, 0.0).reshape(cfg.height, cfg.width)
    return depth, out_color


def virtual_scan(
    verts: np.ndarray,
    faces: np.ndarray,
    vert_colors: Optional[np.ndarray],
    trajectory: Sequence[np.ndarray],  # cam2world matrices
    output_prefix_inc: str,
    output_prefix_cmp: str,
    fusion_cfg: fusion.FusionConfig = fusion.FusionConfig(),
    scan_cfg: ScanConfig = ScanConfig(),
    seed: int = 0,
) -> Tuple[tuple, np.ndarray]:
    """Scan one room mesh along a camera trajectory, writing incomplete and
    complete .sdf/.colors/.knw (Fuser::fuse, Fuser.cpp:21-186). Returns
    (dims_zyx, world2grid)."""
    rng = np.random.default_rng(seed)
    # surface samples for splatting
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    cross = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(cross, axis=1)
    area = float(areas.sum())
    face_normals = cross / np.maximum(np.linalg.norm(cross, axis=1, keepdims=True), 1e-12)
    n_samples = max(10000, int(area * scan_cfg.samples_per_area))
    rng_s = np.random.default_rng(seed)
    fidx = rng_s.choice(len(faces), size=n_samples, p=areas / max(area, 1e-12))
    r1 = np.sqrt(rng_s.random(n_samples))
    r2 = rng_s.random(n_samples)
    a = (1.0 - r1)[:, None]
    b = (r1 * (1.0 - r2))[:, None]
    c = (r1 * r2)[:, None]
    points = (a * v0[fidx] + b * v1[fidx] + c * v2[fidx]).astype(np.float32)
    normals = face_normals[fidx].astype(np.float32)
    colors = None
    if vert_colors is not None:
        # nearest-vertex colors for the samples
        from scipy.spatial import cKDTree

        tree = cKDTree(verts)
        _, idx = tree.query(points, k=1)
        colors = vert_colors[idx]

    dims_zyx, world2grid = fusion.grid_from_bounds(
        verts.min(0), verts.max(0), fusion_cfg
    )
    intr = np.array(
        [scan_cfg.fx, scan_cfg.fy, scan_cfg.width / 2, scan_cfg.height / 2], np.float32
    )

    # frame split (Visualizer.h:37-51): drop p of the frames for the
    # incomplete scan, fuse the rest afterwards for the complete one
    keep = rng.random(len(trajectory)) >= scan_cfg.chance_drop_frames
    if not keep.any():
        keep[rng.integers(len(trajectory))] = True
    inc_frames = [t for t, k in zip(trajectory, keep) if k]
    rest_frames = [t for t, k in zip(trajectory, keep) if not k]

    def frame_iter(cams):
        for fi, cam in enumerate(cams):
            depth, color = render_depth_from_points(
                points, colors, cam, scan_cfg, normals=normals, frame_id=fi
            )
            yield depth, color.astype(np.float32) if color is not None else None, intr, cam

    grid = fusion.make_grid(dims_zyx)
    import jax.numpy as jnp

    w2g = jnp.asarray(world2grid)
    for d, c, i, cam in frame_iter(inc_frames):
        grid = fusion.integrate(grid, jnp.asarray(d), jnp.asarray(c) if c is not None else None,
                                jnp.asarray(i), jnp.asarray(cam, jnp.float32), w2g, fusion_cfg)
    fusion.save_grid(output_prefix_inc, grid, world2grid, fusion_cfg)
    for d, c, i, cam in frame_iter(rest_frames):
        grid = fusion.integrate(grid, jnp.asarray(d), jnp.asarray(c) if c is not None else None,
                                jnp.asarray(i), jnp.asarray(cam, jnp.float32), w2g, fusion_cfg)
    fusion.save_grid(output_prefix_cmp, grid, world2grid, fusion_cfg)
    return dims_zyx, world2grid


def orbit_trajectory(
    center: np.ndarray, radius: float, height: float, num_frames: int = 24
) -> List[np.ndarray]:
    """A simple inward-looking orbit trajectory for synthetic scans (the
    reference uses recorded .sens trajectories; any cam2world source works)."""
    cams = []
    for k in range(num_frames):
        ang = 2 * np.pi * k / num_frames
        eye = center + np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        cam = np.eye(4, dtype=np.float32)
        cam[:3, 0] = right
        cam[:3, 1] = down
        cam[:3, 2] = fwd
        cam[:3, 3] = eye
        cams.append(cam)
    return cams
