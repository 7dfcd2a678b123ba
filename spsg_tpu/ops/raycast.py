"""Differentiable TSDF raycaster (TPU-native rebuild of the reference CUDA
kernel torch/utils/raycast_rgbd/raycast_rgbd_cuda_kernel.cu).

Renders a batched dense TSDF volume with per-voxel color / normal / semantic
attributes into per-view images. Semantics match the reference:

  * pinhole camera: ray through pixel (x, y) has camera-space direction
    ``normalize(((x-mx)/fx, (y-my)/fy, 1))`` (kernel ``kinectDepthToSkeleton``,
    raycast_rgbd_cuda_kernel.cu:72-85); the view matrix maps camera -> grid
    (the reference passes ``world2grid @ pose`` straight through,
    raycast_rgbd.py:77-85).
  * sphere trace with fixed ``ray_increment``; surface = sign change of the
    trilinearly-interpolated SDF between consecutive valid samples, refined by
    3 bisection iterations (kernel :159-263). A sample is valid only if all 8
    interpolation neighbors are valid surface voxels.
  * pixel attributes are taken from the **nearest** voxel at the refined hit
    position (kernel :129 fills attrs from ``getVoxel`` of the un-offset
    position); depth = hit ray length converted to camera z.
  * invalid pixels hold ``-inf`` (kernel :276-285). A hit whose voxel normal
    is exactly zero keeps ``-inf`` normal (kernel :220-224).
  * **gradients**: the backward pass scatters each pixel's gradient to its hit
    voxel's attributes, averaged over the number of pixels that hit the voxel
    (kernel raycast_rgbd_cuda_backward_kernel :365-423; depth grad -> sdf
    value of the hit voxel). No gradient flows through ray geometry, view
    matrices, or intrinsics (autograd boundary raycast_rgbd.py:37-43). We
    implement this exactly with a ``jax.custom_vjp`` + ``segment_sum``; unlike
    the reference we have no ``maxPixelsPerVoxel=64`` cap — the average is
    over *all* hitting pixels (strictly more accurate).

TPU-first design notes: instead of one CUDA thread per pixel with
data-dependent loop exits, all rays march in lockstep as (B, H*W) vectors
inside a ``lax.while_loop`` whose trip count is bounded by the ray-AABB
intersection (rays that miss the volume or have found their surface stop
contributing); every step is 8 vectorized gathers from the flattened volume.
Everything is fully jittable with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -float("inf")
NUM_CLASSES = 14


@dataclasses.dataclass(frozen=True)
class RaycastConfig:
    """Raycast parameters (reference train.py:134-148). Depth units are voxels
    (depth_min/depth_max are divided by voxelsize by the caller)."""

    width: int = 320
    height: int = 256
    depth_min: float = 0.1 / 0.02
    depth_max: float = 6.0 / 0.02
    ray_increment: float = 0.9  # 0.3 * truncation
    thresh_sample_dist: float = 50.5 * 0.9
    max_dir_slack: float = 1.45  # bounds depthToRayLength for the step count
    bisection_iters: int = 3
    # Conservative coarse skipping (default on — results are BIT-IDENTICAL
    # to the plain march, see find_surface_crossings): a crossing needs two
    # consecutive lattice samples whose trilerp cells are fully valid, so any
    # lattice sample whose cell lies in a coarse block containing NO fully-
    # valid cell is provably NaN and can be jumped without evaluation. One
    # packed 8-channel gather row classifies the flags of a 2x2x2 block
    # neighborhood (16^3 voxels at coarse_block=8), letting each hop skip up
    # to SKIP_HORIZON provably-empty samples for the cost of a single row.
    coarse_skip: bool = True
    coarse_block: int = 8  # voxels per coarse block edge
    coarse_hops: int = 4  # skip hops per march iteration (sequential gathers)
    march_block: int = 32  # fine trilerp samples evaluated per iteration
    # Straggler compaction (0 = off): the lockstep march costs
    # P x (trip count of the SLOWEST ray) — most rays hit early, then keep
    # issuing (cheap but not free) constant-index gathers until the last
    # grazing ray exits. When the number of still-marching rays drops to
    # straggler_frac * P, the march exits, the survivors are compacted into a
    # dense (B, frac*P) block (stable argsort on the alive flag — static
    # shapes, order-preserving so gather locality survives) and marched to
    # completion there; per-ray state scatters back afterwards. Sample
    # positions come from the exact lattice expression, so results stay
    # BIT-IDENTICAL to the uncompacted march.
    straggler_frac: float = 0.0
    # Compact stragglers ACROSS batch rows (and, via batch-stacking, across
    # grids): the per-row compaction above still waits for the slowest row to
    # fall below frac*P before exiting phase 1, and keeps B x cap slots in
    # phase 2 even when most rows finished. Global mode exits phase 1 when
    # the TOTAL alive count drops below frac*B*P and compacts the survivors
    # of all rows into one (1, frac*B*P) block — each compacted ray carries
    # its batch row's origin and a gather offset into the batch-flattened
    # cell/window volumes. Sample positions are unchanged, so results stay
    # BIT-IDENTICAL (tests/test_raycast.py::test_global_compaction_bit_identical).
    compact_across_batch: bool = False
    # March (and shade/scatter) the batch in sequential groups of this many
    # samples (0 = whole batch at once). Rationale (round-5 traces): the TPU
    # gather unit is per-row latency-bound AND locality-sensitive
    # (docs/DESIGN.md §2); the march's packed-cell table is (B, Z*Y*X, 8)
    # f32 = 32 MB per flagship sample, and the per-row cost rises ~2.5x when
    # the gathered working set grows from 2 to 8 samples (B=2 phase-1 march
    # 115 ms/step vs B=8 1135 ms/step — 10x for 4x the rays). lax.map over
    # groups of batch_group samples marches each group against its own small
    # table; per-ray sample positions are the same lattice expression, so
    # the DECISIONS (hit, hit_idx) stay bit-identical to the ungrouped
    # march; alpha/depth drift by a few ulps (<=2e-5 abs) because XLA makes
    # different fma/fusion choices inside the lax.map body
    # (tests/test_raycast.py::test_batch_group_equivalent).
    batch_group: int = 0

    def __post_init__(self):
        # frac >= 1 would silently disable compaction (cap == P); catch the
        # configuration error instead (ADVICE r2)
        assert 0.0 <= self.straggler_frac < 1.0, self.straggler_frac


class RaycastOutput(NamedTuple):
    color: jax.Array  # (B, H, W, 3), -inf invalid
    depth: jax.Array  # (B, H, W), -inf invalid, voxel units
    normal: jax.Array  # (B, H, W, 3), -inf invalid
    semantic: jax.Array  # (B, H, W, 14), -inf invalid


def _camera_rays(view, intrinsics, width, height):
    """Per-pixel grid-space origins/directions. view: (B,4,4) cam->grid,
    intrinsics: (B,4) = [fx, fy, mx, my]. Returns (origin (B,3), dir (B,P,3)
    normalized, cam_z (B,P) = z-component of the normalized camera ray,
    i.e. 1/depthToRayLength)."""
    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(px, py, indexing="xy")  # (H, W)
    gx = gx.reshape(-1)
    gy = gy.reshape(-1)
    fx, fy, mx, my = (intrinsics[:, i][:, None] for i in range(4))
    cx = (gx[None, :] - mx) / fx
    cy = (gy[None, :] - my) / fy
    cz = jnp.ones_like(cx)
    cam_dir = jnp.stack([cx, cy, cz], axis=-1)
    cam_dir = cam_dir / jnp.linalg.norm(cam_dir, axis=-1, keepdims=True)
    cam_z = cam_dir[..., 2]
    rot = view[:, :3, :3]
    origin = view[:, :3, 3]
    world_dir = jnp.einsum("bij,bpj->bpi", rot, cam_dir)
    world_dir = world_dir / jnp.linalg.norm(world_dir, axis=-1, keepdims=True)
    return origin, world_dir, cam_z


def _flat_index(ix, iy, iz, dims):
    Z, Y, X = dims
    return (iz * Y + iy) * X + ix


def _gather(flat_vol, idx):
    """flat_vol (B, N) or (B, N, C); idx (B, P) -> (B, P[, C])."""
    return jnp.take_along_axis(
        flat_vol, idx[..., None] if flat_vol.ndim == 3 else idx, axis=1, mode="clip"
    )


def build_march_cells(sdf: jax.Array, valid: jax.Array) -> jax.Array:
    """Pack the 8 trilerp corner values of every grid cell contiguously:
    (B, Z, Y, X, 8), NaN-coded when ANY corner is invalid or out of bounds
    (the reference's all-8-neighbors-valid rule,
    raycast_rgbd_cuda_kernel.cu:120-156).

    TPU rationale: the march then needs ONE 32-byte contiguous gather per
    sample instead of 8 scattered 4-byte gathers — ~8x less gather work, the
    dominant cost of the ray march."""
    B, Z, Y, X = sdf.shape
    nan = jnp.float32(jnp.nan)
    s = jnp.where(valid, sdf, nan)
    sp = jnp.pad(s, ((0, 0), (0, 1), (0, 1), (0, 1)), constant_values=jnp.nan)
    corners = []
    # packing order must match _cell_trilerp: bit0 = x, bit1 = y, bit2 = z
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corners.append(sp[:, dz : dz + Z, dy : dy + Y, dx : dx + X])
    cells = jnp.stack(corners, axis=-1)
    all_ok = jnp.all(jnp.isfinite(cells), axis=-1, keepdims=True)
    return jnp.where(all_ok, cells, nan)


def _cell_trilerp(cells_flat, pos_x, pos_y, pos_z, dims, idx_offset=None):
    """Trilinear interpolation via the packed cell volume. Returns (value,
    ok); invalid samples are NaN -> ok False. cells_flat: (B, N, 8).
    ``idx_offset`` (B, Q) shifts each ray's flat cell index — used by the
    cross-batch compacted march, whose rays gather from a batch-flattened
    (1, B*N, 8) volume with per-ray row offsets."""
    Z, Y, X = dims
    bx = jnp.floor(pos_x)
    by = jnp.floor(pos_y)
    bz = jnp.floor(pos_z)
    wx = pos_x - bx
    wy = pos_y - by
    wz = pos_z - bz
    ix = bx.astype(jnp.int32)
    iy = by.astype(jnp.int32)
    iz = bz.astype(jnp.int32)
    inb = (ix >= 0) & (iy >= 0) & (iz >= 0) & (ix < X - 1) & (iy < Y - 1) & (iz < Z - 1)
    idx = _flat_index(
        jnp.clip(ix, 0, X - 1), jnp.clip(iy, 0, Y - 1), jnp.clip(iz, 0, Z - 1), dims
    )
    if idx_offset is not None:
        idx = idx + (idx_offset if idx.ndim == idx_offset.ndim else idx_offset[..., None])
    B = cells_flat.shape[0]
    flat_shape = idx.shape[1:]
    c = jnp.take_along_axis(
        cells_flat, idx.reshape(B, -1, 1), axis=1, mode="clip"
    ).reshape((B,) + flat_shape + (8,))
    w000 = (1 - wx) * (1 - wy) * (1 - wz)
    w001 = wx * (1 - wy) * (1 - wz)
    w010 = (1 - wx) * wy * (1 - wz)
    w011 = wx * wy * (1 - wz)
    w100 = (1 - wx) * (1 - wy) * wz
    w101 = wx * (1 - wy) * wz
    w110 = (1 - wx) * wy * wz
    w111 = wx * wy * wz
    val = (
        w000 * c[..., 0]
        + w001 * c[..., 1]
        + w010 * c[..., 2]
        + w011 * c[..., 3]
        + w100 * c[..., 4]
        + w101 * c[..., 5]
        + w110 * c[..., 6]
        + w111 * c[..., 7]
    )
    ok = jnp.isfinite(val) & inb
    return jnp.where(ok, val, jnp.nan), ok


def _ray_aabb(origin, direction, lo, hi):
    """Per-ray [t_enter, t_exit] against a per-batch AABB (slab method); used
    to bound the march — a TPU-side improvement over the reference's
    full-range loop. lo/hi: (B, 3) in xyz order."""
    o = origin[:, None, :]
    d = direction
    # slab-parallel rays (|d| ~ 0): a huge inverse of either sign works —
    # min/max over (t0, t1) keeps the slab unbounded when the origin is
    # inside it and empty when outside
    inv = jnp.where(jnp.abs(d) > 1e-9, 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1.0), 1e12)
    t0 = (lo[:, None, :] - o) * inv
    t1 = (hi[:, None, :] - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return tmin, tmax


def _valid_bounds(valid):
    """Tight per-batch xyz bounds of the valid voxels (B, 3) lo / hi: rays
    are clipped to the occupied region, not the whole grid — far fewer march
    samples when geometry fills only part of the volume."""
    B, Z, Y, X = valid.shape
    vz = jnp.any(valid, axis=(2, 3))  # (B, Z)
    vy = jnp.any(valid, axis=(1, 3))
    vx = jnp.any(valid, axis=(1, 2))

    def lo_hi(v, n):
        idx = jnp.arange(n, dtype=jnp.float32)
        big = jnp.float32(n)
        lo = jnp.min(jnp.where(v, idx, big), axis=1)
        hi = jnp.max(jnp.where(v, idx, -1.0), axis=1)
        return lo, hi

    zlo, zhi = lo_hi(vz, Z)
    ylo, yhi = lo_hi(vy, Y)
    xlo, xhi = lo_hi(vx, X)
    lo = jnp.stack([xlo, ylo, zlo], axis=-1) - 1.5
    hi = jnp.stack([xhi, yhi, zhi], axis=-1) + 1.5
    return lo, hi


SKIP_HORIZON = 32  # lattice samples classified per coarse-skip hop


def build_block_windows(cell_ok: jax.Array, block: int) -> jax.Array:
    """Coarse structure for the conservative march skip.

    cell_ok: (B, Z, Y, X) bool — cell is fully trilerp-valid (all 8 corners).
    Returns (B, nbz+2, nby+2, nbx+2, 8) float32: entry [base+1] packs the
    "any fully-valid cell" flags of the 2x2x2 coarse blocks base..base+1
    along each axis (channel order bit0=x, bit1=y, bit2=z, matching
    build_march_cells), with a zero ring so windows touching — or lying
    beyond — the grid border classify as empty (out-of-grid samples are
    invalid anyway)."""
    B, Z, Y, X = cell_ok.shape
    nbz, nby, nbx = -(-Z // block), -(-Y // block), -(-X // block)
    f = jnp.pad(
        cell_ok, ((0, 0), (0, nbz * block - Z), (0, nby * block - Y), (0, nbx * block - X))
    )
    f = f.reshape(B, nbz, block, nby, block, nbx, block).any(axis=(2, 4, 6))
    fp = jnp.pad(f.astype(jnp.float32), ((0, 0), (1, 2), (1, 2), (1, 2)))
    chans = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                chans.append(fp[:, dz : dz + nbz + 2, dy : dy + nby + 2, dx : dx + nbx + 2])
    return jnp.stack(chans, axis=-1)


def _skip_hop(k, dead, rays, t0, step, win_flat, nb, blockf, shift, widx_offset=None):
    """One conservative skip hop, shared by both marches: classify the next
    SKIP_HORIZON lattice samples (starting at per-ray index ``k``) against
    the packed 2x2x2 block-window flags and return ``skip_n`` (B, P) — the
    length of the leading run of provably-empty samples.

    ``shift`` maps ray positions to the flag volume's coordinates: 0.0 for
    trilerp cells (cell = floor(p)), 0.5 for nearest-voxel lookups
    (voxel = floor(p + 0.5)). Classification positions use the exact lattice
    expression t0 + (k + j) * step — the same single f32 rounding as the fine
    march's sample positions, so a sample is classified at exactly the
    position it would be evaluated at (double rounding here could misplace a
    boundary sample into the neighboring block and break conservatism)."""
    ox, oy, oz, dx, dy, dz = rays
    nbz, nby, nbx = nb
    B, P = k.shape
    jj = jnp.arange(SKIP_HORIZON, dtype=jnp.float32)

    t = t0 + k * step
    tt = jnp.where(dead, t0, t)  # constant gather indices for dead rays
    px = ox + tt * dx + shift
    py = oy + tt * dy + shift
    pz = oz + tt * dz + shift
    bx0 = jnp.floor(px / blockf)
    by0 = jnp.floor(py / blockf)
    bz0 = jnp.floor(pz / blockf)
    # window covers blocks base..base+1; pick base so the ray moves into the
    # window (direction ~0 on an axis keeps the current block inside either
    # way)
    basex = jnp.where(dx > 0, bx0, bx0 - 1.0)
    basey = jnp.where(dy > 0, by0, by0 - 1.0)
    basez = jnp.where(dz > 0, bz0, bz0 - 1.0)
    usable = (
        ~dead
        & (basex >= -1) & (basex <= nbx)
        & (basey >= -1) & (basey <= nby)
        & (basez >= -1) & (basez <= nbz)
    )
    six = jnp.clip(basex + 1, 0, nbx + 1).astype(jnp.int32)
    siy = jnp.clip(basey + 1, 0, nby + 1).astype(jnp.int32)
    siz = jnp.clip(basez + 1, 0, nbz + 1).astype(jnp.int32)
    widx = (siz * (nby + 2) + siy) * (nbx + 2) + six
    if widx_offset is not None:
        widx = widx + widx_offset
    row = jnp.take_along_axis(
        win_flat, widx.reshape(B, -1, 1), axis=1, mode="clip"
    ).reshape(B, P, 8)

    tj = t0[..., None] + (k[..., None] + jj) * step  # (B, P, S), exact lattice
    wx = jnp.floor((ox[..., None] + tj * dx[..., None] + shift) / blockf) - basex[..., None]
    wy = jnp.floor((oy[..., None] + tj * dy[..., None] + shift) / blockf) - basey[..., None]
    wz = jnp.floor((oz[..., None] + tj * dz[..., None] + shift) / blockf) - basez[..., None]
    in_win = (
        usable[..., None]
        & (wx >= 0) & (wx <= 1)
        & (wy >= 0) & (wy <= 1)
        & (wz >= 0) & (wz <= 1)
    )
    g = lambda ch: row[..., ch][..., None]
    fz0 = jnp.where(
        wy > 0.5, jnp.where(wx > 0.5, g(3), g(2)), jnp.where(wx > 0.5, g(1), g(0))
    )
    fz1 = jnp.where(
        wy > 0.5, jnp.where(wx > 0.5, g(7), g(6)), jnp.where(wx > 0.5, g(5), g(4))
    )
    flag = jnp.where(wz > 0.5, fz1, fz0)
    prov_empty = in_win & (flag < 0.5)
    run = jnp.cumprod(prov_empty.astype(jnp.int32), axis=-1)
    return jnp.sum(run, axis=-1).astype(jnp.float32)


def _grouped(cfg: RaycastConfig, B: int) -> int:
    """Group size to use for a batch of B (0 = run the whole batch at once).
    Groups only when they divide B evenly — a ragged tail would need a
    second program."""
    G = cfg.batch_group
    if G and 0 < G < B and B % G == 0:
        return G
    return 0


def _map_batch_groups(fn, G: int, *arrays):
    """Run ``fn`` over sequential groups of G samples via lax.map (scan —
    guarantees the groups execute one after another so each group's HBM
    gather working set stays small and row-locality high) and re-concatenate
    along batch. Leaves whose leading axis isn't the batch (e.g. scalar trip
    counts) are reduced with max by the caller."""
    B = arrays[0].shape[0]
    n = B // G
    stacked = tuple(a.reshape((n, G) + a.shape[1:]) for a in arrays)
    out = jax.lax.map(lambda xs: fn(*xs), stacked)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((B,) + o.shape[2:])
        if o.ndim >= 2 and o.shape[:2] == (n, G)
        else o,
        out,
    )


def find_surface_crossings(sdf, valid, view, intrinsics, cfg: RaycastConfig):
    """Non-differentiable surface search. Returns a dict with per-pixel:
    hit (B,P) bool, alpha (B,P) ray length, hit voxel flat index (B,P) int32.

    sdf: (B, Z, Y, X) float32 (voxel units); valid: (B, Z, Y, X) bool.

    TPU structure: all rays march in lockstep on the fixed lattice
    t = t0 + k * ray_increment inside a lax.while_loop. Each iteration runs
    (a) ``coarse_hops`` conservative skip hops — one packed 8-channel gather
    classifies the next SKIP_HORIZON lattice samples against the 2x2x2
    coarse-block window around the ray position and jumps the leading run of
    provably-invalid samples (their trilerp cells sit in blocks with no
    fully-valid cell, so the plain march would evaluate them to NaN; the
    sample lattice is unchanged and ``prev`` is reset to NaN exactly as a
    NaN evaluation would, making the skip BIT-IDENTICAL to the plain march) —
    then (b) one fine block of ``march_block`` contiguous-cell trilerp
    gathers + vectorized sign-change detection. The loop exits as soon as
    every ray has either found its bracket or left the volume (per-ray AABB
    clipping of the *valid* region)."""
    B = sdf.shape[0]
    G = _grouped(cfg, B)
    if G:
        sub = dataclasses.replace(cfg, batch_group=0)
        out = _map_batch_groups(
            lambda s, v, vw, it: find_surface_crossings(s, v, vw, it, sub),
            G, sdf, valid, view, intrinsics,
        )
        out["n_iters"] = jnp.max(out["n_iters"])
        return out
    dims = sdf.shape[1:4]
    P = cfg.width * cfg.height
    cells = build_march_cells(sdf, valid)
    cells_flat = cells.reshape(B, -1, 8)

    origin, direction, cam_z = _camera_rays(view, intrinsics, cfg.width, cfg.height)
    # rayCurrent/rayEnd in ray-length units (kernel :194-197)
    t_start = cfg.depth_min / cam_z
    t_end = cfg.depth_max / cam_z
    lo_b, hi_b = _valid_bounds(valid)
    t_enter, t_exit = _ray_aabb(origin, direction, lo_b, hi_b)
    # skip empty space before the occupied region (snapped to the global step
    # grid so results stay step-aligned per pixel)
    skip = jnp.maximum(jnp.floor((t_enter - t_start) / cfg.ray_increment), 0.0)
    t0 = t_start + skip * cfg.ray_increment
    t_stop = jnp.minimum(t_end, t_exit + cfg.ray_increment)

    ox = origin[:, None, 0]
    oy = origin[:, None, 1]
    oz = origin[:, None, 2]
    dx = direction[..., 0]
    dy = direction[..., 1]
    dz = direction[..., 2]

    def make_sample(oxq, oyq, ozq, dxq, dyq, dzq, cellsq, coffq=None):
        def sample(t):
            """Trilerp at ray length t; t may be (B, Q) or (B, Q, K)."""
            if t.ndim == 3:
                px = oxq[..., None] + t * dxq[..., None]
                py = oyq[..., None] + t * dyq[..., None]
                pz = ozq[..., None] + t * dzq[..., None]
            else:
                px = oxq + t * dxq
                py = oyq + t * dyq
                pz = ozq + t * dzq
            return _cell_trilerp(cellsq, px, py, pz, dims, coffq)

        return sample

    sample = make_sample(ox, oy, oz, dx, dy, dz, cells_flat)  # full-P: init sample + bisection
    step = cfg.ray_increment
    d0, _ = sample(t0)
    prev0 = d0

    F = cfg.march_block
    total_span = (cfg.depth_max - cfg.depth_min) * cfg.max_dir_slack
    # every iteration advances every alive ray by >= F lattice steps (skips
    # only add to that), so this bound is never the binding exit in practice
    n_iter_max = int(math.ceil(total_span / (step * F))) + 1

    if cfg.coarse_skip:
        # cell is NaN-coded iff any corner invalid -> corner 0 finite == all ok
        cell_ok = jnp.isfinite(cells[..., 0])
        win = build_block_windows(cell_ok, cfg.coarse_block)
        nb = (win.shape[1] - 2, win.shape[2] - 2, win.shape[3] - 2)
        win_flat = win.reshape(B, -1, 8)
        blockf = jnp.float32(cfg.coarse_block)

    offs = jnp.arange(F, dtype=jnp.float32)

    def run_march(
        init, t0q, t_stopq, oxq, oyq, ozq, dxq, dyq, dzq,
        cellsq, coffq=None, winq=None, woffq=None,
        stop_alive_gt=None, count_global=False,
    ):
        """March the (B, Q) ray set in ``init`` to completion — or, with
        ``stop_alive_gt``, until at most that many rays per batch row
        (``count_global=False``) or in TOTAL (``count_global=True``) are
        still marching (the straggler-compaction exit). Per-ray results are
        independent of how iterations were partitioned: every sample position
        comes from the exact lattice expression t0 + k * step."""
        sampleq = make_sample(oxq, oyq, ozq, dxq, dyq, dzq, cellsq, coffq)
        if cfg.coarse_skip:
            raysq = (oxq, oyq, ozq, dxq, dyq, dzq)
            winq_ = win_flat if winq is None else winq

            def hop(k, prev, found):
                """Jump the leading run of provably-invalid samples and reset
                prev to NaN — exactly what evaluating them would produce."""
                dead = found | (t0q + k * step > t_stopq)
                skip_n = _skip_hop(
                    k, dead, raysq, t0q, step, winq_, nb, blockf, 0.0,
                    widx_offset=woffq,
                )
                return k + skip_n, jnp.where(skip_n > 0, jnp.nan, prev)

        def cond(c):
            alive = ~c["found"] & (t0q + c["k"] * step <= t_stopq)
            ok = (c["it"] < n_iter_max) & jnp.any(alive)
            if stop_alive_gt is not None:
                count = jnp.sum(alive) if count_global else jnp.max(jnp.sum(alive, axis=1))
                ok &= count > stop_alive_gt
            return ok

        def body(c):
            k = c["k"]
            prev = c["prev"]
            if cfg.coarse_skip:
                for _ in range(cfg.coarse_hops):
                    k, prev = hop(k, prev, c["found"])
            t_base = t0q + k * step
            # t from the exact integer sample index (k + offs is exact in
            # f32): the same lattice sample yields the same float t no matter
            # how the march partitioned iterations — keeps skip/plain/
            # compacted variants bit-identical
            treal = t0q[..., None] + (k[..., None] + offs) * step  # (B, Q, F)
            in_range = treal <= t_stopq[..., None]
            # finished/out-of-range rays sample a fixed position: the TPU
            # gather unit is locality-sensitive, so constant indices are ~30%
            # cheaper
            dead = c["found"] | (t_base > t_stopq)
            t = jnp.where(dead[..., None], t0q[..., None], treal)
            v, _ = sampleq(t)  # NaN-coded trilerp values
            vext = jnp.concatenate([prev[..., None], v], axis=-1)
            prev_v = vext[..., :-1]
            # NaN comparisons are False, so validity of both samples is implied
            crossing = (
                in_range
                & (prev_v * v < 0)
                & (jnp.abs(prev_v - v) < cfg.thresh_sample_dist)
                & (jnp.abs(v) < cfg.thresh_sample_dist)
            )
            any_cross = jnp.any(crossing, axis=-1)
            first = jnp.argmax(crossing, axis=-1)  # (B, Q)
            t_hit = jnp.take_along_axis(treal, first[..., None], axis=-1)[..., 0]
            record = any_cross & ~c["found"]
            d_hit = jnp.take_along_axis(v, first[..., None], axis=-1)[..., 0]
            d_prev = jnp.take_along_axis(prev_v, first[..., None], axis=-1)[..., 0]
            return dict(
                it=c["it"] + 1,
                k=k + jnp.float32(F),
                prev=v[..., -1],
                found=c["found"] | record,
                t_lo=jnp.where(record, t_hit - step, c["t_lo"]),
                d_lo=jnp.where(record, d_prev, c["d_lo"]),
                t_hi=jnp.where(record, t_hit, c["t_hi"]),
                d_hi=jnp.where(record, d_hit, c["d_hi"]),
            )

        return jax.lax.while_loop(cond, body, init)

    init = dict(
        it=jnp.zeros((), jnp.int32),
        k=jnp.ones((B, P), jnp.float32),  # sample 0 evaluated as prev0
        prev=prev0,
        found=jnp.zeros((B, P), bool),
        t_lo=jnp.zeros((B, P), jnp.float32),
        d_lo=jnp.zeros((B, P), jnp.float32),
        t_hi=jnp.zeros((B, P), jnp.float32),
        d_hi=jnp.zeros((B, P), jnp.float32),
    )

    # frac > 0 always compacts: tiny fractions clamp to one survivor slot
    # instead of silently disabling compaction (ADVICE r2)
    cap = max(1, int(P * cfg.straggler_frac)) if cfg.straggler_frac > 0 else 0
    state_keys = ("k", "prev", "found", "t_lo", "d_lo", "t_hi", "d_hi")
    if 0 < cap < P and cfg.compact_across_batch and B > 1:
        # global compaction: phase 1 exits when the TOTAL alive count fits in
        # frac*B*P slots; survivors of ALL rows compact into one (1, capg)
        # block whose rays carry per-ray origins and gather offsets into the
        # batch-flattened cell/window volumes
        capg = max(1, int(B * P * cfg.straggler_frac))
        c = run_march(
            init, t0, t_stop, ox, oy, oz, dx, dy, dz, cells_flat,
            stop_alive_gt=capg, count_global=True,
        )
        alive = ~c["found"] & (t0 + c["k"] * step <= t_stop)
        # alive-first stable order over the flattened (B*P) ray set: batch-
        # major pixel order is preserved, so gather locality survives
        sel = jnp.argsort(~alive.reshape(-1), stable=True)[:capg]  # (capg,)
        b_sel = (sel // P).astype(jnp.int32)
        takeg = lambda a: jnp.broadcast_to(a, (B, P)).reshape(-1)[sel][None]
        init2 = dict(
            it=c["it"], **{key: takeg(c[key]) for key in state_keys}
        )
        ncells = cells_flat.shape[1]
        coff = (b_sel * ncells)[None]
        og = lambda a: a[:, 0][b_sel][None]  # (B, 1) origins -> (1, capg)
        winq = woff = None
        if cfg.coarse_skip:
            winq = win_flat.reshape(1, -1, 8)
            woff = (b_sel * win_flat.shape[1])[None]
        c2 = run_march(
            init2, takeg(t0), takeg(t_stop), og(ox), og(oy), og(oz),
            takeg(dx), takeg(dy), takeg(dz),
            cells_flat.reshape(1, -1, 8), coffq=coff, winq=winq, woffq=woff,
        )
        # scatter back (sel unique; padding slots were dead rays whose
        # marched state did not change)
        for key in ("found", "t_lo", "d_lo", "t_hi", "d_hi"):
            c[key] = c[key].reshape(-1).at[sel].set(c2[key][0]).reshape(B, P)
        c["it"] = c2["it"]
    elif 0 < cap < P:
        c = run_march(
            init, t0, t_stop, ox, oy, oz, dx, dy, dz, cells_flat, stop_alive_gt=cap
        )
        alive = ~c["found"] & (t0 + c["k"] * step <= t_stop)
        # alive-first stable order: every still-marching ray lands in the
        # first `cap` slots (phase 1 guarantees <= cap alive per row), in
        # original pixel order so gather locality is preserved
        sel = jnp.argsort(~alive, axis=1, stable=True)[:, :cap]
        take = lambda a: jnp.take_along_axis(a, sel, axis=1)
        # phase 2 CONTINUES phase 1's iteration count: the n_iter_max budget
        # is shared, so even if phase 1 exited on the budget (possible only
        # when max_dir_slack under-bounds 1/cam_z) every ray still marches
        # exactly as many body iterations as the uncompacted march would —
        # bit-identity holds in the budget-bound case too, and rays beyond
        # `cap` that a budget exit would strand get zero phase-2 iterations,
        # exactly like the plain march's cutoff
        init2 = dict(
            it=c["it"],
            **{key: take(c[key]) for key in state_keys},
        )
        c2 = run_march(
            init2, take(t0), take(t_stop), ox, oy, oz,
            take(dx), take(dy), take(dz), cells_flat,
        )
        # scatter the stragglers' results back (sel indices are unique per
        # row; padding slots were dead rays whose state did not change)
        rows = jnp.arange(B)[:, None]
        for key in ("found", "t_lo", "d_lo", "t_hi", "d_hi"):
            c[key] = c[key].at[rows, sel].set(c2[key])
        c["it"] = c2["it"]
    else:
        c = run_march(init, t0, t_stop, ox, oy, oz, dx, dy, dz, cells_flat)
    found = c["found"]

    # bisection refinement (kernel findIntersectionBisection :166-187)
    a, da = c["t_lo"], c["d_lo"]
    b, db = c["t_hi"], c["d_hi"]
    ok_bis = found
    cmid = b
    for _ in range(cfg.bisection_iters):
        denom = jnp.where(jnp.abs(da - db) > 1e-12, da - db, 1e-12)
        cmid = a + (da / denom) * (b - a)
        dmid, okm = sample(cmid)
        ok_bis = ok_bis & okm
        dmid = jnp.where(okm, dmid, 0.0)
        go_a = da * dmid > 0
        a = jnp.where(go_a, cmid, a)
        da = jnp.where(go_a, dmid, da)
        b = jnp.where(go_a, b, cmid)
        db = jnp.where(go_a, db, dmid)
    alpha = cmid

    # nearest voxel at the refined position (kernel :241; attrs from :129)
    hx = ox + alpha * dx
    hy = oy + alpha * dy
    hz = oz + alpha * dz
    ix = jnp.floor(hx + 0.5).astype(jnp.int32)
    iy = jnp.floor(hy + 0.5).astype(jnp.int32)
    iz = jnp.floor(hz + 0.5).astype(jnp.int32)
    Z, Y, X = dims
    inb = (ix >= 0) & (iy >= 0) & (iz >= 0) & (ix < X) & (iy < Y) & (iz < Z)
    idx = _flat_index(
        jnp.clip(ix, 0, X - 1), jnp.clip(iy, 0, Y - 1), jnp.clip(iz, 0, Z - 1), dims
    )
    hit_ok = _gather(valid.reshape(B, -1), idx)
    hit = found & ok_bis & inb & hit_ok
    depth = alpha * cam_z  # ray length -> camera z (kernel :215)
    # n_iters: while-loop trip count — the march's cost driver (every
    # iteration gathers march_block rows per ray in lockstep); exposed so
    # tests/profilers can assert the coarse skip actually reduces work
    return dict(hit=hit, alpha=alpha, depth=depth, hit_idx=idx, n_iters=c["it"])


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


def _forward_images(flat_attrs, hit, hit_idx, depth, cfg):
    """Assemble output images from hit voxels (gather). flat_attrs:
    (sdf (B,N), color (B,N,3), normal (B,N,3), semantic (B,N,14))."""
    _, color, normal, semantic = flat_attrs
    B = color.shape[0]
    hw = (B, cfg.height, cfg.width)

    def img(vals, nc):
        out = _gather(vals, hit_idx)
        out = jnp.where(hit[..., None], out, NEG_INF)
        return out.reshape(hw + (nc,))

    color_im = img(color, 3)
    sem_im = img(semantic, NUM_CLASSES)
    normal_im = _gather(normal, hit_idx)
    # zero normal -> stays invalid (kernel :220-224)
    nz = jnp.any(normal_im != 0.0, axis=-1)
    normal_im = jnp.where((hit & nz)[..., None], normal_im, NEG_INF)
    normal_im = normal_im.reshape(hw + (3,))
    depth_im = jnp.where(hit, depth, NEG_INF).reshape(hw)
    return RaycastOutput(color_im, depth_im, normal_im, sem_im)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _raycast_attrs(sdf_flat, color_flat, normal_flat, semantic_flat, hit, hit_idx, depth, cfg):
    return _forward_images((sdf_flat, color_flat, normal_flat, semantic_flat), hit, hit_idx, depth, cfg)


def _raycast_attrs_fwd(sdf_flat, color_flat, normal_flat, semantic_flat, hit, hit_idx, depth, cfg):
    out = _forward_images((sdf_flat, color_flat, normal_flat, semantic_flat), hit, hit_idx, depth, cfg)
    n = sdf_flat.shape[1]
    residuals = (hit, hit_idx, n)
    return out, residuals


def _raycast_attrs_bwd(cfg, residuals, g):
    """Scatter pixel grads to hit voxels, averaged per voxel (reference
    backward kernel raycast_rgbd_cuda_kernel.cu:365-423).

    All four gradient images plus the pixel counts scatter in ONE pass: TPU
    scatter-adds are per-row latency-bound (like gathers — docs/DESIGN.md
    §2), so a single 22-channel row update per pixel costs about what any
    one of the five separate scatters did. fp32 accumulation regardless of
    the compute dtype."""
    hit, hit_idx, n = residuals
    g_color, g_depth, g_normal, g_semantic = g
    B = hit.shape[0]
    P = hit.shape[1]
    idx = jnp.where(hit, hit_idx, n)  # invalid pixels scatter to a dump slot

    parts = [
        g_color.reshape(B, P, 3),
        g_normal.reshape(B, P, 3),
        g_semantic.reshape(B, P, NUM_CLASSES),
        g_depth.reshape(B, P, 1),
    ]
    G = jnp.concatenate(
        [p.astype(jnp.float32) for p in parts]
        + [jnp.ones((B, P, 1), jnp.float32)],  # counts channel
        axis=-1,
    )
    G = jnp.where(hit[..., None] & jnp.isfinite(G), G, 0.0)
    nc = G.shape[-1]
    acc = jax.vmap(lambda i, v: jnp.zeros((n + 1, nc), jnp.float32).at[i].add(v))(
        idx, G
    )[:, :n]
    counts = jnp.maximum(acc[..., -1], 1.0)[..., None]
    accn = acc[..., :-1] / counts
    d_color = accn[..., 0:3].astype(g_color.dtype)
    d_normal = accn[..., 3:6].astype(g_normal.dtype)
    d_semantic = accn[..., 6 : 6 + NUM_CLASSES].astype(g_semantic.dtype)
    d_sdf = accn[..., 6 + NUM_CLASSES].astype(g_depth.dtype)
    return d_sdf, d_color, d_normal, d_semantic, None, None, None


_raycast_attrs.defvjp(_raycast_attrs_fwd, _raycast_attrs_bwd)


def shade_hits(
    sdf: jax.Array,
    color: Optional[jax.Array],
    normal: Optional[jax.Array],
    semantic: Optional[jax.Array],
    hits: dict,
    cfg: RaycastConfig,
) -> RaycastOutput:
    """Differentiable attribute pass: assemble output images from precomputed
    surface hits (``find_surface_crossings``). Separated from the march so a
    fused multi-grid march can shade each grid independently — grids whose
    inputs are all stop-gradient then contribute NO backward scatter at all
    (the march itself is always stop-grad, reference autograd boundary
    raycast_rgbd.py:37-43).

    With ``cfg.batch_group`` the shade (and, through the lax.map transpose,
    its backward scatter) runs in sequential batch groups: gathers and
    scatter-adds are per-row latency-bound and locality-sensitive, and the
    per-sample attribute tables / (n+1, 22) f32 scatter accumulator are
    ~32-46 MB per flagship sample, so grouping keeps each pass's working
    set small at B>2."""
    B = sdf.shape[0]
    G = _grouped(cfg, B)
    if G:
        sub = dataclasses.replace(cfg, batch_group=0)
        args = [sdf, color, normal, semantic]
        have = [a is not None for a in args]
        packed = tuple(a for a in args if a is not None)
        nh = len(packed)

        def run(*xs):
            it = iter(xs[:nh])
            s, c, nr, sm = (next(it) if h else None for h in have)
            hits_g = dict(zip(("hit", "hit_idx", "depth"), xs[nh:]))
            return shade_hits(s, c, nr, sm, hits_g, sub)

        return _map_batch_groups(
            run, G, *packed, hits["hit"], hits["hit_idx"], hits["depth"]
        )
    dims = sdf.shape[1:4]
    n = int(np.prod(dims))
    zeros3 = jnp.zeros((B, n, 3), sdf.dtype)
    color_flat = color.reshape(B, n, 3) if color is not None else zeros3
    normal_flat = normal.reshape(B, n, 3) if normal is not None else zeros3
    semantic_flat = (
        semantic.reshape(B, n, NUM_CLASSES)
        if semantic is not None
        else jnp.zeros((B, n, NUM_CLASSES), sdf.dtype)
    )
    # the depth image's cotangent routes to the hit voxel's sdf value inside
    # _raycast_attrs_bwd (reference backward: d_depth accumulates into
    # vals_sdf, raycast_rgbd.py:42)
    sdf_flat = sdf.reshape(B, n)
    return _raycast_attrs(
        sdf_flat,
        color_flat,
        normal_flat,
        semantic_flat,
        hits["hit"],
        hits["hit_idx"],
        hits["depth"],
        cfg,
    )


def raycast(
    sdf: jax.Array,
    valid: jax.Array,
    color: Optional[jax.Array],
    normal: Optional[jax.Array],
    semantic: Optional[jax.Array],
    view: jax.Array,
    intrinsics: jax.Array,
    cfg: RaycastConfig,
) -> RaycastOutput:
    """Differentiable raycast of a dense batched TSDF.

    Args:
      sdf:       (B, Z, Y, X) float32, voxel units.
      valid:     (B, Z, Y, X) bool — surface voxels (the reference's sparse
                 locs set, |sdf| < truncation).
      color:     (B, Z, Y, X, 3) or None.
      normal:    (B, Z, Y, X, 3) or None (typically grid-gradient normals in
                 camera space, see losses).
      semantic:  (B, Z, Y, X, 14) or None (class scores / one-hot).
      view:      (B, 4, 4) camera-to-grid.
      intrinsics:(B, 4) = [fx, fy, mx, my].

    Gradients flow to sdf (via depth), color, normal, semantic only.
    """
    hits = find_surface_crossings(
        jax.lax.stop_gradient(sdf), valid, view, intrinsics, cfg
    )
    return shade_hits(sdf, color, normal, semantic, hits, cfg)


def raycast_occ(
    occ: jax.Array, view: jax.Array, intrinsics: jax.Array, cfg: RaycastConfig
) -> jax.Array:
    """Binary occupancy raycast: 1 if any occupied voxel lies along the pixel
    ray (reference raycast_occ_cuda_kernel :300-344; nearest-voxel lookup, no
    interpolation). occ: (B, Z, Y, X) bool/uint8 -> (B, H, W) uint8.

    Same TPU structure as the main march: blocked lockstep evaluation
    (``march_block`` samples per while iteration) with a conservative coarse
    skip — nearest-voxel samples whose voxel block holds no occupied voxel
    cannot hit, so their leading run is jumped with one packed window gather.
    Since only "was any sample occupied" matters (no prev chain), the skip is
    trivially exact."""
    B = occ.shape[0]
    G = _grouped(cfg, B)
    if G:
        sub = dataclasses.replace(cfg, batch_group=0)
        return _map_batch_groups(
            lambda o, vw, it: raycast_occ(o, vw, it, sub),
            G, occ, view, intrinsics,
        )
    dims = occ.shape[1:4]
    Z, Y, X = dims
    P = cfg.width * cfg.height
    occ_b = occ != 0
    flat_occ = occ_b.reshape(B, -1)

    origin, direction, cam_z = _camera_rays(view, intrinsics, cfg.width, cfg.height)
    t_start = cfg.depth_min / cam_z
    t_end = cfg.depth_max / cam_z
    lo_b, hi_b = _valid_bounds(occ_b)
    t_enter, t_exit = _ray_aabb(origin, direction, lo_b, hi_b)
    skip0 = jnp.maximum(jnp.floor((t_enter - t_start) / cfg.ray_increment), 0.0)
    t0 = t_start + skip0 * cfg.ray_increment
    t_stop = jnp.minimum(t_end, t_exit + cfg.ray_increment)
    step = cfg.ray_increment

    ox = origin[:, None, 0]
    oy = origin[:, None, 1]
    oz = origin[:, None, 2]
    dx = direction[..., 0]
    dy = direction[..., 1]
    dz = direction[..., 2]

    def sample(t):
        # nearest voxel = floor(p + 0.5)
        if t.ndim == 3:
            px = ox[..., None] + t * dx[..., None]
            py = oy[..., None] + t * dy[..., None]
            pz = oz[..., None] + t * dz[..., None]
        else:
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
        ix = jnp.floor(px + 0.5).astype(jnp.int32)
        iy = jnp.floor(py + 0.5).astype(jnp.int32)
        iz = jnp.floor(pz + 0.5).astype(jnp.int32)
        inb = (ix >= 0) & (iy >= 0) & (iz >= 0) & (ix < X) & (iy < Y) & (iz < Z)
        idx = _flat_index(
            jnp.clip(ix, 0, X - 1), jnp.clip(iy, 0, Y - 1), jnp.clip(iz, 0, Z - 1), dims
        )
        got = jnp.take_along_axis(
            flat_occ, idx.reshape(B, -1), axis=1, mode="clip"
        ).reshape(idx.shape)
        return got & inb

    F = cfg.march_block
    n_iter_max = int(math.ceil((cfg.depth_max - cfg.depth_min) * cfg.max_dir_slack / (step * F))) + 1
    offs = jnp.arange(F, dtype=jnp.float32)

    use_skip = cfg.coarse_skip
    if use_skip:
        win = build_block_windows(occ_b, cfg.coarse_block)
        nb = (win.shape[1] - 2, win.shape[2] - 2, win.shape[3] - 2)
        win_flat = win.reshape(B, -1, 8)
        blockf = jnp.float32(cfg.coarse_block)
        rays = (ox, oy, oz, dx, dy, dz)

        def hop(k, done):
            # voxel = floor(p + 0.5): classify in shifted coords (shift 0.5)
            dead = done | (t0 + k * step > t_stop)
            return k + _skip_hop(
                k, dead, rays, t0, step, win_flat, nb, blockf, 0.5
            )

    init = dict(it=jnp.zeros((), jnp.int32), k=jnp.zeros((B, P), jnp.float32),
                hit=jnp.zeros((B, P), bool))

    def cond(c):
        alive = ~c["hit"] & (t0 + c["k"] * step <= t_stop)
        return (c["it"] < n_iter_max) & jnp.any(alive)

    def body(c):
        k = c["k"]
        if use_skip:
            for _ in range(cfg.coarse_hops):
                k = hop(k, c["hit"])
        treal = t0[..., None] + (k[..., None] + offs) * step
        in_range = treal <= t_stop[..., None]
        dead = c["hit"] | (t0 + k * step > t_stop)
        t = jnp.where(dead[..., None], t0[..., None], treal)
        got = sample(t) & in_range
        return dict(
            it=c["it"] + 1,
            k=k + jnp.float32(F),
            hit=c["hit"] | (jnp.any(got, axis=-1) & ~dead),
        )

    c = jax.lax.while_loop(cond, body, init)
    return c["hit"].reshape(B, cfg.height, cfg.width).astype(jnp.uint8)
