"""Cut fused room scans into fixed-size training chunks.

The training data consumed by the reference (chunk ``__inc__``/``__cmp__``
.sdf files with inline known + dense colors, data_util.py:93-132) is produced
by cutting whole-room scans into 64x64x128 windows. This tool performs that
step on the outputs of :mod:`spsg_tpu.datagen.scan` (scene-layout .sdf +
.colors + .knw)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..data import formats


def _load_scene(prefix: str):
    data = formats.load_sdf(
        prefix + ".sdf",
        load_color=os.path.isfile(prefix + ".colors"),
        color_path=prefix + ".colors" if os.path.isfile(prefix + ".colors") else None,
    )
    known = None
    if os.path.isfile(prefix + ".knw"):
        known, _, _ = formats.load_known(prefix + ".knw")
    return data, known


def cut_scene_to_chunks(
    inc_prefix: str,
    cmp_prefix: str,
    output_dir: str,
    name: str,
    chunk_dims: Tuple[int, int, int] = (128, 64, 64),  # zyx
    stride: Optional[Tuple[int, int]] = None,  # (y, x); default = chunk size
    min_surface_voxels: int = 500,
    trunc_store: float = 6.0,
) -> List[str]:
    """Write ``<name>__inc__<k>.sdf`` / ``__cmp__<k>.sdf`` chunk files (inline
    known + colors) for every sufficiently-occupied window. Returns the list
    of incomplete chunk paths."""
    os.makedirs(output_dir, exist_ok=True)
    inc, _ = _load_scene(inc_prefix)
    cmp_, known = _load_scene(cmp_prefix)
    dims = cmp_.dims
    cz, cy, cx = chunk_dims
    sy, sx = stride if stride is not None else (cy, cx)

    inc_dense = formats.sparse_to_dense(inc.locs, inc.sdf[:, None], inc.dims, np.inf)
    cmp_dense = formats.sparse_to_dense(cmp_.locs, cmp_.sdf[:, None], dims, np.inf)
    inc_colors = inc.colors if inc.colors is not None else np.zeros(inc.dims + (3,), np.uint8)
    cmp_colors = cmp_.colors if cmp_.colors is not None else np.zeros(dims + (3,), np.uint8)
    if known is None:
        known = np.full(dims, 255, np.uint8)

    out_files = []
    k = 0
    voxelsize = cmp_.voxelsize
    for y in range(0, max(1, dims[1] - cy // 2), sy):
        for x in range(0, max(1, dims[2] - cx // 2), sx):
            win_cmp = np.full(chunk_dims, np.inf, np.float32)
            win_inc = np.full(chunk_dims, np.inf, np.float32)
            win_kn = np.full(chunk_dims, 255, np.uint8)
            win_ccol = np.zeros(chunk_dims + (3,), np.uint8)
            win_icol = np.zeros(chunk_dims + (3,), np.uint8)
            fz = min(dims[0], cz)
            fy = min(dims[1] - y, cy)
            fx = min(dims[2] - x, cx)
            if fy <= 0 or fx <= 0:
                continue
            win_cmp[:fz, :fy, :fx] = cmp_dense[:cz, y : y + fy, x : x + fx]
            win_inc[:fz, :fy, :fx] = inc_dense[:cz, y : y + fy, x : x + fx]
            win_kn[:fz, :fy, :fx] = known[:cz, y : y + fy, x : x + fx]
            win_ccol[:fz, :fy, :fx] = cmp_colors[:cz, y : y + fy, x : x + fx]
            win_icol[:fz, :fy, :fx] = inc_colors[:cz, y : y + fy, x : x + fx]

            with np.errstate(invalid="ignore"):
                n_surf = int(np.sum(np.abs(win_cmp) < 3.0))
            if n_surf < min_surface_voxels:
                continue

            # chunk-local world2grid: translate the scene transform
            w2g = cmp_.world2grid.copy()
            w2g[0, 3] -= x
            w2g[1, 3] -= y

            def save(tag, grid, colors):
                with np.errstate(invalid="ignore"):
                    m = np.isfinite(grid) & (np.abs(grid) <= trunc_store)
                locs = np.argwhere(m).astype(np.int32)
                path = os.path.join(output_dir, f"{name}__{tag}__{k}.sdf")
                formats.save_sdf(
                    path, chunk_dims, voxelsize, w2g, locs, grid[m],
                    known=win_kn, colors=colors,
                )
                return path

            p_inc = save("inc", win_inc, win_icol)
            save("cmp", win_cmp, win_ccol)
            out_files.append(p_inc)
            k += 1
    return out_files
