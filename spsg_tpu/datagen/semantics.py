"""Semantic dataset extension: splat labeled surface points into voxel grids
(rebuild of reference torch/extend_sdfs.py:81-155 and
torch/extend_sdfs_2cm.py:34-105).

The labeling strategy is the reference's two-pass splat: a dense pass writes
the label into the full floor-cube (8 corners) around each sampled point, a
second pass overwrites with the exact rounded point positions; everything
else stays UNLABELED (14)."""

from __future__ import annotations

import os
import shutil
import struct
from typing import Optional

import numpy as np

from ..data import category, formats

UNLABELED = category.UNLABELED


def splat_semantics(
    points_world: np.ndarray,  # (N, 3)
    labels: np.ndarray,  # (N,) int, already mapped to class ids (>=14 = drop)
    world2grid: np.ndarray,
    dims_zyx,
) -> np.ndarray:
    """Points -> dense (Z, Y, X) uint8 label grid (reference
    add_semantics_to_chunk_sdf, extend_sdfs.py:81-115)."""
    dimz, dimy, dimx = dims_zyx
    h = np.concatenate([points_world, np.ones((len(points_world), 1))], 1)
    x = (h @ np.asarray(world2grid, np.float64).T)[:, :3]  # xyz grid coords

    def in_bounds(p):
        return np.all(p >= 0, axis=1) & (p[:, 0] < dimx) & (p[:, 1] < dimy) & (p[:, 2] < dimz)

    dense = np.full((dimz, dimy, dimx), UNLABELED, np.uint8)
    # pass 1: floor-cube splat, labeled classes only
    cube = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    )
    xf = np.floor(x)
    pts = (cube[None, :, :] + xf[:, None, :]).reshape(-1, 3)
    lab = np.repeat(labels, 8)
    m = in_bounds(pts) & (lab < 14)
    pts = pts[m].astype(int)
    lab = lab[m]
    dense[pts[:, 2], pts[:, 1], pts[:, 0]] = lab
    # pass 2: exact rounded points override
    xr = np.rint(x)
    m = in_bounds(xr)
    pr = xr[m].astype(int)
    lr = labels[m].astype(np.uint8)
    keep = lr < 14
    dense[pr[keep, 2], pr[keep, 1], pr[keep, 0]] = lr[keep]
    return dense


def extend_sdf_file(
    sdf_file: str,
    output_path: str,
    points_world: np.ndarray,
    labels: np.ndarray,
    margin: float = 0.3,
) -> None:
    """Append dense semantics to a copy of a chunk .sdf, producing a
    ``__sem__`` file (reference extend_sdf_file, extend_sdfs.py:133-155)."""
    data = formats.load_sdf(sdf_file)
    dims = data.dims
    grid2world = np.linalg.inv(data.world2grid)
    corners = np.array(
        [[0, 0, 0, 1], [dims[2], dims[1], dims[0], 1]], np.float64
    )
    limits = (corners @ grid2world.T)[:, :3]
    lo = np.minimum(limits[0], limits[1]) - margin
    hi = np.maximum(limits[0], limits[1]) + margin
    sel = np.all((points_world >= lo) & (points_world <= hi), axis=1)
    dense = splat_semantics(points_world[sel], labels[sel], data.world2grid, dims)
    shutil.copyfile(sdf_file, output_path)
    with open(output_path, "ab") as f:
        f.write(struct.pack("<Q", dense.size))
        f.write(dense.tobytes())


def write_scene_semantics(
    sdf_file: str,
    output_semantics_path: str,
    points_world: np.ndarray,
    labels: np.ndarray,
) -> None:
    """Standalone .semantics for full 2 cm scenes (reference
    extend_sdfs_2cm.py:34-105: label 41 (mpcat40 unlabeled) maps to 14)."""
    data = formats.load_sdf(sdf_file)
    labels = np.where(labels == 41, UNLABELED, labels)
    dense = splat_semantics(points_world, labels, data.world2grid, data.dims)
    formats.save_semantics(output_semantics_path, dense)


def labels_from_category_mapping(
    raw_categories: np.ndarray, mapping_tsv: str, column: str = "eigen13id"
) -> np.ndarray:
    """Map raw Matterport category ids to eigen13 ids via the
    category_mapping.tsv table (reference extend_sdfs.py:180-191)."""
    import pandas as pd

    table = pd.read_csv(mapping_tsv, sep="\t")
    lut = np.full(int(table["index"].max()) + 2, UNLABELED, np.int64)
    lut[table["index"].to_numpy()] = table[column].fillna(UNLABELED).to_numpy().astype(np.int64)
    raw = np.clip(raw_categories.astype(np.int64), 0, len(lut) - 1)
    return lut[raw]
