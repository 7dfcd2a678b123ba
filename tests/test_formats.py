"""Round-trip tests of the binary voxel-grid formats against synthetic bytes
(the reference had only a datagen-side save/reload self-check,
Fuser.cpp:106-126)."""

import numpy as np
import pytest

from spsg_tpu.data import formats


def _random_sparse(rng, dims, n=100):
    dimz, dimy, dimx = dims
    locs = np.stack(
        [
            rng.integers(0, dimz, n),
            rng.integers(0, dimy, n),
            rng.integers(0, dimx, n),
        ],
        axis=1,
    ).astype(np.int32)
    # dedupe to keep scatter round-trips exact
    flat = locs[:, 0] * dimy * dimx + locs[:, 1] * dimx + locs[:, 2]
    _, idx = np.unique(flat, return_index=True)
    locs = locs[idx]
    sdf = rng.standard_normal(len(locs)).astype(np.float32) * 2.0
    return locs, sdf


def test_sdf_roundtrip_chunk(tmp_path, rng):
    dims = (16, 12, 10)
    locs, sdf = _random_sparse(rng, dims)
    known = rng.integers(0, 4, dims).astype(np.uint8)
    colors = rng.integers(0, 256, dims + (3,)).astype(np.uint8)
    sem = rng.integers(0, 15, dims).astype(np.uint8)
    w2g = np.eye(4, dtype=np.float32) * 50.0
    w2g[3, 3] = 1.0
    p = str(tmp_path / "chunk__inc__0.sdf")
    formats.save_sdf(p, dims, 0.02, w2g, locs, sdf, known=known, colors=colors, semantics=sem)

    out = formats.load_sdf(p, load_known=True, load_color=True, load_semantic=True)
    assert out.dims == dims
    assert out.voxelsize == pytest.approx(0.02)
    np.testing.assert_allclose(out.world2grid, w2g)
    # loader reorders? no — same order preserved
    np.testing.assert_array_equal(out.locs, locs)
    np.testing.assert_allclose(out.sdf, sdf, rtol=1e-5)
    np.testing.assert_array_equal(out.colors, colors)
    np.testing.assert_array_equal(out.semantics, sem)
    # known is modified by the loader: surface voxels 1, in-front voxels 0
    # (reference data_util.py:105-108)
    expect = known.copy()
    m = (out.sdf >= -1) & (out.sdf <= 1)
    expect[locs[m, 0], locs[m, 1], locs[m, 2]] = 1
    m = out.sdf > 1
    expect[locs[m, 0], locs[m, 1], locs[m, 2]] = 0
    np.testing.assert_array_equal(out.known, expect)


def test_sdf_scene_with_sidecars(tmp_path, rng):
    dims = (8, 9, 10)
    locs, sdf = _random_sparse(rng, dims, n=40)
    w2g = np.eye(4, dtype=np.float32)
    p = str(tmp_path / "scene.sdf")
    formats.save_sdf(p, dims, 0.05, w2g, locs, sdf)
    colors_sparse = rng.integers(0, 256, (len(locs), 3)).astype(np.uint8)
    cp = str(tmp_path / "scene.colors")
    formats.save_colors_sparse(cp, dims, colors_sparse)
    sem = rng.integers(0, 15, dims).astype(np.uint8)
    sp = str(tmp_path / "scene.semantics")
    formats.save_semantics(sp, sem)

    out = formats.load_sdf(p, load_color=True, load_semantic=True, color_path=cp, semantic_path=sp)
    dense_expected = formats.sparse_to_dense(locs, colors_sparse, dims, 0)
    np.testing.assert_array_equal(out.colors, dense_expected)
    np.testing.assert_array_equal(out.semantics, sem)


def test_knw_roundtrip(tmp_path, rng):
    known = rng.integers(0, 5, (6, 7, 8)).astype(np.uint8)
    w2g = np.eye(4, dtype=np.float32)
    p = str(tmp_path / "a.knw")
    formats.save_known(p, known, 0.04, w2g)
    k2, vs, w = formats.load_known(p)
    np.testing.assert_array_equal(k2, known)
    assert vs == pytest.approx(0.04)


def test_sparse_dense_inverse(rng):
    dims = (10, 11, 12)
    grid = np.full(dims, np.inf, dtype=np.float32)
    locs = np.array([[1, 2, 3], [4, 5, 6], [9, 10, 11]], dtype=np.int32)
    vals = np.array([0.5, -1.0, 2.0], dtype=np.float32)
    grid[locs[:, 0], locs[:, 1], locs[:, 2]] = vals
    l2, v2 = formats.dense_to_sparse(grid, 3.0)
    assert len(l2) == 3  # all |val| < 3 survive; inf background does not
    back = formats.sparse_to_dense(l2, v2[:, None], dims, np.inf)
    mask = np.abs(grid) < 3.0
    np.testing.assert_allclose(back[mask], grid[mask])
