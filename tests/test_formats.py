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


# ---------------------------------------------------------------------------
# golden BYTES fixtures, hand-authored straight from the reference reader's
# field order (torch/data_util.py:70-184) — NOT produced by save_sdf, so a
# same-bug-in-reader-and-writer round-trip cannot mask a format drift
# (VERDICT r2 item 8)
# ---------------------------------------------------------------------------


def _golden_header(dimx, dimy, dimz, voxelsize, w2g16):
    import struct

    b = struct.pack("<QQQ", dimx, dimy, dimz)
    b += struct.pack("<f", voxelsize)
    b += struct.pack("<16f", *w2g16)
    return b


def test_golden_sdf_chunk_bytes(tmp_path):
    """Chunk-file layout: header | sparse locs(xyz u32)+sdf(meters f32) |
    num_known u64 + known u8[N] | num_color u64 + color u8[N*3] |
    num_sem u64 + sem u8[N]."""
    import struct

    dimx, dimy, dimz = 3, 2, 2  # distinct dims catch axis transposition
    n = dimx * dimy * dimz
    vs = 0.05
    w2g = list(range(16))
    b = _golden_header(dimx, dimy, dimz, vs, w2g)
    # two sparse voxels, locs in FILE xyz order, sdf in METERS
    b += struct.pack("<Q", 2)
    b += struct.pack("<3I", 1, 0, 1) + struct.pack("<3I", 2, 1, 0)
    b += struct.pack("<2f", 0.05, -0.1)
    # inline known: raw values 0..11 (z-major: z*dimy*dimx + y*dimx + x)
    b += struct.pack("<Q", n) + bytes(range(n))
    # inline colors: 0..35
    b += struct.pack("<Q", n) + bytes(range(n * 3))
    # inline semantics: 100..111
    b += struct.pack("<Q", n) + bytes(range(100, 100 + n))
    p = tmp_path / "golden__inc__0.sdf"
    p.write_bytes(b)

    out = formats.load_sdf(str(p), load_known=True, load_color=True, load_semantic=True)
    assert out.dims == (dimz, dimy, dimx) == (2, 2, 3)
    assert out.voxelsize == np.float32(vs)
    np.testing.assert_array_equal(out.world2grid, np.arange(16, dtype=np.float32).reshape(4, 4))
    # locs flipped to zyx; sdf divided by voxelsize (meters -> voxels)
    np.testing.assert_array_equal(out.locs, [[1, 0, 1], [0, 1, 2]])
    np.testing.assert_allclose(out.sdf, [1.0, -2.0], rtol=1e-6)
    # known fixups (data_util.py:105-108): sdf=1.0 in [-1,1] -> known=1 at
    # zyx (1,0,1) (raw flat index 7); sdf=-2.0 matches neither mask
    expect_known = np.arange(n, dtype=np.uint8).reshape(2, 2, 3)
    expect_known[1, 0, 1] = 1
    np.testing.assert_array_equal(out.known, expect_known)
    np.testing.assert_array_equal(
        out.colors, np.arange(n * 3, dtype=np.uint8).reshape(2, 2, 3, 3)
    )
    assert out.colors[1, 0, 2].tolist() == [24, 25, 26]  # flat zyx idx 8
    np.testing.assert_array_equal(
        out.semantics, np.arange(100, 100 + n, dtype=np.uint8).reshape(2, 2, 3)
    )


def test_golden_scene_sidecar_bytes(tmp_path):
    """Scene layout: bare .sdf + .colors sidecar (sparse) + .semantics
    sidecar (dense) + .knw (header + dense u8)."""
    import struct

    dimx, dimy, dimz = 3, 2, 2
    n = dimx * dimy * dimz
    vs = 0.02
    b = _golden_header(dimx, dimy, dimz, vs, [float(i) for i in range(16)])
    b += struct.pack("<Q", 2)
    b += struct.pack("<3I", 1, 0, 1) + struct.pack("<3I", 2, 1, 0)
    b += struct.pack("<2f", 0.02, -0.04)
    sdf_p = tmp_path / "scene.sdf"
    sdf_p.write_bytes(b)

    cb = struct.pack("<QQQ", dimx, dimy, dimz)
    cb += struct.pack("<Q", 2) + bytes([10, 20, 30, 40, 50, 60])
    (tmp_path / "scene.colors").write_bytes(cb)

    sb = struct.pack("<QQQ", dimx, dimy, dimz) + bytes(range(200, 200 + n))
    (tmp_path / "scene.semantics").write_bytes(sb)

    kb = _golden_header(dimx, dimy, dimz, vs, [0.0] * 16) + bytes(range(n))
    (tmp_path / "scene.knw").write_bytes(kb)

    out = formats.load_sdf(
        str(sdf_p),
        load_color=True,
        load_semantic=True,
        color_path=str(tmp_path / "scene.colors"),
        semantic_path=str(tmp_path / "scene.semantics"),
    )
    np.testing.assert_allclose(out.sdf, [1.0, -2.0], rtol=1e-6)
    # sidecar colors scatter to the sparse locs, 0 elsewhere
    expect_colors = np.zeros((2, 2, 3, 3), np.uint8)
    expect_colors[1, 0, 1] = [10, 20, 30]
    expect_colors[0, 1, 2] = [40, 50, 60]
    np.testing.assert_array_equal(out.colors, expect_colors)
    np.testing.assert_array_equal(
        out.semantics, np.arange(200, 200 + n, dtype=np.uint8).reshape(2, 2, 3)
    )

    known, kvs, kw2g = formats.load_known(str(tmp_path / "scene.knw"))
    assert kvs == np.float32(vs)
    np.testing.assert_array_equal(known, np.arange(n, dtype=np.uint8).reshape(2, 2, 3))
    np.testing.assert_array_equal(kw2g, np.zeros((4, 4), np.float32))


def test_reference_filelists_parse():
    """The shipped reference filelists work verbatim (data_util.py:26-38
    semantics: names without '.sdf' get '__0__.sdf' appended; a 1-file list
    flips the overfit flag)."""
    import os

    import pytest

    from spsg_tpu.data.pipeline import get_train_files

    fl = "/root/reference/filelists"
    if not os.path.isdir(fl):
        pytest.skip("reference filelists not present")
    train, _, overfit = get_train_files("/data", os.path.join(fl, "train.txt"))
    assert train[0].endswith("1LXtFkjw3qL_room0__inc__0.sdf") and not overfit
    scenes, _, _ = get_train_files("/data", os.path.join(fl, "mp-rooms_val-scenes.txt"))
    assert scenes[0].endswith("__0__.sdf")
    mp, _, _ = get_train_files("/data", os.path.join(fl, "mp_train.txt"), max_num=5)
    assert len(mp) == 5 and mp[0].endswith(".sdf")
