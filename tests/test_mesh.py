"""Mesh extraction + I/O tests (native marching tetrahedra vs analytic
surfaces; PLY round trip)."""

import numpy as np
import pytest

from spsg_tpu.ops import mesh


def _sphere_sdf(dims=(32, 32, 32), c=(16, 16, 16), r=8.0, trunc=3.0):
    zz, yy, xx = np.meshgrid(
        np.arange(dims[0], dtype=np.float32),
        np.arange(dims[1], dtype=np.float32),
        np.arange(dims[2], dtype=np.float32),
        indexing="ij",
    )
    d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) - r
    return np.clip(d, -trunc, trunc).astype(np.float32)


def test_marching_cubes_sphere():
    sdf = _sphere_sdf()
    verts, colors, faces = mesh.marching_cubes(sdf, truncation=3.0)
    assert len(verts) > 100
    assert len(faces) > 100
    # all vertices lie near the analytic sphere (xyz order)
    d = np.sqrt(((verts - np.array([16.0, 16.0, 16.0])) ** 2).sum(1))
    assert np.abs(d - 8.0).max() < 0.75
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_marching_cubes_colors():
    sdf = _sphere_sdf()
    colors = np.zeros(sdf.shape + (3,), np.uint8)
    colors[..., 0] = 200
    colors[..., 2] = 40
    verts, vcol, faces = mesh.marching_cubes(sdf, colors, truncation=3.0)
    assert vcol is not None and len(vcol) == len(verts)
    assert np.abs(vcol[:, 0].astype(int) - 200).max() <= 1
    assert np.abs(vcol[:, 2].astype(int) - 40).max() <= 1


def test_marching_cubes_watertight_skip_unobserved():
    sdf = _sphere_sdf()
    sdf[:, :, :8] = np.inf  # unobserved region: no geometry there
    verts, _, faces = mesh.marching_cubes(sdf, truncation=3.0)
    assert len(verts) > 0
    assert verts[:, 0].min() >= 7.0  # x < 8 region skipped


def test_marching_cubes_classic_topology():
    """Default method="mc" has the reference's vertex set (on cube edges
    only), is watertight on a closed surface, and winds outward."""
    from collections import Counter

    sdf = _sphere_sdf()
    verts, _, faces = mesh.marching_cubes(sdf, truncation=3.0, method="mc")
    # every vertex lies on a cube edge: >= 2 integral coordinates
    fract = np.abs(verts - np.round(verts))
    assert ((fract < 1e-5).sum(1) >= 2).all()
    # closed surface: every undirected edge shared by exactly 2 faces
    cnt = Counter()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    assert set(cnt.values()) == {2}
    # Euler characteristic of a sphere
    assert len(verts) - len(cnt) + len(faces) == 2
    # consistent outward winding
    n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                 verts[faces[:, 2]] - verts[faces[:, 0]])
    ctr = verts[faces].mean(1) - 16.0
    assert ((n * ctr).sum(1) > 0).all()
    # tet method still available, denser vertex set
    v2, _, f2 = mesh.marching_cubes(sdf, truncation=3.0, method="tet")
    assert len(v2) > len(verts)


def test_marching_cubes_classic_manifold_on_noise():
    """Ambiguous faces (asymptotic decider) never produce non-manifold edges
    or cracks, even on random fields with unobserved holes."""
    from collections import Counter

    rng = np.random.RandomState(3)
    sdf = np.clip(rng.randn(10, 11, 12).astype(np.float32) * 2.0, -3, 3)
    sdf[rng.rand(*sdf.shape) < 0.2] = np.inf
    verts, _, faces = mesh.marching_cubes(sdf, truncation=3.0, method="mc")
    cnt = Counter()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    assert max(cnt.values()) <= 2  # open boundaries allowed, cracks not


def test_ply_roundtrip(tmp_path):
    sdf = _sphere_sdf()
    colors = np.full(sdf.shape + (3,), 128, np.uint8)
    verts, vcol, faces = mesh.marching_cubes(sdf, colors, truncation=3.0)
    p = str(tmp_path / "m.ply")
    mesh.save_ply(p, verts, faces, vcol)
    v2, c2, f2 = mesh.load_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(c2, vcol)
    np.testing.assert_array_equal(f2, faces)


def test_sample_point_cloud():
    sdf = _sphere_sdf()
    verts, _, faces = mesh.marching_cubes(sdf, truncation=3.0)
    pts = mesh.sample_point_cloud(verts, faces, 5000)
    assert pts.shape == (5000, 3)
    d = np.sqrt(((pts - np.array([16.0, 16.0, 16.0])) ** 2).sum(1))
    assert np.abs(d - 8.0).max() < 1.0
