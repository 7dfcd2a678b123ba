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
