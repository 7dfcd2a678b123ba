"""Evaluation-metric tests (SSIM, Chamfer, Feature-l1; reference
torch/metrics.py)."""

import os

import numpy as np
import pytest

from spsg_tpu.inference import metrics as M


def test_ssim_identity_and_noise(rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert M.ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img.astype(float) + rng.normal(0, 40, img.shape), 0, 255)
    s = M.ssim(img, noisy)
    assert 0.0 < s < 0.9


def test_chamfer_zero_and_offset(rng):
    pts = rng.random((500, 3)).astype(np.float32)
    assert M.chamfer_distance(pts, pts) == pytest.approx(0.0, abs=1e-10)
    shifted = pts + np.array([0.5, 0.0, 0.0], np.float32)
    d = M.chamfer_distance(pts, shifted)
    assert d > 0.01  # both directions accumulate squared distances


def test_feature_l1(rng):
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.3, 0, 1)
    assert M.feature_l1(a, a) == pytest.approx(0.0, abs=1e-6)
    assert M.feature_l1(a, b) > 0.0


def test_fid():
    """FID: zero for identical distributions, positive and larger for a
    shifted one (reference delegates FID to the TTUR repo, metrics.py:7)."""
    from spsg_tpu.inference import metrics as M

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (64, 16))
    b = rng.normal(0, 1, (64, 16))
    c = rng.normal(2.0, 1, (64, 16))
    same = M.fid(a, a)
    close = M.fid(a, b)
    far = M.fid(a, c)
    assert abs(same) < 1e-6
    assert far > close > 0


def test_fid_cli(tmp_path):
    from PIL import Image

    from spsg_tpu.cli import metrics as mcli

    rng = np.random.default_rng(1)
    for d, shift in (("p", 0), ("t", 80)):
        os.makedirs(tmp_path / d)
        for i in range(3):
            img = (rng.random((32, 32, 3)) * 120 + shift).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / d / f"s{i}_x.png")
    out = tmp_path / "fid.txt"
    mcli.main([
        "--metric", "fid", "--pred_dir", str(tmp_path / "p"),
        "--target_dir", str(tmp_path / "t"),
        "--pred_suffix", "_x.png", "--target_suffix", "_x.png",
        "--output", str(out),
    ])
    val = float(open(out).read().split()[1])
    assert np.isfinite(val) and val > 0


def test_mesh_voxelize_iou_recall():
    """voxelize_mesh / mesh_iou_recall (the reference's metrics.py:64 TODO,
    completed): identical meshes give IoU == Recall == 1; disjoint meshes
    give 0; a half-overlapping mesh lands in between."""
    # unit-square "floor" mesh at z=0.5, 1m x 1m, two triangles
    def quad(x0, x1):
        v = np.array([
            [x0, 0.0, 0.5], [x1, 0.0, 0.5], [x1, 1.0, 0.5], [x0, 1.0, 0.5],
        ], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        return v, f

    v, f = quad(0.0, 1.0)
    occ, origin = M.voxelize_mesh(v, f, 0.05)
    # a 1 m^2 plane at 5 cm voxels crosses ~20x20 voxels (plus edge overlap)
    assert 380 <= occ.sum() <= 1000
    iou, recall = M.mesh_iou_recall(v, f, v, f, 0.05)
    assert iou == pytest.approx(1.0) and recall == pytest.approx(1.0)

    v2, f2 = quad(2.0, 3.0)  # disjoint
    iou, recall = M.mesh_iou_recall(v, f, v2, f2, 0.05)
    assert iou == 0.0 and recall == 0.0

    v3, f3 = quad(0.5, 1.5)  # half overlap
    iou, recall = M.mesh_iou_recall(v, f, v3, f3, 0.05)
    assert 0.2 < iou < 0.5 and 0.4 < recall < 0.65
