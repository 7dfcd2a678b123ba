"""Evaluation-metric tests (SSIM, Chamfer, Feature-l1; reference
torch/metrics.py)."""

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
