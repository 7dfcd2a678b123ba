"""Depth-map op tests (reference CUDA kernels depth_utils_cuda_kernel.cu)."""

import jax.numpy as jnp
import numpy as np

from spsg_tpu.ops import depth as D


def test_bilateral_preserves_constant():
    d = np.full((1, 16, 16), 2.0, np.float32)
    out = np.asarray(D.bilateral_filter(jnp.asarray(d)))
    np.testing.assert_allclose(out, d, atol=1e-5)


def test_bilateral_keeps_holes():
    d = np.full((1, 16, 16), 2.0, np.float32)
    d[0, 5, 5] = 0.0
    out = np.asarray(D.bilateral_filter(jnp.asarray(d)))
    assert out[0, 5, 5] == 0.0
    assert abs(out[0, 8, 8] - 2.0) < 1e-4


def test_median_fill_fills_hole():
    d = np.full((1, 16, 16), 1.5, np.float32)
    d[0, 7, 7] = 0.0
    out = np.asarray(D.median_fill(jnp.asarray(d)))
    assert abs(out[0, 7, 7] - 1.5) < 1e-3  # filled with neighborhood median
    np.testing.assert_allclose(out[0, 0, 0], 1.5)


def test_fill_depth_holes_early_exit():
    d = np.full((1, 16, 16), 1.5, np.float32)
    out, ok = D.fill_depth_holes(jnp.asarray(d), max_iters=4)
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(out), d)  # untouched when no holes


def test_fill_depth_holes_large_hole():
    d = np.full((1, 24, 24), 2.0, np.float32)
    d[0, 4:16, 4:16] = 0.0
    out, ok = D.fill_depth_holes(jnp.asarray(d), max_iters=40)
    out = np.asarray(out)
    assert bool(ok[0])
    assert np.abs(out - 2.0).max() < 0.01


def test_unprojection_and_normals_plane():
    """A fronto-parallel constant-depth plane has camera-space normal
    pointing along +z after the reference's negation (cross(PC-MC, CP-CM)
    with y down gives -z; kernel negates)."""
    H, W = 32, 40
    depth = np.full((1, H, W), 2.0, np.float32)
    intr = np.array([[40.0, 40.0, W / 2, H / 2]], np.float32)
    pts = np.asarray(D.depth_to_camera_space(jnp.asarray(depth), jnp.asarray(intr)))
    # center pixel unprojects to (0 - mx)/fx * d etc.
    assert abs(pts[0, H // 2, W // 2, 2] - 2.0) < 1e-5
    normals = np.asarray(D.camera_space_normals(jnp.asarray(pts)))
    interior = normals[0, 2:-2, 2:-2]
    nz = interior[..., 2]
    assert np.abs(np.abs(nz) - 1.0).max() < 1e-3  # unit z normals
    # all interior normals same sign
    assert (np.sign(nz) == np.sign(nz.flat[0])).all()
