"""Color-space conversion tests: round trips, reference-formula parity, and
numpy/jax agreement."""

import jax.numpy as jnp
import numpy as np

from spsg_tpu.data import colorspace


def test_hsv_roundtrip(rng):
    rgb = rng.random((5, 6, 7, 3)).astype(np.float32)
    rgb = np.clip(rgb, 0.05, 1.0)  # avoid the <0.01-sum masked region
    hsv = colorspace.rgb_to_hsv_np(rgb)
    back = colorspace.hsv_to_rgb_np(hsv)
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_hsv_ranges(rng):
    rgb = rng.random((100, 3)).astype(np.float32)
    hsv = colorspace.rgb_to_hsv_np(rgb)
    assert hsv[..., 0].min() >= 0 and hsv[..., 0].max() < 360
    assert hsv[..., 1].min() >= 0 and hsv[..., 1].max() <= 1
    assert hsv[..., 2].min() >= 0 and hsv[..., 2].max() <= 1


def test_lab_roundtrip(rng):
    rgb = rng.random((64, 3)).astype(np.float32)
    lab = colorspace.rgb_to_lab(rgb, xp=np)
    back = colorspace.lab_to_rgb(lab, xp=np)
    np.testing.assert_allclose(back, rgb, atol=5e-3)


def test_lab_known_values():
    # white -> L=100, a=b=0; black -> 0,0,0
    lab = colorspace.rgb_to_lab(np.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], np.float32))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.2)


def test_lab_np_jax_agree(rng):
    rgb = rng.random((32, 3)).astype(np.float32)
    a = colorspace.rgb_to_lab(rgb, xp=np)
    b = np.asarray(colorspace.rgb_to_lab(jnp.asarray(rgb), xp=jnp))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_lab01_roundtrip(rng):
    rgb = rng.random((32, 3)).astype(np.float32)
    lab01 = colorspace.rgb_to_lab01(rgb, xp=np)
    assert lab01.min() >= -0.01 and lab01.max() <= 1.01
    back = np.asarray(colorspace.lab01_to_rgb(jnp.asarray(lab01)))
    np.testing.assert_allclose(back, rgb, atol=5e-3)


def test_augment_hue_identity(rng):
    rgb = rng.integers(0, 256, (4, 5, 6, 3)).astype(np.uint8)
    out = colorspace.augment_hue_np(rgb, 1.0)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2
