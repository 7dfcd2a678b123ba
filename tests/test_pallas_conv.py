"""Pallas im2col conv kernels (ops/pallas_conv.py): forward/backward vs
lax.conv_general_dilated, the fused conv+bias+LeakyReLU+BN-stats variant,
and VMEM Y-striping (large-channel layers must tile the patch matrix)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spsg_tpu.ops import pallas_conv as pc


def _ref(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b
    return y


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5, 6)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((6,)) * 0.1, jnp.float32)
    return x, w, b


def test_conv3x3_fwd_and_grads(data):
    x, w, _ = data
    np.testing.assert_allclose(
        np.asarray(pc.conv3x3(x, w)), np.asarray(_ref(x, w)), atol=2e-5
    )
    loss = lambda f: (lambda x, w: jnp.sum(jnp.sin(f(x, w))))
    g1 = jax.grad(loss(pc.conv3x3), argnums=(0, 1))(x, w)
    g2 = jax.grad(loss(_ref), argnums=(0, 1))(x, w)
    for a, b_, n in zip(g1, g2, "xw"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, err_msg=n)


def test_fused_act_stats_matches_composition(data):
    x, w, b = data

    def ref(x, w, b):
        y = _ref(x, w, b)
        y = jnp.where(y > 0, y, 0.2 * y)
        return y, jnp.sum(y, axis=(0, 1, 2, 3)), jnp.sum(y * y, axis=(0, 1, 2, 3))

    outs = pc.conv3x3_act_stats(x, w, b)
    refs = ref(x, w, b)
    for a, r, n in zip(outs, refs, ("y", "s", "ss")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-3, err_msg=n)

    def loss(f):
        def L(x, w, b):
            y, s, ss = f(x, w, b)
            return jnp.sum(jnp.sin(y)) + jnp.sum(s * 0.3) + jnp.sum(jnp.sqrt(ss + 1.0))
        return L

    g1 = jax.grad(loss(pc.conv3x3_act_stats), argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss(ref), argnums=(0, 1, 2))(x, w, b)
    for a, r, n in zip(g1, g2, "xwb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4, err_msg=n)


def test_y_striping_forced(data, monkeypatch):
    """A tiny VMEM budget forces ystrip < Y (the real-shape C_in=80 case);
    strips must reproduce the unstripped results exactly."""
    x, w, b = data
    ys_full = pc._pick_ystrip(8, 8, 5, 6, 4)
    assert ys_full == 8  # small shapes fit unstripped
    y0, s0, ss0 = (np.asarray(a) for a in pc.conv3x3_act_stats(x, w, b))
    d0 = np.asarray(pc.conv3x3(x, w))
    monkeypatch.setattr(pc, "_VMEM_BUDGET", 40_000)
    assert pc._pick_ystrip(8, 8, 5, 6, 4) < 8
    y1, s1, ss1 = (np.asarray(a) for a in pc.conv3x3_act_stats(x, w, b))
    d1 = np.asarray(pc.conv3x3(x, w))
    np.testing.assert_allclose(y1, y0, atol=1e-5)
    np.testing.assert_allclose(s1, s0, rtol=1e-4)
    np.testing.assert_allclose(ss1, ss0, rtol=1e-4)
    np.testing.assert_allclose(d1, d0, atol=1e-5)
    # dw under striping (grid accumulation across Y strips)
    dw = np.asarray(pc._conv3x3_dw_impl(x, jnp.ones_like(_ref(x, w)), True))
    monkeypatch.undo()
    dw0 = np.asarray(pc._conv3x3_dw_impl(x, jnp.ones_like(_ref(x, w)), True))
    np.testing.assert_allclose(dw, dw0, rtol=2e-4)


def test_real_shape_layers_fit_vmem():
    """Every eligible generator conv at the flagship operating point must
    pick a strip whose footprint fits the budget — incl. the C_in=80
    decoder_3a layer that motivated striping."""
    for (Y, X, C, Cout) in [(64, 64, 20, 20), (64, 64, 80, 40), (64, 64, 40, 40),
                            (32, 32, 100, 100), (64, 64, 24, 20)]:
        for itemsize in (2, 4):
            ys = pc._pick_ystrip(Y, X, C, Cout, itemsize)
            slab = 3 * (ys + 2) * (X + 2) * C * itemsize
            patches = ys * X * 27 * C * itemsize
            assert slab + patches <= pc._VMEM_BUDGET, (Y, X, C, Cout, itemsize, ys)
