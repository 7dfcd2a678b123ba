"""Z-slab conv formulation (ops/zslab_conv.py): exact conv semantics
(values AND gradients) vs lax.conv across the generator's full layer zoo
(reference torch/model.py:183-341: 5x5x5 pad-2, 4x4x4 stride-2 pad-1,
3x3x3 pad-1, dilated 3x3x3), and full-generator equivalence with
`zslab_conv=True`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spsg_tpu.models import Generator, GeneratorConfig
from spsg_tpu.ops.zslab_conv import conv3d_zslab


def _ref_conv(x, k, strides=(1, 1, 1), padding=(1, 1, 1), dilation=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x, k, strides, [(p, p) for p in padding],
        rhs_dilation=dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


# every (kernel, stride, pad, dilation) combination the generator uses,
# plus anisotropic odds and ends the formulation must not special-case
_CASES = [
    # shape,                 kshape,             stride,    pad,       dil
    ((2, 6, 8, 12, 5), (3, 3, 3, 5, 7), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    ((1, 8, 8, 8, 4), (5, 5, 5, 4, 2), (1, 1, 1), (2, 2, 2), (1, 1, 1)),
    ((2, 8, 8, 12, 3), (4, 4, 4, 3, 6), (2, 2, 2), (1, 1, 1), (1, 1, 1)),
    ((1, 10, 10, 10, 4), (3, 3, 3, 4, 4), (1, 1, 1), (2, 2, 2), (2, 2, 2)),
    ((1, 9, 7, 11, 2), (3, 3, 3, 2, 5), (2, 1, 2), (1, 2, 0), (1, 2, 1)),
    ((2, 6, 6, 6, 8), (1, 1, 1, 8, 3), (1, 1, 1), (0, 0, 0), (1, 1, 1)),
    ((1, 7, 8, 8, 3), (2, 3, 4, 3, 4), (1, 2, 2), (1, 1, 1), (1, 1, 1)),
]


@pytest.mark.parametrize("shape,kshape,stride,pad,dil", _CASES)
def test_zslab_matches_conv(shape, kshape, stride, pad, dil):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape, np.float32))
    k = jnp.asarray(rng.standard_normal(kshape, np.float32))
    ref = _ref_conv(x, k, stride, pad, dil)
    got = conv3d_zslab(x, k, stride, pad, dil)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize(
    "shape,kshape,stride,pad,dil",
    [_CASES[0], _CASES[1], _CASES[2], _CASES[3]],
)
def test_zslab_gradients_match_conv(shape, kshape, stride, pad, dil):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape, np.float32))
    k = jnp.asarray(rng.standard_normal(kshape, np.float32))
    ct = jnp.asarray(
        rng.standard_normal(_ref_conv(x, k, stride, pad, dil).shape, np.float32)
    )
    g_ref = jax.grad(
        lambda x, k: jnp.sum(_ref_conv(x, k, stride, pad, dil) * ct), (0, 1)
    )(x, k)
    g_new = jax.grad(
        lambda x, k: jnp.sum(conv3d_zslab(x, k, stride, pad, dil) * ct), (0, 1)
    )(x, k)
    for a, b, nm in [(g_ref[0], g_new[0], "dx"), (g_ref[1], g_new[1], "dkernel")]:
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-5, err_msg=nm
        )


def test_zslab_rejects_channel_mismatch():
    with pytest.raises(ValueError):
        conv3d_zslab(jnp.zeros((1, 4, 4, 4, 3)), jnp.zeros((3, 3, 3, 2, 4)))


def test_zslab_bf16_close_to_conv_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, 20), np.float32)).astype(jnp.bfloat16)
    k = (jnp.asarray(rng.standard_normal((3, 3, 3, 20, 20), np.float32)) * 0.1).astype(jnp.bfloat16)
    ref = _ref_conv(x, k).astype(np.float32)
    got = conv3d_zslab(x, k).astype(np.float32)
    # different accumulation orders in bf16: tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15, rtol=0.05)


def test_zslab_conv_generator_matches_default():
    """zslab_conv=True swaps EVERY conv (5x5x5, strided 4x4x4, dilated and
    plain 3x3x3) for the z-slab rank-4 form. Parameter tree identical;
    outputs (train+eval), batch_stats updates, and gradients match."""
    gen = Generator(GeneratorConfig(nf=4))
    gen_z = Generator(GeneratorConfig(nf=4, zslab_conv=True))
    x0 = jnp.zeros((1, 16, 16, 16, 4))
    m0 = jnp.zeros((1, 16, 16, 16, 1))
    kw = dict(pred_color=True, pred_sdf=True, pred_semantic=True)
    variables = gen.init(jax.random.PRNGKey(0), x0, m0, train=False, **kw)
    vars_z = gen_z.init(jax.random.PRNGKey(0), x0, m0, train=False, **kw)
    fa = jax.tree_util.tree_flatten_with_path(variables)
    fb = jax.tree_util.tree_flatten_with_path(vars_z)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        assert la.shape == lb.shape, pa

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((2, 16, 16, 16, 1)) > 0.5).astype(np.float32))

    out_a = gen.apply(variables, x, m, train=False, **kw)
    out_z = gen_z.apply(variables, x, m, train=False, **kw)
    for a, b in zip(out_a, out_z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    out_a, upd_a = gen.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    out_z, upd_z = gen_z.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    for a, b in zip(out_a, out_z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(upd_a)[0],
        jax.tree_util.tree_flatten_with_path(upd_z)[0],
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-4, err_msg=str(pa))

    def loss(g_mod):
        def f(p):
            occ, sdf, col, sem = g_mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]}, x, m,
                train=True, mutable=["batch_stats"], **kw,
            )[0]
            return jnp.mean(occ**2) + jnp.mean(sdf**2) + jnp.mean(col**2) + jnp.mean(sem**2)
        return f

    g_a = jax.grad(loss(gen))(variables["params"])
    g_z = jax.grad(loss(gen_z))(variables["params"])
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(g_a)[0],
        jax.tree_util.tree_flatten_with_path(g_z)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=5e-4, rtol=5e-3, err_msg=str(pa)
        )
