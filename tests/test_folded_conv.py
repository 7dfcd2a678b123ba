"""Output-folded conv formulation (ops/folded_conv.py): exact conv
semantics (values AND gradients) vs lax.conv, fold-picker invariants, and
full-generator equivalence with `folded_conv=True` (reference conv
semantics: torch/model.py:183-341 kernel-3/stride-1/pad-1 Conv3d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spsg_tpu.models import Generator, GeneratorConfig
from spsg_tpu.ops.folded_conv import conv3x3_folded, conv_folded, fold_win, pick_fold


def _ref_conv(x, k):
    p = k.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(p, p)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "shape,feat,fold",
    [
        ((2, 6, 8, 12, 5), 7, (2, 4)),
        ((1, 4, 8, 8, 3), 1, (8, 8)),
        ((2, 5, 16, 8, 20), 10, (4, 2)),
        ((1, 3, 4, 4, 4), 4, (1, 2)),
        ((2, 4, 8, 8, 13), 40, (2, 1)),
    ],
)
def test_folded_matches_conv(shape, feat, fold):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape, np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, shape[-1], feat), np.float32))
    ref = _ref_conv(x, k)
    got = conv3x3_folded(x, k, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("fold", [(2, 4), (4, 4), (1, 2)])
def test_folded_5x5x5_matches_conv(fold):
    # the generator's full-res geo_0a/encoder_0a are 5x5x5 stride-1 SAME
    # convs (reference model.py:196, 250) — the worst lane-fill offenders
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 4), np.float32))
    k = jnp.asarray(rng.standard_normal((5, 5, 5, 4, 2), np.float32))
    ref = _ref_conv(x, k)
    got = conv_folded(x, k, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)
    ct = jnp.asarray(rng.standard_normal(ref.shape, np.float32))
    g_ref = jax.grad(lambda x, k: jnp.sum(_ref_conv(x, k) * ct), (0, 1))(x, k)
    g_new = jax.grad(lambda x, k: jnp.sum(conv_folded(x, k, fold) * ct), (0, 1))(x, k)
    for a, b, nm in [(g_ref[0], g_new[0], "dx"), (g_ref[1], g_new[1], "dkernel")]:
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-5, err_msg=nm
        )


def test_folded_rejects_even_kernel():
    x = jnp.zeros((1, 4, 4, 4, 3))
    k = jnp.zeros((4, 4, 4, 3, 4))
    with pytest.raises(ValueError):
        conv_folded(x, k, (2, 2))


def test_folded_gradients_match_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 6), np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 10), np.float32))
    ct = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 10), np.float32))
    g_ref = jax.grad(lambda x, k: jnp.sum(_ref_conv(x, k) * ct), (0, 1))(x, k)
    g_new = jax.grad(lambda x, k: jnp.sum(conv3x3_folded(x, k, (2, 4)) * ct), (0, 1))(x, k)
    for a, b, nm in [(g_ref[0], g_new[0], "dx"), (g_ref[1], g_new[1], "dkernel")]:
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-5, err_msg=nm
        )


def test_folded_bf16_close_to_conv_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 16, 20), np.float32)).astype(jnp.bfloat16)
    k = (jnp.asarray(rng.standard_normal((3, 3, 3, 20, 20), np.float32)) * 0.1).astype(jnp.bfloat16)
    ref = _ref_conv(x, k).astype(np.float32)
    got = conv3x3_folded(x, k, (2, 2)).astype(np.float32)
    # different accumulation orders in bf16: tolerance, not bit equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.15, rtol=0.05)


def test_pick_fold_invariants():
    # divides the dims, respects the 128-lane budget, never loses to (1,1)
    for ydim, xdim, feat in [(64, 128, 10), (64, 128, 20), (64, 128, 40),
                             (64, 128, 1), (64, 128, 100), (16, 16, 14),
                             (6, 10, 20), (1, 1, 5)]:
        gy, gx = pick_fold(ydim, xdim, feat)
        assert ydim % gy == 0 and xdim % gx == 0
        assert gy * gx * feat <= 128 or (gy, gx) == (1, 1)
        assert fold_win(gy, gx) >= 1.0
    # known picks: the win formula 9*gy*gx/((gy+2)(gx+2)) at the lane budget
    assert pick_fold(64, 128, 100) == (1, 1)   # no fold fits -> plain conv
    assert set(pick_fold(64, 128, 10)) == {2, 4}  # win 3.0
    assert pick_fold(64, 128, 20) == (2, 2)       # win 2.25
    assert pick_fold(64, 128, 1) == (8, 8)        # win 5.76


def test_fold_rejects_nondividing_dims():
    x = jnp.zeros((1, 4, 6, 8, 3))
    k = jnp.zeros((3, 3, 3, 3, 4))
    with pytest.raises(ValueError):
        conv3x3_folded(x, k, (4, 2))


def _init(cfg, dims=(16, 16, 16)):
    gen = Generator(cfg)
    x = jnp.zeros((1,) + dims + (4,))
    m = jnp.zeros((1,) + dims + (1,))
    variables = gen.init(
        jax.random.PRNGKey(0), x, m, pred_color=True, pred_sdf=True,
        pred_semantic=True, train=False,
    )
    return gen, variables


def test_folded_conv_generator_matches_default():
    """folded_conv=True swaps eligible convs for the output-folded matmul.
    Parameter tree identical to the plain path; outputs (train+eval), the
    batch_stats updates, and gradients match to fp tolerance."""
    gen, variables = _init(GeneratorConfig(nf=4))
    gen_f = Generator(GeneratorConfig(nf=4, folded_conv=True))
    vars_f = gen_f.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)),
        jnp.zeros((1, 16, 16, 16, 1)),
        pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
    )
    fa = jax.tree_util.tree_flatten_with_path(variables)
    fb = jax.tree_util.tree_flatten_with_path(vars_f)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        assert la.shape == lb.shape, pa

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((2, 16, 16, 16, 1)) > 0.5).astype(np.float32))
    kw = dict(pred_color=True, pred_sdf=True, pred_semantic=True)

    out_a = gen.apply(variables, x, m, train=False, **kw)
    out_f = gen_f.apply(variables, x, m, train=False, **kw)
    for a, b in zip(out_a, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    out_a, upd_a = gen.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    out_f, upd_f = gen_f.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    for a, b in zip(out_a, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(upd_a)[0],
        jax.tree_util.tree_flatten_with_path(upd_f)[0],
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
    g_f = jax.grad(loss(gen_f))(variables["params"])
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(g_a)[0],
        jax.tree_util.tree_flatten_with_path(g_f)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=5e-4, rtol=5e-3, err_msg=str(pa)
        )
