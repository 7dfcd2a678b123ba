"""Shape and parameter tests for the generator/discriminator (reference
torch/model.py — parameter-count parity is checked against the torch layer
arithmetic)."""

import jax
import jax.numpy as jnp
import numpy as np

from spsg_tpu.models import Discriminator2D, Generator, GeneratorConfig
from spsg_tpu.models.discriminator import num_disc_layers
from spsg_tpu.models.generator import count_params


def _init(cfg, dims=(16, 16, 16)):
    gen = Generator(cfg)
    x = jnp.zeros((1,) + dims + (4,))
    m = jnp.zeros((1,) + dims + (1,))
    variables = gen.init(
        jax.random.PRNGKey(0), x, m, pred_color=True, pred_sdf=True, pred_semantic=True,
        train=False,
    )
    return gen, variables


def test_generator_shapes():
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    x = jnp.zeros((2, 16, 16, 16, 4))
    m = jnp.zeros((2, 16, 16, 16, 1))
    occ, sdf, color, sem = gen.apply(
        variables, x, m, pred_color=True, pred_sdf=True, pred_semantic=True, train=False
    )
    assert occ.shape == (2, 16, 16, 16, 1)
    assert sdf.shape == (2, 16, 16, 16, 1)
    assert color.shape == (2, 16, 16, 16, 3)
    assert sem.shape == (2, 16, 16, 16, 14)
    assert np.abs(np.asarray(color)).max() <= 1.0


def test_generator_geo_only_skips_color_branch():
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    x = jnp.zeros((1, 16, 16, 16, 4))
    m = jnp.zeros((1, 16, 16, 16, 1))
    occ, sdf, color, sem = gen.apply(
        variables, x, m, pred_color=False, pred_sdf=True, pred_semantic=False, train=False
    )
    assert color is None and sem is None


def test_generator_fully_convolutional():
    """Weights trained at chunk size must apply to any multiple-of-4 volume
    (replaces the reference's update_sizes, model.py:342)."""
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg, dims=(16, 16, 16))
    x = jnp.zeros((1, 32, 24, 20, 4))
    m = jnp.zeros((1, 32, 24, 20, 1))
    occ, sdf, _, _ = gen.apply(
        variables, x, m, pred_color=False, pred_sdf=True, train=False
    )
    assert occ.shape == (1, 32, 24, 20, 1)


def test_generator_param_count_matches_reference_arithmetic():
    """Parameter count of the geo branch with nf=20, computed from the torch
    layer shapes (model.py:194-242): conv kernels are identical, so counts
    must match exactly (conv weights + biases + BN scale/shift)."""
    nf = 20

    def conv(cin, cout, k):
        return cin * cout * k[0] * k[1] * k[2] + cout

    def bn(c):
        return 2 * c

    expect = 0
    # geo_0
    expect += conv(1, nf // 2, (5, 5, 5)) + bn(nf // 2)
    expect += conv(nf // 2, nf, (4, 4, 4)) + bn(nf)
    expect += conv(nf, nf, (3, 3, 3)) + bn(nf)
    # geo_1
    expect += conv(nf, 2 * nf, (4, 4, 4)) + bn(2 * nf)
    expect += conv(2 * nf, 2 * nf, (3, 3, 3)) + bn(2 * nf)
    expect += conv(2 * nf, 2 * nf, (3, 3, 3)) + bn(2 * nf)
    expect += conv(2 * nf, 2 * nf, (3, 3, 3)) + bn(2 * nf)
    # geo_2
    expect += conv(2 * nf, nf, (3, 3, 3)) + bn(nf)
    expect += conv(nf, nf, (3, 3, 3)) + bn(nf)
    # geo_occ
    expect += conv(nf, nf // 2, (3, 3, 3)) + bn(nf // 2)
    expect += conv(nf // 2, 1, (3, 3, 3))
    # geo_3
    expect += conv(nf, nf // 2, (3, 3, 3)) + bn(nf // 2)
    expect += conv(nf // 2, nf // 2, (3, 3, 3)) + bn(nf // 2)
    expect += conv(nf // 2, 1, (3, 3, 3))

    gen, variables = _init(GeneratorConfig(nf=nf))
    geo_names = ("geo_0", "geo_1", "geo_2", "geo_occ", "geo_3")
    total = 0
    for name, tree in variables["params"].items():
        if name.startswith(geo_names):
            total += count_params(tree)
    # BN scale/bias live in params; running stats live in batch_stats
    for name, tree in variables["batch_stats"].items():
        pass  # running stats are not parameters in torch's count
    assert total == expect


def test_discriminator_shapes():
    disc = Discriminator2D(nf_in=12, nf=8, patch_size=96, image_dims=(256, 320))
    assert num_disc_layers(96, (256, 320), True) == 5
    x = jnp.zeros((2, 256, 320, 12))
    variables = disc.init(jax.random.PRNGKey(0), x, update_sn_stats=False)
    out = disc.apply(variables, x, update_sn_stats=False)
    assert out.shape == (2, 8, 10, 1)  # 256/2^5, 320/2^5
    valid = disc.compute_valids(jnp.ones((2, 256, 320, 1)))
    assert valid.shape == (2, 8, 10, 1)


def test_remat_matches_plain():
    """remat=True must be numerically identical in forward and keep grads
    finite (it only changes what the backward rematerializes)."""
    import jax.numpy as _jnp

    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    gen_r = Generator(GeneratorConfig(nf=4, remat=True))
    x = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (1, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.zeros((1, 16, 16, 16, 1))
    out_a = gen.apply(variables, x, m, pred_color=True, pred_sdf=True, pred_semantic=True, train=False)
    out_b = gen_r.apply(variables, x, m, pred_color=True, pred_sdf=True, pred_semantic=True, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(p):
        occ, sdf, col, sem = gen_r.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x, m,
            pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
        )
        return _jnp.mean(occ**2) + _jnp.mean(sdf**2) + _jnp.mean(col**2)

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_channels_first_matches_channels_last():
    """channels_first=True must produce the same outputs from the same
    parameters (it only changes the compute layout: NCDHW convs, BN axis=1,
    transposes at entry/exit — tools/layout_probe.py for the why), in both
    eval and train mode including the BN batch-stats updates."""
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    gen_cf = Generator(GeneratorConfig(nf=4, channels_first=True))
    # identical init: parameter trees must match exactly
    vars_cf = gen_cf.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)),
        jnp.zeros((1, 16, 16, 16, 1)),
        pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
    )
    fa = jax.tree_util.tree_flatten_with_path(variables)
    fb = jax.tree_util.tree_flatten_with_path(vars_cf)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(pa))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((2, 16, 16, 16, 1)) > 0.5).astype(np.float32))
    out_a = gen.apply(variables, x, m, pred_color=True, pred_sdf=True,
                      pred_semantic=True, train=False)
    out_b = gen_cf.apply(variables, x, m, pred_color=True, pred_sdf=True,
                         pred_semantic=True, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # train mode: outputs + updated batch stats agree
    out_a, mut_a = gen.apply(
        variables, x, m, pred_color=True, pred_sdf=True, pred_semantic=True,
        train=True, mutable=["batch_stats"],
    )
    out_b, mut_b = gen_cf.apply(
        variables, x, m, pred_color=True, pred_sdf=True, pred_semantic=True,
        train=True, mutable=["batch_stats"],
    )
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    sa = jax.tree_util.tree_flatten_with_path(mut_a)
    sb = jax.tree_util.tree_flatten_with_path(mut_b)
    assert [p for p, _ in sa[0]] == [p for p, _ in sb[0]]
    for (pa, la), (_, lb) in zip(sa[0], sb[0]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5,
                                   err_msg=str(pa))


def test_pallas_conv_generator_matches_default():
    """pallas_conv=True routes eligible 3x3x3 convs through the Pallas
    im2col kernel (interpreter mode on CPU) with identical parameters; the
    outputs must match the lax-conv path, and gradients must stay finite."""
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    gen_p = Generator(GeneratorConfig(nf=4, pallas_conv=True))
    vars_p = gen_p.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 4)),
        jnp.zeros((1, 16, 16, 16, 1)),
        pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
    )
    fa = jax.tree_util.tree_flatten_with_path(variables)
    fb = jax.tree_util.tree_flatten_with_path(vars_p)
    assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
    for (pa, la), (_, lb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(pa))

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-3, 3, (1, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.5).astype(np.float32))
    out_a = gen.apply(variables, x, m, pred_color=True, pred_sdf=True,
                      pred_semantic=True, train=False)
    out_b = gen_p.apply(variables, x, m, pred_color=True, pred_sdf=True,
                        pred_semantic=True, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    def loss(p):
        occ, sdf, col, sem = gen_p.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x, m,
            pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
        )
        return jnp.mean(occ**2) + jnp.mean(sdf**2) + jnp.mean(col**2)

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_alt_conv_paths_bf16_head_precision():
    """Under compute_dtype='bfloat16' the output heads pass no dtype and must
    compute in f32 (nn.Conv's dtype=None promotion) in EVERY conv path —
    pallas_conv and channels_first included. Outputs must agree with the
    default path within bf16 body noise (a bf16-demoted head would diverge
    far more on the final 1-channel convs)."""
    cfg_ref = GeneratorConfig(nf=4, dtype="bfloat16")
    gen_ref, variables = _init(cfg_ref)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-3, 3, (1, 16, 16, 16, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.5).astype(np.float32))
    out_ref = gen_ref.apply(variables, x, m, pred_color=True, pred_sdf=True,
                            pred_semantic=True, train=False)
    for alt in (GeneratorConfig(nf=4, dtype="bfloat16", pallas_conv=True),
                GeneratorConfig(nf=4, dtype="bfloat16", channels_first=True)):
        gen_alt = Generator(alt)
        out_alt = gen_alt.apply(variables, x, m, pred_color=True, pred_sdf=True,
                                pred_semantic=True, train=False)
        for a, b in zip(out_ref, out_alt):
            assert b.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.05, rtol=0.05)


def test_fused_conv_generator_matches_default():
    """fused_conv=True fuses bias+LeakyReLU+BN-statistics into the Pallas
    conv kernel for eligible blocks. Parameter AND batch_stats trees must be
    identical to the plain path; outputs (train and eval), the training-mode
    batch_stats updates, and gradients must match to fp tolerance."""
    cfg = GeneratorConfig(nf=4)
    gen, variables = _init(cfg)
    gen_f = Generator(GeneratorConfig(nf=4, fused_conv=True))
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

    # eval mode (running stats)
    out_a = gen.apply(variables, x, m, train=False, **kw)
    out_f = gen_f.apply(variables, x, m, train=False, **kw)
    for a, b in zip(out_a, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # train mode: outputs AND the mutated batch_stats must match
    out_a, upd_a = gen.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    out_f, upd_f = gen_f.apply(variables, x, m, train=True, mutable=["batch_stats"], **kw)
    for a, b in zip(out_a, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(upd_a)[0],
        jax.tree_util.tree_flatten_with_path(upd_f)[0],
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-4, err_msg=str(pa))

    # gradients through the fused custom_vjp vs the plain path
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
