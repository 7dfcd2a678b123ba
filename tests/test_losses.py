"""Loss-function unit tests: masked-dense formulations must equal the
reference's boolean-select reductions (torch/loss.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from spsg_tpu.losses import gan, geo, semantic, style, twod


def test_masked_mean_equals_boolean_select(rng):
    x = rng.standard_normal((4, 8, 8)).astype(np.float32)
    m = rng.random((4, 8, 8)) > 0.5
    got = float(geo.masked_mean(jnp.asarray(x), jnp.asarray(m)))
    want = x[m].mean()
    assert np.isclose(got, want, rtol=1e-5)


def test_log_transform():
    x = jnp.asarray([-3.0, -1.0, 0.0, 1.0, 3.0])
    out = np.asarray(geo.apply_log_transform(x))
    want = np.sign(x) * np.log1p(np.abs(x))
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_occ_loss_matches_manual_bce(rng):
    tgt_sdf = rng.standard_normal((2, 8, 8, 8)).astype(np.float32) * 4
    logits = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    known = rng.random((2, 8, 8, 8)) > 0.3
    w = np.abs(rng.standard_normal((2, 8, 8, 8))).astype(np.float32)
    got = float(
        geo.occ_loss(jnp.asarray(tgt_sdf), jnp.asarray(logits), jnp.asarray(known), jnp.asarray(w), 3.0)
    )
    # manual: bce with weight over known-selected elements
    t = (np.abs(tgt_sdf) < 3.0).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    bce = -(t * np.log(p + 1e-12) + (1 - t) * np.log(1 - p + 1e-12))
    want = (bce * w)[known].mean()
    assert np.isclose(got, want, rtol=1e-3)


def test_geo_weights():
    tgt = jnp.asarray(np.array([[[[0.5, 2.5, 3.0]]]], np.float32))
    input_occ = jnp.asarray(np.array([[[[True, False, False]]]]))
    w = np.asarray(geo.dense_geo_weights(tgt, input_occ, 3.0, 1.0, 5.0))
    assert w[0, 0, 0, 0] == 1.0  # surface but present in input
    assert w[0, 0, 0, 1] == 5.0  # surface, missing from input
    assert w[0, 0, 0, 2] == 1.0  # not surface


def test_occ_iou_empty_union():
    tgt = jnp.full((1, 4, 4, 4), 10.0)
    logits = jnp.full((1, 4, 4, 4), -10.0)
    assert float(geo.occ_iou(tgt, logits, None, 3.0)) == -1.0


def test_weighted_cross_entropy_matches_torch_semantics(rng):
    """torch F.cross_entropy(weight=w) normalizes by the sum of selected
    class weights."""
    logits = rng.standard_normal((50, 14)).astype(np.float32)
    labels = rng.integers(0, 14, 50)
    mask = rng.random(50) > 0.4
    w = rng.random(14).astype(np.float32) + 0.1
    got = float(
        semantic.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(w)
        )
    )
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ce = -lp[np.arange(50), labels]
    sel = mask
    want = (w[labels] * ce)[sel].sum() / w[labels][sel].sum()
    assert np.isclose(got, want, rtol=1e-4)


def test_depth_color_l1(rng):
    d = rng.random((1, 8, 8)).astype(np.float32) * 5
    d_pred = d / 0.02 + 1.0  # voxel units, off by 0.02m after scaling
    d_pred[0, 0, 0] = -np.inf
    img = d.copy()
    img[0, 1, 1] = 0.0  # hole
    loss = float(twod.depth_l1_loss(jnp.asarray(d_pred), jnp.asarray(img), 0.02))
    assert np.isclose(loss, 0.02, rtol=1e-4)

    c_pred = rng.random((1, 8, 8, 3)).astype(np.float32)
    c_tgt = c_pred + 0.25
    c_pred2 = c_pred.copy()
    c_pred2[0, 0, 0] = -np.inf
    loss_c = float(twod.color_l1_loss(jnp.asarray(c_pred2), jnp.asarray(c_tgt)))
    assert np.isclose(loss_c, 0.25, rtol=1e-4)


def test_filter_proj_target_lab():
    c = np.full((1, 4, 4, 3), 0.5, np.float32)
    c[..., 0] = 0.001  # near-black lab
    invalid = np.asarray(twod.filter_proj_target(jnp.asarray(c), 15, "lab"))
    assert invalid.all()
    c[..., 0] = 0.4
    invalid = np.asarray(twod.filter_proj_target(jnp.asarray(c), 15, "lab"))
    assert not invalid.any()


def test_gan_losses(rng):
    d_real = jnp.asarray(rng.standard_normal((2, 4, 5, 1)).astype(np.float32))
    d_fake = jnp.asarray(rng.standard_normal((2, 4, 5, 1)).astype(np.float32))
    valid = jnp.asarray(rng.random((2, 4, 5)) > 0.3)
    for lt in ("vanilla", "hinge", "wgan"):
        r, f = gan.discriminator_loss(lt, d_real, d_fake, valid)
        assert np.isfinite(float(r)) and np.isfinite(float(f))
        g = gan.generator_loss(lt, d_fake)
        assert np.isfinite(float(g))


def test_gradient_penalty(rng):
    def disc(x):
        return jnp.sum(x**2, axis=(1, 2, 3), keepdims=True)[..., 0]

    a = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    gp = float(gan.gradient_penalty(disc, a, b, jax.random.PRNGKey(0)))
    assert np.isfinite(gp) and gp >= 0


def test_gram_matrix_shape(rng):
    f = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    g = style.gram_matrix(f)
    assert g.shape == (8, 8)  # (B*C, B*C)
    ls, lc = style.style_content_loss([f], [f * 1.1], True, True)
    assert float(lc) > 0 and float(ls) > 0


def test_missing_geo_mask():
    input_occ = jnp.zeros((1, 16, 16, 16), bool)
    input_occ = input_occ.at[:, :8].set(True)
    tgt = jnp.zeros((1, 16, 16, 16))
    m = np.asarray(geo.missing_geo_mask(input_occ, tgt, 3.0))
    assert not m[0, :8].any()  # input geometry present -> not missing
    assert m[0, 8:].all()  # target surface with no input -> missing
