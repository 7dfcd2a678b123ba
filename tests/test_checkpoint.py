"""Checkpoint/resume tests (reference torch.save/--retrain semantics,
train.py:165-174, 1316-1320 — rebuilt on orbax)."""

import jax
import jax.numpy as jnp
import numpy as np

from spsg_tpu.training import TrainConfig
from spsg_tpu.training.state import init_states, load_checkpoint, save_checkpoint

CFG = TrainConfig(input_dim=(16, 16, 16), nf_gen=4, nf_disc=4,
                  style_width=48, style_height=32, patch_size=16)


def test_checkpoint_roundtrip(tmp_path):
    gen, disc = init_states(CFG, jax.random.PRNGKey(0))
    gen = gen.replace(step=jnp.asarray(123))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, gen, disc, epoch=7)

    gen2, disc2 = init_states(CFG, jax.random.PRNGKey(1))  # different init
    gen2, disc2, epoch = load_checkpoint(path, gen2, disc2)
    assert epoch == 7
    assert int(gen2.step) == 123
    a = jax.tree_util.tree_leaves(gen.params)
    b = jax.tree_util.tree_leaves(gen2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    da = jax.tree_util.tree_leaves(disc.params)
    db = jax.tree_util.tree_leaves(disc2.params)
    for x, y in zip(da, db):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vgg_feature_extractor():
    from spsg_tpu.models.vgg import VGGFeatures, load_vgg_for_style

    model, params = load_vgg_for_style()
    x = jnp.zeros((1, 64, 80, 3))
    feats = model.apply({"params": params}, x)
    assert len(feats) == 1
    # conv_8 output: 2 pools -> H/4, W/4, 256 channels
    assert feats[0].shape == (1, 16, 20, 256)


def test_load_reference_pth_checkpoint(tmp_path):
    """A reference-format .pth checkpoint loads straight into our state
    (torch train.py:781-786 -> models/convert.py)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference/torch")
    import model as ref_model

    from spsg_tpu.training.state import load_any_checkpoint

    tgen = ref_model.Generator(
        nf_in_geo=1, nf_in_color=4, nf=4, pass_geo_feats=True,
        max_data_size=(16, 16, 16), truncation=3.0,
    )
    p = str(tmp_path / "model-iter10-epoch0.pth")
    torch.save({"epoch": 0, "state_dict": tgen.state_dict(), "optimizer": {}}, p)

    cfg2 = TrainConfig(input_dim=(16, 16, 16), nf_gen=4, weight_disc_loss=0.0)
    gen, _ = init_states(cfg2, jax.random.PRNGKey(0), with_disc=False)
    gen2, _, epoch = load_any_checkpoint(p, gen, None)
    w_torch = tgen.geo_0[0].weight.detach().numpy()
    w_flax = np.asarray(gen2.params["geo_0a"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(np.transpose(w_flax, (4, 3, 0, 1, 2)), w_torch, rtol=1e-6)


def test_load_reference_disc_pth_checkpoint(tmp_path):
    """--retrain_disc with a reference-format discriminator .pth
    (torch train.py:171-178, saved :781-786): weight_orig/weight_u convert
    into our params + spectral_stats via load_any_checkpoint."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference/torch")
    import model as ref_model

    from spsg_tpu.training.state import load_any_checkpoint

    tdisc = ref_model.Discriminator2D(
        nf_in=CFG.disc_nf_in, nf=CFG.nf_disc, patch_size=CFG.patch_size,
        image_dims=(CFG.style_height, CFG.style_width), patch=True,
        use_bias=True, disc_loss_type=CFG.disc_loss_type,
    )
    p = str(tmp_path / "disc-iter10-epoch0.pth")
    torch.save({"epoch": 0, "state_dict": tdisc.state_dict(), "optimizer": {}}, p)

    gen, disc = init_states(CFG, jax.random.PRNGKey(0))
    gen2, disc2, _ = load_any_checkpoint(p, gen, disc)
    # generator untouched, disc params replaced with the converted weights
    w_torch = tdisc.discriminator_net[0].conv2d.weight_orig.detach().numpy()
    w_flax = np.asarray(disc2.params["sn_conv_0"]["kernel"])
    np.testing.assert_allclose(np.transpose(w_flax, (3, 2, 0, 1)), w_torch, rtol=1e-6)
    u_torch = tdisc.discriminator_net[0].conv2d.weight_u.detach().numpy()
    u_flax = np.asarray(disc2.spectral_stats["SpectralNorm_0"]["sn_conv_0/kernel/u"])[0]
    np.testing.assert_allclose(u_flax, u_torch, rtol=1e-6)
    assert gen2 is gen
