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
