"""Numerical parity: our Flax generator vs the reference PyTorch generator
(torch CPU) with converted weights — same input, matching outputs. This
proves layer-for-layer architecture fidelity (kernels, strides, paddings,
skip wiring, BN statistics use, activation ordering, output clamping)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/torch")


@pytest.fixture(scope="module")
def models():
    import model as ref_model  # reference torch/model.py (imports torch+numpy only)

    import jax
    from spsg_tpu.models import Generator, GeneratorConfig
    from spsg_tpu.models.convert import convert_generator_state_dict

    nf = 4
    tgen = ref_model.Generator(
        nf_in_geo=1, nf_in_color=4, nf=nf, pass_geo_feats=True,
        max_data_size=(16, 16, 16), truncation=3.0,
    )
    tgen.eval()
    # randomize BN running stats so statistic usage is actually exercised
    g = torch.Generator().manual_seed(0)
    for m in tgen.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
    sd = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    variables = convert_generator_state_dict(sd)
    fgen = Generator(GeneratorConfig(nf=nf))
    return tgen, fgen, variables


def _inputs(seed=0, dims=(16, 16, 16)):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3.0, 3.0, size=(2, 1) + dims).astype(np.float32)
    colors = rng.uniform(0, 1, size=(2, 3) + dims).astype(np.float32)
    mask = (rng.random((2, 1) + dims) > 0.5).astype(np.float32)
    xin = np.concatenate([x, colors], axis=1)
    return xin, mask


def test_generator_parity_geo(models):
    tgen, fgen, variables = models
    xin, mask = _inputs()
    with torch.no_grad():
        t_occ, t_sdf, _, _ = tgen(
            torch.from_numpy(xin.copy()), torch.from_numpy(mask.copy()),
            pred_color=False, pred_sdf=[True, True], pred_semantic=False,
        )
    import jax.numpy as jnp

    f_occ, f_sdf, _, _ = fgen.apply(
        variables,
        jnp.asarray(np.transpose(xin, (0, 2, 3, 4, 1))),
        jnp.asarray(np.transpose(mask, (0, 2, 3, 4, 1))),
        pred_color=False, pred_sdf=True, pred_semantic=False, train=False,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_occ), (0, 4, 1, 2, 3)), t_occ.numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_sdf), (0, 4, 1, 2, 3)), t_sdf.numpy(),
        atol=2e-4, rtol=1e-3,
    )


def test_generator_parity_full(models):
    tgen, fgen, variables = models
    xin, mask = _inputs(seed=3)
    with torch.no_grad():
        t_occ, t_sdf, t_color, t_sem = tgen(
            torch.from_numpy(xin.copy()), torch.from_numpy(mask.copy()),
            pred_color=True, pred_sdf=[True, True], pred_semantic=True,
        )
    import jax.numpy as jnp

    f_occ, f_sdf, f_color, f_sem = fgen.apply(
        variables,
        jnp.asarray(np.transpose(xin, (0, 2, 3, 4, 1))),
        jnp.asarray(np.transpose(mask, (0, 2, 3, 4, 1))),
        pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_color), (0, 4, 1, 2, 3)), t_color.numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_sem), (0, 4, 1, 2, 3)), t_sem.numpy(),
        atol=5e-4, rtol=1e-3,
    )


def test_discriminator_parity():
    """Our patch discriminator vs the reference Discriminator2D with the
    spectral-norm *effective* weights transplanted (validates layer count,
    strides, padding, activation placement, final 1x1 conv, output layout —
    model.py:40-104)."""
    import model as ref_model

    import jax.numpy as jnp
    from spsg_tpu.models import Discriminator2D

    H, W, nf_in, nf = 64, 80, 12, 4
    tdisc = ref_model.Discriminator2D(
        nf_in=nf_in, nf=nf, patch_size=24, image_dims=(H, W), patch=True,
        use_bias=True, disc_loss_type="vanilla",
    )
    tdisc.eval()
    x = np.random.default_rng(0).standard_normal((2, nf_in, H, W)).astype(np.float32)
    with torch.no_grad():
        t_out = tdisc(torch.from_numpy(x))  # (B, H', W', 1)
        # effective (already spectral-normalized) conv weights
        params = {}
        for k, m in enumerate(tdisc.discriminator_net):
            w = m.conv2d.weight.detach().numpy()  # (O, I, kh, kw)
            b = m.conv2d.bias.detach().numpy()
            params[f"sn_conv_{k}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": b,
            }
        params["final"] = {
            "kernel": np.transpose(tdisc.final.weight.detach().numpy(), (2, 3, 1, 0)),
            "bias": tdisc.final.bias.detach().numpy(),
        }

    fdisc = Discriminator2D(
        nf_in=nf_in, nf=nf, patch_size=24, image_dims=(H, W), patch=True,
        spectral_norm=False,
    )
    f_out = fdisc.apply(
        {"params": params},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        update_sn_stats=False,
    )
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=2e-4, rtol=1e-3)

    # valid-patch pyramid parity (model.py:82-94)
    valid = np.random.default_rng(1).random((2, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        t_valid = tdisc.compute_valids(torch.from_numpy(valid))
    f_valid = fdisc.compute_valids(jnp.asarray(np.transpose(valid, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.asarray(f_valid)[..., 0], t_valid.numpy()[:, 0], atol=1e-5
    )


def test_discriminator_converter_spectral_parity():
    """convert_discriminator_state_dict: torch legacy spectral_norm state
    (weight_orig/weight_u/weight_v, model.py:19-24) -> flax nn.SpectralNorm.
    Both frameworks run the identical power iteration (v = norm(W^T u);
    u = norm(W v); sigma = u^T W v) from the stored u, so a torch TRAIN-mode
    forward must match our spectral-normalized apply exactly."""
    import model as ref_model

    import jax.numpy as jnp
    from spsg_tpu.models import Discriminator2D
    from spsg_tpu.models.convert import convert_discriminator_state_dict

    H, W, nf_in, nf = 64, 80, 12, 4
    tdisc = ref_model.Discriminator2D(
        nf_in=nf_in, nf=nf, patch_size=24, image_dims=(H, W), patch=True,
        use_bias=True, disc_loss_type="vanilla",
    )
    # convert BEFORE the torch forward: train mode updates u/v in place,
    # and both sides must start the iteration from the same stored u
    sd = {k: v.detach().numpy().copy() for k, v in tdisc.state_dict().items()}
    variables = convert_discriminator_state_dict(sd)

    tdisc.train()
    x = np.random.default_rng(7).standard_normal((2, nf_in, H, W)).astype(np.float32)
    with torch.no_grad():
        t_out = tdisc(torch.from_numpy(x))

    fdisc = Discriminator2D(
        nf_in=nf_in, nf=nf, patch_size=24, image_dims=(H, W), patch=True,
        spectral_norm=True,
    )
    f_out, mutated = fdisc.apply(
        {"params": variables["params"], "spectral_stats": variables["spectral_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        update_sn_stats=True,
        mutable=["spectral_stats"],
    )
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=2e-4, rtol=1e-3)

    # the updated u vectors must also agree (training continues identically)
    for k, m in enumerate(tdisc.discriminator_net):
        t_u = m.conv2d.weight_u.detach().numpy()
        f_u = np.asarray(
            mutated["spectral_stats"][f"SpectralNorm_{k}"][f"sn_conv_{k}/kernel/u"]
        )[0]
        np.testing.assert_allclose(f_u, t_u, atol=1e-5, rtol=1e-4)
