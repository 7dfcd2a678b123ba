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
