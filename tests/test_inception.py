"""Inception-v3 extractor (reference metrics.py:45-53 torchvision
inception_v3): architecture table, torchvision-format .pth conversion,
forward shapes. Pretrained-parity can't be tested in this image (no
torchvision / no weights); the converter is validated on a FABRICATED
torchvision-shaped state_dict, like the VGG19 path."""

import numpy as np
import pytest

from spsg_tpu.models.inception import (
    NUM_CLASSES,
    POOL_DIM,
    convert_inception_state_dict,
    fabricate_state_dict,
    inception_v3,
    load_inception,
    preprocess,
)


def test_inception_forward_shapes():
    import jax
    import jax.numpy as jnp

    params = convert_inception_state_dict(fabricate_state_dict())
    x = jnp.asarray(np.random.default_rng(0).random((1, 299, 299, 3)), jnp.float32)
    pool, logits = jax.jit(inception_v3)(params, x)
    assert pool.shape == (1, POOL_DIM)
    assert logits.shape == (1, NUM_CLASSES)
    assert np.isfinite(np.asarray(pool)).all()
    assert np.isfinite(np.asarray(logits)).all()


def test_inception_preprocess():
    import jax.numpy as jnp

    x = jnp.ones((2, 64, 80, 3)) * 0.5
    y = preprocess(x)
    assert y.shape == (2, 299, 299, 3)
    # 0.5 gray maps to (0.5 - mean)/std
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]), (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        atol=1e-5,
    )


def test_inception_pth_load(tmp_path):
    """load_inception consumes a torchvision-format .pth exactly like the
    reference's --inception_v3_path (metrics.py:45-50)."""
    torch = pytest.importorskip("torch")

    sd = fabricate_state_dict(7)
    # torchvision checkpoints also carry the train-only aux head — must be
    # ignored by the converter
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    p = str(tmp_path / "inception_v3.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, p)
    params = load_inception(p)
    direct = convert_inception_state_dict(sd)
    for name in ("Conv2d_1a_3x3", "Mixed_7c.branch_pool", "fc"):
        for k in params[name]:
            np.testing.assert_array_equal(params[name][k], direct[name][k])


def test_converter_rejects_wrong_shapes():
    sd = fabricate_state_dict()
    sd["Mixed_5b.branch1x1.conv.weight"] = np.zeros((65, 192, 1, 1), np.float32)
    with pytest.raises(ValueError, match="Mixed_5b.branch1x1"):
        convert_inception_state_dict(sd)
