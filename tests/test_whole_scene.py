"""Spatially-sharded single-shot whole-scene inference: sharded output must
equal the unsharded forward (GSPMD conv halo exchange correctness)."""

import jax
import numpy as np

from spsg_tpu.data import pipeline, synthetic
from spsg_tpu.inference import whole_scene
from spsg_tpu.parallel import make_mesh
from spsg_tpu.training import TrainConfig
from spsg_tpu.training.state import init_states, make_generator


def test_spatially_sharded_matches_single_device():
    cfg = TrainConfig(input_dim=(16, 16, 16), nf_gen=4, weight_disc_loss=0.0)
    gen = make_generator(cfg)
    gs, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
    variables = {"params": gs.params, "batch_stats": gs.batch_stats}
    scene = synthetic.make_scene(dims=(16, 64, 48), seed=11)
    sample = pipeline.assemble_sample(
        scene.sdf_input, scene.sdf_complete, scene.input_colors, scene.colors,
        scene.semantics, scene.known, scene.world2grid, 3.0, "lab", None,
    )

    occ1, sdf1, col1, sem1 = whole_scene.run_whole_scene(
        gen, variables, sample["input"], sample["mask"], max_height=16
    )
    mesh = make_mesh(jax.devices()[:4])
    occ4, sdf4, col4, sem4 = whole_scene.run_whole_scene(
        gen, variables, sample["input"], sample["mask"], max_height=16, mesh=mesh
    )
    assert occ1.shape == occ4.shape == (16, 64, 48)
    np.testing.assert_allclose(occ4, occ1, atol=2e-4)
    np.testing.assert_allclose(sdf4, sdf1, atol=2e-4)
    np.testing.assert_allclose(col4, col1, atol=2e-4)
    np.testing.assert_allclose(sem4, sem1, atol=2e-4)
