"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel train
step and replicated-parameter consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spsg_tpu.data import synthetic
from spsg_tpu.parallel import make_mesh, replicate_state, shard_batch
from spsg_tpu.training import StepFlags, TrainConfig
from spsg_tpu.training.state import init_states
from spsg_tpu.training.step import Trainer

DIMS = (16, 16, 16)


def test_eight_device_mesh_available():
    assert jax.device_count() >= 8


def test_data_parallel_geo_step():
    n = 8
    mesh = make_mesh(jax.devices()[:n])
    cfg = TrainConfig(
        input_dim=DIMS, nf_gen=4, batch_size=n,
        weight_disc_loss=0.0, weight_depth_loss=0.0,
    )
    gen_state, _ = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    batch = synthetic.make_chunk_batch(batch_size=n, dims=DIMS, seed=5)
    batch.pop("name", None)
    batch["weight_occ"] = np.ones(())
    batch = shard_batch(batch, mesh)
    assert batch["input"].sharding.spec[0] == "data"
    gen_state = replicate_state(gen_state, mesh)
    flags = StepFlags(pred_sdf=True)
    new_state, _, metrics = trainer.step(gen_state, None, batch, jax.random.PRNGKey(1), flags)
    assert np.isfinite(float(metrics["loss"]))
    # parameters stay replicated (identical) across devices
    p = new_state.params["geo_0a"]["Conv_0"]["kernel"]
    assert len(p.sharding.device_set) == n or p.sharding.is_fully_replicated


def test_data_parallel_matches_single_device():
    """The sharded step must produce the same update as the unsharded one
    (GSPMD semantics: global-batch BatchNorm stats + summed gradients)."""
    n = 4
    cfg = TrainConfig(
        input_dim=DIMS, nf_gen=4, batch_size=n,
        weight_disc_loss=0.0, weight_depth_loss=0.0,
    )
    batch_np = synthetic.make_chunk_batch(batch_size=n, dims=DIMS, seed=9)
    batch_np.pop("name", None)
    batch_np["weight_occ"] = np.ones(())
    flags = StepFlags(pred_sdf=True)

    def run(devices):
        mesh = make_mesh(devices)
        gen_state, _ = init_states(cfg, jax.random.PRNGKey(0))
        trainer = Trainer(cfg)
        b = shard_batch(dict(batch_np), mesh)
        s = replicate_state(gen_state, mesh)
        s2, _, m = trainer.step(s, None, b, jax.random.PRNGKey(1), flags)
        return np.asarray(s2.params["geo_0a"]["Conv_0"]["kernel"]), float(m["loss"])

    p1, l1 = run(jax.devices()[:1])
    p4, l4 = run(jax.devices()[:4])
    assert np.isclose(l1, l4, rtol=1e-4)
    np.testing.assert_allclose(p1, p4, rtol=1e-4, atol=1e-6)


def test_sharded_full_step_with_round4_knobs():
    """The round-4/5 perf knobs must compile and run under a data-parallel
    mesh: pair_raycast (stacked 2B march), compact_across_batch (cross-row
    straggler gathers become collectives under GSPMD), march_group (the
    lax.map batch regrouping must tolerate a batch-sharded leading dim),
    fused_conv (the Pallas block, interpret mode on CPU devices), and
    folded_conv (the output-folded matmul; per-shard spatial slicing under
    GSPMD). Finite loss + replicated params."""
    n = 4
    mesh = make_mesh(jax.devices()[:n])
    cfg = TrainConfig(
        input_dim=DIMS, nf_gen=4, nf_disc=4, batch_size=n,
        style_width=48, style_height=32, patch_size=16,
        max_depth_fill_iters=4, min_num_valid_2d=10,
        pair_raycast=True, compact_across_batch=True, fused_conv=True,
        folded_conv=True,  # composes: fused takes act+bn 3x3x3 blocks,
        # folded takes the remaining eligible convs (5x5x5 + bare heads)
        march_group=2,
    )
    gen_state, disc_state = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    batch = synthetic.make_chunk_batch(
        batch_size=n, dims=DIMS, seed=11, with_frames=True,
        image_dims=(cfg.style_width, cfg.style_height),
    )
    batch.pop("name", None)
    batch["weight_occ"] = np.ones(())
    batch = shard_batch(batch, mesh)
    gen_state = replicate_state(gen_state, mesh)
    disc_state = replicate_state(disc_state, mesh)
    flags = StepFlags(
        pred_sdf=True, pred_color=True, pred_semantic=True, use_2d=True, use_disc=True
    )
    g, d, metrics = trainer.step(
        gen_state, disc_state, batch, jax.random.PRNGKey(1), flags
    )
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(g.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_sharded_step_many():
    """step_many (K steps per dispatch) under a data-parallel mesh: the
    scanned GSPMD program must execute and keep params replicated/finite."""
    n = 4
    mesh = make_mesh(jax.devices()[:n])
    cfg = TrainConfig(
        input_dim=DIMS, nf_gen=4, batch_size=n,
        weight_disc_loss=0.0, weight_depth_loss=0.0,
    )
    gen_state, _ = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    K = 2
    batches = []
    for i in range(K):
        b = synthetic.make_chunk_batch(batch_size=n, dims=DIMS, seed=20 + i)
        b.pop("name", None)
        b["weight_occ"] = np.ones(())
        batches.append(shard_batch(b, mesh))
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *batches)
    rngs = jnp.stack([jax.random.PRNGKey(70 + i) for i in range(K)])
    gen_state = replicate_state(gen_state, mesh)
    flags = StepFlags(pred_sdf=True)
    g, _, ms = trainer.step_many(gen_state, None, stacked, rngs, flags)
    assert ms["loss"].shape == (K,)
    assert np.isfinite(np.asarray(ms["loss"])).all()
    assert int(g.step) == K


def test_sharded_full_step_zslab_conv():
    """zslab_conv reshapes activations to (B*Zo, Y, X, kz*C) inside every
    conv — under a batch-sharded mesh the merged leading dim must stay
    data-parallel (B divisible by mesh size keeps the reshape local under
    GSPMD). Full 2D+GAN step on a 4-device mesh: finite loss, finite
    replicated params."""
    n = 4
    mesh = make_mesh(jax.devices()[:n])
    cfg = TrainConfig(
        input_dim=DIMS, nf_gen=4, nf_disc=4, batch_size=n,
        style_width=48, style_height=32, patch_size=16,
        max_depth_fill_iters=4, min_num_valid_2d=10,
        zslab_conv=True,
    )
    gen_state, disc_state = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    batch = synthetic.make_chunk_batch(
        batch_size=n, dims=DIMS, seed=11, with_frames=True,
        image_dims=(cfg.style_width, cfg.style_height),
    )
    batch.pop("name", None)
    batch["weight_occ"] = np.ones(())
    batch = shard_batch(batch, mesh)
    gen_state = replicate_state(gen_state, mesh)
    disc_state = replicate_state(disc_state, mesh)
    flags = StepFlags(
        pred_sdf=True, pred_color=True, pred_semantic=True, use_2d=True, use_disc=True
    )
    g, d, metrics = trainer.step(
        gen_state, disc_state, batch, jax.random.PRNGKey(1), flags
    )
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(g.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
