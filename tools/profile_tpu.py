"""TPU component profiler — quick triage of where the train step spends time.

Run on real TPU hardware (ONE process at a time; see CLAUDE.md for the relay
rules). Timings force host transfers and feed fresh inputs each call —
``block_until_ready`` is unreliable on the axon backend.

  python tools/profile_tpu.py            # component timings
  python tools/profile_tpu.py --march    # march block-size / mode sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def timed(name, fn, fresh_args, n=10):
    import jax

    out = fn(*fresh_args())
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*fresh_args())
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.1f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--march", action="store_true", help="march sweep only")
    p.add_argument("--batch_size", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from spsg_tpu.data import synthetic
    from spsg_tpu.ops import depth as depth_ops
    from spsg_tpu.ops import normals3d
    from spsg_tpu.ops import raycast as rcm
    from spsg_tpu.training import StepFlags, TrainConfig
    from spsg_tpu.training.state import init_states
    from spsg_tpu.training.step import Trainer, _raycast_cfg

    dims = (128, 64, 64)
    cfg = TrainConfig(input_dim=dims, batch_size=args.batch_size, max_depth_fill_iters=0)
    print(f"[profile] building batch B={args.batch_size}", file=sys.stderr)
    batch = synthetic.make_chunk_batch(
        batch_size=args.batch_size, dims=dims, image_dims=(320, 256), seed=0,
        with_frames=True, truncation=3.0,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "name"}
    batch["weight_occ"] = jnp.ones(())
    rc0 = _raycast_cfg(cfg)
    tgt0 = jnp.clip(batch["target_sdf"], -3, 3)
    valid = jnp.abs(batch["target_sdf"]) < 3
    view = batch["images_view"]
    intr = batch["images_intrinsic"]

    def fresh_tgt():
        return (tgt0 + 0.0,)

    if args.march:
        # plain march (no skipping) at a few fine-block sizes, then the
        # conservative coarse-skip march over (fine block, hops, block size)
        for blk in (16, 32, 64):
            rcc = dataclasses.replace(rc0, coarse_skip=False, march_block=blk)
            f = jax.jit(lambda s, r=rcc: rcm.find_surface_crossings(s, valid, view, intr, r))
            timed(f"march plain F={blk}", f, fresh_tgt)
        for fine in (8, 16, 32):
            for hops in (1, 2, 4):
                for cb in (4, 8):
                    rcc = dataclasses.replace(
                        rc0, coarse_skip=True, march_block=fine,
                        coarse_hops=hops, coarse_block=cb,
                    )
                    f = jax.jit(
                        lambda s, r=rcc: rcm.find_surface_crossings(s, valid, view, intr, r)
                    )
                    o = f(tgt0)
                    hit = float(jnp.mean(o["hit"].astype(jnp.float32)))
                    dt = timed(f"march skip F={fine} hops={hops} cb={cb}", f, fresh_tgt)
                    print(f"  hit frac {hit:.4f}")
        return

    # components
    gen_state, disc_state = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)

    gfwd = jax.jit(
        lambda p, x: trainer.generator.apply(
            {"params": p, "batch_stats": gen_state.batch_stats}, x, batch["mask"],
            pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
        )
    )
    timed("gen fwd (eval)", gfwd, lambda: (gen_state.params, batch["input"] + 0.0))

    f_march = jax.jit(lambda s: rcm.find_surface_crossings(s, valid, view, intr, rc0))
    timed("march", f_march, fresh_tgt)

    nrm = jax.jit(lambda s: normals3d.surface_normals(s, valid))
    timed("surface_normals", nrm, fresh_tgt)

    d2n = jax.jit(lambda d: depth_ops.depth_to_normals(d, intr, 0))
    timed("depth_to_normals", d2n, lambda: (batch["images_depth"] + 0.0,))

    # full train step (donated states -> rebuild each call is wrong; chain)
    flags = StepFlags(pred_sdf=True, pred_color=True, pred_semantic=True,
                      use_2d=True, use_disc=True)
    gs, ds = gen_state, disc_state
    gs, ds, m = trainer.step(gs, ds, batch, jax.random.PRNGKey(0), flags)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        gs, ds, m = trainer.step(gs, ds, batch, jax.random.PRNGKey(i), flags)
        _ = float(m["loss"])  # sync every step
    dt = (time.perf_counter() - t0) / n
    print(f"full step (sync each): {dt * 1000:.1f} ms  "
          f"({args.batch_size / dt:.2f} chunks/s)")


if __name__ == "__main__":
    main()
