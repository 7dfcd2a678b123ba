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
import os
import sys
import time

import numpy as np

# allow running as `python tools/profile_tpu.py` from anywhere (PYTHONPATH
# must stay unset — it breaks the axon PJRT plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, fresh_args, n=10):
    """Time fn via a scalar checksum: summing every output leaf on device
    keeps the whole computation live (no DCE) while the host transfer is 4
    bytes — transferring a real output leaf through the axon relay costs
    hundreds of ms for MB-sized arrays and swamps the op being measured."""
    import jax
    import jax.numpy as jnp

    probe = jax.jit(
        lambda *a: sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    _ = np.asarray(probe(*fresh_args()))
    t0 = time.perf_counter()
    for _ in range(n):
        _ = np.asarray(probe(*fresh_args()))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.1f} ms")
    return dt


def bench_pipeline(args):
    """Host input-pipeline throughput (batches/s and chunks/s): is the thread
    pool fast enough to keep the device busy at the measured step speed? Uses
    real chunk files when --data_path is given, otherwise writes a synthetic
    chunk-file dataset to disk so the full decode path (sdf parse, LAB,
    hue augmentation, collate) is exercised."""
    import tempfile
    import time

    from spsg_tpu.data import pipeline as pl
    from spsg_tpu.data import synthetic

    if args.data_path and args.file_list:
        files, _, _ = pl.get_train_files(args.data_path, args.file_list, "", 0)
    else:
        from spsg_tpu.data import formats

        tmp = tempfile.mkdtemp(prefix="spsg_pipe_")
        files = []
        dims = (128, 64, 64)
        for i in range(24):
            b = synthetic.make_chunk_batch(
                batch_size=1, dims=dims, image_dims=(320, 256), seed=i,
                with_frames=False, truncation=3.0,
            )
            for tag, sdf_key, col_key in (
                ("inc", "input", None), ("cmp", "target_sdf", "target_colors"),
            ):
                grid = np.asarray(b[sdf_key])[0]
                if grid.ndim == 4:
                    grid = grid[..., 0]
                m = np.isfinite(grid) & (np.abs(grid) <= 6.0)
                locs = np.argwhere(m).astype(np.int32)
                colors = (
                    np.asarray(b[col_key])[0].astype(np.uint8)
                    if col_key
                    else np.zeros(dims + (3,), np.uint8)
                )
                path = f"{tmp}/synth{i}__{tag}__0.sdf"
                formats.save_sdf(
                    path, dims, 0.02, np.eye(4, dtype=np.float32), locs,
                    grid[m], known=np.zeros(dims, np.uint8), colors=colors,
                )
            files.append(f"{tmp}/synth{i}__inc__0.sdf")
        if args.with_frames:
            # full 2D-loss input path: one 320x256 depth PNG + color JPG +
            # camera txt per chunk (the expensive PIL decodes)
            from spsg_tpu.datagen import scan as scan_mod

            fb = synthetic.make_chunk_batch(
                batch_size=1, dims=dims, image_dims=(320, 256), seed=0,
                with_frames=True, truncation=3.0,
            )
            depth = np.asarray(fb["images_depth"])[0] * 0.02  # voxels -> m
            color = (np.asarray(fb["images_color"])[0].transpose(1, 2, 0) * 255).astype(np.uint8)
            cam = np.eye(4, dtype=np.float32)
            intr = np.asarray(fb["images_intrinsic"])[0]
            for i in range(len(files)):
                scan_mod.export_frame(f"{tmp}/synth{i}", i, depth, color, cam, intr)
                with open(f"{tmp}/synth{i}__cmp__0.txt", "w") as f:
                    f.write(f"{i}\n")
    kw = {}
    if args.with_frames and not args.data_path:
        kw = dict(frame_info_path=tmp, frame_path=tmp, load_depth=True,
                  image_dims=(320, 256))
    ds = pl.ChunkDataset(files, load_semantic=False, **kw)
    n_batches = 0
    n_warm = 2
    t0 = None
    for batch in pl.batch_iterator(
        ds, args.batch_size, shuffle=True, seed=0, num_workers=args.pipeline_workers
    ):
        n_batches += 1
        if n_batches == n_warm:
            t0 = time.perf_counter()
    if t0 is None or n_batches - n_warm <= 0:
        raise SystemExit(
            f"pipeline probe needs > {n_warm} batches to time "
            f"(got {n_batches}; add files or lower --batch_size)"
        )
    dt = time.perf_counter() - t0
    timed_batches = n_batches - n_warm
    print(
        f"pipeline: {timed_batches / dt:.2f} batches/s = "
        f"{timed_batches * args.batch_size / dt:.2f} chunks/s "
        f"(B={args.batch_size}, workers={args.pipeline_workers}, "
        f"{len(ds)} files)"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--march", action="store_true", help="march sweep only")
    p.add_argument("--compact", action="store_true",
                   help="straggler-compaction march rows only")
    p.add_argument("--pipeline", action="store_true", help="host input-pipeline throughput only")
    p.add_argument("--with_frames", action="store_true",
                   help="pipeline probe includes RGB-D frame decode (2D-loss path)")
    p.add_argument("--pipeline_workers", type=int, default=4)
    p.add_argument("--data_path", default="")
    p.add_argument("--file_list", default="")
    p.add_argument("--batch_size", type=int, default=2)
    args = p.parse_args()

    if args.pipeline:
        return bench_pipeline(args)

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

    if args.compact:
        # straggler-compaction rows only (baseline = default skip config)
        f = jax.jit(lambda s: rcm.find_surface_crossings(s, valid, view, intr, rc0))
        timed("march skip (default)", f, fresh_tgt)
        for frac in (0.03, 0.0625, 0.125, 0.25):
            for global_c in (False, True):
                rcc = dataclasses.replace(
                    rc0, straggler_frac=frac, compact_across_batch=global_c
                )
                f = jax.jit(lambda s, r=rcc: rcm.find_surface_crossings(s, valid, view, intr, r))
                tag = "global" if global_c else "row"
                timed(f"march skip+compact frac={frac} ({tag})", f, fresh_tgt)
        return

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
        # straggler compaction on top of the default skip config
        for frac in (0.03, 0.0625, 0.125, 0.25):
            rcc = dataclasses.replace(rc0, straggler_frac=frac)
            f = jax.jit(lambda s, r=rcc: rcm.find_surface_crossings(s, valid, view, intr, r))
            timed(f"march skip+compact frac={frac}", f, fresh_tgt)
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
