"""Whole-scene inference sweep in ONE process (relay-friendly): times
run_chunked_inference over window_batch x dtype combinations on a synthetic
128x256x320 scene and prints one JSON line per combo plus a final best line.

  python tools/scene_sweep.py --window_batches 8 16 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--window_batches", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--dtypes", nargs="+", default=["bf16", "f32"])
    p.add_argument("--stride", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from spsg_tpu.data import pipeline, synthetic
    from spsg_tpu.inference import chunked
    from spsg_tpu.training import TrainConfig
    from spsg_tpu.training.state import init_states, make_generator

    scene = synthetic.make_scene(dims=(128, 256, 320), seed=1)
    sample = pipeline.assemble_sample(
        scene.sdf_input, scene.sdf_complete, scene.input_colors, scene.colors,
        scene.semantics, scene.known, scene.world2grid, 3.0, "lab", None,
    )
    rows = []
    for dt in args.dtypes:
        cfg = TrainConfig(
            weight_disc_loss=0.0,
            compute_dtype="bfloat16" if dt == "bf16" else None,
        )
        gen = make_generator(cfg)
        gs, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
        variables = {"params": gs.params, "batch_stats": gs.batch_stats}
        for wb in args.window_batches:
          for scan in (False, True):
            kwargs = dict(
                truncation=3.0, chunk_dims=(128, 64, 64), stride=args.stride,
                window_batch=wb, pred_color=True, pred_semantic=True,
                scan_windows=scan,
            )
            try:
                chunked.run_chunked_inference(  # compile + warmup
                    gen, variables, sample["input"], sample["mask"],
                    None, None, None, **kwargs,
                )
                t0 = time.perf_counter()
                out = chunked.run_chunked_inference(
                    gen, variables, sample["input"], sample["mask"],
                    None, None, None, **kwargs,
                )
                np.asarray(out.sdf)  # host-transfer fence
                dtsec = time.perf_counter() - t0
                row = {
                    "dtype": dt, "window_batch": wb, "scan": scan,
                    "seconds": round(dtsec, 2),
                    "voxels_per_sec": round(int(np.prod(out.sdf.shape)) / dtsec, 1),
                }
            except Exception as e:
                row = {"dtype": dt, "window_batch": wb, "scan": scan,
                       "error": str(e)[:200]}
            rows.append(row)
            print(json.dumps(row), flush=True)
    ok = [r for r in rows if "voxels_per_sec" in r]
    if ok:
        print(json.dumps({"best": max(ok, key=lambda r: r["voxels_per_sec"])}),
              flush=True)


if __name__ == "__main__":
    main()
