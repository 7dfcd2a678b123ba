"""AOT memory analysis of the full train step at a given batch size.

Diagnoses the B=4 full-step OOM (docs/DESIGN.md §5: "B=4 OOMs, pathological
layout padding"): lowers and compiles Trainer._step at the requested batch
size WITHOUT running it, then prints XLA's buffer-assignment summary — peak
HBM, argument/output/temp sizes, and the largest temp buffers — so the
offending allocation can be located instead of guessed at.

Usage (ONE process at a time on the relay-attached TPU):
  python tools/memcheck.py --batch_size 2
  python tools/memcheck.py --batch_size 4 --bf16
  python tools/memcheck.py --batch_size 4 --dump /tmp/hlo_b4   # + HLO dump

The precomp path is exercised with --precomp (matches bench defaults).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--compact_resid", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--precomp", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--mode", choices=["full", "geo"], default="full")
    p.add_argument("--dump", default="", help="xla_dump_to directory for HLO")
    p.add_argument("--cpu", action="store_true", help="analyze on the CPU backend")
    args = p.parse_args()

    if args.dump:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={args.dump}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spsg_tpu.data import synthetic
    from spsg_tpu.training import StepFlags, TrainConfig
    from spsg_tpu.training.state import init_states
    from spsg_tpu.training.step import Trainer

    full = args.mode == "full"
    cfg = TrainConfig(
        batch_size=args.batch_size,
        compute_dtype="bfloat16" if args.bf16 else None,
        remat=args.remat,
        compact_resid=args.compact_resid,
        weight_depth_loss=1.0 if full else 0.0,
        weight_disc_loss=0.5 if full else 0.0,
    )
    batch = synthetic.make_chunk_batch(
        batch_size=cfg.batch_size,
        dims=(128, 64, 64),
        image_dims=(320, 256),
        seed=0,
        with_frames=full,
        truncation=cfg.truncation,
    )
    batch.pop("name", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["weight_occ"] = jnp.ones(())

    gen_state, disc_state = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    flags = StepFlags(
        pred_sdf=True, pred_color=True,
        pred_semantic=cfg.weight_semantic_loss > 0,
        use_2d=full, use_disc=full,
    )
    precomp = None
    if full and args.precomp:
        precomp = trainer.precompute_views(batch)

    fn = jax.jit(
        functools.partial(trainer._step, flags),
        donate_argnums=(0, 1),
    )
    print(f"[memcheck] lowering B={args.batch_size} bf16={args.bf16} "
          f"remat={args.remat} precomp={precomp is not None}", file=sys.stderr)
    t0 = time.time()
    lowered = fn.lower(gen_state, disc_state, batch, jax.random.PRNGKey(1), None, precomp)
    print(f"[memcheck] lowered in {time.time()-t0:.1f}s; compiling", file=sys.stderr)
    t0 = time.time()
    try:
        compiled = lowered.compile()
    except Exception as e:
        print(json.dumps({
            "batch_size": args.batch_size, "bf16": args.bf16,
            "compile_error": str(e)[:2000],
        }))
        return
    print(f"[memcheck] compiled in {time.time()-t0:.1f}s", file=sys.stderr)
    try:
        ma = compiled.memory_analysis()
    except Exception as e:
        print(json.dumps({"batch_size": args.batch_size, "memory_analysis_error": str(e)}))
        return
    if ma is None:
        print(json.dumps({"batch_size": args.batch_size, "memory_analysis": None}))
        return

    def gb(x):
        return round(x / 2**30, 3)

    out = {"batch_size": args.batch_size, "bf16": args.bf16, "remat": args.remat,
           "compact_resid": args.compact_resid, "precomp": precomp is not None}
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes", "peak_memory_in_bytes"):
        v = getattr(ma, attr, None)
        if v is not None:
            out[attr.replace("_in_bytes", "_gb")] = gb(v)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
