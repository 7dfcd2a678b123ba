"""Isolated generator timings on the TPU: fwd, fwd+bwd(+BN update), and an
optimizer-only update — splits the geo step (bench.py --mode geo) into its
parts so conv-stack optimization effort can be aimed correctly.

Timing discipline per CLAUDE.md: host-transfer fences, fresh inputs.
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
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused_conv", action="store_true",
                   help="fused conv+act+BN-stats Pallas block")
    p.add_argument("--pallas_conv", action="store_true")
    p.add_argument("--zslab_conv", action="store_true",
                   help="z-slab rank-4 conv formulation (ops/zslab_conv.py)")
    p.add_argument("--folded_conv", action="store_true",
                   help="output-folded conv matmuls (ops/folded_conv.py)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from spsg_tpu.training import TrainConfig
    from spsg_tpu.training.state import init_states, make_generator, gen_optimizer

    cfg = TrainConfig(
        batch_size=args.batch,
        compute_dtype="bfloat16" if args.bf16 else None,
        weight_disc_loss=0.0,
        fused_conv=args.fused_conv,
        pallas_conv=args.pallas_conv,
        folded_conv=args.folded_conv,
        zslab_conv=args.zslab_conv,
    )
    gen = make_generator(cfg)
    gs, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
    tx = gen_optimizer(cfg)

    B = args.batch
    Z, Y, X = cfg.input_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, (B, Z, Y, X, 4)).astype(np.float32))
    m = jnp.asarray((rng.random((B, Z, Y, X, 1)) > 0.5).astype(np.float32))

    def fwd(params, bstats, x, m):
        outs, mut = gen.apply(
            {"params": params, "batch_stats": bstats}, x, m,
            pred_color=True, pred_sdf=True, pred_semantic=True,
            train=True, mutable=["batch_stats"],
        )
        occ, sdf, col, sem = outs
        loss = jnp.mean(occ**2) + jnp.mean(sdf**2) + jnp.mean(col**2) + jnp.mean(sem**2)
        return loss, mut["batch_stats"]

    jf = jax.jit(fwd)
    jg = jax.jit(jax.grad(fwd, has_aux=True))

    def opt_step(gstate, grads):
        updates, new_opt = tx.update(grads, gstate.opt_state, gstate.params)
        params = optax.apply_updates(gstate.params, updates)
        return gstate.replace(params=params, opt_state=new_opt)

    jo = jax.jit(opt_step, donate_argnums=(0,))

    results = {}

    def timeit(name, fn, fence):
        fence(fn())  # warmup/compile
        t0 = time.perf_counter()
        for i in range(args.steps):
            out = fn(offset=i)
        fence(out)
        results[name] = round((time.perf_counter() - t0) / args.steps * 1000, 1)
        print(name, results[name], "ms", flush=True)

    timeit(
        "fwd",
        lambda offset=0: jf(gs.params, gs.batch_stats, x + offset * 1e-6, m),
        lambda o: float(np.asarray(o[0])),
    )
    timeit(
        "fwd_bwd",
        lambda offset=0: jg(gs.params, gs.batch_stats, x + offset * 1e-6, m),
        lambda o: float(np.asarray(jax.tree_util.tree_leaves(o[0])[0].ravel()[0])),
    )
    grads = jg(gs.params, gs.batch_stats, x, m)[0]
    state = {"s": gs}

    def run_opt(offset=0):
        g2 = jax.tree_util.tree_map(lambda a: a + offset * 1e-8, grads)
        state["s"] = jo(state["s"], g2)
        return state["s"]

    timeit(
        "optimizer",
        run_opt,
        lambda s: float(np.asarray(jax.tree_util.tree_leaves(s.params)[0].ravel()[0])),
    )
    print(json.dumps({"batch": B, "bf16": args.bf16, **results}))


if __name__ == "__main__":
    main()
