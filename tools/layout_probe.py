"""Micro-probe: HBM cost + speed of 3D convs at tiny channel counts in
NDHWC (channel-minor) vs NCDHW (channel-first) layouts on the TPU.

Motivation: the full train step's temp memory is ~3.4x its logical size on
TPU (tools/memcheck.py: 10.8 GB vs 3.1 GB for the conv-dominated geo config
at B=2). Hypothesis: XLA stores NDHWC activations with C minor, padding
C=20 -> 128 lanes (6.4x) for every saved residual; channels-first puts a
spatial dim minor instead (X=64 -> 128 lanes, 2x). This probe compiles a
small conv stack fwd+bwd in both layouts and prints memory_analysis + step
time for each.

  python tools/layout_probe.py            # TPU
  python tools/layout_probe.py --cpu      # logical sizes for reference
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--dims", type=int, nargs=3, default=(128, 64, 64))
    p.add_argument("--nf", type=int, default=20)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    B = args.batch
    Z, Y, X = args.dims
    C = args.nf
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.layers + 1)
    # kernels stored (kz, ky, kx, in, out) like flax; transposed per layout
    kernels = [
        (jax.random.normal(ks[i], (3, 3, 3, C, C), jnp.float32) * 0.05).astype(dt)
        for i in range(args.layers)
    ]

    def stack_ndhwc(x, kernels):
        for k in kernels:
            x = lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            x = jnp.maximum(x, 0.2 * x)
        return jnp.sum(x.astype(jnp.float32))

    def stack_ncdhw(x, kernels):
        # x arrives channels-first (B, C, Z, Y, X); kernels (O, I, kz, ky, kx)
        for k in kernels:
            x = lax.conv_general_dilated(
                x, jnp.transpose(k, (4, 3, 0, 1, 2)), (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            )
            x = jnp.maximum(x, 0.2 * x)
        return jnp.sum(x.astype(jnp.float32))

    x_last = (jax.random.normal(ks[-1], (B, Z, Y, X, C), jnp.float32)).astype(dt)
    x_first = jnp.transpose(x_last, (0, 4, 1, 2, 3))

    results = {}
    for name, fn, x in (
        ("NDHWC", stack_ndhwc, x_last),
        ("NCDHW", stack_ncdhw, x_first),
    ):
        grad = jax.jit(jax.grad(fn, argnums=1))
        lowered = grad.lower(x, kernels)
        t0 = time.time()
        compiled = lowered.compile()
        comp_s = time.time() - t0
        ma = compiled.memory_analysis()
        entry = {"compile_s": round(comp_s, 1)}
        if ma is not None:
            entry["temp_gb"] = round(ma.temp_size_in_bytes / 2**30, 3)
        # timing: fence through a host transfer (relay block_until_ready is
        # unreliable), feed fresh inputs to dodge result caching
        g = compiled(x, kernels)
        np.asarray(jax.tree_util.tree_leaves(g)[0][0, 0, 0])
        t0 = time.perf_counter()
        for i in range(args.steps):
            xi = x + jnp.float32(i).astype(dt)
            g = compiled(xi, kernels)
        np.asarray(jax.tree_util.tree_leaves(g)[0][0, 0, 0])
        entry["step_ms"] = round((time.perf_counter() - t0) / args.steps * 1000, 2)
        results[name] = entry
        print(json.dumps({name: entry}), file=sys.stderr, flush=True)

    logical_gb = args.layers * B * Z * Y * X * C * (2 if args.bf16 else 4) / 2**30
    print(json.dumps({
        "config": {"B": B, "dims": [Z, Y, X], "nf": C, "layers": args.layers,
                   "bf16": args.bf16, "logical_resid_gb": round(logical_gb, 3)},
        **results,
    }))


if __name__ == "__main__":
    main()
