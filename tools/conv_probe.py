"""3D-conv strategy probe: XLA's native conv vs matmul reformulations.

Motivation (docs/DESIGN.md round 3): the generator's conv stack runs at
~1.9 TFLOP/s effective on v5e — ~30x below even the 20/128-lane-limited MXU
ceiling — so XLA's rank-5 conv lowering, not the march, is the biggest
remaining cost. A 3x3x3 conv is exactly an im2col matmul with K=27*C_in;
this probe times fwd+bwd of an N-layer stack under several formulations:

  conv      lax.conv_general_dilated (the baseline the model uses)
  patches   lax.conv_general_dilated_patches (im2col) + jnp.dot
  zslab     2D conv per z-tap: sum_dz conv2d(x[z+dz], W[dz]) via one rank-4
            conv over a (B*Z, Y, X, 3*C) z-neighbor stack
  taps      27 shifted (1M, Cin) @ (Cin, Cout) matmuls, accumulated
  pallas    the Pallas im2col kernel (ops/pallas_conv.py)
  fused     the fused conv+bias+act+BN-stats Pallas kernel
  folded    output-folded matmul (ops/folded_conv.py): gy*gx output pixels
            per row -> lane dim gy*gx*C instead of C (the nf=20 lane fix)

  python tools/conv_probe.py            # TPU
  python tools/conv_probe.py --cpu      # smoke only
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--dims", type=int, nargs=3, default=(128, 64, 64))
    p.add_argument("--nf", type=int, default=20)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--only", default="", help="comma-separated subset of strategies")
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
    ks = jax.random.split(jax.random.PRNGKey(0), args.layers + 1)
    kernels = [
        (jax.random.normal(ks[i], (3, 3, 3, C, C), jnp.float32) * 0.05).astype(dt)
        for i in range(args.layers)
    ]
    x0 = jax.random.normal(ks[-1], (B, Z, Y, X, C), jnp.float32).astype(dt)

    def act(v):
        return jnp.maximum(v, 0.2 * v)

    def stack_conv(x, kernels):
        for k in kernels:
            x = lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            x = act(x)
        return jnp.sum(x.astype(jnp.float32))

    def stack_patches(x, kernels):
        for k in kernels:
            # im2col: (B, Z, Y, X, C*27) with feature-major patch order
            pat = lax.conv_general_dilated_patches(
                x, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            # patches order the channel dim as (C, kz, ky, kx)
            km = jnp.transpose(k, (3, 0, 1, 2, 4)).reshape(-1, k.shape[-1])
            x = act(jnp.dot(pat, km, preferred_element_type=x.dtype))
        return jnp.sum(x.astype(jnp.float32))

    def stack_zslab(x, kernels):
        # one rank-4 conv over a z-neighbor channel stack:
        # x3[b*z, y, x, 3C] = concat(x[z-1], x[z], x[z+1]);
        # W4[(3, 3), 3C, C] = the 3x3x3 kernel with kz folded into channels
        for k in kernels:
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            x3 = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
            x3 = x3.reshape(B * Z, Y, X, 3 * x.shape[-1])
            w4 = jnp.concatenate([k[0], k[1], k[2]], axis=2).reshape(
                3, 3, 3 * k.shape[3], k.shape[4]
            )
            y = lax.conv_general_dilated(
                x3, w4, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = act(y.reshape(B, Z, Y, X, k.shape[4]))
        return jnp.sum(x.astype(jnp.float32))

    def stack_taps(x, kernels):
        for k in kernels:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        sl = xp[:, dz:dz + Z, dy:dy + Y, dx:dx + X, :]
                        t = jnp.dot(sl, k[dz, dy, dx],
                                    preferred_element_type=x.dtype)
                        acc = t if acc is None else acc + t
            x = act(acc)
        return jnp.sum(x.astype(jnp.float32))

    def stack_pallas(x, kernels):
        from spsg_tpu.ops.pallas_conv import conv3x3

        for k in kernels:
            x = act(conv3x3(x, k, args.cpu))  # interpret on CPU
        return jnp.sum(x.astype(jnp.float32))

    def stack_folded(x, kernels):
        # output-folded matmul (ops/folded_conv.py): gy*gx output pixels per
        # MXU row so the lane dim is gy*gx*C instead of C
        from spsg_tpu.ops.folded_conv import conv3x3_folded, pick_fold

        fold = pick_fold(Y, X, C)
        for k in kernels:
            x = act(conv3x3_folded(x, k, fold))
        return jnp.sum(x.astype(jnp.float32))

    zero_b = jnp.zeros((C,), jnp.float32)

    def stack_fused(x, kernels):
        # the fused conv+bias+act+BN-stats kernel (models use it via
        # --fused_conv); stats consumed so their computation isn't DCE'd
        from spsg_tpu.ops.pallas_conv import conv3x3_act_stats

        extra = jnp.zeros((), jnp.float32)
        for k in kernels:
            x, s, ss = conv3x3_act_stats(x, k, zero_b, args.cpu)
            extra += jnp.sum(s) * 1e-9 + jnp.sum(ss) * 1e-12
        return jnp.sum(x.astype(jnp.float32)) + extra

    strategies = {
        "conv": stack_conv,
        "patches": stack_patches,
        "zslab": stack_zslab,
        "taps": stack_taps,
        "pallas": stack_pallas,
        "fused": stack_fused,
        "folded": stack_folded,
    }
    if args.only:
        keep = set(args.only.split(","))
        strategies = {k: v for k, v in strategies.items() if k in keep}

    flops = 3 * 2 * args.layers * B * Z * Y * X * 27 * C * C  # fwd+bwd ~3x fwd
    results = {}
    for name, fn in strategies.items():
        grad = jax.jit(jax.grad(fn, argnums=1))
        try:
            t0 = time.time()
            g = grad(x0, kernels)
            np.asarray(jax.tree_util.tree_leaves(g)[0][0, 0, 0])
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            for i in range(args.steps):
                xi = x0 + jnp.float32(i).astype(dt)
                g = grad(xi, kernels)
            np.asarray(jax.tree_util.tree_leaves(g)[0][0, 0, 0])
            ms = (time.perf_counter() - t0) / args.steps * 1000
            results[name] = {
                "ms": round(ms, 1),
                "eff_tflops": round(flops / (ms / 1e3) / 1e12, 2),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            # the mosaic diagnostic lives thousands of chars in — keep it all
            print(f"=== full error for {name} ===\n{e}\n=== end ===",
                  file=sys.stderr, flush=True)
        print(json.dumps({name: results[name]}), file=sys.stderr, flush=True)

    # numeric cross-check at a tolerance (different accumulation orders)
    if "conv" in strategies and len(strategies) > 1:
        ref = jax.jit(strategies["conv"])(x0, kernels)
        for name, fn in strategies.items():
            got = jax.jit(fn)(x0, kernels)
            results[name]["matches_conv"] = bool(
                np.allclose(np.asarray(ref), np.asarray(got), rtol=2e-2)
            )
    print(json.dumps({
        "config": {"B": B, "dims": [Z, Y, X], "nf": C, "layers": args.layers,
                   "bf16": args.bf16},
        **results,
    }))


if __name__ == "__main__":
    main()
