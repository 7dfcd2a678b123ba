"""Benchmark: full train-step throughput at the reference operating point.

Measures train chunks/sec/chip for the flagship configuration — 64x64x128
TSDF chunks (z-up 128), nf=20 generator, 3D occ/SDF/semantic losses + 2D
view-guided losses (3 differentiable raycasts at 320x256) + patch-GAN
discriminator update — i.e. the reference's full hot loop
(torch/train.py:419-757) fused into one jitted TPU step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
measured against the driver's north-star target of 5x an A100 PyTorch
baseline only when such a number becomes available; until then it is null.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

# ---------------------------------------------------------------------------
# Diagnostics-first harness. The two previous driver runs produced no JSON:
# r1 failed backend init (rc=1), r2 hung before devices() returned and was
# SIGTERM'd by the driver's timeout (rc=124) — both relay failures, not slow
# compiles. So: (a) track the current phase globally, (b) emit a parseable
# diagnostic JSON line on SIGTERM/watchdog so even a wedged relay leaves
# evidence, (c) give backend init its own short deadline.
# ---------------------------------------------------------------------------
_T0 = time.time()
_PHASE = "startup"
_RESULT_PRINTED = False
_RELAY_PROBE = "not probed"


def _probe_relay() -> None:
    """TCP-probe the TPU relay's loopback port once at startup (no jax
    involved) so a later hang/timeout diagnostic can say decisively whether
    the relay was even listening — "connection refused at startup" is the
    dead-relay signature (CLAUDE.md), distinct from a slow compile."""
    global _RELAY_PROBE
    if "cpu" in os.environ.get("JAX_PLATFORMS", "axon").lower():
        _RELAY_PROBE = "n/a (cpu)"
        return
    import socket

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082))
        _RELAY_PROBE = "port 8082 open at startup"
    except OSError as e:
        _RELAY_PROBE = f"port 8082 {e.strerror or e} at startup"
    finally:
        s.close()


def _phase(name: str) -> None:
    global _PHASE
    _PHASE = name
    print(f"[bench +{time.time() - _T0:.1f}s] {name}", file=sys.stderr, flush=True)


def _diagnostic_json(reason: str) -> None:
    global _RESULT_PRINTED
    if _RESULT_PRINTED:
        return
    _RESULT_PRINTED = True
    print(
        json.dumps(
            {
                "metric": "train_chunks_per_sec_per_chip",
                "value": None,
                "unit": "chunks/s/chip",
                "vs_baseline": None,
                "error": f"{reason} during phase '{_PHASE}' "
                f"at +{time.time() - _T0:.1f}s (TPU relay likely wedged, "
                f"see CLAUDE.md; relay probe: {_RELAY_PROBE})",
            }
        ),
        flush=True,
    )


def _on_sigterm(signum, frame):
    _diagnostic_json("SIGTERM (external timeout)")
    os._exit(3)


signal.signal(signal.SIGTERM, _on_sigterm)


# ---------------------------------------------------------------------------
# Supervisor: the relay *randomly* hangs whole processes (observed twice this
# round on phases that normally take seconds-to-minutes: a batch build that
# took 196 s cold hung >540 s on the next invocation, and a cache-warm geo
# compile hung >540 s after succeeding twice earlier). A hung attempt is
# process-fatal, but the NEXT process usually succeeds — so run the real
# bench in a child with a deadline and retry once. The parent never imports
# jax (nothing to wedge) and buffers each attempt's stdout so a failed
# attempt's diagnostic JSON is not mistaken for the result; on an external
# SIGTERM it dumps the live attempt's output plus a diagnostic line.
# Opt out with SPSG_BENCH_SUPERVISE=0 (tools/sweeps run the child directly).
# ---------------------------------------------------------------------------
def _supervise() -> "int":
    import subprocess

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "2"))
    # 720 s covers a cold full-step compile through the relay (~360 s to
    # first timed step observed for the round-5 B=8 default; ~310-370 s
    # observed end-to-end for the round-4 default config: zslab + pair +
    # global compaction + steps_per_call=4) with margin; cache-warm runs
    # finish in ~90-160 s (the .jax_cache persisted by the measurement
    # queue already holds the default program)
    deadline = int(os.environ.get("BENCH_ATTEMPT_S", "720"))
    if "--sweep" in sys.argv or "--ab" in sys.argv:
        deadline *= 24  # multi-config runs legitimately take hours
    pause = 15
    state = {"p": None, "buf": []}

    def _dump_and_die(signum, frame):
        for ln in state["buf"]:
            sys.stdout.write(ln)
        _diagnostic_json("SIGTERM (external timeout, supervisor)")
        p = state["p"]
        if p is not None and p.poll() is None:
            p.kill()
        os._exit(3)

    signal.signal(signal.SIGTERM, _dump_and_die)

    env = dict(os.environ, SPSG_BENCH_CHILD="1",
               BENCH_WATCHDOG_S=str(max(60, deadline - 30)))
    rc = 1
    last: list = []
    for attempt in range(attempts):
        state["buf"] = []
        print(f"[bench supervisor] attempt {attempt + 1}/{attempts} "
              f"(deadline {deadline}s)", file=sys.stderr, flush=True)
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        )
        state["p"] = p
        import threading

        def _read(buf=state["buf"], pipe=p.stdout):
            for line in pipe:
                buf.append(line)

        t = threading.Thread(target=_read, daemon=True)
        t.start()
        try:
            rc = p.wait(timeout=deadline)
        except subprocess.TimeoutExpired:
            # Killing a TPU process mid-call is exactly the relay-wedging
            # pattern CLAUDE.md warns about — but a child hung this long is
            # already stuck in a wedged grant, and empirically (this round)
            # the NEXT process often succeeds where the hung one never will.
            # The retry is a calculated trade: worst case the relay stays
            # wedged (it already was), best case the bench lands a number.
            print(f"[bench supervisor] attempt {attempt + 1} hung past "
                  f"{deadline}s — killing child", file=sys.stderr, flush=True)
            p.kill()
            p.wait()
            rc = 9
        t.join(timeout=5)
        if rc == 0:
            for ln in state["buf"]:
                sys.stdout.write(ln)
            sys.stdout.flush()
            return 0
        last = state["buf"]
        if attempt + 1 < attempts:
            time.sleep(pause)
    # all attempts failed: emit the last attempt's output (its diagnostic
    # JSON line, if it got that far) or our own diagnostic
    if any('"metric"' in ln for ln in last):
        for ln in last:
            sys.stdout.write(ln)
        sys.stdout.flush()
    else:
        _diagnostic_json(f"all {attempts} supervised attempts failed (rc={rc})")
    return rc


if (
    __name__ == "__main__"
    and os.environ.get("SPSG_BENCH_CHILD") != "1"
    and os.environ.get("SPSG_BENCH_SUPERVISE", "1") != "0"
):
    sys.exit(_supervise())

_probe_relay()
_phase(f"importing jax (relay probe: {_RELAY_PROBE})")
import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench invocations skip the ~4 min
# first-compile of the full train step (same cache the tests share)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    ),
)


def bench_scene(args, quiet=False):
    """Whole-scene chunked inference throughput: voxels/sec at 2 cm
    (the second north-star metric, BASELINE.md)."""
    from spsg_tpu.data import pipeline, synthetic
    from spsg_tpu.inference import chunked
    from spsg_tpu.training import TrainConfig
    from spsg_tpu.training.state import init_states, make_generator

    bf16 = args.bf16 and not args.f32
    cfg = TrainConfig(
        weight_disc_loss=0.0,
        compute_dtype="bfloat16" if bf16 else None,
        pallas_conv=getattr(args, "pallas_conv", False),
        fused_conv=getattr(args, "fused_conv", False),
        folded_conv=getattr(args, "folded_conv", False),
        zslab_conv=getattr(args, "zslab_conv", False),
    )
    gen = make_generator(cfg)
    gs, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
    variables = {"params": gs.params, "batch_stats": gs.batch_stats}
    scene = synthetic.make_scene(dims=tuple(args.scene_dims), seed=1)
    sample = pipeline.assemble_sample(
        scene.sdf_input, scene.sdf_complete, scene.input_colors, scene.colors,
        scene.semantics, scene.known, scene.world2grid, 3.0, "lab", None,
    )
    _phase("scene inference warmup")
    compact_feed = getattr(args, "compact_feed", False)
    kwargs = dict(
        truncation=3.0, chunk_dims=(128, 64, 64), stride=32,
        window_batch=args.window_batch,
        pred_color=True, pred_semantic=True,
        scan_windows=getattr(args, "scan_windows", False),
        stitch_slices=getattr(args, "stitch_slices", False),
    )
    if compact_feed:
        # raw-feed path: clamp/LAB/mask/pad run on device, ~4x less
        # host->device traffic (inference/chunked.py compact_scene)
        kwargs["compact_scene"] = dict(
            sdf=scene.sdf_input.astype(np.float32),
            colors=scene.input_colors, color_space="lab",
        )
        scene_args = (gen, variables, None, None, None, None, None)
    else:
        scene_args = (
            gen, variables, sample["input"], sample["mask"], None, None, None,
        )
    chunked.run_chunked_inference(*scene_args, **kwargs)
    _phase("timing scene inference")
    profile_dir = getattr(args, "profile_dir", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    out = chunked.run_chunked_inference(*scene_args, **kwargs)
    np.asarray(out.sdf)  # host-transfer fence (block_until_ready is unreliable here)
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        _phase(f"trace written to {profile_dir}")
    n_vox = int(np.prod(out.sdf.shape))
    result = {
        "metric": "scene_inference_voxels_per_sec",
        "value": round(n_vox / dt, 1),
        "unit": "voxels/s (2cm chunked whole-scene completion, stride 32)",
        "vs_baseline": None,
        "extra": {"scene_dims": list(out.sdf.shape), "seconds": round(dt, 3),
                  "window_batch": args.window_batch, "bf16": bf16,
                  "compact_feed": compact_feed,
                  "scan_windows": getattr(args, "scan_windows", False),
                  "stitch_slices": getattr(args, "stitch_slices", False),
                  "folded_conv": cfg.folded_conv,
                  "zslab_conv": cfg.zslab_conv,
                  "fused_conv": cfg.fused_conv,
                  "pallas_conv": cfg.pallas_conv},
    }
    if not quiet:
        global _RESULT_PRINTED
        _RESULT_PRINTED = True
        print(json.dumps(result), flush=True)
    return result


def bench_train(args, batch_size=None, bf16=None, remat=None, quiet=False):
    """One train-throughput measurement; returns the result dict."""
    import jax
    import jax.numpy as jnp

    from spsg_tpu.data import synthetic
    from spsg_tpu.training import StepFlags, TrainConfig
    from spsg_tpu.training.state import init_states
    from spsg_tpu.training.step import Trainer

    batch_size = args.batch_size if batch_size is None else batch_size
    bf16 = (args.bf16 and not args.f32) if bf16 is None else bf16
    remat = getattr(args, "remat", False) if remat is None else remat
    dims = (128, 64, 64) if args.dims == 0 else (args.dims,) * 3  # smoke-test knob
    full = args.mode == "full"
    use_2d = args.mode in ("full", "2d")  # "2d" isolates raycast+2D losses from disc cost
    cfg = TrainConfig(
        input_dim=dims,
        batch_size=batch_size,
        weight_disc_loss=0.5 if full else 0.0,
        weight_depth_loss=1.0 if use_2d else 0.0,
        max_depth_fill_iters=0,  # synthetic frames are hole-free
        compute_dtype="bfloat16" if bf16 else None,
        channels_first=getattr(args, "channels_first", False),
        pallas_conv=getattr(args, "pallas_conv", False),
        fused_conv=getattr(args, "fused_conv", False),
        folded_conv=getattr(args, "folded_conv", False),
        zslab_conv=getattr(args, "zslab_conv", False),
        compact_resid=getattr(args, "compact_resid", False),
        remat=remat,
        **({"fuse_raycast": False} if getattr(args, "unfuse", False)
           else {"fuse_raycast": True} if getattr(args, "fuse", False) else {}),
        **({"straggler_frac": args.straggler} if getattr(args, "straggler", None) is not None else {}),
        **({"march_block": args.march_block} if getattr(args, "march_block", 0) else {}),
        **({"coarse_hops": args.hops} if getattr(args, "hops", 0) else {}),
        pair_raycast=getattr(args, "pair", False),
        compact_across_batch=getattr(args, "compact_global", False),
        march_group=getattr(args, "march_group", 0),
    )
    _phase(f"building synthetic batch (dims={dims}, B={batch_size})")
    batch = synthetic.make_chunk_batch(
        batch_size=cfg.batch_size,
        dims=dims,
        image_dims=(cfg.style_width, cfg.style_height),
        seed=0,
        with_frames=use_2d,
        truncation=cfg.truncation,
    )
    batch.pop("name", None)
    _phase("transferring batch to device")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["weight_occ"] = jnp.ones(())

    _phase("initializing model/optimizer states (jitted init)")
    gen_state, disc_state = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    flags = StepFlags(
        pred_sdf=True,
        pred_color=True,
        pred_semantic=True,
        use_2d=use_2d,
        use_disc=full,
    )

    # Cached-render steady state (VERDICT r2 item 3): the input/target march
    # hits + depth chain are parameter-independent, so the training loop
    # caches them per (chunk, frame) and only the prediction march runs
    # in-step. Bit-identical losses (tests/test_train_step.py).
    precomp = None
    if use_2d and getattr(args, "precomp", True):
        _phase("precomputing parameter-independent renders (once per chunk)")
        precomp = trainer.precompute_views(batch)

    spc = max(1, getattr(args, "steps_per_call", 1))
    if spc > 1:
        # K steps per device dispatch (Trainer.step_many — the training
        # loop's --steps_per_call path): amortizes the per-dispatch host
        # overhead, bit-identical training math
        stackK = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.stack([a] * spc), t
        )
        batches_k = stackK(batch)
        precomps_k = stackK(precomp) if precomp is not None else None

        def run_step(gen_state, disc_state, key):
            g, d, ms = trainer.step_many(
                gen_state, disc_state, batches_k,
                jax.random.split(key, spc), flags, precomps_k,
            )
            return g, d, {"loss": ms["loss"][-1]}
    else:

        def run_step(gen_state, disc_state, key):
            return trainer.step(
                gen_state, disc_state, batch, key, flags, precomp=precomp
            )

    _phase("compiling + warmup (first full-step compile ~4 min cold)")
    for i in range(args.warmup):
        gen_state, disc_state, metrics = run_step(
            gen_state, disc_state, jax.random.PRNGKey(i)
        )
    # block_until_ready is NOT a reliable fence on the axon relay (CLAUDE.md);
    # a host transfer is. Each step consumes the previous step's state, so
    # transferring the final loss fences the whole chain. (--warmup 0 smoke
    # runs have nothing to fence; the timed loop below still compiles.)
    if args.warmup > 0:
        float(np.asarray(metrics["loss"]))

    _phase(f"timing {args.steps} calls x {spc} steps")
    profile_dir = getattr(args, "profile_dir", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(args.steps):
        gen_state, disc_state, metrics = run_step(
            gen_state, disc_state, jax.random.PRNGKey(100 + i)
        )
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        _phase(f"trace written to {profile_dir}")

    step_time = dt / (args.steps * spc)
    chunks_per_sec = batch_size / step_time
    n_chips = jax.device_count()
    result = {
        "metric": "train_chunks_per_sec_per_chip",
        "value": round(chunks_per_sec / n_chips, 4),
        "unit": "chunks/s/chip (64x64x128 TSDF, full 3D+2D+GAN step)"
        if full
        else "chunks/s/chip (64x64x128 TSDF, 3D+2D losses)"
        if use_2d
        else "chunks/s/chip (64x64x128 TSDF, 3D losses)",
        "vs_baseline": None,
        "extra": {
            "step_time_s": round(step_time, 4),
            "batch_size": batch_size,
            "bf16": bool(bf16),
            "remat": bool(remat),
            "fused_raycast": cfg.fuse_raycast,
            "channels_first": cfg.channels_first,
            "pallas_conv": cfg.pallas_conv,
            "fused_conv": cfg.fused_conv,
            "folded_conv": cfg.folded_conv,
            "zslab_conv": cfg.zslab_conv,
            "compact_resid": cfg.compact_resid,
            "cached_renders": precomp is not None,
            "straggler_frac": cfg.straggler_frac,
            "march_group": cfg.march_group,
            "steps_per_call": spc,
            "mode": args.mode,
            "device": str(jax.devices()[0]),
            "loss": float(metrics["loss"]),
        },
    }
    if not quiet:
        global _RESULT_PRINTED
        _RESULT_PRINTED = True
        print(json.dumps(result), flush=True)
    return result


def bench_sweep(args):
    """Batch-scaling sweep (VERDICT r1 item 3): B x {f32, bf16} x remat; one
    row per config on stderr, the single driver JSON line reports the best
    chunks/s/chip. Run on the real TPU: python bench.py --sweep."""
    rows = []
    for bf16 in (False, True):
        for batch in (2, 4, 8, 16):
            for remat in ((False, True) if batch >= 8 else (False,)):
                try:
                    r = bench_train(args, batch_size=batch, bf16=bf16,
                                    remat=remat, quiet=True)
                except Exception as e:  # OOM at large batches is expected
                    print(f"[sweep] B={batch} bf16={bf16} remat={remat}: "
                          f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                    continue
                rows.append(r)
                print(f"[sweep] B={batch} bf16={bf16} remat={remat}: "
                      f"{r['value']} chunks/s/chip "
                      f"({r['extra']['step_time_s']}s/step)", file=sys.stderr)
    if not rows:
        raise SystemExit("sweep: every configuration failed")
    best = max(rows, key=lambda r: r["value"])
    best["extra"]["sweep"] = [
        {k: r["extra"][k] for k in ("batch_size", "bf16", "remat", "step_time_s")}
        | {"chunks_per_sec_per_chip": r["value"]}
        for r in rows
    ]
    global _RESULT_PRINTED
    _RESULT_PRINTED = True
    print(json.dumps(best), flush=True)


# Round-4 A/B matrices. One PROCESS runs every variant: the axon relay died
# after ~15 TPU processes in round 3, so the per-process cost is the scarce
# resource — a single process recompiles per variant but needs one backend
# init and one relay grant for the whole matrix.
#
# Variants apply on top of a NEUTRAL base (all round-4 knobs off), not the
# CLI defaults — the measured winners became the plain-bench defaults, and
# the matrix would otherwise silently inherit them.
_AB_NEUTRAL_TRAIN = {
    "zslab_conv": False, "folded_conv": False, "fused_conv": False,
    "pallas_conv": False, "pair": False, "compact_global": False,
    "steps_per_call": 1, "steps": 5, "compact_resid": False,
    "batch_size": 2, "march_group": 0,
}
_AB_NEUTRAL_SCENE = {
    "zslab_conv": False, "folded_conv": False, "fused_conv": False,
    "pallas_conv": False, "scan_windows": False, "window_batch": 8,
    "compact_feed": False, "stitch_slices": False,
}
_AB_TRAIN = [
    ("baseline", {}),
    ("fused_conv", {"fused_conv": True}),
    ("pallas_conv", {"pallas_conv": True}),
    ("folded_conv", {"folded_conv": True}),
    ("folded+fused", {"folded_conv": True, "fused_conv": True}),
    ("pair", {"pair": True}),
    ("compact_global", {"compact_global": True}),
    ("pair+global", {"pair": True, "compact_global": True}),
    ("spc4", {"steps_per_call": 4, "steps": 3}),
    ("best_combo", {"folded_conv": True, "fused_conv": True, "pair": True,
                    "compact_global": True}),
    ("b8_resid_global", {"batch_size": 8, "compact_resid": True,
                         "compact_global": True}),
    ("b8_resid_folded", {"batch_size": 8, "compact_resid": True,
                         "folded_conv": True}),
    # round-4 session-2 additions: the z-slab conv formulation (the
    # conv_probe winner, 15.17 vs 2.35 eff TFLOP/s) alone and composed
    # with the measured march/dispatch wins
    ("zslab", {"zslab_conv": True}),
    ("zslab+spc4", {"zslab_conv": True, "steps_per_call": 4, "steps": 3}),
    ("zslab+pair+global+spc4", {"zslab_conv": True, "pair": True,
                                "compact_global": True,
                                "steps_per_call": 4, "steps": 3}),
    ("b8_resid_zslab", {"batch_size": 8, "compact_resid": True,
                        "zslab_conv": True}),
    # round-4 session-3: B=8 scaling triage. Measured so far: b8_resid_global
    # 3.61 (2.215 s) vs b8_resid_zslab 2.95 (2.716 s) — global compaction is
    # the B=8 lever and zslab HURTS at B=8; probe the cross terms.
    ("b8_resid_zslab_global", {"batch_size": 8, "compact_resid": True,
                               "zslab_conv": True, "compact_global": True}),
    ("b8_resid_global_pair", {"batch_size": 8, "compact_resid": True,
                              "compact_global": True, "pair": True}),
    ("b4_resid_zslab_global", {"batch_size": 4, "compact_resid": True,
                               "zslab_conv": True, "compact_global": True}),
    # round-5: batch-grouped march (VMEM-resident gather tables per group;
    # the B=8 ungrouped march costs ~2.5x more per gather row than B=2)
    ("b8_resid_global_mg2", {"batch_size": 8, "compact_resid": True,
                             "compact_global": True, "march_group": 2}),
    ("b8_resid_zslab_global_mg2", {"batch_size": 8, "compact_resid": True,
                                   "zslab_conv": True, "compact_global": True,
                                   "march_group": 2}),
    ("b8_resid_global_mg4", {"batch_size": 8, "compact_resid": True,
                             "compact_global": True, "march_group": 4}),
    ("b4_resid_zslab_global_mg2", {"batch_size": 4, "compact_resid": True,
                                   "zslab_conv": True, "compact_global": True,
                                   "march_group": 2}),
]
_AB_SCENE = [
    ("baseline", {}),
    ("scan", {"scan_windows": True}),
    ("folded", {"folded_conv": True}),
    ("folded+scan", {"folded_conv": True, "scan_windows": True}),
    ("folded_wb16", {"folded_conv": True, "window_batch": 16}),
    ("zslab+scan", {"zslab_conv": True, "scan_windows": True}),
    ("zslab+scan_wb16", {"zslab_conv": True, "scan_windows": True,
                         "window_batch": 16}),
    # round-4 session-3: compact device feed (host->device transfer is the
    # suspected dominant cost of the scan-path scene step)
    ("cfeed", {"compact_feed": True}),
    ("zslab+scan+cfeed", {"zslab_conv": True, "scan_windows": True,
                          "compact_feed": True}),
    ("zslab+scan_wb16+cfeed", {"zslab_conv": True, "scan_windows": True,
                               "window_batch": 16, "compact_feed": True}),
    # round-5: slice-RMW stitching (inference/chunked.py stitch_slices) —
    # the flat scatter-add stitch is per-row latency-bound on TPU
    ("zslab+scan+cfeed+rmw", {"zslab_conv": True, "scan_windows": True,
                              "compact_feed": True, "stitch_slices": True}),
    ("zslab+scan_wb16+cfeed+rmw", {"zslab_conv": True, "scan_windows": True,
                                   "window_batch": 16, "compact_feed": True,
                                   "stitch_slices": True}),
]


def bench_ab(args):
    """One-process A/B matrix over the round-4 knobs (train or scene mode).
    One stderr row per variant as it lands (so a mid-matrix relay death
    still leaves evidence); the single driver JSON line reports the best
    variant with the full matrix in extra.ab."""
    scene = args.mode == "scene"
    variants = _AB_SCENE if scene else _AB_TRAIN
    if args.only_ab:
        keep = set(args.only_ab.split(","))
        variants = [v for v in variants if v[0] in keep]
    rows = []
    neutral = _AB_NEUTRAL_SCENE if scene else _AB_NEUTRAL_TRAIN
    for name, over in variants:
        a = argparse.Namespace(**{**vars(args), **neutral, **over})
        _phase(f"A/B variant '{name}'")
        try:
            r = (bench_scene if scene else bench_train)(a, quiet=True)
        except Exception as e:  # OOM at B=8 without resid etc.
            print(f"[ab] {name}: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            continue
        rows.append((name, r))
        unit = "voxels/s" if scene else "chunks/s/chip"
        print(f"[ab] {name}: {r['value']} {unit}", file=sys.stderr, flush=True)
    if not rows:
        raise SystemExit("ab: every variant failed")
    best_name, best = max(rows, key=lambda nr: nr[1]["value"])
    best["extra"]["ab_best"] = best_name
    best["extra"]["ab"] = [
        {"variant": n, "value": r["value"],
         **({"seconds": r["extra"].get("seconds")} if scene
            else {"step_time_s": r["extra"].get("step_time_s"),
                  "batch_size": r["extra"].get("batch_size")})}
        for n, r in rows
    ]
    global _RESULT_PRINTED
    _RESULT_PRINTED = True
    print(json.dumps(best), flush=True)


def main():
    # Watchdog: if the TPU relay is wedged, backend init hangs forever (no
    # exception); emit a parseable diagnostic JSON line and bail instead of
    # letting the driver's external timeout kill us silently. 9 min covers
    # the worst observed cold path (init ~10 s + full-step first compile
    # ~4 min + steps); healthy relay-cached runs finish in well under 2 min.
    import threading

    done = threading.Event()
    # multi-config runs legitimately take hours
    sweep_run = "--sweep" in sys.argv or "--ab" in sys.argv

    def _watchdog():
        # An explicit BENCH_WATCHDOG_S is authoritative: the supervisor
        # already folds the sweep/--ab multiplier into the deadline it
        # derives this value from, so re-multiplying here would push the
        # child's watchdog past the supervisor's kill — the child would die
        # without ever emitting its per-phase diagnostic JSON. Only the
        # un-supervised default applies the multi-config multiplier.
        env_s = os.environ.get("BENCH_WATCHDOG_S")
        timeout = int(env_s) if env_s else 540 * (24 if sweep_run else 1)
        if not done.wait(timeout=timeout):
            _diagnostic_json("watchdog timeout")
            os._exit(7)

    threading.Thread(target=_watchdog, daemon=True).start()

    # Backend init gets its own deadline: a wedged relay hangs inside
    # jax.devices() with no exception, which is indistinguishable from a
    # slow compile unless isolated here.
    def _init_watchdog():
        deadline = int(os.environ.get("BENCH_INIT_WATCHDOG_S", "150"))
        if not _init_done.wait(timeout=deadline):
            _diagnostic_json("backend init timeout")
            os._exit(4)

    _init_done = threading.Event()
    threading.Thread(target=_init_watchdog, daemon=True).start()
    _phase("initializing TPU backend (jax.devices)")
    devs = jax.devices()
    _init_done.set()
    _phase(f"backend up: {devs}")

    p = argparse.ArgumentParser()
    # default = the measured round-5 full-step winner: B=8 + compact_resid
    # + march_group=2 (+ pair/global/spc4), zslab OFF at B=8 — 5.13
    # chunks/s/chip (1.56 s/step) vs 4.05 for the round-4 B=2+zslab default.
    # The reference default batch is 2 (train.py:49); --batch_size 2 restores
    # the per-step-latency operating point.
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--mode", choices=["full", "2d", "geo", "scene"], default="full")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True,
                   help="bfloat16 conv compute, f32 master weights (default; "
                   "convergence-equivalent to f32, docs/DESIGN.md §5)")
    p.add_argument("--f32", action="store_true", help="force float32 convs")
    p.add_argument("--remat", action="store_true", help="rematerialized generator")
    p.add_argument("--dims", type=int, default=0,
                   help="cubic chunk dims override (0 = reference 128x64x64); "
                   "for CPU smoke tests only")
    p.add_argument("--sweep", action="store_true",
                   help="batch-scaling sweep; reports the best config")
    p.add_argument("--ab", action="store_true",
                   help="one-process A/B matrix over the round-4 knobs "
                   "(respects --mode; one stderr row per variant)")
    p.add_argument("--only_ab", default="",
                   help="comma-separated subset of --ab variant names")
    p.add_argument("--march_group", type=int, default=2,
                   help="march/shade the batch in sequential groups of this "
                   "many samples (shrinks the per-pass gather working set — "
                   "the packed-cell table is 32 MB/sample and TPU gather "
                   "rows cost ~2.5x more at B=8 than B=2; 0 = whole batch)")
    p.add_argument("--march_block", type=int, default=0,
                   help="override march fine-block size (0 = config default)")
    p.add_argument("--hops", type=int, default=0,
                   help="override coarse skip hops per iteration")
    p.add_argument("--straggler", type=float, default=None,
                   help="march straggler-compaction fraction override "
                   "(default: TrainConfig default; 0 = off)")
    p.add_argument("--channels_first", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="NCDHW generator convs (1.5x faster in a same-C conv "
                   "micro-probe but ~4% SLOWER in the real model end-to-end "
                   "— docs/DESIGN.md layout experiments)")
    p.add_argument("--pallas_conv", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="route 3x3x3 stride-1 generator convs through the "
                   "Pallas im2col kernel")
    p.add_argument("--folded_conv", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="output-folded matmul formulation for 3x3x3 stride-1 "
                   "generator convs (gy*gx output pixels per MXU row — the "
                   "nf=20 lane-ceiling fix, ops/folded_conv.py)")
    p.add_argument("--zslab_conv", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="z-slab rank-4 formulation for every generator conv "
                   "(kz taps fold into channels; 6.4x over the rank-5 conv "
                   "lowering in tools/conv_probe.py — ops/zslab_conv.py). "
                   "Wins at B=2 (4.05 vs 3.65) but LOSES at the B=8 default "
                   "(4.56 vs 4.89, round-5 A/B): the slab transposes scale "
                   "with activations while the MXU win does not. Default: "
                   "off in train modes (B=8), ON in scene mode (conv-bound "
                   "once the stitch is slice-RMW)")
    p.add_argument("--compact_resid", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compact lane-aligned generator residuals (~4x lower "
                   "step HBM, required by the B=8 default)")
    p.add_argument("--precomp", action=argparse.BooleanOptionalAction, default=True,
                   help="cache the parameter-independent input/target renders "
                   "outside the step (bit-identical; models the training "
                   "loop's per-chunk render cache)")
    p.add_argument("--stitch_slices", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scene mode: slice-RMW stitching instead of flat "
                   "scatter-adds (inference/chunked.py stitch_slices; the "
                   "scatter stitch was ~10.5 s of the 18.4 s scene step — "
                   "rmw+cfeed measured 1.26 Mvox/s vs 0.57, round-5)")
    p.add_argument("--scan_windows", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scene mode: one jitted lax.scan over all window "
                   "batches (single dispatch) instead of a host loop")
    p.add_argument("--window_batch", type=int, default=8,
                   help="windows per device batch in --mode scene")
    p.add_argument("--compact_feed", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scene mode: feed raw f32-sdf + u8-rgb and assemble "
                   "the sample on device (~4x less host->device traffic)")
    p.add_argument("--scene_dims", type=int, nargs=3, default=[128, 256, 320],
                   help="--mode scene volume (z y x); y/x must be >= the "
                   "64x64 window — shrink for CPU smoke runs only")
    p.add_argument("--profile_dir", default="",
                   help="write a jax.profiler trace of the timed steps here "
                   "(summarize with tools/trace_summary.py)")
    p.add_argument("--unfuse", action="store_true",
                   help="force three separate raycast marches (config default)")
    p.add_argument("--fuse", action="store_true",
                   help="force the single stacked tri-raycast march")
    p.add_argument("--pair", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="one stacked march for input+target (pred separate)")
    p.add_argument("--compact_global", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cross-batch straggler compaction (bit-identical)")
    p.add_argument("--steps_per_call", type=int, default=4,
                   help="train steps per device dispatch (Trainer.step_many)")
    p.add_argument("--fused_conv", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="fused conv+LeakyReLU+BN-stats Pallas block")
    args = p.parse_args()
    if args.zslab_conv is None:
        args.zslab_conv = args.mode == "scene"  # see --zslab_conv help

    try:
        if args.ab:
            return bench_ab(args)
        if args.mode == "scene":
            return bench_scene(args)
        if args.sweep:
            return bench_sweep(args)
        bench_train(args)
    finally:
        done.set()


if __name__ == "__main__":
    main()
