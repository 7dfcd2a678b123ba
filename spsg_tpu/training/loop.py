"""Host-side training loop (reference torch/train.py:399-867, 1278-1323):
epoch iteration, curriculum flag resolution, batch sharding, CSV logging,
checkpointing, validation, phase timing."""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh, replicate_state, shard_batch
from ..utils.logging import MetricsAccumulator, TrainLog
from ..utils.timing import PhaseTimer
from . import state as state_lib
from .config import StepFlags, TrainConfig
from .step import Trainer


def _prepare_batch(batch, cfg: TrainConfig, it: int):
    batch = dict(batch)
    batch.pop("name", None)
    batch.pop("frames_missing", None)
    batch.pop("frame_ids", None)  # cache key only (RenderCache), not a tensor
    # curriculum occ weight (train.py:476)
    w = 1.0 if it <= cfg.num_iters_geo_only else cfg.weight_occ_loss
    batch["weight_occ"] = np.asarray(w, np.float32)
    return batch


def _has_frames(batch) -> bool:
    return "images_depth" in batch and "images_color" in batch


class RenderCache:
    """Device-side LRU over Trainer.precompute_views results, keyed per
    (chunk name, selected frame ids).

    The input/target raycast marches and the depth->normals chain depend only
    on the batch, never on model parameters, yet the reference recomputes
    them every step (train.py:563,590). Caching them per (chunk, frames)
    makes every revisit of a chunk skip ~half the per-step march cost with
    bit-identical losses. Entries live on device ((F, ...) leading-axis
    slices); a batch of all-hits is passed to Trainer.step as a tuple of
    per-sample entries and concatenated inside the compiled step (no extra
    host dispatches on the hot path)."""

    def __init__(self, trainer: Trainer, capacity: int):
        from collections import OrderedDict

        self.trainer = trainer
        self.capacity = capacity
        self.hits = 0
        self.misses = 0
        self._d: "OrderedDict" = OrderedDict()

    def lookup(self, batch, names, frame_ids):
        """Per-sample precomp entries for this batch (tuple, len B).

        Hits and misses are PER SAMPLE: only the missing samples are
        recomputed, batched into one gathered sub-batch (epoch reshuffling
        re-pairs chunks every epoch, so an all-or-nothing batch cache would
        almost never hit in real training). precompute_views has no
        cross-sample reductions, so sub-batch composition cannot change the
        per-sample results — bit-identity holds
        (tests/test_train_step.py::test_render_cache_training_bit_identical)."""
        B = len(names)
        if frame_ids is None:
            frame_ids = [()] * B
        keys = [
            (n, tuple(np.asarray(f).ravel().tolist()))
            for n, f in zip(names, frame_ids)
        ]
        missing = [i for i, k in enumerate(keys) if k not in self._d]
        self.hits += B - len(missing)
        self.misses += len(missing)
        if missing:
            idx = jnp.asarray(missing)
            # gather ONLY the tensors precompute_views reads — each eager
            # device gather pays the relay's fixed dispatch cost, and the
            # jitted precompute would DCE unused args anyway
            needed = ("input", "target_sdf", "images_depth", "images_view",
                      "images_intrinsic")
            sub = {k: batch[k][idx] for k in needed if k in batch}
            pre = self.trainer.precompute_views(sub)
            rows = next(iter(pre.values())).shape[0]  # len(missing) * n_frames
            F = rows // len(missing)
            for j, i in enumerate(missing):
                self._d[keys[i]] = jax.tree_util.tree_map(
                    lambda a, j=j: a[j * F : (j + 1) * F], pre
                )
        for k in keys:
            self._d.move_to_end(k)
        out = tuple(self._d[k] for k in keys)  # before eviction: capacity < B
        while len(self._d) > self.capacity:
            self._d.popitem(last=False)
        return out


def _dump_visuals(trainer, cfg, gen_state, batch, it, epoch, save_dir, flags):
    """Mesh/PNG dumps of the current batch's predictions (reference
    save_predictions call, train.py:842-849)."""
    from ..utils import visualize

    inp = np.asarray(batch["input"])
    msk = np.asarray(batch["mask"])
    occ_l, sdf_p, color_p, sem_p = trainer.generator.apply(
        {"params": gen_state.params, "batch_stats": gen_state.batch_stats},
        batch["input"], batch["mask"],
        pred_color=flags.pred_color, pred_sdf=True,
        pred_semantic=flags.pred_semantic, train=False,
    )
    occ = 1.0 / (1.0 + np.exp(-np.asarray(occ_l)[..., 0])) > 0.5
    sdf_p = np.asarray(sdf_p)[..., 0]
    color_p = np.asarray(color_p) if color_p is not None else None
    sem_p = np.asarray(sem_p) if sem_p is not None else None
    out_dir = os.path.join(save_dir, f"iter{it}-epoch{epoch}", "train")
    tgt = np.asarray(batch["target_sdf"])
    for b in range(min(2, inp.shape[0])):
        pred_sdf_vis = np.where(
            (np.abs(sdf_p[b]) < cfg.truncation) & occ[b], sdf_p[b], -np.inf
        )
        visualize.save_predictions(
            out_dir,
            f"sample{b}",
            inp[b],
            np.clip(tgt[b], -cfg.truncation, cfg.truncation),
            np.asarray(batch["target_colors"])[b] if "target_colors" in batch else None,
            np.asarray(batch["semantics"])[b] if "semantics" in batch else None,
            pred_sdf_vis,
            color_p[b] if color_p is not None else None,
            sem_p[b] if sem_p is not None else None,
            truncation=cfg.truncation,
            color_space=cfg.color_space,
        )


def run_training(
    cfg: TrainConfig,
    train_dataset,
    val_dataset=None,
    save_dir: str = "./logs",
    max_epoch: Optional[int] = None,
    start_epoch: int = 0,
    start_iter: int = 0,
    retrain: str = "",
    retrain_disc: str = "",
    log_every: int = 20,
    ckpt_every_iters: int = 10000,
    seed: int = 0,
    vgg=None,
    vis_at_epoch_end: bool = True,
    steps_per_call: int = 1,
):
    """Train to max_epoch. Returns (gen_state, disc_state).

    Multi-host: when this process is part of a jax.distributed job
    (process_count > 1, see parallel.multihost.initialize), each host feeds
    its interleaved slice of the global batch, the jitted step runs the same
    GSPMD program on every host, and only process 0 writes checkpoints, logs,
    and visual dumps."""
    from ..data.pipeline import batch_iterator
    from ..parallel import multihost

    n_proc = jax.process_count()
    primary = jax.process_index() == 0
    if n_proc > 1:
        assert cfg.batch_size % n_proc == 0, (cfg.batch_size, n_proc)
    local_bs = cfg.batch_size // n_proc

    os.makedirs(save_dir, exist_ok=True)
    mesh = make_mesh()
    trainer = Trainer(cfg, vgg=vgg)
    gen_state, disc_state = state_lib.init_states(cfg, jax.random.PRNGKey(seed))
    epoch0 = start_epoch
    if retrain:
        gen_state, disc_state, epoch0 = state_lib.load_any_checkpoint(
            retrain, gen_state, disc_state
        )
        epoch0 = max(epoch0, start_epoch)
        print(f"loaded checkpoint {retrain} (epoch {epoch0})")
    if retrain_disc and disc_state is not None:
        # discriminator from a separate checkpoint (reference train.py:43,
        # :171-178); the generator slot of that checkpoint is discarded
        _, d2, _ = state_lib.load_any_checkpoint(retrain_disc, gen_state, disc_state)
        if d2 is None:
            raise ValueError(
                f"--retrain_disc {retrain_disc!r}: checkpoint has no "
                "discriminator state"
            )
        disc_state = d2
        print(f"loaded disc checkpoint {retrain_disc}")
    gen_state = replicate_state(gen_state, mesh)
    if disc_state is not None:
        disc_state = replicate_state(disc_state, mesh)

    log = TrainLog(save_dir, has_val=val_dataset is not None) if primary else None
    acc = MetricsAccumulator()
    timer = PhaseTimer(report_every=100)
    # render cache: single-host only (entries are per-host device slices;
    # under multi-host the global batch assembly would need per-process
    # cache coherence for no extra win — each host could cache its own
    # slice, left for when multi-host perf matters)
    render_cache = (
        RenderCache(trainer, cfg.cache_renders)
        if cfg.cache_renders > 0 and n_proc == 1
        else None
    )

    # preemption-safe checkpointing (an improvement over the reference's
    # skip-and-continue-only failure handling, SURVEY.md §5): SIGTERM/SIGINT
    # request a checkpoint at the next step boundary before exiting
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        print(f"signal {signum}: checkpointing at next step boundary")
        stop_requested["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:  # not in main thread
            pass
    it = start_iter if start_iter > 0 else epoch0 * max(1, len(train_dataset) // cfg.batch_size)
    rng = jax.random.PRNGKey(seed + 1)
    max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch

    start = time.time()
    last_batch = None
    last_flags = None
    for epoch in range(epoch0, max_epoch):
        if n_proc > 1:
            it_batches = batch_iterator(
                train_dataset, local_bs, shuffle=False,
                indices=multihost.local_indices(
                    len(train_dataset), cfg.batch_size, seed=seed, epoch=epoch
                ),
            )
        else:
            it_batches = batch_iterator(
                train_dataset, cfg.batch_size, shuffle=True, seed=seed + epoch
            )
        # steps_per_call > 1: buffer (batch, rng, precomp) triples and
        # dispatch them as ONE jitted lax.scan (Trainer.step_many) —
        # amortizes the per-dispatch host overhead (~25-130 ms on a
        # relay-attached TPU). Windows flush when full, when the curriculum
        # flags change (they are jit-static per window), and at epoch end.
        window: list = []
        wflags: Optional[StepFlags] = None

        def _stack_window(items):
            from jax.sharding import NamedSharding, PartitionSpec as P

            def one(*ls):
                a = jnp.stack(ls)
                if (
                    a.ndim >= 2
                    and a.shape[1] > 0
                    and a.shape[1] % mesh.shape["data"] == 0
                ):
                    return jax.device_put(a, NamedSharding(mesh, P(None, "data")))
                return jax.device_put(a, NamedSharding(mesh, P()))

            return jax.tree_util.tree_map(one, *items)

        def _flush_window():
            """Dispatch buffered steps; returns per-step host metric dicts."""
            nonlocal gen_state, disc_state
            if not window:
                return []
            if len(window) == 1:
                b, k, p = window[0]
                gen_state, disc_state, m = trainer.step(
                    gen_state, disc_state, b, k, wflags, precomp=p
                )
                rows = [jax.device_get(m)]
            else:
                batches = _stack_window([w[0] for w in window])
                rngs = jnp.stack([w[1] for w in window])
                precomps = (
                    None
                    if window[0][2] is None
                    else _stack_window([w[2] for w in window])
                )
                gen_state, disc_state, ms = trainer.step_many(
                    gen_state, disc_state, batches, rngs, wflags, precomps
                )
                ms = jax.device_get(ms)
                rows = [
                    {kk: vv[i] for kk, vv in ms.items()} for i in range(len(window))
                ]
            window.clear()
            return rows

        def _post_step(row, epoch):
            """Per-iteration bookkeeping after a dispatched step."""
            nonlocal it
            it += 1
            with timer.phase("log"):
                acc.add(row)
                if it % log_every == 0 and log is not None:
                    log.log_train(epoch, it, acc.means(), time.time() - start)
                if ckpt_every_iters and it % ckpt_every_iters == 0:
                    # all hosts call: orbax saves are collective (state.py)
                    state_lib.save_checkpoint(
                        os.path.join(save_dir, f"model-iter{it}-epoch{epoch}"),
                        gen_state,
                        disc_state,
                        epoch,
                    )
            timer.step()

        for batch in it_batches:
            with timer.phase("setup"):
                batch_names = batch.get("name")
                batch_frame_ids = batch.get("frame_ids")
                have_frames = _has_frames(batch)
                if n_proc > 1:
                    # the skip decision must agree across hosts or the GSPMD
                    # program deadlocks — take the conjunction
                    from jax.experimental import multihost_utils

                    have_frames = bool(
                        multihost_utils.process_allgather(
                            np.asarray(have_frames)
                        ).all()
                    )
                # iter of THIS batch's step: `it` advances only at dispatch
                it_next = it + len(window)
                flags = StepFlags.for_iter(it_next, cfg, have_frames=have_frames)
                if flags.use_2d and not have_frames:
                    continue  # reference skip (train.py:428-432)
                if window and flags != wflags:
                    for row in _flush_window():
                        _post_step(row, epoch)
                    it_next = it
                    flags = StepFlags.for_iter(it_next, cfg, have_frames=have_frames)
                batch = _prepare_batch(batch, cfg, it_next)
                if n_proc > 1:
                    batch = multihost.make_global_batch(batch, mesh)
                else:
                    batch = shard_batch(batch, mesh)
                precomp = None
                if (
                    render_cache is not None
                    and flags.use_2d
                    and batch_names is not None
                ):
                    precomp = render_cache.lookup(
                        batch, batch_names, batch_frame_ids
                    )
                rng, krng = jax.random.split(rng)
                if window and (precomp is None) != (window[0][2] is None):
                    # a cache-availability change mid-window would break the
                    # scan's pytree structure — flush first
                    for row in _flush_window():
                        _post_step(row, epoch)
            with timer.phase("step"):
                window.append((batch, krng, precomp))
                wflags = flags
                rows = (
                    _flush_window()
                    if len(window) >= max(1, steps_per_call)
                    or stop_requested["flag"]
                    else []
                )
            last_batch = batch
            last_flags = flags
            for row in rows:
                _post_step(row, epoch)
            if n_proc > 1:
                # preemption signals usually hit one host; the collective
                # checkpoint below needs every process to join, so agree on
                # the stop flag first (any host stopping stops all)
                from jax.experimental import multihost_utils

                stop_requested["flag"] = bool(
                    multihost_utils.process_allgather(
                        np.asarray(stop_requested["flag"])
                    ).any()
                )
            if stop_requested["flag"]:
                state_lib.save_checkpoint(
                    os.path.join(save_dir, f"model-preempt-iter{it}"),
                    gen_state,
                    disc_state,
                    epoch,
                )
                if primary:
                    print(f"preemption checkpoint written at iter {it}; exiting")
                if log is not None:
                    log.close()
                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
                return gen_state, disc_state

        # end of epoch: flush any partial step window first
        for row in _flush_window():
            _post_step(row, epoch)

        # end of epoch: visual dumps (reference dumps meshes/PNGs of the last
        # train batch, train.py:771, 789-849)
        # (multi-host: skipped — the dump forwards the last *global* batch,
        # which would be a collective program only the primary joins)
        if vis_at_epoch_end and last_batch is not None and primary and n_proc == 1:
            try:
                _dump_visuals(
                    trainer, cfg, gen_state, last_batch, it, epoch, save_dir, last_flags
                )
            except Exception as e:  # vis must never kill training
                print(f"visual dump failed: {e}")

        # end of epoch: validation + checkpoint (train.py:1294-1320)
        if val_dataset is not None:
            val_acc = MetricsAccumulator()
            if n_proc > 1:
                val_batches = batch_iterator(
                    val_dataset, local_bs, shuffle=False,
                    indices=multihost.local_indices(
                        len(val_dataset), cfg.batch_size, seed=0, epoch=0
                    ),
                )
            else:
                val_batches = batch_iterator(
                    val_dataset, cfg.batch_size, shuffle=False, seed=0
                )
            for batch in val_batches:
                have_frames = _has_frames(batch)
                if n_proc > 1:
                    from jax.experimental import multihost_utils

                    have_frames = bool(
                        multihost_utils.process_allgather(np.asarray(have_frames)).all()
                    )
                flags = StepFlags.for_iter(it, cfg, have_frames=have_frames, train=False)
                if flags.use_2d and not have_frames:
                    continue
                batch = _prepare_batch(batch, cfg, it)
                if n_proc > 1:
                    batch = multihost.make_global_batch(batch, mesh)
                else:
                    batch = shard_batch(batch, mesh)
                rng, krng = jax.random.split(rng)
                _, _, metrics = trainer.step(gen_state, disc_state, batch, krng, flags)
                val_acc.add(jax.device_get(metrics))
            if log is not None:
                log.log_val(epoch, it, acc.means(), val_acc.means(), time.time() - start)
        acc.reset()
        if (epoch + 1) % cfg.save_epoch == 0 or epoch + 1 == max_epoch:
            # all hosts call: orbax saves are collective (state.py)
            state_lib.save_checkpoint(
                os.path.join(save_dir, f"model-epoch{epoch}"),
                gen_state,
                disc_state,
                epoch + 1,
            )
    if log is not None:
        log.close()
    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    return gen_state, disc_state
