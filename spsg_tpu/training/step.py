"""The jitted train/val step (TPU rebuild of the reference hot loop,
torch/train.py:419-757).

One call fuses, under a single jit: generator forward, 3D occupancy/SDF/
semantic losses, three differentiable raycasts (input / projected target /
prediction), depth+color 2D losses, VGG style/content, the discriminator
update and the generator adversarial term, and the generator optimizer step.

Design choices vs the reference (all SURVEY.md §7 "hard parts"):
  * dynamic sparse loc lists -> dense masks (chunks are dense; MXU-friendly);
  * skip-sample conditions (missing frames, unfillable depth holes) -> a
    runtime gate scalar multiplying the 2D losses and predicating the disc
    optimizer update via lax.cond (reference: `continue`, train.py:428-432,
    539-541). Known deviation: on an unfillable-depth sample the reference
    skips the *whole* batch including 3D losses; we zero only the 2D terms
    and still take the 3D gradient step (strictly more data used);
  * the reference updates the discriminator *then* computes the generator's
    adversarial loss against the updated disc (train.py:726-730). We
    replicate exactly by splitting the generator backward with jax.vjp:
    forward once -> disc update on stop-grad renders -> pull the adversarial
    cotangent back through the saved vjp. One forward, one backward.
  * curriculum gates are jit-static flags — a handful of recompiles per run
    instead of per-step Python branching.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data import category
from ..models import generator as gen_models
from ..losses import gan as gan_losses
from ..losses import geo as geo_losses
from ..losses import semantic as sem_losses
from ..losses import style as style_losses
from ..losses import twod as twod_losses
from ..ops import depth as depth_ops
from ..ops import normals3d
from ..ops.raycast import RaycastConfig, find_surface_crossings, raycast, shade_hits
from .config import StepFlags, TrainConfig
from .state import (
    DiscState,
    GenState,
    disc_optimizer,
    gen_optimizer,
    make_discriminator,
    make_generator,
)

NEG_INF = -jnp.inf
UNLABELED = 14


def _raycast_cfg(cfg: TrainConfig) -> RaycastConfig:
    return RaycastConfig(
        width=cfg.style_width,
        height=cfg.style_height,
        depth_min=cfg.raycast_depth_min / cfg.voxelsize,
        depth_max=cfg.raycast_depth_max / cfg.voxelsize,
        ray_increment=cfg.ray_increment,
        thresh_sample_dist=cfg.thresh_sample_dist,
        straggler_frac=cfg.straggler_frac,
        march_block=cfg.march_block,
        coarse_hops=cfg.coarse_hops,
        compact_across_batch=cfg.compact_across_batch,
        batch_group=cfg.march_group,
    )


def _sanitize(img, fill=0.0):
    return jnp.where(jnp.isfinite(img), img, fill)


class Trainer:
    """Owns models/optimizers and a cache of jitted step functions keyed by
    StepFlags (curriculum phases)."""

    def __init__(self, cfg: TrainConfig, vgg=None):
        self.cfg = cfg
        self.generator = make_generator(cfg)
        self.discriminator = make_discriminator(cfg) if cfg.weight_disc_loss > 0 else None
        self.gen_tx = gen_optimizer(cfg)
        self.disc_tx = disc_optimizer(cfg)
        self.vgg = vgg  # optional (model, params) tuple for style/content
        self.class_weights = jnp.asarray(category.CLASS_WEIGHTS, jnp.float32)
        self._jitted: Dict[StepFlags, Any] = {}

    # -- public API ---------------------------------------------------------

    def step(self, gen_state, disc_state, batch, rng, flags: StepFlags,
             precomp=None, donate: bool = True):
        """One train/val step. ``donate=False`` disables input-state buffer
        donation: XLA:CPU deadlocks in a cross-module all-reduce rendezvous
        when donation aliases large sharded state buffers (reproduced at the
        flagship shapes on an 8/4-device virtual CPU mesh — one partition
        stalls at a different op_id; tiny shapes unaffected). Real-shape CPU
        dryruns pass donate=False; the TPU path keeps donation."""
        key = (flags, precomp is not None, donate)
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(self._step, flags),
                donate_argnums=(0, 1) if (flags.train and donate) else (),
            )
            self._jitted[key] = fn
        vgg_params = self.vgg[1] if self.vgg is not None else None
        return fn(gen_state, disc_state, batch, rng, vgg_params, precomp)

    def step_many(self, gen_state, disc_state, batches, rngs, flags: StepFlags,
                  precomps=None, donate: bool = True):
        """Run K consecutive train steps inside ONE jitted lax.scan.

        ``batches`` (and ``precomps``, if given) are pytrees with a leading
        (K, ...) axis; ``rngs`` is (K, 2) PRNG keys. Returns the final
        states and metrics stacked to (K,) per entry — same math as K
        sequential :meth:`step` calls (equal to ulp tolerance; the scanned
        body compiles with different fusion, tests/test_train_step.py).

        Why: each host->device dispatch costs ~25-130 ms on a relay-attached
        TPU (CLAUDE.md) — a meaningful fraction of the 0.57 s full step — and
        sub-ms on directly-attached chips; batching K steps per dispatch
        amortizes it. The curriculum ``flags`` are static for the window, so
        the host loop flushes windows at curriculum boundaries.

        ``donate=False``: same XLA:CPU donation-deadlock escape hatch as
        :meth:`step` — large sharded state buffers + donation hang a
        virtual-CPU mesh in an all-reduce rendezvous."""
        key = ("many", flags, precomps is not None, donate)
        fn = self._jitted.get(key)
        if fn is None:

            def many(gen_state, disc_state, batches, rngs, vgg_params, precomps):
                def body(carry, xs):
                    g, d = carry
                    batch, rng, pre = xs
                    g, d, m = self._step(flags, g, d, batch, rng, vgg_params, pre)
                    return (g, d), m

                (g, d), ms = jax.lax.scan(
                    body, (gen_state, disc_state), (batches, rngs, precomps)
                )
                return g, d, ms

            fn = jax.jit(
                many,
                donate_argnums=(0, 1) if (flags.train and donate) else (),
            )
            self._jitted[key] = fn
        vgg_params = self.vgg[1] if self.vgg is not None else None
        return fn(gen_state, disc_state, batches, rngs, vgg_params, precomps)

    def precompute_views(self, batch):
        """Parameter-independent per-(chunk, frame) view precomputation.

        The input and projected-target raycast marches, the depth->normals
        chain, and the missing-color occupancy masks depend only on the batch
        (SDF grids, depth images, cameras) — never on model parameters — yet
        the reference recomputes them every step (train.py:563,590 and :537,
        :546-554). Computing them once per (chunk, frame) and feeding the
        results back as batch tensors removes ~half of the per-step march
        cost with BIT-IDENTICAL losses: the cached march hits are exactly
        what the in-step march would produce, and shading stays in-step so
        color augmentation and curriculum flags still apply.

        Returns a dict of arrays in flattened (B*F, ...) frame-batch layout:
          in_hit/in_hit_idx/in_depth         input-grid surface hits
          tgt_hit/tgt_hit_idx/tgt_depth      target-grid hits (project_targets)
          images_normals (B*F,H,W,3)         from the depth chain
          frames_ok (B*F,)                   depth holes filled successfully
          missing2d/tgt_mask2d (B*F,H,W) u8  only when weight_missing_color>1
        """
        fn = self._jitted.get("__precompute__")
        if fn is None:
            fn = jax.jit(self._precompute_views)
            self._jitted["__precompute__"] = fn
        return fn(batch)

    def _precompute_views(self, batch):
        cfg = self.cfg
        trunc = cfg.truncation
        rc = _raycast_cfg(cfg)

        images_depth = batch["images_depth"]
        if images_depth.ndim == 4:  # (B, F, H, W)
            n_frames = images_depth.shape[1]
            images_depth = images_depth.reshape((-1,) + images_depth.shape[2:])
            view = batch["images_view"].reshape(-1, 4, 4)
            intr = batch["images_intrinsic"].reshape(-1, 4)
        else:
            n_frames = 1
            view = batch["images_view"]
            intr = batch["images_intrinsic"]

        def rep(g):
            return jnp.repeat(g, n_frames, axis=0) if n_frames > 1 else g

        target_sdf = rep(geo_losses.compute_targets(batch["target_sdf"], trunc))
        input_sdf = rep(batch["input"][..., 0])
        input_valid = jnp.abs(input_sdf) < trunc
        tgt_valid = jnp.abs(target_sdf) < trunc

        images_normals, _, frames_ok = depth_ops.depth_to_normals(
            images_depth, intr, cfg.max_depth_fill_iters
        )

        out = dict(images_normals=images_normals, frames_ok=frames_ok)
        if cfg.pair_raycast and cfg.project_targets:
            # one stacked march for both scene-like grids (bit-identical;
            # with compact_across_batch the straggler tail is shared)
            B = input_sdf.shape[0]
            hits = find_surface_crossings(
                jnp.concatenate([input_sdf, target_sdf], axis=0),
                jnp.concatenate([input_valid, tgt_valid], axis=0),
                jnp.concatenate([view, view], axis=0),
                jnp.concatenate([intr, intr], axis=0),
                rc,
            )
            out.update(
                in_hit=hits["hit"][:B], in_hit_idx=hits["hit_idx"][:B],
                in_depth=hits["depth"][:B],
                tgt_hit=hits["hit"][B:], tgt_hit_idx=hits["hit_idx"][B:],
                tgt_depth=hits["depth"][B:],
            )
        else:
            in_hits = find_surface_crossings(input_sdf, input_valid, view, intr, rc)
            out.update(
                in_hit=in_hits["hit"], in_hit_idx=in_hits["hit_idx"],
                in_depth=in_hits["depth"],
            )
            if cfg.project_targets:
                tgt_hits = find_surface_crossings(target_sdf, tgt_valid, view, intr, rc)
                out.update(
                    tgt_hit=tgt_hits["hit"], tgt_hit_idx=tgt_hits["hit_idx"],
                    tgt_depth=tgt_hits["depth"],
                )
        if cfg.weight_missing_color > 1:
            from ..ops.raycast import raycast_occ

            rc_occ = dataclasses.replace(
                rc, depth_max=cfg.raycast_occ_depth_max / cfg.voxelsize
            )
            input_occ = jnp.abs(input_sdf) < trunc - 0.01
            missing3d = geo_losses.missing_geo_mask(input_occ, target_sdf, trunc)
            out["missing2d"] = raycast_occ(missing3d, view, intr, rc_occ)
            out["tgt_mask2d"] = raycast_occ(
                jnp.abs(target_sdf) < 1, view, intr, rc_occ
            )
        return out

    # -- internals ----------------------------------------------------------

    def _gen_apply(self, params, batch_stats, batch, flags: StepFlags):
        variables = {"params": params, "batch_stats": batch_stats}
        if flags.train:
            def apply_train(p, bs, x, m):
                (outs, mutated) = self.generator.apply(
                    {"params": p, "batch_stats": bs},
                    x,
                    m,
                    pred_color=flags.pred_color,
                    pred_sdf=True,
                    pred_semantic=flags.pred_semantic,
                    train=True,
                    mutable=["batch_stats"],
                )
                return outs, mutated["batch_stats"]

            if self.cfg.compact_resid:
                # save ONLY the lane-aligned compact conv outputs tagged in
                # models/generator.py (_compact_tag): convs are never
                # recomputed (their outputs are the saved residuals) and no
                # padded (B,Z,Y,X,C->128-lane) activation survives to the
                # backward — cuts the step's peak HBM ~4x so larger batches
                # fit (tools/memcheck.py, docs/DESIGN.md round-3 findings)
                from jax.ad_checkpoint import checkpoint_policies

                apply_train = jax.checkpoint(
                    apply_train,
                    policy=checkpoint_policies.save_only_these_names(
                        gen_models.COMPACT_RESID_NAME
                    ),
                )
            outs, new_bstats = apply_train(
                params, batch_stats, batch["input"], batch["mask"]
            )
            return outs, new_bstats
        outs = self.generator.apply(
            variables,
            batch["input"],
            batch["mask"],
            pred_color=flags.pred_color,
            pred_sdf=True,
            pred_semantic=flags.pred_semantic,
            train=False,
        )
        return outs, batch_stats

    def _disc_apply(self, params, spectral_stats, img, update_stats):
        variables = {"params": params, "spectral_stats": spectral_stats}
        if update_stats:
            out, mutated = self.discriminator.apply(
                variables, img, update_sn_stats=True, mutable=["spectral_stats"]
            )
            return out, mutated["spectral_stats"]
        out = self.discriminator.apply(variables, img, update_sn_stats=False)
        return out, spectral_stats

    def _forward_losses(self, params, batch_stats, batch, flags: StepFlags,
                        vgg_params=None, precomp=None):
        """Everything except the adversarial generator term. Returns
        ((loss_rest, synth_for_disc), aux)."""
        cfg = self.cfg
        trunc = cfg.truncation
        metrics: Dict[str, jax.Array] = {}

        (occ_logits, pred_sdf, pred_color, pred_sem), new_bstats = self._gen_apply(
            params, batch_stats, batch, flags
        )
        occ_logits = occ_logits[..., 0]
        pred_sdf_g = pred_sdf[..., 0]

        target_sdf = geo_losses.compute_targets(batch["target_sdf"], trunc)
        known = None
        if cfg.use_loss_masking and "known" in batch:
            known = batch["known"] <= 1  # reference train.py:445-446
        input_sdf = batch["input"][..., 0]
        input_occ = jnp.abs(input_sdf) < trunc - 0.01
        weight = geo_losses.dense_geo_weights(
            target_sdf, input_occ, trunc, cfg.weight_surf_geo, cfg.weight_missing_geo
        )
        # zero loss where the model predicts empty (train.py:479-481)
        empty = jax.nn.sigmoid(jax.lax.stop_gradient(occ_logits)) < 0.5
        weight = jnp.where(empty, 0.0, weight)

        loss_occ = geo_losses.occ_loss(target_sdf, occ_logits, known, weight, trunc)
        # weight_occ is 1 during the geo-only phase, weight_occ_loss after
        # (train.py:476)
        loss = batch["weight_occ"] * loss_occ
        metrics["loss_occ"] = loss_occ
        metrics["iou_occ"] = geo_losses.occ_iou(target_sdf, occ_logits, known, trunc)

        if flags.pred_sdf and cfg.weight_sdf_loss > 0:
            loss_sdf = geo_losses.sdf_l1_loss(
                target_sdf, pred_sdf_g, known, weight, cfg.logweight_sdf
            )
            loss = loss + cfg.weight_sdf_loss * loss_sdf
            metrics["loss_sdf"] = loss_sdf

        # sparsification mask of the prediction (train.py:493-498)
        surface_pred = (jnp.abs(jax.lax.stop_gradient(pred_sdf_g)) < trunc) & ~empty

        if flags.pred_semantic and cfg.pred_3d_semantic:
            loss_sem = sem_losses.semantic_3d_loss(
                pred_sem, batch["semantics"], surface_pred, self.class_weights
            )
            loss = loss + cfg.weight_semantic_loss * loss_sem
            metrics["loss_semantic"] = loss_sem

        synth = None
        target_img = None
        valid_patches = None
        gates = (jnp.zeros(()), jnp.zeros(()))  # (combined, depth-fill only)
        sw_real = None
        sw_fake = None
        wcd = None
        if flags.use_2d:
            (
                loss2d, synth, target_img, valid_patches, gates, metrics2d,
                sw_real, sw_fake, wcd,
            ) = self._2d_losses(
                batch, flags, target_sdf, input_occ, pred_sdf_g, pred_color, pred_sem,
                surface_pred, vgg_params=vgg_params, precomp=precomp,
            )
            loss = loss + loss2d
            metrics.update(metrics2d)

        aux = dict(
            new_bstats=new_bstats,
            metrics=metrics,
            target_img=target_img,
            valid_patches=valid_patches,
            gate2d=gates[0],  # combined (depth-fill AND enough valid pixels)
            gate_depth=gates[1],  # depth-fill only (reference whole-batch skip)
            sample_weight_real=sw_real,
            sample_weight_fake=sw_fake,
            weight_color_disc=wcd,
        )
        if synth is None:
            synth = jnp.zeros((batch["input"].shape[0], 1, 1, 1), jnp.float32)
        return (loss, synth), aux

    def _2d_losses(
        self, batch, flags, target_sdf, input_occ, pred_sdf_g, pred_color, pred_sem,
        surface_pred, vgg_params=None, precomp=None,
    ):
        """The 2D view-guided block (reference train.py:524-752), minus the
        adversarial terms which are handled outside."""
        cfg = self.cfg
        trunc = cfg.truncation
        rc = _raycast_cfg(cfg)
        metrics: Dict[str, jax.Array] = {}
        B = target_sdf.shape[0]

        # multiple frames per chunk: (B, F, ...) image tensors flatten to a
        # (B*F) frame batch and every volume repeats F times (reference
        # RaycastRGBD max_num_frames + compute_view_matrix, style.py:9-16)
        images_depth = batch["images_depth"]
        if images_depth.ndim == 4:  # (B, F, H, W)
            n_frames = images_depth.shape[1]
            images_depth = images_depth.reshape((-1,) + images_depth.shape[2:])
            images_color = batch["images_color"].reshape(
                (-1,) + batch["images_color"].shape[2:]
            )
            view = batch["images_view"].reshape(-1, 4, 4)
            intr = batch["images_intrinsic"].reshape(-1, 4)
        else:
            n_frames = 1
            images_color = batch["images_color"]
            view = batch["images_view"]  # (B,4,4) cam->grid
            intr = batch["images_intrinsic"]
        images_color = jnp.transpose(images_color, (0, 2, 3, 1))  # (B*F,H,W,3)

        def rep(g):
            return jnp.repeat(g, n_frames, axis=0) if n_frames > 1 else g

        target_sdf = rep(target_sdf)
        input_occ = rep(input_occ)
        pred_sdf_g = rep(pred_sdf_g)
        surface_pred = rep(surface_pred)
        if pred_color is not None:
            pred_color = rep(pred_color)
        if pred_sem is not None:
            pred_sem = rep(pred_sem)
        semantics_grid_labels = rep(batch["semantics"]) if "semantics" in batch else None
        input_grid = rep(batch["input"])
        target_colors255 = rep(batch["target_colors"])
        B = target_sdf.shape[0]  # = original B * n_frames from here on

        if precomp is not None:
            # parameter-independent view precomputation (precompute_views):
            # the depth chain, occupancy masks, and the input/target march
            # hits arrive as batch tensors — bit-identical to recomputing
            images_normals = precomp["images_normals"]
            frames_ok = precomp["frames_ok"]
        else:
            images_normals, _, frames_ok = depth_ops.depth_to_normals(
                images_depth, intr, cfg.max_depth_fill_iters
            )
        # reference skips the sample when holes remain (train.py:539-541)
        gate2d = jnp.all(frames_ok).astype(jnp.float32)

        view_inv_rot = jnp.linalg.inv(view)[:, :3, :3]

        # --- input grids (train.py:556-577) ---
        input_sdf = input_grid[..., 0]
        input_valid = jnp.abs(input_sdf) < trunc
        input_colors01 = input_grid[..., 1:4]
        input_normals = normals3d.surface_normals(
            input_sdf, jnp.ones_like(input_valid), view_inv_rot
        )

        # --- per-pixel color weights for missing regions (train.py:546-554) ---
        weight_color = None
        missing2d = None
        if cfg.weight_missing_color > 1:
            if precomp is not None:
                missing2d = precomp["missing2d"].astype(bool)
                tgt_mask2d = precomp["tgt_mask2d"].astype(bool)
            else:
                from ..ops.raycast import raycast_occ

                # the reference's RaycastOcc uses a shallower 4 m range than
                # the color raycaster (train.py:146-148)
                rc_occ = dataclasses.replace(
                    rc, depth_max=cfg.raycast_occ_depth_max / cfg.voxelsize
                )
                missing3d = geo_losses.missing_geo_mask(input_occ, target_sdf, trunc)
                missing2d = raycast_occ(missing3d, view, intr, rc_occ).astype(bool)
                tgt_mask2d = raycast_occ(jnp.abs(target_sdf) < 1, view, intr, rc_occ).astype(bool)
            weight_color = jnp.where(tgt_mask2d & missing2d, cfg.weight_missing_color, 1.0)

        # --- target grids (train.py:579-616) ---
        tgt_valid = jnp.abs(target_sdf) < trunc
        tgt_colors01 = target_colors255 / 255.0
        tgt_normals = jax.lax.stop_gradient(
            normals3d.surface_normals(target_sdf, tgt_valid, view_inv_rot)
        )
        sem_onehot = (
            jax.nn.one_hot(semantics_grid_labels.astype(jnp.int32), 15)[..., :14]
            if semantics_grid_labels is not None
            else jnp.zeros(target_sdf.shape + (14,), jnp.float32)
        )

        # --- prediction grids (train.py:617-632) ---
        pred_normals = normals3d.surface_normals(pred_sdf_g, surface_pred, view_inv_rot)
        color01 = (
            (pred_color + 1.0) * 0.5
            if flags.pred_color
            else jnp.zeros(pred_sdf_g.shape + (3,), jnp.float32)
        )
        semantic_grid = (
            pred_sem
            if flags.pred_semantic
            else jnp.full(pred_sdf_g.shape + (14,), 14.0, jnp.float32)
        )

        # --- one fused march for input + projected-target + prediction ---
        # (the reference launches three separate CUDA raycasts,
        # train.py:563,590,626; stacking them along the batch axis runs one
        # march while_loop instead of three — the march dominates 2D cost).
        # Shading is per grid: the march is stop-grad anyway, and shading the
        # input/target grids under stop_gradient means their backward scatter
        # is never built — the VJP scatters only the prediction's B rows
        # instead of all n_stack*B.
        n_stack = 3 if cfg.project_targets else 2
        stack = lambda *xs: jnp.concatenate(xs, axis=0)
        sg = jax.lax.stop_gradient
        if precomp is not None:
            # cached input/target march hits: only the shading gathers run
            # in-step (cheap); the prediction march stays — it depends on the
            # evolving pred SDF
            in_hits = {
                "hit": precomp["in_hit"], "hit_idx": precomp["in_hit_idx"],
                "depth": precomp["in_depth"],
            }
            rc_in = jax.tree_util.tree_map(
                sg,
                shade_hits(
                    sg(input_sdf), sg(input_colors01), sg(input_normals),
                    jnp.zeros(input_sdf.shape + (14,), jnp.float32),
                    in_hits, rc,
                ),
            )
            rc_tgt = None
            if cfg.project_targets:
                tgt_hits = {
                    "hit": precomp["tgt_hit"], "hit_idx": precomp["tgt_hit_idx"],
                    "depth": precomp["tgt_depth"],
                }
                rc_tgt = jax.tree_util.tree_map(
                    sg,
                    shade_hits(
                        sg(target_sdf), sg(tgt_colors01), tgt_normals,
                        sg(sem_onehot), tgt_hits, rc,
                    ),
                )
            rc_pred = raycast(
                pred_sdf_g, surface_pred, color01, pred_normals,
                semantic_grid, view, intr, rc,
            )
        elif cfg.fuse_raycast:
            if cfg.project_targets:
                s_sdf = stack(sg(input_sdf), sg(target_sdf), sg(pred_sdf_g))
                s_valid = stack(input_valid, tgt_valid, surface_pred)
            else:
                s_sdf = stack(sg(input_sdf), sg(pred_sdf_g))
                s_valid = stack(input_valid, surface_pred)
            s_view = jnp.concatenate([view] * n_stack, axis=0)
            s_intr = jnp.concatenate([intr] * n_stack, axis=0)
            hits_all = find_surface_crossings(s_sdf, s_valid, s_view, s_intr, rc)

            def hits_slice(a, b):
                return {
                    k: (v[a:b] if k != "n_iters" else v) for k, v in hits_all.items()
                }

            rc_in = jax.tree_util.tree_map(
                sg,
                shade_hits(
                    input_sdf, input_colors01, input_normals,
                    jnp.zeros_like(sem_onehot) if cfg.project_targets
                    else jnp.zeros_like(semantic_grid),
                    hits_slice(0, B), rc,
                ),
            )
            if cfg.project_targets:
                rc_tgt = jax.tree_util.tree_map(
                    sg,
                    shade_hits(
                        target_sdf, tgt_colors01, tgt_normals, sem_onehot,
                        hits_slice(B, 2 * B), rc,
                    ),
                )
            else:
                rc_tgt = None
            rc_pred = shade_hits(
                pred_sdf_g, color01, pred_normals, semantic_grid,
                hits_slice((n_stack - 1) * B, n_stack * B), rc,
            )
        elif cfg.pair_raycast and cfg.project_targets:
            # paired march: input+target stack into ONE march (similar trip
            # counts — both are scene TSDFs), the noisier prediction keeps
            # its own; shading stays per grid. Bit-identical outputs.
            p_sdf = stack(sg(input_sdf), sg(target_sdf))
            p_valid = stack(input_valid, tgt_valid)
            p_view = jnp.concatenate([view, view], axis=0)
            p_intr = jnp.concatenate([intr, intr], axis=0)
            hits_pair = find_surface_crossings(p_sdf, p_valid, p_view, p_intr, rc)
            pair_slice = lambda a, b: {
                k: (v[a:b] if k != "n_iters" else v) for k, v in hits_pair.items()
            }
            rc_in = jax.tree_util.tree_map(
                sg,
                shade_hits(
                    sg(input_sdf), sg(input_colors01), sg(input_normals),
                    jnp.zeros_like(sem_onehot), pair_slice(0, B), rc,
                ),
            )
            rc_tgt = jax.tree_util.tree_map(
                sg,
                shade_hits(
                    sg(target_sdf), sg(tgt_colors01), tgt_normals,
                    sg(sem_onehot), pair_slice(B, 2 * B), rc,
                ),
            )
            rc_pred = raycast(
                pred_sdf_g, surface_pred, color01, pred_normals,
                semantic_grid, view, intr, rc,
            )
        else:
            # three separate marches (reference structure, train.py:563,590,626):
            # each grid's while_loop exits at its own trip count
            rc_in = jax.tree_util.tree_map(
                sg,
                raycast(
                    sg(input_sdf), input_valid, sg(input_colors01),
                    sg(input_normals), jnp.zeros_like(semantic_grid),
                    view, intr, rc,
                ),
            )
            rc_tgt = None
            if cfg.project_targets:
                rc_tgt = jax.tree_util.tree_map(
                    sg,
                    raycast(
                        sg(target_sdf), tgt_valid, sg(tgt_colors01),
                        tgt_normals, sg(sem_onehot), view, intr, rc,
                    ),
                )
            rc_pred = raycast(
                pred_sdf_g, surface_pred, color01, pred_normals,
                semantic_grid, view, intr, rc,
            )

        normals_in = _sanitize(rc_in.normal)
        if flags.pred_color:
            in_color = _sanitize(rc_in.color * 2.0 - 1.0)
            input2d = jnp.concatenate([in_color, normals_in], axis=-1)
        else:
            input2d = normals_in

        target2d = None
        target2d_label = None
        if cfg.project_targets:
            if cfg.filter_proj_tgt:
                invalid_c = twod_losses.filter_proj_target(
                    rc_tgt.color, cfg.color_thresh, cfg.color_space
                )[..., None] | (rc_tgt.color == NEG_INF)
            else:
                invalid_c = rc_tgt.color == NEG_INF
            t_color = jnp.where(invalid_c, images_color, rc_tgt.color) * 2.0 - 1.0
            t_norm = jnp.where(rc_tgt.normal == NEG_INF, images_normals, rc_tgt.normal)
            if flags.pred_color:
                target2d = jnp.concatenate([t_color, t_norm], axis=-1)
            else:
                target2d = t_norm
            if flags.pred_semantic:
                target2d_label = sem_losses.rendered_semantic_label(rc_tgt.semantic)

        # --- depth L1 (train.py:634-641) ---
        loss_depth = twod_losses.depth_l1_loss(rc_pred.depth, images_depth, cfg.voxelsize)
        loss2d = cfg.weight_depth_loss * gate2d * loss_depth
        metrics["loss_depth"] = loss_depth

        # --- color L1 (train.py:642-648) ---
        if flags.pred_color and cfg.weight_color_loss > 0:
            loss_color = twod_losses.color_l1_loss(rc_pred.color, images_color, weight_color)
            loss2d = loss2d + cfg.weight_color_loss * gate2d * loss_color
            metrics["loss_color"] = loss_color

        # --- assemble rendered stack + validity (train.py:649-662) ---
        if flags.pred_color:
            raycast_stack = jnp.concatenate([rc_pred.color, rc_pred.normal], axis=-1)
        else:
            raycast_stack = rc_pred.normal
        valid_px = jax.lax.stop_gradient(raycast_stack) != NEG_INF
        num_valid = jnp.sum(valid_px)
        gate_numvalid = (num_valid > cfg.min_num_valid_2d).astype(jnp.float32)

        valid_patches = None
        weight_color_disc = None
        if self.discriminator is not None and cfg.patch_disc and cfg.patch_size < cfg.style_height:
            vp = self.discriminator.compute_valids(
                valid_px[..., -1:].astype(jnp.float32)
            )
            valid_patches = vp[..., 0] > cfg.valid_thresh
            gate_numvalid = gate_numvalid * (jnp.sum(valid_patches) > 0).astype(jnp.float32)
            if weight_color is not None:
                # per-patch disc weights from the missing-color map
                # (train.py:657-661)
                wcd = self.discriminator.compute_valids(weight_color[..., None])
                weight_color_disc = (
                    cfg.weight_missing_color * wcd / jnp.maximum(jnp.max(wcd), 1e-12)
                )

        # --- style/content (train.py:663-686) ---
        if (flags.compute_style or flags.compute_content) and self.vgg is not None:
            from ..data import colorspace

            style_pred = rc_pred.color
            style_tgt = images_color
            if cfg.color_space == "lab":
                invalid = style_pred == NEG_INF
                style_pred = jnp.where(
                    invalid, NEG_INF, colorspace.lab01_to_rgb(_sanitize(style_pred))
                )
                style_tgt = colorspace.lab01_to_rgb(style_tgt)
            style_pred, style_tgt = twod_losses.preprocess_rendered_target_images(
                style_pred, style_tgt
            )
            if missing2d is not None:
                # when weight_missing_color > 1 the reference restricts style/
                # content to missing regions by copying target pixels into
                # every non-missing render pixel (train.py:679-681,
                # style.py:24-29)
                style_pred = jnp.where(missing2d[..., None], style_pred, style_tgt)
            # vgg_params arrives as a jit ARGUMENT (threaded through step()):
            # capturing it from self.vgg would embed the weights as module
            # constants, which remote-compile transports may reject for size
            vgg_model = self.vgg[0]
            f_out = vgg_model.apply({"params": vgg_params}, style_pred)
            f_tgt = vgg_model.apply({"params": vgg_params}, style_tgt)
            l_style, l_content = style_losses.style_content_loss(
                f_out, f_tgt, flags.compute_style, flags.compute_content
            )
            g = gate2d * gate_numvalid
            loss2d = loss2d + g * (
                cfg.weight_style_loss * l_style + cfg.weight_content_loss * l_content
            )
            if flags.compute_style:
                metrics["loss_style"] = l_style
            if flags.compute_content:
                metrics["loss_content"] = l_content

        # --- 2D semantic CE (train.py:743-747) ---
        if flags.pred_semantic and not cfg.pred_3d_semantic and target2d_label is not None:
            loss_sem2d = sem_losses.semantic_2d_loss(
                rc_pred.semantic, target2d_label, self.class_weights
            )
            loss2d = loss2d + cfg.weight_semantic_loss * gate2d * loss_sem2d
            metrics["loss_semantic"] = loss_sem2d

        # --- disc inputs (train.py:688-701) ---
        synth = None
        target_img = None
        if flags.use_disc:
            tgt_stack = (
                jnp.concatenate([images_color, images_normals], axis=-1)
                if flags.pred_color
                else images_normals
            )
            synth_r, tgt_r = twod_losses.preprocess_rendered_target_images(
                raycast_stack, tgt_stack
            )
            if flags.pred_color:
                synth_r = synth_r.at[..., :3].multiply(2.0).at[..., :3].add(-1.0)
            if cfg.project_targets and target2d is not None:
                tgt_r = target2d
            elif flags.pred_color:
                tgt_r = tgt_r.at[..., :3].multiply(2.0).at[..., :3].add(-1.0)
            synth = jnp.concatenate([input2d, synth_r], axis=-1)
            target_img = jax.lax.stop_gradient(
                jnp.concatenate([input2d, tgt_r], axis=-1)
            )

        # --- per-sample percent-pixel weights (train.py:597-632, 705-715) ---
        sample_weight_real = None
        sample_weight_fake = None
        if cfg.weight_by_percent_pixels:
            if cfg.project_targets and rc_tgt is not None:
                tgt_invalid = invalid_c[..., 0]
                w = 1.0 - jnp.mean(tgt_invalid.astype(jnp.float32), axis=(1, 2))
                sample_weight_real = jnp.clip(w, 0.0, 0.3) / 0.3
            w = jnp.mean(
                (jax.lax.stop_gradient(rc_pred.color[..., 0]) != NEG_INF).astype(jnp.float32),
                axis=(1, 2),
            )
            sample_weight_fake = jnp.clip(w, 0.0, 0.3) / 0.3

        # gate: disc/adv terms require BOTH fillable depth and enough valid
        # rendered pixels (reference train.py:539-541 and :662); gate2d alone
        # is the depth-fill gate — the only condition under which the
        # reference skips the whole sample (`continue`, train.py:539-541)
        gate = gate2d * gate_numvalid
        return (
            loss2d, synth, target_img, valid_patches, (gate, gate2d), metrics,
            sample_weight_real, sample_weight_fake, weight_color_disc,
        )

    def _step(self, flags: StepFlags, gen_state: GenState, disc_state, batch, rng,
              vgg_params=None, precomp=None):
        cfg = self.cfg
        if isinstance(precomp, (list, tuple)):
            # per-sample cache entries (loop.RenderCache): concat inside the
            # compiled program so assembly costs no extra host dispatch
            precomp = {
                k: jnp.concatenate([p[k] for p in precomp], axis=0)
                for k in precomp[0]
            }

        fwd = lambda p: self._forward_losses(
            p, gen_state.batch_stats, batch, flags, vgg_params, precomp
        )
        (loss_and_synth, vjp_fn, aux) = jax.vjp(fwd, gen_state.params, has_aux=True)
        loss_rest, synth = loss_and_synth
        metrics = aux["metrics"]
        gate = aux["gate2d"]

        new_disc_state = disc_state
        gen_adv_cotangent = jnp.zeros_like(synth)
        if flags.use_disc and disc_state is not None:
            synth_sg = jax.lax.stop_gradient(synth)
            target_img = aux["target_img"]
            valid_patches = aux["valid_patches"]

            def disc_loss_fn(dparams, sstats, gp_rng):
                d_real, sstats1 = self._disc_apply(dparams, sstats, target_img, flags.train)
                d_fake, sstats2 = self._disc_apply(dparams, sstats1, synth_sg, flags.train)
                real_l, fake_l = gan_losses.discriminator_loss(
                    cfg.disc_loss_type,
                    d_real,
                    d_fake,
                    valid_patches if cfg.patch_disc else None,
                    aux["weight_color_disc"] if cfg.patch_disc else None,
                    sample_weight_real=aux["sample_weight_real"]
                    if cfg.weight_by_percent_pixels and cfg.disc_loss_type != "hinge"
                    else None,
                    sample_weight_fake=aux["sample_weight_fake"]
                    if cfg.weight_by_percent_pixels and cfg.disc_loss_type != "hinge"
                    else None,
                )
                if cfg.disc_loss_type.startswith("wgan"):
                    # wgan(-gp) scaling + gradient penalty (train.py:718-720)
                    dl = cfg.weight_disc_loss * 0.005 * (real_l + fake_l)
                    if cfg.disc_loss_type == "wgan_gp" and flags.train:
                        penalty = gan_losses.gradient_penalty(
                            lambda x: self._disc_apply(dparams, sstats, x, False)[0],
                            target_img,
                            synth_sg,
                            gp_rng,
                        )
                        dl = dl + 10.0 * penalty
                else:
                    dl = cfg.weight_disc_loss * (real_l + fake_l)
                return dl, (real_l, fake_l, sstats2)

            rng, gp_rng = jax.random.split(rng)
            (disc_l, (real_l, fake_l, new_sstats)), dgrads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(disc_state.params, disc_state.spectral_stats, gp_rng)
            metrics["loss_disc"] = disc_l
            metrics["loss_disc_real"] = real_l
            metrics["loss_disc_fake"] = fake_l

            if flags.train:

                def do_update(_):
                    updates, new_opt = self.disc_tx.update(
                        dgrads, disc_state.opt_state, disc_state.params
                    )
                    return DiscState(
                        params=optax.apply_updates(disc_state.params, updates),
                        spectral_stats=new_sstats,
                        opt_state=new_opt,
                    )

                def no_update(_):
                    return DiscState(
                        params=disc_state.params,
                        spectral_stats=new_sstats,
                        opt_state=disc_state.opt_state,
                    )

                # reference only steps the disc when enough pixels are valid
                # (train.py:662, 726-727)
                new_disc_state = jax.lax.cond(gate > 0, do_update, no_update, None)

            # generator adversarial loss against the *updated* disc
            # (train.py:730-732)
            def gen_adv_fn(s):
                d_fake, _ = self._disc_apply(
                    new_disc_state.params, new_disc_state.spectral_stats, s, False
                )
                return gan_losses.generator_loss(cfg.disc_loss_type, d_fake)

            gen_l, gen_adv_cotangent = jax.value_and_grad(gen_adv_fn)(synth)
            metrics["loss_gen"] = gen_l
            gen_adv_cotangent = cfg.weight_discgen_loss * gate * gen_adv_cotangent
            total_loss = loss_rest + cfg.weight_discgen_loss * gate * gen_l
        else:
            total_loss = loss_rest

        new_gen_state = gen_state
        if flags.train:
            (grads_params,) = vjp_fn((jnp.ones(()), gen_adv_cotangent))
            updates, new_opt = self.gen_tx.update(
                grads_params, gen_state.opt_state, gen_state.params
            )
            stepped = GenState(
                params=optax.apply_updates(gen_state.params, updates),
                batch_stats=aux["new_bstats"],
                opt_state=new_opt,
                step=gen_state.step + 1,
            )
            if cfg.skip_batch_on_bad_depth and flags.use_2d:
                # exact reference parity (train.py:539-541): unfillable depth
                # skips the WHOLE batch — no optimizer/batch-stats/step
                # change at all. Deliberately gate_depth, NOT the combined
                # gate: the reference's num_valid check (train.py:662) only
                # wraps the style/disc block (handled above) and still takes
                # the generator step with the 3D losses.
                new_gen_state = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(aux["gate_depth"] > 0, new, old),
                    gen_state,
                    stepped,
                )
            else:
                new_gen_state = stepped

        metrics["loss"] = total_loss
        return new_gen_state, new_disc_state, metrics
