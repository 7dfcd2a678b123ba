"""Whole-scene completion by sliding-window chunking with overlap stitching
(TPU rebuild of reference torch/test_scene_as_chunks.py:92-330).

The reference runs one 64x64x128 window at a time through the generator and
scatter-accumulates SDF/color/semantic sums + counts into scene-sized
buffers, masking away a pad-voxel border on stitched sides. Here windows are
**batched**: all non-empty window positions are gathered up front, padded to a
multiple of the window batch, and run through a single jitted batched forward
— this is the codebase's analog of context parallelism (SURVEY.md §5): the
window batch shards over the data mesh axis, so a whole scene's windows
spread across chips with no halo exchange (overlap is recomputed per window
and merged by summation).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import category, colorspace


def _prep_compact_scene(sdf, rgb, truncation, lab, zyx, pads):
    """Device-side compact-scene assembly: pipeline.assemble_sample math
    (scene_dataloader.py:222-253) + the reference pad fill values
    (test_scene_as_chunks.py:166-180). Module-level and jitted ONCE so
    repeated run_chunked_inference calls over same-shaped scenes reuse one
    executable instead of retracing per call (ADVICE r4); the scalar config
    rides in as hashable static kwargs.
    """
    Z, Y, X = zyx
    pad_z, pad_y, pad_x = pads
    empty = jnp.abs(sdf) > truncation
    m = ((sdf <= -1) & ~empty).astype(jnp.float32)
    col = rgb.astype(jnp.float32) / 255.0
    if lab:
        col = colorspace.rgb_to_lab01(col, xp=jnp)
    col = jnp.where(empty[..., None], 0.0, col)
    sin = jnp.concatenate(
        [jnp.clip(sdf, -truncation, truncation)[..., None], col], -1
    )
    sin = jnp.pad(sin, ((0, pad_z), (0, pad_y), (0, pad_x), (0, 0)))
    fill = jnp.float32(-truncation)
    sin = sin.at[Z:, :, :, 0].set(fill)
    sin = sin.at[:, Y:, :, 0].set(fill)
    sin = sin.at[:, :, X:, 0].set(fill)
    mp = jnp.pad(m[..., None], ((0, pad_z), (0, pad_y), (0, pad_x), (0, 0)))
    return sin, mp


_prep_compact_scene = jax.jit(
    _prep_compact_scene, static_argnames=("truncation", "lab", "zyx", "pads")
)


@dataclasses.dataclass
class SceneOutputs:
    sdf: np.ndarray  # (Z, Y, X) stitched, -inf where no prediction
    colors: Optional[np.ndarray]  # (Z, Y, X, 3) uint8 in [0, 255]
    # named sem_labels (NOT `semantics`) because the field changed meaning in
    # r2 from (Z,Y,X,14) accumulated float logits to (Z,Y,X) uint8 argmax
    # labels, computed on device — transferring the (N, 14) float accumulator
    # dominated whole-scene wall time on relay-attached TPUs. The rename makes
    # stale probability-weighted consumers fail loudly (ADVICE r2).
    sem_labels: Optional[np.ndarray]  # (Z, Y, X) uint8 argmax labels
    occ: np.ndarray  # (Z, Y, X) bool
    counts: np.ndarray  # (Z, Y, X) overlap counts
    geo_intersection: int
    geo_union: int
    class_intersection: np.ndarray  # (14,)
    class_union: np.ndarray  # (14,)
    class_weight: np.ndarray  # (14,) target voxel counts per class


def window_positions(scene_dims_yx, stride) -> np.ndarray:
    # Positions depend only on scene extent + stride (windows past the edge
    # are zero-padded downstream, reference test_scene_as_chunks.py:156-277
    # semantics) — the window extent deliberately does NOT clamp positions.
    ys = list(range(0, scene_dims_yx[0], stride))
    xs = list(range(0, scene_dims_yx[1], stride))
    return np.array([(y, x) for y in ys for x in xs], dtype=np.int32)


def run_chunked_inference(
    generator,
    variables,
    scene_input: np.ndarray,  # (Z, Y, X, 4)
    scene_mask: np.ndarray,  # (Z, Y, X, 1)
    target_sdf: Optional[np.ndarray],  # (Z, Y, X) for IoU; may be None
    known: Optional[np.ndarray],
    target_semantics: Optional[np.ndarray],
    truncation: float = 3.0,
    chunk_dims: Tuple[int, int, int] = (128, 64, 64),
    stride: int = 32,
    pad: int = 2,
    max_height: int = 128,
    window_batch: int = 8,
    pred_color: bool = True,
    pred_semantic: bool = True,
    mesh=None,
    skip_empty_windows: bool = False,
    scan_windows: bool = False,
    compact_scene: Optional[Dict[str, np.ndarray]] = None,
    stitch_slices: bool = False,
) -> SceneOutputs:
    """Stitched scene completion + IoU accumulation.

    ``compact_scene`` (opt-in): feed the device the RAW scene instead of the
    assembled f32 sample — ``{"sdf": (Z,Y,X) f32 raw input SDF, "colors":
    (Z,Y,X,3) u8 RGB, "color_space": "lab"|"rgb"}``. Truncation clamping,
    LAB encoding, the input mask (scene_dataloader.py:242-253 semantics,
    identical math to data/pipeline.assemble_sample) and the window padding
    then all run in one jitted prep ON DEVICE. Host->device traffic drops
    ~4x (e.g. 314 MB -> 74 MB for a 128x256x320 scene) — host transfers are
    the scaling wall on relay-attached TPUs (CLAUDE.md). When given,
    ``scene_input``/``scene_mask`` may be None.

    ``stitch_slices``: stitch windows by dense dynamic-slice
    read-modify-write on SHAPED scene accumulators (and extract target
    windows by dynamic_slice) instead of flat 8M-row scatter-adds/gathers.
    TPU scatter/gather are per-row latency-bound (docs/DESIGN.md §2), while
    a window's contribution is a contiguous (cz, cy, cx) block — the RMW
    path turns stitching into plain HBM block traffic. Integer accumulators
    (counts, occ, IoU) are bit-identical to the scatter path; float sums
    (sdf/color/semantic) can differ by add-order ulps where >1 window of
    the same batch overlaps a voxel."""
    raw_sdf = raw_rgb = None
    if compact_scene is not None:
        raw_sdf = compact_scene["sdf"]
        raw_rgb = compact_scene["colors"]
        # Fail loudly on dtype mistakes: jnp.asarray(float_rgb, uint8) would
        # silently truncate instead of dividing by 255 (ADVICE r4).
        if raw_rgb.dtype != np.uint8:
            raise TypeError(
                "compact_scene['colors'] must be uint8 in [0,255], got "
                f"{raw_rgb.dtype}"
            )
        if not np.issubdtype(raw_sdf.dtype, np.floating):
            raise TypeError(
                f"compact_scene['sdf'] must be floating, got {raw_sdf.dtype}"
            )
        scene_zyx = raw_sdf.shape[:3]
    else:
        scene_zyx = scene_input.shape[:3]
    # crop height (test_scene_as_chunks.py:120-132)
    if max_height > 0 and scene_zyx[0] > max_height:
        if compact_scene is not None:
            raw_sdf = raw_sdf[:max_height]
            raw_rgb = raw_rgb[:max_height]
        else:
            scene_input = scene_input[:max_height]
            scene_mask = scene_mask[:max_height]
        if target_sdf is not None:
            target_sdf = target_sdf[:max_height]
        if known is not None:
            known = known[:max_height]
        if target_semantics is not None:
            target_semantics = target_semantics[:max_height]
    scene_dims = raw_sdf.shape[:3] if compact_scene is not None else scene_input.shape[:3]
    cz, cy, cx = chunk_dims
    n_classes = category.NUM_CLASSES

    # Window selection: the reference's "empty chunk" test
    # (test_scene_as_chunks.py:158-160) includes the [0,1] color channels in
    # its occupancy check, so it effectively never skips an in-bounds window —
    # every window gets a prediction and enters the IoU accumulators. We match
    # that (process all windows); `skip_empty_windows=True` restores the
    # stricter SDF-only skip as an opt-in speed knob (metrics then become
    # incomparable to reference numbers on scenes with empty-input windows).
    positions = []
    for y, x in window_positions(scene_dims[1:], stride):
        if skip_empty_windows:
            # raw-vs-clamped is equivalent here: |clip(x, +-t)| < t iff |x| < t
            win = (
                raw_sdf[:cz, y : y + cy, x : x + cx]
                if compact_scene is not None
                else scene_input[:cz, y : y + cy, x : x + cx, 0]
            )
            if not np.any(np.abs(win) < truncation):
                continue
        positions.append((int(y), int(x)))
    if not positions:
        raise ValueError("scene has no occupied windows")

    n_win = len(positions)
    n_batches = -(-n_win // window_batch)  # ceil: the last partial batch runs padded

    put = None
    if mesh is not None:
        # shard the window batch over the data axis: the scene's sliding
        # windows spread across chips (SURVEY.md §5's context-parallel analog)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))

        def put(a):
            return jax.device_put(a, sharding)

    # Device-side stitching: the generator forward, the interior masking, the
    # scatter-accumulate into scene-sized buffers, and the IoU accumulation
    # all run inside ONE jitted update per window batch — the host only feeds
    # window buffers and reads the final accumulators once. (The reference
    # stitches window-by-window on the host, test_scene_as_chunks.py:199-250;
    # a host loop per window would dominate whole-scene inference on TPU.)
    Z, Y, X = (int(d) for d in scene_dims)
    n_scene = Z * Y * X
    has_target = target_sdf is not None
    has_sem_target = has_target and target_semantics is not None and pred_semantic

    # placeholders keep the update signature static when there is no target.
    # Fill values reproduce the reference's beyond-scene chunk fills
    # (test_scene_as_chunks.py:166-180): sdf -> inf (never occupied),
    # known -> True, semantics -> UNLABELED (one_hot of 14 == zeros).
    tgt_dev = jnp.zeros((), jnp.float32)
    kn_dev = jnp.zeros((), bool)
    sm_dev = jnp.zeros((), jnp.int32)
    if has_target:
        tgt_np = np.ascontiguousarray(target_sdf[:Z]).astype(np.float32)
        kn_np = (
            np.ascontiguousarray(known[:Z] <= 1)
            if known is not None
            else np.ones((Z, Y, X), bool)
        )
        sm_np = (
            np.ascontiguousarray(target_semantics[:Z]).astype(np.int32)
            if target_semantics is not None
            else np.full((Z, Y, X), category.UNLABELED, np.int32)
        )
        if stitch_slices:
            # padded SHAPED targets: per-window extraction is a dynamic_slice
            # (the scatter path gathers 8M flat rows per window batch instead)
            pz, py, px = max(0, cz - Z), cy, cx
            pad3 = ((0, pz), (0, py), (0, px))
            tgt_dev = jnp.asarray(np.pad(tgt_np, pad3, constant_values=np.inf))
            kn_dev = jnp.asarray(np.pad(kn_np, pad3, constant_values=True))
            sm_dev = jnp.asarray(
                np.pad(sm_np, pad3, constant_values=category.UNLABELED)
            )
        else:
            tgt_dev = jnp.asarray(tgt_np).reshape(-1)
            kn_dev = jnp.asarray(kn_np).reshape(-1)
            sm_dev = jnp.asarray(sm_np).reshape(-1)

    zz = jnp.arange(cz, dtype=jnp.int32)[:, None, None]
    yy = jnp.arange(cy, dtype=jnp.int32)[None, :, None]
    xx = jnp.arange(cx, dtype=jnp.int32)[None, None, :]

    # Window extraction runs on device: the scene is padded once with the
    # reference fill values (sdf -> -truncation, colors/mask -> 0,
    # test_scene_as_chunks.py:166-180) so a dynamic_slice per window never
    # clamps; the host feeds only (y, x) positions instead of copying ~MBs
    # of window buffers per batch.
    pad_y = cy
    pad_x = cx
    pad_z = max(0, cz - Z)
    if compact_scene is not None:
        # device-side sample assembly: same math as pipeline.assemble_sample
        # (scene_dataloader.py:222-253) + the reference pad fill values
        # (test_scene_as_chunks.py:166-180), jitted, fed only the compact raw
        # arrays (f32 sdf + u8 rgb ~= a quarter of the assembled f32 tensors)
        lab = compact_scene.get("color_space", "lab") == "lab"
        scene_in_dev, scene_mask_dev = _prep_compact_scene(
            jnp.asarray(np.ascontiguousarray(raw_sdf), jnp.float32),
            jnp.asarray(np.ascontiguousarray(raw_rgb)),
            truncation=float(truncation),
            lab=lab,
            zyx=(int(Z), int(Y), int(X)),
            pads=(int(pad_z), int(pad_y), int(pad_x)),
        )
    else:
        scene_in_pad = np.pad(
            scene_input.astype(np.float32),
            ((0, pad_z), (0, pad_y), (0, pad_x), (0, 0)),
        )
        scene_in_pad[Z:, :, :, 0] = -truncation
        scene_in_pad[:, scene_dims[1] :, :, 0] = -truncation
        scene_in_pad[:, :, scene_dims[2] :, 0] = -truncation
        scene_mask_pad = np.pad(
            scene_mask.astype(np.float32),
            ((0, pad_z), (0, pad_y), (0, pad_x), (0, 0)),
        )
        scene_in_dev = jnp.asarray(scene_in_pad)
        scene_mask_dev = jnp.asarray(scene_mask_pad)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        scene_in_dev = jax.device_put(scene_in_dev, rep)
        scene_mask_dev = jax.device_put(scene_mask_dev, rep)
        tgt_dev = jax.device_put(tgt_dev, rep)
        kn_dev = jax.device_put(kn_dev, rep)
        sm_dev = jax.device_put(sm_dev, rep)

    # NB: the scene tensors are jit ARGUMENTS, not closure captures — a
    # captured jax.Array is embedded in the lowered module as a constant,
    # which a remote-compile transport may reject outright for scene-sized
    # arrays (HTTP 413 on the axon relay).
    def extract(scene_in, scene_mask, pos):
        def one(p):
            c = jax.lax.dynamic_slice(
                scene_in,
                (0, p[0], p[1], 0),
                (cz, cy, cx, scene_in.shape[-1]),
            )
            m = jax.lax.dynamic_slice(
                scene_mask, (0, p[0], p[1], 0), (cz, cy, cx, 1)
            )
            return c, m

        return jax.vmap(one)(pos)

    # the forward stays its own jit so results are bit-identical to a
    # standalone generator.apply (fusing it into the stitching program
    # changes borderline threshold voxels by a ulp)
    fwd = jax.jit(
        lambda v, c, m: generator.apply(
            v, c, m, pred_color=pred_color, pred_sdf=True,
            pred_semantic=pred_semantic, train=False,
        )
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        extract_jit = jax.jit(
            extract,
            out_shardings=NamedSharding(mesh, P("data")),
        )
    else:
        extract_jit = jax.jit(extract)

    def update(acc, occ_l, sdf_p, color_p, sem_p, pos, real, tgt_dev, kn_dev, sm_dev):
        occ_l = occ_l[..., 0]
        sdf_p = sdf_p[..., 0]
        occ = jax.nn.sigmoid(occ_l) > 0.5
        surf = (jnp.abs(sdf_p) < truncation) & occ

        y = pos[:, 0][:, None, None, None]  # (Bw,1,1,1)
        x = pos[:, 1][:, None, None, None]
        gz = jnp.broadcast_to(zz[None], occ.shape)
        gy = y + jnp.broadcast_to(yy[None], occ.shape)
        gx = x + jnp.broadcast_to(xx[None], occ.shape)
        in_scene = (gz < Z) & (gy < Y) & (gx < X)

        # interior mask (test_scene_as_chunks.py:216-236)
        inter = in_scene
        if stride < cy:
            inter &= ~((y > 0) & (yy[None] < pad))
            inter &= ~((x > 0) & (xx[None] < pad))
            inter &= ~((y + cy < Y) & (yy[None] >= cy - pad))
            inter &= ~((x + cx < X) & (xx[None] >= cx - pad))
        keep = inter & surf & real[:, None, None, None]

        flat = (gz * Y + gy) * X + gx
        # masked-out contributions scatter out of bounds and are dropped
        sidx = jnp.where(keep, flat, n_scene).reshape(-1)
        add = lambda a, v: a.at[sidx].add(v.reshape(-1), mode="drop")
        acc = dict(acc)
        acc["sdf"] = add(acc["sdf"], jnp.where(keep, sdf_p, 0.0))
        acc["counts"] = add(acc["counts"], keep.astype(jnp.int32))
        if pred_color:
            cvals = jnp.where(keep[..., None], (color_p + 1.0) * 0.5, 0.0)
            acc["color"] = acc["color"].at[sidx].add(
                cvals.reshape(-1, 3), mode="drop"
            )
        if pred_semantic:
            svals = jnp.where(keep[..., None], sem_p, 0.0)
            acc["sem"] = acc["sem"].at[sidx].add(
                svals.reshape(-1, n_classes), mode="drop"
            )
        # occ: OR over windows in the clipped extent (the host reference
        # overwrites in window order; OR differs only where overlapping
        # windows disagree — the grid is informational, unused by metrics)
        oidx = jnp.where(in_scene & real[:, None, None, None], flat, n_scene).reshape(-1)
        acc["occ"] = acc["occ"].at[oidx].max(
            occ.astype(jnp.int32).reshape(-1), mode="drop"
        )

        if has_target:
            # gather target windows from the scene (fill values beyond the
            # scene: sdf -> inf, known -> True, semantics -> UNLABELED;
            # test_scene_as_chunks.py:166-180)
            gidx = jnp.where(in_scene, flat, 0).reshape(-1)
            tgt = jnp.where(
                in_scene, tgt_dev[gidx].reshape(occ.shape), jnp.inf
            )
            kn = jnp.where(in_scene, kn_dev[gidx].reshape(occ.shape), True)
            kn &= real[:, None, None, None]
            tgt_occ = jnp.abs(tgt) < truncation
            occ_r = occ & real[:, None, None, None]
            acc["geo_i"] += jnp.sum((occ_r & tgt_occ & kn).astype(jnp.int32))
            acc["geo_u"] += jnp.sum(((occ_r | tgt_occ) & kn).astype(jnp.int32))
            if has_sem_target:
                sm = jnp.where(
                    in_scene, sm_dev[gidx].reshape(occ.shape), category.UNLABELED
                )
                lbl = jnp.argmax(sem_p, axis=-1)
                sem_known = kn & (sm != category.UNLABELED)
                p1 = jax.nn.one_hot(lbl, n_classes, dtype=jnp.int32) * occ_r[..., None]
                t1 = jax.nn.one_hot(sm, n_classes, dtype=jnp.int32) * tgt_occ[..., None]
                k1 = sem_known[..., None].astype(jnp.int32)
                acc["cls_i"] += jnp.sum(p1 * t1 * k1, axis=(0, 1, 2, 3))
                acc["cls_u"] += jnp.sum(
                    (((p1 + t1) > 0).astype(jnp.int32)) * k1, axis=(0, 1, 2, 3)
                )
                acc["cls_w"] += jnp.sum(
                    jax.nn.one_hot(sm, n_classes, dtype=jnp.int32)
                    * real[:, None, None, None, None].astype(jnp.int32),
                    axis=(0, 1, 2, 3),
                )
        return acc

    def update_rmw(acc, occ_l, sdf_p, color_p, sem_p, pos, real, tgt_dev, kn_dev, sm_dev):
        """stitch_slices variant of update(): SHAPED accumulators, one dense
        dynamic-slice read-modify-write per window (TPU scatter rows are
        latency-bound; a window is a contiguous block), target windows by
        dynamic_slice. Same masks/fills as update() — integer results are
        bit-identical, float sums differ only by add order within a batch."""
        occ_l = occ_l[..., 0]
        sdf_p = sdf_p[..., 0]
        occ = jax.nn.sigmoid(occ_l) > 0.5
        surf = (jnp.abs(sdf_p) < truncation) & occ
        acc = dict(acc)
        for i in range(occ.shape[0]):  # static unroll over the window batch
            y = pos[i, 0]
            x = pos[i, 1]
            gy = y + yy  # (1,cy,1) broadcasting with zz/xx to (cz,cy,cx)
            gx = x + xx
            in_scene = (zz < Z) & (gy < Y) & (gx < X)
            inter = in_scene
            if stride < cy:
                inter &= ~((y > 0) & (yy < pad))
                inter &= ~((x > 0) & (xx < pad))
                inter &= ~((y + cy < Y) & (yy >= cy - pad))
                inter &= ~((x + cx < X) & (xx >= cx - pad))
            keep = inter & surf[i] & real[i]

            def rmw(a, v, op=jnp.add):
                start = (jnp.int32(0), y, x) + (jnp.int32(0),) * (a.ndim - 3)
                blk = jax.lax.dynamic_slice(a, start, (cz, cy, cx) + a.shape[3:])
                return jax.lax.dynamic_update_slice(a, op(blk, v), start)

            acc["sdf"] = rmw(acc["sdf"], jnp.where(keep, sdf_p[i], 0.0))
            acc["counts"] = rmw(acc["counts"], keep.astype(jnp.int32))
            if pred_color:
                acc["color"] = rmw(
                    acc["color"],
                    jnp.where(keep[..., None], (color_p[i] + 1.0) * 0.5, 0.0),
                )
            if pred_semantic:
                acc["sem"] = rmw(
                    acc["sem"], jnp.where(keep[..., None], sem_p[i], 0.0)
                )
            occ_i = (occ[i] & in_scene & real[i]).astype(jnp.int32)
            acc["occ"] = rmw(acc["occ"], occ_i, op=jnp.maximum)

            if has_target:
                start3 = (jnp.int32(0), y, x)
                sz3 = (cz, cy, cx)
                tgt = jax.lax.dynamic_slice(tgt_dev, start3, sz3)
                kn = jax.lax.dynamic_slice(kn_dev, start3, sz3) & real[i]
                tgt_occ = jnp.abs(tgt) < truncation
                occ_r = occ[i] & real[i]
                acc["geo_i"] += jnp.sum((occ_r & tgt_occ & kn).astype(jnp.int32))
                acc["geo_u"] += jnp.sum(((occ_r | tgt_occ) & kn).astype(jnp.int32))
                if has_sem_target:
                    sm = jax.lax.dynamic_slice(sm_dev, start3, sz3)
                    lbl = jnp.argmax(sem_p[i], axis=-1)
                    sem_known = kn & (sm != category.UNLABELED)
                    p1 = jax.nn.one_hot(lbl, n_classes, dtype=jnp.int32) * occ_r[..., None]
                    t1 = jax.nn.one_hot(sm, n_classes, dtype=jnp.int32) * tgt_occ[..., None]
                    k1 = sem_known[..., None].astype(jnp.int32)
                    acc["cls_i"] += jnp.sum(p1 * t1 * k1, axis=(0, 1, 2))
                    acc["cls_u"] += jnp.sum(
                        (((p1 + t1) > 0).astype(jnp.int32)) * k1, axis=(0, 1, 2)
                    )
                    acc["cls_w"] += jnp.sum(
                        jax.nn.one_hot(sm, n_classes, dtype=jnp.int32)
                        * real[i].astype(jnp.int32),
                        axis=(0, 1, 2),
                    )
        return acc

    upd = update_rmw if stitch_slices else update
    update_jit = jax.jit(upd, donate_argnums=(0, 1, 2, 3, 4))

    if stitch_slices:
        # shaped accumulators, padded like the input scene so a window RMW
        # never clamps; cropped back to (Z, Y, X) in finalize
        shp = (Z + pad_z, Y + pad_y, X + pad_x)
        acc = dict(
            sdf=jnp.zeros(shp, jnp.float32),
            counts=jnp.zeros(shp, jnp.int32),
            occ=jnp.zeros(shp, jnp.int32),
            geo_i=jnp.zeros((), jnp.int32),
            geo_u=jnp.zeros((), jnp.int32),
            cls_i=jnp.zeros((n_classes,), jnp.int32),
            cls_u=jnp.zeros((n_classes,), jnp.int32),
            cls_w=jnp.zeros((n_classes,), jnp.int32),
        )
        if pred_color:
            acc["color"] = jnp.zeros(shp + (3,), jnp.float32)
        if pred_semantic:
            acc["sem"] = jnp.zeros(shp + (n_classes,), jnp.float32)
    else:
        acc = dict(
            sdf=jnp.zeros((n_scene,), jnp.float32),
            counts=jnp.zeros((n_scene,), jnp.int32),
            occ=jnp.zeros((n_scene,), jnp.int32),
            geo_i=jnp.zeros((), jnp.int32),
            geo_u=jnp.zeros((), jnp.int32),
            cls_i=jnp.zeros((n_classes,), jnp.int32),
            cls_u=jnp.zeros((n_classes,), jnp.int32),
            cls_w=jnp.zeros((n_classes,), jnp.int32),
        )
        if pred_color:
            acc["color"] = jnp.zeros((n_scene, 3), jnp.float32)
        if pred_semantic:
            acc["sem"] = jnp.zeros((n_scene, n_classes), jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        acc = {k: jax.device_put(v, rep) for k, v in acc.items()}

    if scan_windows:
        # ONE device dispatch for the whole scene: a lax.scan over the window
        # batches runs extract -> forward -> stitch per iteration with the
        # accumulators as the carry. On a relay-attached TPU each host
        # dispatch costs ~25-130 ms, so the loop path pays ~3 * n_batches
        # dispatches of pure overhead that this removes. Results can differ
        # from the loop path by a ulp on borderline threshold voxels (the
        # forward fuses into the stitching program), hence opt-in.
        all_pos = np.zeros((n_batches, window_batch, 2), np.int32)
        all_real = np.zeros((n_batches, window_batch), bool)
        for bidx in range(n_batches):
            start = bidx * window_batch
            for bi in range(min(window_batch, n_win - start)):
                all_pos[bidx, bi] = positions[start + bi]
                all_real[bidx, bi] = True

        def run_all(variables, scene_in, scene_mask, acc, all_pos, all_real,
                    tgt_dev, kn_dev, sm_dev):
            def body(carry, pr):
                pos, real = pr
                cb, mb = extract(scene_in, scene_mask, pos)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    sh = NamedSharding(mesh, P("data"))
                    cb = jax.lax.with_sharding_constraint(cb, sh)
                    mb = jax.lax.with_sharding_constraint(mb, sh)
                occ_l, sdf_p, color_p, sem_p = generator.apply(
                    variables, cb, mb, pred_color=pred_color, pred_sdf=True,
                    pred_semantic=pred_semantic, train=False,
                )
                zero = jnp.zeros((), jnp.float32)
                carry = upd(
                    carry, occ_l, sdf_p,
                    color_p if color_p is not None else zero,
                    sem_p if sem_p is not None else zero,
                    pos, real, tgt_dev, kn_dev, sm_dev,
                )
                return carry, None

            acc, _ = jax.lax.scan(body, acc, (all_pos, all_real))
            return acc

        acc = jax.jit(run_all, donate_argnums=(3,))(
            variables, scene_in_dev, scene_mask_dev, acc,
            jnp.asarray(all_pos), jnp.asarray(all_real),
            tgt_dev, kn_dev, sm_dev,
        )
    else:
        for bidx in range(n_batches):
            start = bidx * window_batch
            pos = np.zeros((window_batch, 2), np.int32)
            real = np.zeros((window_batch,), bool)
            for bi in range(min(window_batch, n_win - start)):
                pos[bi] = positions[start + bi]
                real[bi] = True
            pos = jnp.asarray(pos)
            real_j = jnp.asarray(real)
            if put is not None:
                pos = put(pos)
                real_j = put(real_j)
            cb, mb = extract_jit(scene_in_dev, scene_mask_dev, pos)
            occ_l, sdf_p, color_p, sem_p = fwd(variables, cb, mb)
            zero = jnp.zeros((), jnp.float32)
            acc = update_jit(
                acc, occ_l, sdf_p,
                color_p if color_p is not None else zero,
                sem_p if sem_p is not None else zero,
                pos, real_j, tgt_dev, kn_dev, sm_dev,
            )

    # normalize ON DEVICE (test_scene_as_chunks.py:270-280) and transfer the
    # compact results: the raw accumulators are ~20x the final payload
    # ((N, 14) float semantic sums alone dominate), and host transfer is the
    # whole-scene bottleneck on a relay-attached TPU.
    def finalize(acc):
        if stitch_slices:
            # crop the shaped padded accumulators back to the scene extent
            # and flatten so the normalization below is layout-agnostic
            acc = {
                k: (
                    v[:Z, :Y, :X].reshape((n_scene,) + v.shape[3:])
                    if v.ndim >= 3
                    else v
                )
                for k, v in acc.items()
            }
        counts = acc["counts"]
        got = counts > 0
        cf = jnp.maximum(counts.astype(jnp.float32), 1.0)
        out = dict(
            counts=counts.astype(jnp.uint16),  # overlaps <= (chunk/stride)^2
            occ=acc["occ"].astype(bool),
            geo_i=acc["geo_i"],
            geo_u=acc["geo_u"],
            cls_i=acc["cls_i"],
            cls_u=acc["cls_u"],
            cls_w=acc["cls_w"],
            sdf=jnp.where(
                got, jnp.clip(acc["sdf"] / cf, -truncation, truncation), -jnp.inf
            ),
        )
        if pred_color:
            # u8: the visualization path quantizes to u8 anyway, and the f32
            # color grid dominated the remaining host transfer
            out["color"] = jnp.round(
                jnp.where(
                    got[:, None],
                    jnp.clip(acc["color"] / cf[:, None] * 255.0, 0.0, 255.0),
                    0.0,
                )
            ).astype(jnp.uint8)
        if pred_semantic:
            out["sem_label"] = jnp.argmax(acc["sem"], axis=-1).astype(jnp.uint8)
        return out

    fin = jax.device_get(jax.jit(finalize)(acc))
    counts = fin["counts"].reshape(scene_dims)
    occ_out = fin["occ"].reshape(scene_dims)
    geo_i = int(fin["geo_i"])
    geo_u = int(fin["geo_u"])
    cls_i = fin["cls_i"].astype(np.int64)
    cls_u = fin["cls_u"].astype(np.int64)
    cls_w = fin["cls_w"].astype(np.int64)
    sdf_out = fin["sdf"].reshape(scene_dims)
    color_out = fin["color"].reshape(scene_dims + (3,)) if pred_color else None
    sem_out = fin["sem_label"].reshape(scene_dims) if pred_semantic else None

    return SceneOutputs(
        sdf=sdf_out,
        colors=color_out,
        sem_labels=sem_out,
        occ=occ_out,
        counts=counts,
        geo_intersection=geo_i,
        geo_union=geo_u,
        class_intersection=cls_i,
        class_union=cls_u,
        class_weight=cls_w,
    )


def summarize_iou(
    geo_i: int,
    geo_u: int,
    cls_i: np.ndarray,
    cls_u: np.ndarray,
    cls_w: np.ndarray,
    class_names=category.CLASS_NAMES,
) -> Dict:
    """Global geo IoU + per-class IoU + frequency-weighted mean IoU
    (test_scene_as_chunks.py:252-264, 308-319)."""
    geo_iou = geo_i / geo_u if geo_u > 0 else float("nan")
    with np.errstate(invalid="ignore", divide="ignore"):
        iou_classes = cls_i / cls_u
    clean = np.nan_to_num(iou_classes, nan=0.0)
    mean_iou = float((clean * cls_w / max(cls_w.sum(), 1)).sum())
    return {
        "geo_iou": float(geo_iou),
        "class_iou": {class_names[i]: float(iou_classes[i]) for i in range(len(cls_i))},
        "mean_iou": mean_iou,
    }


def write_iou_txt(path: str, summary: Dict, class_names=category.CLASS_NAMES) -> None:
    """IoU.txt in the reference's format (test_scene_as_chunks.py:321-328)."""
    with open(path, "w") as f:
        f.write(str(summary["geo_iou"]))
        f.write("\n")
        if summary.get("class_iou"):
            for n in class_names:
                f.write(f"{n}\n")
            for n in class_names:
                f.write("%.3f\n" % np.nan_to_num(summary["class_iou"][n], nan=0.0))
            f.write("Mean: ")
            f.write(str(summary["mean_iou"]))
