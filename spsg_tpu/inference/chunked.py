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

from ..data import category


@dataclasses.dataclass
class SceneOutputs:
    sdf: np.ndarray  # (Z, Y, X) stitched, -inf where no prediction
    colors: Optional[np.ndarray]  # (Z, Y, X, 3) in [0, 255]
    semantics: Optional[np.ndarray]  # (Z, Y, X, 14) accumulated logits
    occ: np.ndarray  # (Z, Y, X) bool
    counts: np.ndarray  # (Z, Y, X) overlap counts
    geo_intersection: int
    geo_union: int
    class_intersection: np.ndarray  # (14,)
    class_union: np.ndarray  # (14,)
    class_weight: np.ndarray  # (14,) target voxel counts per class


def window_positions(scene_dims_yx, chunk_yx, stride) -> np.ndarray:
    ys = list(range(0, scene_dims_yx[0], stride))
    xs = list(range(0, scene_dims_yx[1], stride))
    return np.array([(y, x) for y in ys for x in xs], dtype=np.int32)


def extract_window(
    inputs: np.ndarray,  # (Z, Y, X, C) scene input (sdf + colors)
    mask: np.ndarray,  # (Z, Y, X, 1)
    y: int,
    x: int,
    chunk_dims: Tuple[int, int, int],
    truncation: float,
):
    """Copy one window into fixed-size buffers with the reference fill values
    (test_scene_as_chunks.py:166-180): sdf -> -truncation, colors/mask -> 0."""
    cz, cy, cx = chunk_dims
    out = np.zeros(chunk_dims + (inputs.shape[-1],), np.float32)
    out[..., 0] = -truncation
    m = np.zeros(chunk_dims + (1,), np.float32)
    fz = min(inputs.shape[0], cz)
    fy = min(inputs.shape[1] - y, cy)
    fx = min(inputs.shape[2] - x, cx)
    out[:fz, :fy, :fx] = inputs[:cz, y : y + cy, x : x + cx]
    m[:fz, :fy, :fx] = mask[:cz, y : y + cy, x : x + cx]
    return out, m


def interior_mask(
    y: int, x: int, chunk_dims, scene_dims, stride: int, pad: int
) -> np.ndarray:
    """Window-interior mask dropping `pad` voxels on stitched sides
    (test_scene_as_chunks.py:216-236)."""
    cz, cy, cx = chunk_dims
    mask = np.ones(chunk_dims, bool)
    if stride < cy:
        if y > 0:
            mask[:, :pad, :] = False
        if x > 0:
            mask[:, :, :pad] = False
        if y + cy < scene_dims[1]:
            mask[:, cy - pad :, :] = False
        if x + cx < scene_dims[2]:
            mask[:, :, cx - pad :] = False
    # clip to scene bounds
    fz = min(scene_dims[0], cz)
    fy = min(scene_dims[1] - y, cy)
    fx = min(scene_dims[2] - x, cx)
    mask[fz:, :, :] = False
    mask[:, fy:, :] = False
    mask[:, :, fx:] = False
    return mask


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
) -> SceneOutputs:
    """Stitched scene completion + IoU accumulation."""
    # crop height (test_scene_as_chunks.py:120-132)
    if max_height > 0 and scene_input.shape[0] > max_height:
        scene_input = scene_input[:max_height]
        scene_mask = scene_mask[:max_height]
        if target_sdf is not None:
            target_sdf = target_sdf[:max_height]
        if known is not None:
            known = known[:max_height]
        if target_semantics is not None:
            target_semantics = target_semantics[:max_height]
    scene_dims = scene_input.shape[:3]
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
    for y, x in window_positions(scene_dims[1:], (cy, cx), stride):
        if skip_empty_windows:
            win = scene_input[:cz, y : y + cy, x : x + cx, 0]
            if not np.any(np.abs(win) < truncation):
                continue
        positions.append((int(y), int(x)))
    if not positions:
        raise ValueError("scene has no occupied windows")

    chunks = []
    masks = []
    for y, x in positions:
        c, m = extract_window(scene_input, scene_mask, y, x, chunk_dims, truncation)
        chunks.append(c)
        masks.append(m)
    n_win = len(positions)
    n_pad = (-n_win) % window_batch
    for _ in range(n_pad):
        chunks.append(chunks[-1])
        masks.append(masks[-1])
    chunks = np.stack(chunks)
    masks = np.stack(masks)

    fwd = jax.jit(
        lambda c, m: generator.apply(
            variables, c, m, pred_color=pred_color, pred_sdf=True,
            pred_semantic=pred_semantic, train=False,
        )
    )
    put = None
    if mesh is not None:
        # shard the window batch over the data axis: the scene's sliding
        # windows spread across chips (SURVEY.md §5's context-parallel analog)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))

        def put(a):
            return jax.device_put(a, sharding)

    # scene accumulators (test_scene_as_chunks.py:136-140)
    acc_sdf = np.zeros(scene_dims, np.float64)
    acc_color = np.zeros(scene_dims + (3,), np.float64) if pred_color else None
    acc_sem = np.zeros(scene_dims + (n_classes,), np.float64) if pred_semantic else None
    counts = np.zeros(scene_dims, np.int32)
    occ_out = np.zeros(scene_dims, bool)

    geo_i = 0
    geo_u = 0
    cls_i = np.zeros(n_classes, np.int64)
    cls_u = np.zeros(n_classes, np.int64)
    cls_w = np.zeros(n_classes, np.int64)

    for start in range(0, len(chunks), window_batch):
        cb = jnp.asarray(chunks[start : start + window_batch])
        mb = jnp.asarray(masks[start : start + window_batch])
        if put is not None:
            cb = put(cb)
            mb = put(mb)
        occ_l, sdf_p, color_p, sem_p = fwd(cb, mb)
        occ_l = np.asarray(occ_l)[..., 0]
        sdf_p = np.asarray(sdf_p)[..., 0]
        color_p = np.asarray(color_p) if color_p is not None else None
        sem_p = np.asarray(sem_p) if sem_p is not None else None

        for bi in range(min(window_batch, n_win - start)):
            y, x = positions[start + bi]
            occ = 1.0 / (1.0 + np.exp(-occ_l[bi])) > 0.5
            surf = (np.abs(sdf_p[bi]) < truncation) & occ

            # per-window IoU vs target (test_scene_as_chunks.py:74-89,183-197)
            if target_sdf is not None:
                tgt_chunk = np.full(chunk_dims, np.inf, np.float32)
                kn_chunk = np.ones(chunk_dims, bool)
                sm_chunk = np.full(chunk_dims, category.UNLABELED, np.uint8)
                fz = min(scene_dims[0], cz)
                fy = min(scene_dims[1] - y, cy)
                fx = min(scene_dims[2] - x, cx)
                tgt_chunk[:fz, :fy, :fx] = target_sdf[:cz, y : y + cy, x : x + cx]
                if known is not None:
                    kn_chunk[:fz, :fy, :fx] = known[:cz, y : y + cy, x : x + cx] <= 1
                if target_semantics is not None:
                    sm_chunk[:fz, :fy, :fx] = target_semantics[:cz, y : y + cy, x : x + cx]
                tgt_occ = np.abs(tgt_chunk) < truncation
                geo_i += int(np.sum(occ & tgt_occ & kn_chunk))
                geo_u += int(np.sum((occ | tgt_occ) & kn_chunk))
                if target_semantics is not None and sem_p is not None:
                    lbl = np.argmax(sem_p[bi], axis=-1)
                    sem_known = kn_chunk & (sm_chunk != category.UNLABELED)
                    for cl in range(n_classes):
                        t = tgt_occ & (sm_chunk == cl)
                        p = occ & (lbl == cl)
                        cls_i[cl] += int(np.sum(p & t & sem_known))
                        cls_u[cl] += int(np.sum((p | t) & sem_known))
                        cls_w[cl] += int(np.sum(sm_chunk == cl))

            # stitch (test_scene_as_chunks.py:199-250)
            inter = interior_mask(y, x, chunk_dims, scene_dims, stride, pad) & surf
            zz, yy, xx = np.nonzero(inter)
            gy = yy + y
            gx = xx + x
            acc_sdf[zz, gy, gx] += sdf_p[bi][zz, yy, xx]
            counts[zz, gy, gx] += 1
            if acc_color is not None and color_p is not None:
                acc_color[zz, gy, gx] += (color_p[bi][zz, yy, xx] + 1.0) * 0.5
            if acc_sem is not None and sem_p is not None:
                acc_sem[zz, gy, gx] += sem_p[bi][zz, yy, xx]
            fz = min(scene_dims[0], cz)
            fy = min(scene_dims[1] - y, cy)
            fx = min(scene_dims[2] - x, cx)
            occ_out[:fz, y : y + fy, x : x + fx] = occ[:fz, :fy, :fx]

    # normalize (test_scene_as_chunks.py:270-280)
    got = counts > 0
    sdf_out = np.full(scene_dims, -np.inf, np.float32)
    sdf_out[got] = np.clip(acc_sdf[got] / counts[got], -truncation, truncation)
    color_out = None
    if acc_color is not None:
        color_out = np.zeros(scene_dims + (3,), np.float32)
        color_out[got] = np.clip(acc_color[got] / counts[got][:, None] * 255.0, 0, 255)
    sem_out = acc_sem.astype(np.float32) if acc_sem is not None else None

    return SceneOutputs(
        sdf=sdf_out,
        colors=color_out,
        semantics=sem_out,
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
