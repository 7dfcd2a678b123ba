"""Single-shot whole-scene inference + top-down raycast visualization CLI
(reference torch/test_scene.py:24-380): pads the scene to a multiple of 4,
runs the fully-convolutional generator once at full scene size (no
update_sizes needed — the Flax model is shape-polymorphic), then renders
input/target/prediction views from a synthetic overhead camera with the
differentiable raycaster, dumping meshes and images.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference run-script compatibility; "
                   "ignored (device selection is JAX's)")
    p.add_argument("--cpu", action="store_true",
                   help="force the JAX CPU backend (reference test_scene.py "
                   "--cpu)")
    p.add_argument("--input_data_path", default="")
    p.add_argument("--target_data_path", default="")
    p.add_argument("--test_file_list", default="")
    p.add_argument("--model_path", default="")
    p.add_argument("--output", default="./output_scene")
    p.add_argument("--synthetic_scenes", type=int, default=0)
    p.add_argument("--truncation", type=float, default=3)
    p.add_argument("--voxelsize", type=float, default=0.02)
    p.add_argument("--input_dim", type=int, nargs=3, default=None,
                   metavar=("Z", "Y", "X"),
                   help="max scene bounds to load (reference test_scene.py:63 "
                   "default (128, 260, 328)); the forward pass here is "
                   "shape-polymorphic so this only bounds loading")
    p.add_argument("--nf_gen", type=int, default=20)
    p.add_argument("--no_pass_geo_feats", dest="pass_geo_feats", action="store_false")
    p.add_argument("--input_mask", type=int, default=1)
    p.add_argument("--max_input_height", type=int, default=128)
    p.add_argument("--compute_dtype", type=str, default="",
                   help="'bfloat16' runs the generator convs in bf16")
    p.add_argument("--zslab_conv", action="store_true",
                   help="z-slab rank-4 conv formulation (ops/zslab_conv.py)")
    p.add_argument("--folded_conv", action="store_true",
                   help="output-folded conv matmuls (ops/folded_conv.py)")
    p.add_argument("--num_to_vis", type=int, default=10)
    p.add_argument("--max_to_process", type=int, default=150)
    p.add_argument("--vis_only", action="store_true",
                   help="overwrite an existing --output without prompting "
                   "(reference test_scene.py:43; this CLI never prompts)")
    p.add_argument("--weight_color_loss", type=float, default=1.0)
    p.add_argument("--weight_semantic_loss", type=float, default=0.1)
    p.add_argument("--color_thresh", type=float, default=15.0)
    p.add_argument("--color_truncation", type=float, default=0)
    p.add_argument("--augment_rgb_scaling", action="store_true")
    p.add_argument("--augment_scale_min", type=float, default=0.5)
    p.add_argument("--augment_scale_max", type=float, default=1.5)
    p.add_argument("--color_space", type=str, default="lab")
    p.add_argument("--style_width", type=int, default=480)  # reference test_scene.py:58
    p.add_argument("--style_height", type=int, default=384)
    p.add_argument("--spatial_shard", action="store_true",
                   help="shard the scene volume along Y over all devices")
    p.set_defaults(pass_geo_feats=True)
    return p


def overhead_camera(dims_zyx, width, height):
    """The reference's fly-over camera (test_scene.py:89-95, 182-187):
    fx/fy = 269.112/269.297, looking straight down from 2x the scene height
    above the scene center. Returns (cam2grid (4,4), intrinsics (4,))."""
    intr = np.array([269.1120, 269.2970, width // 2, height // 2], np.float32)
    cam2grid = np.array(
        [
            [1, 0, 0, dims_zyx[2] // 2],
            [0, -1, 0, dims_zyx[1] // 2],
            [0, 0, -1, dims_zyx[0] * 2],
            [0, 0, 0, 1],
        ],
        np.float32,
    )
    return cam2grid, intr


def render_views(sdf, valid, colors01, semantics_grid, view, intr, cfg_rc):
    """Raycast one volume from the overhead camera. Returns dict of numpy
    images (color/normal/depth/semantic-label)."""
    import jax
    import jax.numpy as jnp

    from ..losses import semantic as sem_losses
    from ..ops import normals3d
    from ..ops.raycast import raycast

    view_inv_rot = np.linalg.inv(view)[None, :3, :3]
    fn = jax.jit(
        lambda s, v, c, sem: raycast(
            s,
            v,
            c,
            normals3d.surface_normals(s, v, jnp.asarray(view_inv_rot)),
            sem,
            jnp.asarray(view[None]),
            jnp.asarray(intr[None]),
            cfg_rc,
        )
    )
    out = fn(
        jnp.asarray(sdf[None]),
        jnp.asarray(valid[None]),
        jnp.asarray(colors01[None]) if colors01 is not None else None,
        jnp.asarray(semantics_grid[None]) if semantics_grid is not None else None,
    )
    images = {
        "color": np.asarray(out.color)[0],
        "normal": np.asarray(out.normal)[0],
        "depth": np.asarray(out.depth)[0],
    }
    if semantics_grid is not None:
        images["semlabel"] = np.asarray(
            sem_losses.rendered_semantic_label(out.semantic)
        )[0]
    return images


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu:
        # after-import config update is the only reliable way to force CPU
        # here (sitecustomize may already have imported jax with a TPU
        # platform; see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..data import pipeline
    from ..ops.raycast import RaycastConfig
    from ..training import TrainConfig
    from ..training.state import init_states, load_any_checkpoint, make_generator
    from ..utils import visualize

    cfg = TrainConfig(
        truncation=args.truncation,
        nf_gen=args.nf_gen,
        pass_geo_feats=args.pass_geo_feats,
        input_mask=bool(args.input_mask),
        color_space=args.color_space,
        weight_disc_loss=0.0,
        compute_dtype=args.compute_dtype or None,
        folded_conv=args.folded_conv,
        zslab_conv=args.zslab_conv,
    )
    generator = make_generator(cfg)
    gen_state, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
    if args.model_path:
        gen_state, _, _ = load_any_checkpoint(args.model_path, gen_state, None)
        print("loaded model:", args.model_path)
    variables = {"params": gen_state.params, "batch_stats": gen_state.batch_stats}

    # streamed: one scene's arrays in host RAM at a time (matches the
    # reference's dataloader iteration, test_scene.py:110)
    if args.synthetic_scenes > 0:
        from ..data import synthetic

        def _iter_scenes():
            for i in range(args.synthetic_scenes):
                s = synthetic.make_scene(dims=(128, 160, 192), seed=200 + i)
                sample = pipeline.assemble_sample(
                    s.sdf_input, s.sdf_complete, s.input_colors, s.colors,
                    s.semantics, s.known, s.world2grid, args.truncation,
                    args.color_space, None,
                )
                sample["name"] = f"synthetic_scene_{i}"
                yield sample

    else:
        files, _, _ = pipeline.get_train_files(args.input_data_path, args.test_file_list)
        files = files[: args.max_to_process]
        ds = pipeline.SceneDataset(
            files, args.target_data_path, truncation=args.truncation,
            color_space=args.color_space, load_semantic=args.weight_semantic_loss > 0,
            color_truncation=args.color_truncation,
            augment_hue=args.augment_rgb_scaling,
            aug_scale_range=(args.augment_scale_min, args.augment_scale_max),
        )

        def _iter_scenes():
            for i in range(len(ds)):
                yield ds[i]

    os.makedirs(args.output, exist_ok=True)
    rc = RaycastConfig(
        width=args.style_width,
        height=args.style_height,
        depth_min=0.1 / args.voxelsize,
        depth_max=6.0 / args.voxelsize,
        ray_increment=0.3 * args.truncation,
        thresh_sample_dist=50.5 * 0.3 * args.truncation,
    )

    from ..inference import whole_scene
    from ..parallel import make_mesh

    mesh = make_mesh() if args.spatial_shard else None
    for si, sample in enumerate(_iter_scenes()):
        if si >= args.max_to_process:
            break
        name = sample["name"]
        inp = sample["input"]
        mask = sample["mask"]
        if args.input_dim is not None:
            # bound loaded scene extents (reference max_data_size crop,
            # test_scene.py:63,78)
            z, y, x = args.input_dim
            inp = inp[:z, :y, :x]
            mask = mask[:z, :y, :x] if mask is not None else None
        n_shards = mesh.shape["data"] if mesh is not None else 1
        pad_inp, pad_mask, dims = whole_scene.pad_scene(
            inp, mask, args.truncation, args.max_input_height, y_multiple=4 * n_shards
        )
        print(f"[ {si} ] {name} {tuple(dims)}")

        _, sdf_p, color_p, sem_p = whole_scene.run_whole_scene(
            generator, variables, inp, mask,
            truncation=args.truncation, max_height=args.max_input_height,
            pred_color=args.weight_color_loss > 0,
            pred_semantic=args.weight_semantic_loss > 0, mesh=mesh,
        )
        pred_valid = np.abs(sdf_p) < args.truncation  # test_scene.py:156

        if si < args.num_to_vis:
            view, intr = overhead_camera(tuple(dims), args.style_width, args.style_height)
            images = {}
            # input render
            in_sdf = pad_inp[..., 0]
            r = render_views(in_sdf, np.abs(in_sdf) < args.truncation,
                             pad_inp[..., 1:4], None, view, intr, rc)
            images["input"] = r["color"]
            images["input-normals"] = r["normal"]
            # target render
            tz = min(dims[0], sample["target_sdf"].shape[0])
            tgt = np.full(tuple(dims), np.inf, np.float32)
            tgt[:tz, : sample["target_sdf"].shape[1], : sample["target_sdf"].shape[2]] = np.clip(
                sample["target_sdf"][:tz], -args.truncation, args.truncation
            )
            tcol = np.zeros(tuple(dims) + (3,), np.float32)
            tcol[:tz, : sample["target_colors"].shape[1], : sample["target_colors"].shape[2]] = (
                sample["target_colors"][:tz] / 255.0
            )
            tsem = None
            s14 = None
            if "semantics" in sample:
                import jax.nn

                s14 = np.full(tuple(dims), 14, np.uint8)
                s14[:tz, : sample["semantics"].shape[1], : sample["semantics"].shape[2]] = sample[
                    "semantics"
                ][:tz]
                tsem = np.asarray(jax.nn.one_hot(s14.astype(np.int32), 15))[..., :14]
            r = render_views(np.where(np.isfinite(tgt), tgt, args.truncation),
                             np.abs(tgt) < args.truncation, tcol, tsem, view, intr, rc)
            images["target"] = r["color"]
            images["target-normals"] = r["normal"]
            images["target-depth"] = np.where(np.isfinite(r["depth"]), r["depth"] * args.voxelsize, 0)
            if "semlabel" in r:
                images["target-semantics"] = r["semlabel"]
            # prediction render
            pcol01 = (color_p + 1.0) * 0.5 if color_p is not None else None
            r = render_views(sdf_p, pred_valid, pcol01, sem_p, view, intr, rc)
            images["pred"] = r["color"]
            images["pred-normals"] = r["normal"]
            images["pred-depth"] = np.where(np.isfinite(r["depth"]), r["depth"] * args.voxelsize, 0)
            if "semlabel" in r:
                images["pred-semantics"] = r["semlabel"]

            visualize.save_predictions(
                args.output,
                name,
                pad_inp,
                np.where(np.isfinite(tgt), tgt, -np.inf),
                None,
                s14,
                np.where(pred_valid, sdf_p, -np.inf),
                color_p,
                sem_p,
                truncation=args.truncation,
                color_space=args.color_space,
                images=images,
            )
    print("done")


if __name__ == "__main__":
    main()
