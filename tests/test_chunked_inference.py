"""Chunked whole-scene inference tests: single-window equivalence with a
direct forward pass, multi-window stitching, IoU summary plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from spsg_tpu.data import pipeline, synthetic
from spsg_tpu.inference import chunked
from spsg_tpu.training import TrainConfig
from spsg_tpu.training.state import init_states, make_generator

CHUNK = (16, 16, 16)


def _setup():
    cfg = TrainConfig(input_dim=CHUNK, nf_gen=4, weight_disc_loss=0.0)
    gen = make_generator(cfg)
    gs, _ = init_states(cfg, jax.random.PRNGKey(0), with_disc=False)
    variables = {"params": gs.params, "batch_stats": gs.batch_stats}
    return cfg, gen, variables


def _scene_sample(dims, seed=3):
    s = synthetic.make_scene(dims=dims, seed=seed)
    sample = pipeline.assemble_sample(
        s.sdf_input, s.sdf_complete, s.input_colors, s.colors, s.semantics,
        s.known, s.world2grid, 3.0, "lab", None,
    )
    return sample


def test_single_window_matches_direct_forward():
    cfg, gen, variables = _setup()
    sample = _scene_sample(CHUNK)
    out = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
        sample["known"], sample["semantics"], chunk_dims=CHUNK,
        stride=CHUNK[1], pad=2, max_height=CHUNK[0], window_batch=1,
    )
    occ_l, sdf_p, color_p, sem_p = gen.apply(
        variables, jnp.asarray(sample["input"][None]), jnp.asarray(sample["mask"][None]),
        pred_color=True, pred_sdf=True, pred_semantic=True, train=False,
    )
    sdf_p = np.asarray(sdf_p)[0, ..., 0]
    occ_l = np.asarray(occ_l)[0, ..., 0]
    occ = 1 / (1 + np.exp(-occ_l)) > 0.5
    surf = (np.abs(sdf_p) < 3.0) & occ
    got = out.counts > 0
    # the device stitch evaluates sigmoid(occ_l) > 0.5 on device; with an
    # UNTRAINED model occ_l ~ 0 everywhere, so exclude voxels within a ulp of
    # the decision boundary (|occ_l| tiny) where device exp and numpy exp may
    # round the threshold differently
    decided = np.abs(occ_l) > 1e-5
    np.testing.assert_array_equal(got[decided], surf[decided])
    both = got & surf
    np.testing.assert_allclose(out.sdf[both], sdf_p[both], atol=1e-5)


def test_multi_window_stitching():
    cfg, gen, variables = _setup()
    sample = _scene_sample((16, 40, 48), seed=4)
    out = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
        sample["known"], sample["semantics"], chunk_dims=CHUNK,
        stride=8, pad=2, max_height=CHUNK[0], window_batch=4,
    )
    assert out.sdf.shape == (16, 40, 48)
    assert out.counts.max() >= 2  # overlapping windows did accumulate
    assert np.isfinite(out.sdf[out.counts > 0]).all()
    assert out.geo_union > 0
    summary = chunked.summarize_iou(
        out.geo_intersection, out.geo_union,
        out.class_intersection, out.class_union, out.class_weight,
    )
    assert 0.0 <= summary["geo_iou"] <= 1.0
    assert 0.0 <= summary["mean_iou"] <= 1.0


def test_window_batch_size_invariance():
    """Results must not depend on how windows are batched — in particular a
    window count NOT divisible by window_batch must still process every
    window (regression: ceil-division bug dropped the trailing partial
    batch)."""
    cfg, gen, variables = _setup()
    sample = _scene_sample((16, 40, 48), seed=4)
    outs = {}
    for wb in (7, 64):  # 64 >> n_win: everything in one batch
        outs[wb] = chunked.run_chunked_inference(
            gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
            sample["known"], sample["semantics"], chunk_dims=CHUNK,
            stride=8, pad=2, max_height=CHUNK[0], window_batch=wb,
        )
    a, b = outs[7], outs[64]
    assert int(a.counts.sum()) == int(b.counts.sum())
    np.testing.assert_array_equal(a.counts, b.counts)
    got = a.counts > 0
    np.testing.assert_allclose(a.sdf[got], b.sdf[got], atol=1e-6)
    assert a.geo_union == b.geo_union
    assert a.geo_intersection == b.geo_intersection


def test_iou_txt(tmp_path):
    summary = {
        "geo_iou": 0.5,
        "mean_iou": 0.25,
        "class_iou": {n: 0.1 for n in __import__("spsg_tpu.data.category", fromlist=["CLASS_NAMES"]).CLASS_NAMES},
    }
    p = str(tmp_path / "IoU.txt")
    chunked.write_iou_txt(p, summary)
    content = open(p).read()
    assert content.startswith("0.5")
    assert "Mean: 0.25" in content


def test_chunked_inference_sharded_over_mesh():
    """Window batches shard over the 8-device data axis."""
    import jax as _jax
    from spsg_tpu.parallel import make_mesh

    cfg, gen, variables = _setup()
    sample = _scene_sample((16, 40, 48), seed=6)
    mesh = make_mesh(_jax.devices()[:8])
    out = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
        sample["known"], sample["semantics"], chunk_dims=CHUNK,
        stride=8, pad=2, max_height=CHUNK[0], window_batch=8, mesh=mesh,
    )
    assert out.counts.max() >= 1
    assert np.isfinite(out.sdf[out.counts > 0]).all()


def test_scan_windows_matches_loop():
    """scan_windows=True runs all window batches inside one jitted lax.scan
    (single device dispatch); the stitched outputs and IoU accumulators must
    match the host-loop path (identical math — only dispatch granularity
    changes; borderline voxels may differ by a ulp, so occupancy-derived
    fields compare away from the decision boundary)."""
    cfg, gen, variables = _setup()
    dims = (16, 32, 48)
    sample = _scene_sample(dims)
    kwargs = dict(
        chunk_dims=CHUNK, stride=8, pad=2, max_height=CHUNK[0], window_batch=4,
    )
    out_a = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
        sample["known"], sample["semantics"], **kwargs,
    )
    out_b = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], sample["target_sdf"],
        sample["known"], sample["semantics"], scan_windows=True, **kwargs,
    )
    same = out_a.counts == out_b.counts
    assert same.mean() > 0.99  # ulp-boundary voxels only
    got = (out_a.counts > 0) & (out_b.counts > 0) & same
    np.testing.assert_allclose(out_a.sdf[got], out_b.sdf[got], atol=1e-5)
    if out_a.colors is not None:
        assert np.mean(
            np.abs(out_a.colors[got].astype(int) - out_b.colors[got].astype(int)) <= 1
        ) > 0.999
    np.testing.assert_allclose(
        out_a.geo_intersection, out_b.geo_intersection, rtol=0.02, atol=3
    )
    np.testing.assert_allclose(out_a.geo_union, out_b.geo_union, rtol=0.02, atol=3)


def test_compact_feed_matches_host_assembly():
    """compact_scene (device-side clamp/LAB/mask/pad) must reproduce the
    host assemble_sample path: identical stitched coverage, near-identical
    SDF, and colors within LAB float tolerance."""
    cfg, gen, variables = _setup()
    dims = (16, 40, 48)
    s = synthetic.make_scene(dims=dims, seed=5)
    sample = pipeline.assemble_sample(
        s.sdf_input, s.sdf_complete, s.input_colors, s.colors, s.semantics,
        s.known, s.world2grid, 3.0, "lab", None,
    )
    kwargs = dict(chunk_dims=CHUNK, stride=8, pad=2, max_height=CHUNK[0],
                  window_batch=4)
    ref = chunked.run_chunked_inference(
        gen, variables, sample["input"], sample["mask"], None, None, None,
        **kwargs,
    )
    got = chunked.run_chunked_inference(
        gen, variables, None, None, None, None, None,
        compact_scene=dict(sdf=s.sdf_input.astype(np.float32),
                           colors=s.input_colors, color_space="lab"),
        **kwargs,
    )
    # coverage may flip only on sigmoid-boundary voxels of the untrained
    # model; everything decidedly covered must agree
    agree = ref.counts == got.counts
    assert agree.mean() > 0.999
    both = (ref.counts > 0) & (got.counts > 0) & agree
    np.testing.assert_allclose(got.sdf[both], ref.sdf[both], atol=1e-4)
    assert np.abs(
        got.colors[both].astype(np.int32) - ref.colors[both].astype(np.int32)
    ).max() <= 1  # u8 after device-vs-host LAB encoding

    # scan path composes with the compact feed
    got2 = chunked.run_chunked_inference(
        gen, variables, None, None, None, None, None,
        compact_scene=dict(sdf=s.sdf_input.astype(np.float32),
                           colors=s.input_colors, color_space="lab"),
        scan_windows=True, **kwargs,
    )
    assert (got2.counts == got.counts).mean() > 0.999


def test_stitch_slices_matches_scatter():
    """stitch_slices replaces the flat scatter-add stitch with per-window
    dense slice read-modify-write (round-5: TPU scatter/gather rows are
    latency-bound, a window is a contiguous block). Integer accumulators
    (counts, occ grid, geo/class IoU) must match the scatter path exactly;
    float sums may differ by add order where windows of the same batch
    overlap a voxel — bound those tightly. Covered in both the per-batch
    loop and the lax.scan whole-scene paths."""
    cfg, gen, variables = _setup()
    sample = _scene_sample((16, 40, 48), seed=4)

    def run(**kw):
        return chunked.run_chunked_inference(
            gen, variables, sample["input"], sample["mask"],
            sample["target_sdf"], sample["known"], sample["semantics"],
            chunk_dims=CHUNK, stride=8, pad=2, max_height=CHUNK[0],
            window_batch=4, **kw,
        )

    for scan in (False, True):
        ref = run(scan_windows=scan, stitch_slices=False)
        rmw = run(scan_windows=scan, stitch_slices=True)
        np.testing.assert_array_equal(rmw.counts, ref.counts, err_msg="counts")
        np.testing.assert_array_equal(rmw.occ, ref.occ, err_msg="occ")
        assert rmw.geo_intersection == ref.geo_intersection
        assert rmw.geo_union == ref.geo_union
        np.testing.assert_array_equal(rmw.class_intersection, ref.class_intersection)
        np.testing.assert_array_equal(rmw.class_union, ref.class_union)
        np.testing.assert_array_equal(rmw.class_weight, ref.class_weight)
        got = ref.counts > 0
        np.testing.assert_allclose(rmw.sdf[got], ref.sdf[got], atol=1e-5)
        # colors are u8-rounded on device: add-order ulps can flip a
        # 0.5-boundary rounding by at most 1
        assert int(np.abs(
            rmw.colors[got].astype(np.int16) - ref.colors[got].astype(np.int16)
        ).max()) <= 1
        np.testing.assert_array_equal(rmw.sem_labels[got], ref.sem_labels[got])
