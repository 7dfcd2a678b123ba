"""Golden-value and gradient-semantics tests for the differentiable TSDF
raycaster (reference CUDA kernel raycast_rgbd_cuda_kernel.cu — tested here
against analytic plane/sphere scenes; the reference had no tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spsg_tpu.ops import raycast


def _plane_scene(dims=(64, 48, 48), z0=20.0, trunc=3.0):
    """TSDF of the horizontal plane z = z0 (positive above)."""
    Z, Y, X = dims
    z = np.arange(Z, dtype=np.float32)[:, None, None]
    sdf = np.broadcast_to(z - z0, dims).astype(np.float32)
    sdf = np.clip(sdf, -trunc, trunc)
    valid = np.abs(sdf) < trunc
    return sdf, valid


def _down_camera(dims, height_z, image=(32, 24)):
    """Camera at (height_z, yc, xc) looking straight down (-grid z)."""
    Z, Y, X = dims
    w, h = image
    fx = 32.0
    intr = np.array([fx, fx, w / 2.0, h / 2.0], dtype=np.float32)
    # camera x -> grid x, camera y -> grid y, camera z (forward) -> -grid z
    cam2grid = np.array(
        [
            [1, 0, 0, X / 2.0],
            [0, 1, 0, Y / 2.0],
            [0, 0, -1, height_z],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return cam2grid, intr


def _cfg(image=(32, 24), depth_min=2.0, depth_max=80.0):
    return raycast.RaycastConfig(
        width=image[0],
        height=image[1],
        depth_min=depth_min,
        depth_max=depth_max,
        ray_increment=0.9,
        thresh_sample_dist=45.45,
    )


def test_plane_depth():
    dims = (64, 48, 48)
    z0 = 20.0
    cam_z = 60.0
    sdf, valid = _plane_scene(dims, z0)
    view, intr = _down_camera(dims, cam_z)
    cfg = _cfg()
    out = raycast.raycast(
        jnp.asarray(sdf[None]),
        jnp.asarray(valid[None]),
        None,
        None,
        None,
        jnp.asarray(view[None]),
        jnp.asarray(intr[None]),
        cfg,
    )
    depth = np.asarray(out.depth)[0]
    hit = depth != -np.inf
    assert hit.mean() > 0.9  # nearly all rays hit the plane
    # depth (camera z) to a fronto-parallel plane is constant = cam_z - z0
    np.testing.assert_allclose(depth[hit], cam_z - z0, atol=0.6)


def test_plane_color_and_semantic():
    dims = (64, 48, 48)
    sdf, valid = _plane_scene(dims)
    color = np.zeros(dims + (3,), dtype=np.float32)
    color[..., 0] = 0.25
    color[..., 1] = 0.5
    color[..., 2] = 0.75
    sem = np.zeros(dims + (14,), dtype=np.float32)
    sem[..., 5] = 7.0
    view, intr = _down_camera(dims, 60.0)
    cfg = _cfg()
    out = raycast.raycast(
        jnp.asarray(sdf[None]),
        jnp.asarray(valid[None]),
        jnp.asarray(color[None]),
        None,
        jnp.asarray(sem[None]),
        jnp.asarray(view[None]),
        jnp.asarray(intr[None]),
        cfg,
    )
    c = np.asarray(out.color)[0]
    hit = c[..., 0] != -np.inf
    assert hit.mean() > 0.9
    expected = np.broadcast_to(np.array([0.25, 0.5, 0.75], np.float32), c[hit].shape)
    np.testing.assert_allclose(c[hit], expected, atol=1e-5)
    s = np.asarray(out.semantic)[0]
    np.testing.assert_allclose(s[hit][:, 5], 7.0, atol=1e-5)


def test_sphere_depth():
    dims = (64, 64, 64)
    Z, Y, X = dims
    c = np.array([24.0, 32.0, 32.0])
    r = 12.0
    zz, yy, xx = np.meshgrid(
        np.arange(Z, dtype=np.float32),
        np.arange(Y, dtype=np.float32),
        np.arange(X, dtype=np.float32),
        indexing="ij",
    )
    d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) - r
    trunc = 3.0
    sdf = np.clip(d, -trunc, trunc).astype(np.float32)
    valid = np.abs(sdf) < trunc
    cam_z = 60.0
    view, intr = _down_camera(dims, cam_z)
    cfg = _cfg()
    out = raycast.raycast(
        jnp.asarray(sdf[None]),
        jnp.asarray(valid[None]),
        None,
        None,
        None,
        jnp.asarray(view[None]),
        jnp.asarray(intr[None]),
        cfg,
    )
    depth = np.asarray(out.depth)[0]
    # center pixel ray passes through the sphere top: depth = cam_z - (cz + r)
    center = depth[cfg.height // 2, cfg.width // 2]
    expected = cam_z - (c[0] + r)
    assert center == pytest.approx(expected, abs=0.5)


def test_gradient_scatter_semantics():
    """grad of sum(color image) wrt the color grid must be exactly 1 at every
    hit voxel (sum over hitting pixels of 1/count) and 0 elsewhere —
    the reference backward's averaged scatter
    (raycast_rgbd_cuda_kernel.cu:365-423)."""
    dims = (48, 32, 32)
    sdf, valid = _plane_scene(dims, z0=16.0)
    color = np.full(dims + (3,), 0.5, dtype=np.float32)
    view, intr = _down_camera(dims, 40.0, image=(16, 12))
    cfg = _cfg(image=(16, 12), depth_max=60.0)

    def loss_fn(col):
        out = raycast.raycast(
            jnp.asarray(sdf[None]),
            jnp.asarray(valid[None]),
            col,
            None,
            None,
            jnp.asarray(view[None]),
            jnp.asarray(intr[None]),
            cfg,
        )
        c = out.color
        return jnp.sum(jnp.where(c != -jnp.inf, c, 0.0))

    g = jax.grad(loss_fn)(jnp.asarray(color[None]))
    g = np.asarray(g)[0]
    hit_voxels = np.abs(g[..., 0]) > 1e-8
    assert hit_voxels.sum() > 0
    np.testing.assert_allclose(g[hit_voxels], 1.0, atol=1e-5)
    # depth grad routes into the sdf grid at the same voxels
    def dloss(s):
        out = raycast.raycast(
            s,
            jnp.asarray(valid[None]),
            jnp.asarray(color[None]),
            None,
            None,
            jnp.asarray(view[None]),
            jnp.asarray(intr[None]),
            cfg,
        )
        d = out.depth
        return jnp.sum(jnp.where(d != -jnp.inf, d, 0.0))

    gs = np.asarray(jax.grad(dloss)(jnp.asarray(sdf[None])))[0]
    np.testing.assert_allclose(gs[np.abs(gs) > 1e-8], 1.0, atol=1e-5)


def _oblique_camera(dims, image=(32, 24)):
    """Camera outside the volume looking diagonally through it — exercises
    grazing rays and negative direction components on every axis."""
    w, h = image
    Z, Y, X = dims
    fx = 24.0
    intr = np.array([fx, fx, w / 2.0, h / 2.0], dtype=np.float32)
    # forward along (-1, -1, -1)/sqrt(3), positioned past the +corner
    f = np.array([-1.0, -1.0, -1.0]) / np.sqrt(3.0)
    r = np.cross([0.0, 0.0, 1.0], f)
    r /= np.linalg.norm(r)
    u = np.cross(f, r)
    cam2grid = np.eye(4, dtype=np.float32)
    cam2grid[:3, 0] = r  # camera x (xyz grid order: cols are x,y,z axes)
    cam2grid[:3, 1] = u
    cam2grid[:3, 2] = f
    cam2grid[:3, 3] = [X * 1.1, Y * 1.1, Z * 1.1]
    return cam2grid, intr


def _blob_scene(dims=(64, 64, 64), trunc=3.0, seed=0):
    """Union of random spheres — fragmented valid shells with lots of empty
    space, the hard case for any skipping scheme."""
    Z, Y, X = dims
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.meshgrid(
        np.arange(Z, dtype=np.float32),
        np.arange(Y, dtype=np.float32),
        np.arange(X, dtype=np.float32),
        indexing="ij",
    )
    d = np.full(dims, 1e9, np.float32)
    for _ in range(6):
        c = rng.uniform(8, np.array([Z, Y, X]) - 8)
        rad = rng.uniform(4, 10)
        d = np.minimum(
            d, np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) - rad
        )
    sdf = np.clip(d, -trunc, trunc).astype(np.float32)
    return sdf, np.abs(sdf) < trunc


@pytest.mark.parametrize("hops,fine,cb", [(1, 16, 8), (2, 16, 8), (2, 8, 4), (4, 32, 8)])
def test_coarse_skip_bit_identical(hops, fine, cb):
    """The conservative coarse-skip march must reproduce the plain march
    BIT-IDENTICALLY — it only jumps lattice samples that are provably NaN
    (no fully-valid trilerp cell in their coarse block) and resets the prev
    chain exactly as evaluating them would."""
    import dataclasses

    dims = (64, 64, 64)
    sdf, valid = _blob_scene(dims)
    base = _cfg(depth_max=200.0)
    for cam in (_down_camera(dims, 60.0), _oblique_camera(dims)):
        view, intr = cam
        outs = {}
        for name, skip in (("skip", True), ("plain", False)):
            cfg = dataclasses.replace(
                base, coarse_skip=skip, coarse_hops=hops, march_block=fine,
                coarse_block=cb,
            )
            out = raycast.raycast(
                jnp.asarray(sdf[None]), jnp.asarray(valid[None]), None, None, None,
                jnp.asarray(view[None]), jnp.asarray(intr[None]), cfg,
            )
            outs[name] = np.asarray(out.depth)[0]
        assert (outs["skip"] != -np.inf).sum() > 20  # scene actually hit
        np.testing.assert_array_equal(outs["skip"], outs["plain"])


@pytest.mark.parametrize("frac", [0.05, 0.25])
def test_straggler_compaction_bit_identical(frac):
    """Straggler compaction only reschedules iterations (early lockstep exit
    + compacted phase-2 march); every per-ray sample position comes from the
    same lattice expression, so hit/depth/voxel outputs must match the
    uncompacted march bitwise — with and without the coarse skip."""
    import dataclasses

    dims = (64, 64, 64)
    sdf, valid = _blob_scene(dims, seed=5)
    base = _cfg(depth_max=200.0)
    # slack=0.05 under-bounds 1/cam_z so the n_iter_max budget BINDS — the
    # phase-1/phase-2 iteration budget must be shared for bit-identity there
    for slack in (1.45, 0.05):
        for cam in (_down_camera(dims, 60.0), _oblique_camera(dims)):
            view, intr = cam
            for skip in (True, False):
                outs = {}
                for name, f in (("compact", frac), ("plain", 0.0)):
                    cfg = dataclasses.replace(
                        base, coarse_skip=skip, straggler_frac=f,
                        max_dir_slack=slack,
                    )
                    out = raycast.find_surface_crossings(
                        jnp.asarray(sdf[None]), jnp.asarray(valid[None]),
                        jnp.asarray(view[None]), jnp.asarray(intr[None]), cfg,
                    )
                    outs[name] = {
                        k: np.asarray(v) for k, v in out.items() if k != "n_iters"
                    }
                if slack == 1.45:
                    assert outs["compact"]["hit"].sum() > 20  # scene actually hit
                for k in outs["plain"]:
                    np.testing.assert_array_equal(
                        outs["compact"][k], outs["plain"][k], err_msg=k
                    )


def test_raycast_occ():
    dims = (48, 32, 32)
    occ = np.zeros(dims, dtype=np.uint8)
    occ[10:14, 8:24, 8:24] = 1  # slab
    view, intr = _down_camera(dims, 40.0, image=(16, 12))
    cfg = _cfg(image=(16, 12), depth_max=60.0)
    out = raycast.raycast_occ(
        jnp.asarray(occ[None]), jnp.asarray(view[None]), jnp.asarray(intr[None]), cfg
    )
    out = np.asarray(out)[0]
    # center rays hit the slab; the slab covers the central part of the image
    assert out[6, 8] == 1
    assert out.sum() > 0


def test_raycast_occ_skip_matches_plain():
    """Blocked + coarse-skipped occupancy march == plain blocked march, and
    both see the fragmented-blob scene correctly."""
    import dataclasses

    dims = (64, 64, 64)
    sdf, valid = _blob_scene(dims, seed=3)
    occ = (np.abs(sdf) < 1.5).astype(np.uint8)
    base = _cfg(depth_max=200.0)
    for cam in (_down_camera(dims, 60.0), _oblique_camera(dims)):
        view, intr = cam
        outs = {}
        for name, skip in (("skip", True), ("plain", False)):
            cfg = dataclasses.replace(base, coarse_skip=skip)
            out = raycast.raycast_occ(
                jnp.asarray(occ[None]), jnp.asarray(view[None]),
                jnp.asarray(intr[None]), cfg,
            )
            outs[name] = np.asarray(out)[0]
        assert outs["skip"].sum() > 10
        np.testing.assert_array_equal(outs["skip"], outs["plain"])


def test_coarse_skip_reduces_iterations():
    """The skip's point: on a sparse scene the lockstep march finishes in
    fewer while-loop iterations (the cost driver) than the plain march."""
    import dataclasses

    dims = (64, 64, 64)
    sdf, valid = _blob_scene(dims, seed=7)
    view, intr = _oblique_camera(dims)
    base = _cfg(depth_max=200.0)
    iters = {}
    for name, skip in (("skip", True), ("plain", False)):
        cfg = dataclasses.replace(base, coarse_skip=skip, march_block=16)
        out = raycast.find_surface_crossings(
            jnp.asarray(sdf[None]), jnp.asarray(valid[None]),
            jnp.asarray(view[None]), jnp.asarray(intr[None]), cfg,
        )
        iters[name] = int(out["n_iters"])
    assert iters["skip"] < iters["plain"], iters


def test_global_compaction_bit_identical():
    """Cross-batch straggler compaction (compact_across_batch): survivors of
    ALL batch rows compact into one block with per-ray origins and gather
    offsets into the batch-flattened cell/window volumes. Sample positions
    are unchanged, so hit/depth/voxel outputs must match the plain AND the
    per-row-compacted march bitwise — on a batch mixing different scenes and
    cameras."""
    import dataclasses

    dims = (64, 64, 64)
    s1, v1 = _blob_scene(dims, seed=5)
    s2, v2 = _blob_scene(dims, seed=9)
    s3, v3 = _plane_scene(dims, z0=30.0)
    view_a, intr_a = _down_camera(dims, 60.0)
    view_b, intr_b = _oblique_camera(dims)
    sdf = jnp.asarray(np.stack([s1, s2, s3]))
    valid = jnp.asarray(np.stack([v1, v2, v3]))
    views = jnp.asarray(np.stack([view_a, view_b, view_a]))
    intrs = jnp.asarray(np.stack([intr_a, intr_b, intr_a]))
    base = _cfg(depth_max=200.0)
    for skip in (True, False):
        outs = {}
        for name, kw in (
            ("global", dict(straggler_frac=0.125, compact_across_batch=True)),
            ("row", dict(straggler_frac=0.125)),
            ("plain", dict(straggler_frac=0.0)),
        ):
            cfg = dataclasses.replace(base, coarse_skip=skip, **kw)
            out = raycast.find_surface_crossings(sdf, valid, views, intrs, cfg)
            outs[name] = {k: np.asarray(v) for k, v in out.items() if k != "n_iters"}
        assert outs["global"]["hit"].sum() > 50
        for ref_name in ("row", "plain"):
            for k in outs[ref_name]:
                np.testing.assert_array_equal(
                    outs["global"][k], outs[ref_name][k], err_msg=f"{ref_name}:{k}"
                )


def test_batch_group_equivalent():
    """batch_group marches the batch in sequential lax.map groups (round-5
    gather-locality fix: the packed-cell table is 32 MB/sample and gather
    rows cost ~2.5x more at B=8 than B=2, so B>2 marches group into B=2
    sub-marches). Per-ray sample positions are the same lattice expression
    either way, so the DECISIONS (hit mask, hit voxel index) must match the
    ungrouped run bitwise; float outputs (alpha/depth, shaded images, the
    backward scatter) may drift a few ulps because XLA picks different
    fma/fusion inside the lax.map body — bound those tightly instead.
    Exercised on a 4-row batch mixing scenes and cameras."""
    import dataclasses

    dims = (48, 48, 48)
    s1, v1 = _blob_scene(dims, seed=5)
    s2, v2 = _blob_scene(dims, seed=9)
    s3, v3 = _plane_scene(dims, z0=25.0)
    view_a, intr_a = _down_camera(dims, 44.0)
    view_b, intr_b = _oblique_camera(dims)
    sdf = jnp.asarray(np.stack([s1, s2, s3, s2]))
    valid = jnp.asarray(np.stack([v1, v2, v3, v2]))
    views = jnp.asarray(np.stack([view_a, view_b, view_a, view_a]))
    intrs = jnp.asarray(np.stack([intr_a, intr_b, intr_a, intr_a]))
    base = _cfg(depth_max=150.0)
    B = 4
    rng = np.random.RandomState(3)
    color = jnp.asarray(rng.rand(B, *dims, 3).astype(np.float32))

    def shaded_loss(s, c, cfg):
        out = raycast.raycast(s, valid, c, None, None, views, intrs, cfg)
        img = jnp.where(jnp.isfinite(out.color), out.color, 0.0)
        dep = jnp.where(jnp.isfinite(out.depth), out.depth, 0.0)
        return jnp.sum(img * img) + jnp.sum(dep), out

    for kw in (dict(straggler_frac=0.125, compact_across_batch=True),
               dict(straggler_frac=0.0)):
        plain_cfg = dataclasses.replace(base, batch_group=0, **kw)
        group_cfg = dataclasses.replace(base, batch_group=2, **kw)
        hits_p = raycast.find_surface_crossings(sdf, valid, views, intrs, plain_cfg)
        hits_g = raycast.find_surface_crossings(sdf, valid, views, intrs, group_cfg)
        assert np.asarray(hits_p["hit"]).sum() > 50
        for k in ("hit", "hit_idx"):
            np.testing.assert_array_equal(
                np.asarray(hits_g[k]), np.asarray(hits_p[k]), err_msg=k
            )
        for k in ("alpha", "depth"):
            np.testing.assert_allclose(
                np.asarray(hits_g[k]), np.asarray(hits_p[k]),
                rtol=2e-5, atol=2e-5, err_msg=k,
            )

        (_, out_p), grads_p = jax.value_and_grad(shaded_loss, argnums=(0, 1), has_aux=True)(
            sdf, color, plain_cfg
        )
        (_, out_g), grads_g = jax.value_and_grad(shaded_loss, argnums=(0, 1), has_aux=True)(
            sdf, color, group_cfg
        )
        for a, b, name in zip(out_p, out_g, out_p._fields):
            a, b = np.asarray(a), np.asarray(b)
            # -inf marks invalid pixels: the masks must agree exactly
            np.testing.assert_array_equal(
                np.isfinite(a), np.isfinite(b), err_msg=f"{name} validity"
            )
            np.testing.assert_allclose(
                np.nan_to_num(a, neginf=0.0), np.nan_to_num(b, neginf=0.0),
                rtol=2e-5, atol=2e-5, err_msg=name,
            )
        for a, b, name in zip(grads_p, grads_g, ("d_sdf", "d_color")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=name,
            )

    # occupancy raycast groups too
    occ = jnp.asarray(np.stack([np.abs(s1) < 1, np.abs(s2) < 1,
                                np.abs(s3) < 1, np.abs(s2) < 1]))
    occ_p = raycast.raycast_occ(occ, views, intrs, dataclasses.replace(base, batch_group=0))
    occ_g = raycast.raycast_occ(occ, views, intrs, dataclasses.replace(base, batch_group=2))
    np.testing.assert_array_equal(np.asarray(occ_g), np.asarray(occ_p))
    # non-divisible group sizes fall back to the ungrouped march
    occ_f = raycast.raycast_occ(occ, views, intrs, dataclasses.replace(base, batch_group=3))
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_p))
