"""Datagen tests: TSDF fusion correctness vs analytic geometry, known-space
encoding, end-to-end virtual scan producing loadable training files, and
semantic splatting (reference datagen has only a save/reload self-check,
Fuser.cpp:106-126)."""

import os

import numpy as np
import pytest

from spsg_tpu.data import formats
from spsg_tpu.datagen import fusion, scan, semantics
from spsg_tpu.ops import mesh as mesh_ops


def _plane_mesh(z0=0.5, half=1.0):
    """A horizontal square plane at world z = z0."""
    verts = np.array(
        [
            [-half, -half, z0],
            [half, -half, z0],
            [half, half, z0],
            [-half, half, z0],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


def test_grid_from_bounds():
    cfg = fusion.FusionConfig(voxelsize=0.05, scene_pad=2, height_pad=1)
    dims, w2g = fusion.grid_from_bounds([0, 0, 0], [1.0, 0.5, 0.25], cfg)
    assert dims == (5 + 2, 10 + 4, 20 + 4)  # zyx; +2*pad per axis
    # world origin maps to the padding offset
    p = w2g @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [2, 2, 1], atol=1e-5)


def test_fuse_plane_depth():
    """Fuse straight-down views of a plane; the fused SDF must match the
    analytic distance field near the surface."""
    cfg = fusion.FusionConfig(voxelsize=0.05)
    dims, w2g = fusion.grid_from_bounds([-0.4, -0.4, 0.0], [0.4, 0.4, 1.0], cfg)
    sc = scan.ScanConfig(width=128, height=96, fx=120.0, fy=120.0)
    # camera 1m above the plane looking straight down (world z up)
    cam = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 1.5], [0, 0, 0, 1]], np.float32
    )
    verts, faces = _plane_mesh(z0=0.5)
    pts = mesh_ops.sample_point_cloud(verts, faces, 200000, seed=0)
    depth, _ = scan.render_depth_from_points(pts, None, cam, sc)
    assert (depth > 0).mean() > 0.3

    grid = fusion.fuse_frames(
        dims, w2g, [(depth, None, np.array([sc.fx, sc.fy, sc.width / 2, sc.height / 2]), cam)], cfg
    )
    sdf = np.asarray(grid["sdf"])
    # voxel at world (0, 0, 0.7) is 0.2 above the plane -> sdf ~ +0.2 (clamped
    # to the adaptive truncation ~0.2) ; voxel at (0,0,0.5) -> ~0
    g = w2g @ np.array([0, 0, 0.5, 1.0])
    vz, vy, vx = int(round(g[2])), int(round(g[1])), int(round(g[0]))
    assert np.isfinite(sdf[vz, vy, vx])
    assert abs(sdf[vz, vy, vx]) < 0.06
    g2 = w2g @ np.array([0, 0, 0.6, 1.0])
    v2 = sdf[int(round(g2[2])), vy, vx]
    assert v2 == pytest.approx(0.1, abs=0.06)


def test_known_encoding():
    vs = 0.05
    sdf = np.array([[[0.2, 0.03, -0.03, -0.2, -np.inf]]], np.float32)
    k = fusion.known_encoding(sdf, vs)
    assert k[0, 0, 0] == 0  # known empty
    assert k[0, 0, 1] == 1  # surface
    assert k[0, 0, 2] == 1
    assert 2 <= k[0, 0, 3] <= 255  # behind surface
    assert k[0, 0, 4] == 255  # unobserved


def test_virtual_scan_end_to_end(tmp_path):
    """Scan a synthetic room mesh -> __inc__/__cmp__ files load and feed the
    chunk assembly path."""
    from spsg_tpu.data import pipeline

    # box room: floor plane with a box on it
    zz = 0.0
    verts, faces = _plane_mesh(z0=zz, half=1.0)
    colors = np.full((len(verts), 3), 180, np.uint8)
    center = np.array([0.0, 0.0, 0.0])
    traj = scan.orbit_trajectory(center, radius=1.5, height=1.2, num_frames=8)
    cfg = fusion.FusionConfig(voxelsize=0.05)
    inc = str(tmp_path / "room__inc__0")
    cmp_ = str(tmp_path / "room__cmp__0")
    dims, w2g = scan.virtual_scan(
        verts, faces, colors, traj, inc, cmp_, fusion_cfg=cfg, seed=3
    )
    inc_data = formats.load_sdf(inc + ".sdf")
    cmp_data = formats.load_sdf(cmp_ + ".sdf")
    assert len(cmp_data.locs) >= len(inc_data.locs) > 0
    known, vs, _ = formats.load_known(cmp_ + ".knw")
    assert known.shape == cmp_data.dims
    assert vs == pytest.approx(0.05)


def test_splat_semantics():
    w2g = np.eye(4)
    w2g[:3, :3] *= 10.0  # voxelsize 0.1
    pts = np.array([[0.55, 0.35, 0.25]])
    labels = np.array([5])
    dense = semantics.splat_semantics(pts, labels, w2g, (8, 8, 8))
    # rounded point (x=6 (5.5->6), y=4 (3.5->4), z=2 (2.5->2, round-half-even))
    assert dense[2, 4, 6] == 5 or dense[3, 4, 6] == 5
    # floor-cube corners labeled too
    assert dense[2, 3, 5] == 5
    assert (dense == 5).sum() >= 8
    assert (dense == semantics.UNLABELED).sum() > 400


def test_extend_sdf_file_roundtrip(tmp_path, rng):
    dims = (8, 8, 8)
    locs = np.array([[2, 2, 2], [3, 3, 3]], np.int32)
    sdf = np.array([0.5, -0.5], np.float32)
    w2g = np.eye(4, dtype=np.float32) * 10.0
    w2g[3, 3] = 1.0
    known = np.zeros(dims, np.uint8)
    colors = np.zeros(dims + (3,), np.uint8)
    src = str(tmp_path / "c__cmp__0.sdf")
    formats.save_sdf(src, dims, 0.1, w2g, locs, sdf, known=known, colors=colors)
    out = str(tmp_path / "c__sem__0.sdf")
    pts = np.array([[0.25, 0.25, 0.25]])
    semantics.extend_sdf_file(src, out, pts, np.array([7]))
    data = formats.load_sdf(out, load_known=True, load_color=True, load_semantic=True)
    assert data.semantics is not None
    assert (data.semantics == 7).sum() >= 8


def test_labeled_ply_roundtrip_and_sampling(tmp_path):
    """Region-segmentation PLY reading + per-face-labeled surface sampling
    (reference sample_util.py:45-67)."""
    import struct

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 0, 2], [1, 0, 2], [1, 1, 2]], np.float32
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cats = np.array([5, 12], np.int32)
    p = str(tmp_path / "region.ply")
    with open(p, "wb") as f:
        hdr = [
            "ply", "format binary_little_endian 1.0",
            "element vertex 6",
            "property float x", "property float y", "property float z",
            "element face 2",
            "property list uchar int vertex_indices",
            "property int category_id",
            "end_header",
        ]
        f.write(("\n".join(hdr) + "\n").encode())
        f.write(verts.astype("<f4").tobytes())
        for i in range(2):
            f.write(struct.pack("B", 3))
            f.write(faces[i].astype("<i4").tobytes())
            f.write(struct.pack("<i", cats[i]))
    v2, f2, c2 = semantics.read_labeled_ply(p)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_array_equal(c2, cats)

    pts, labels = semantics.sample_labeled_mesh(v2, f2, c2, samples_per_face=50)
    assert len(pts) == 100  # samples_per_face * num_faces
    # points on the z=0 triangle must carry label 5; z=2 -> 12
    np.testing.assert_array_equal(labels[np.abs(pts[:, 2]) < 1e-5], 5)
    np.testing.assert_array_equal(labels[np.abs(pts[:, 2] - 2) < 1e-5], 12)


def test_sens_roundtrip_and_fusion(tmp_path):
    """.sens write -> read -> fuse end-to-end (ScanNet SensorData format)."""
    from spsg_tpu.datagen import sens, scan
    from spsg_tpu.ops import mesh as mesh_ops2

    verts, faces = _plane_mesh(z0=0.5)
    pts = mesh_ops2.sample_point_cloud(verts, faces, 100000, seed=0)
    sc = scan.ScanConfig(width=64, height=48, fx=60.0, fy=60.0)
    cams = []
    depths = []
    for k in range(3):
        cam = np.array(
            [[1, 0, 0, 0.05 * k], [0, -1, 0, 0], [0, 0, -1, 1.6], [0, 0, 0, 1]],
            np.float32,
        )
        d, _ = scan.render_depth_from_points(pts, None, cam, sc)
        cams.append(cam)
        depths.append(d)
    intr = np.array(
        [[60.0, 0, 32, 0], [0, 60.0, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    p = str(tmp_path / "scan.sens")
    sens.write_sens(p, np.stack(depths), None, np.stack(cams), intr)

    r = sens.SensReader(p)
    assert r.num_frames == 3
    assert r.depth_width == 64 and r.depth_height == 48
    np.testing.assert_allclose(r.depth_intrinsics_params, [60, 60, 32, 24])
    frames = list(r.frames())
    np.testing.assert_allclose(frames[0][0], depths[0], atol=1e-3)
    np.testing.assert_allclose(frames[2][2], cams[2], atol=1e-6)
    r.close()

    out = str(tmp_path / "fused")
    dims, w2g = sens.fuse_sens(p, out, voxelsize=0.05)
    data = formats.load_sdf(out + ".sdf")
    assert len(data.locs) > 0


def test_parameter_file_reader(tmp_path):
    """zParameters-style config files drive the datagen configs (reference
    GlobalAppState.h:11-78)."""
    from spsg_tpu.datagen import params as P

    p = str(tmp_path / "zParams.txt")
    open(p, "w").write(
        """
s_bDebugVis = false;
s_voxelSize = 0.05f;	//in m
s_renderWidth = 160;	// render width
s_chanceDropFrames = 0.7f;
s_sceneFileList = "../fileLists/rooms.txt";
s_scenePadding = 6; 		//on each side
"""
    )
    d = P.load_parameter_file(p)
    assert d["s_bDebugVis"] is False
    assert d["s_voxelSize"] == 0.05
    assert d["s_renderWidth"] == 160
    assert d["s_sceneFileList"] == "../fileLists/rooms.txt"
    fc, sc = P.scan_configs_from_params(d)
    assert fc.voxelsize == 0.05 and fc.scene_pad == 6
    assert sc.width == 160 and sc.chance_drop_frames == 0.7


def test_matterport_semseg_vsegs_ingestion(tmp_path):
    """Raw Matterport annotation pair -> per-vertex labels -> __sem__ chunk
    (reference Aggregation.h:47-80 + Segmentation.h:60-86 + LabelUtil.h)."""
    import json

    import numpy as np

    from spsg_tpu.cli import datagen as dg
    from spsg_tpu.datagen import semantics
    from spsg_tpu.ops import mesh as mesh_ops

    # two-triangle mesh: left triangle is a "bed", right is a "wall"
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    mesh_path = str(tmp_path / "scene.ply")
    mesh_ops.save_ply(mesh_path, verts, faces, np.full((4, 3), 99, np.uint8))

    vsegs = {"params": {"kThresh": "0.01"}, "segIndices": [7, 7, 12, -1]}
    semseg = {
        "sceneId": "scene", "appId": "test",
        "segGroups": [
            {"id": 0, "objectId": 0, "label": "bed", "segments": [7]},
            {"id": 1, "objectId": 1, "label": "wall", "segments": [12]},
        ],
    }
    (tmp_path / "scene.vsegs.json").write_text(json.dumps(vsegs))
    (tmp_path / "scene.semseg.json").write_text(json.dumps(semseg))
    mapping = tmp_path / "category_mapping.tsv"
    mapping.write_text(
        "index\traw_category\teigen13id\n1\tbed\t1\n2\twall\t12\n3\tdoor\t4\n"
    )

    vlabels = semantics.vertex_labels_from_segmentation(
        str(tmp_path / "scene.vsegs.json"), str(tmp_path / "scene.semseg.json"),
        str(mapping),
    )
    # -1 marks an unsegmented vertex -> UNLABELED (14), not segment 0's label
    np.testing.assert_array_equal(vlabels, [1, 1, 12, 14])
    flabels = semantics.face_labels_from_vertex_labels(faces, vlabels)
    np.testing.assert_array_equal(flabels, [1, 1])

    # full CLI path: scan the mesh, chunk it, extend with raw annotations
    scans = str(tmp_path / "scans")
    dg.main(["scan", "--mesh", mesh_path, "--output_dir", scans,
             "--voxelsize", "0.08", "--num_frames", "6"])
    chunks_dir = str(tmp_path / "chunks")
    dg.main(["chunk", "--inc", os.path.join(scans, "scene__inc__0"),
             "--cmp", os.path.join(scans, "scene__cmp__0"),
             "--output_dir", chunks_dir, "--name", "scene",
             "--chunk_dims", "16", "16", "16", "--min_surface_voxels", "20"])
    dg.main(["semantics", "--vsegs", str(tmp_path / "scene.vsegs.json"),
             "--semseg", str(tmp_path / "scene.semseg.json"),
             "--mesh", mesh_path, "--mapping", str(mapping),
             "--sdf_glob", os.path.join(chunks_dir, "*__cmp__*.sdf"),
             "--samples_per_face", "400"])
    sem_chunks = [f for f in os.listdir(chunks_dir) if "__sem__" in f]
    assert sem_chunks
    from spsg_tpu.data import formats

    data = formats.load_sdf(
        os.path.join(chunks_dir, sem_chunks[0]), load_semantic=True
    )
    present = set(np.unique(data.semantics))
    assert 1 in present or 12 in present  # bed/wall labels landed in the grid
