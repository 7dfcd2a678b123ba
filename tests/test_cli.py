"""End-to-end CLI smoke tests on synthetic data (no dataset download):
train a few iterations, then run whole-scene chunked evaluation."""

import json
import os

import numpy as np
import pytest


def test_train_cli_synthetic(tmp_path):
    from spsg_tpu.cli import train as train_cli

    save = str(tmp_path / "run")
    train_cli.main(
        [
            "--synthetic_chunks", "4",
            "--save", save,
            "--input_dim", "16",
            "--nf_gen", "4",
            "--batch_size", "2",
            "--max_epoch", "1",
            "--weight_disc_loss", "0",
            "--weight_depth_loss", "0",
            "--num_iters_geo_only", "1",
        ]
    )
    assert os.path.isfile(os.path.join(save, "args.txt"))
    log = open(os.path.join(save, "log.csv")).read().splitlines()
    assert log[0].startswith("epoch,iter,train_loss(total)")
    # checkpoints written per epoch
    assert any(f.startswith("model-epoch") for f in os.listdir(save))


def test_chunks_eval_cli_synthetic(tmp_path):
    from spsg_tpu.cli import test_scene_as_chunks as eval_cli

    out = str(tmp_path / "out")
    summary = eval_cli.main(
        [
            "--synthetic_scenes", "1",
            "--output", out,
            "--input_dim", "16",
            "--nf_gen", "4",
            "--stride", "8",
            "--window_batch", "4",
            "--num_to_vis", "1",
        ]
    )
    assert os.path.isfile(os.path.join(out, "IoU.txt"))
    assert 0.0 <= summary["geo_iou"] <= 1.0
    vis = os.listdir(os.path.join(out, "vis"))
    assert any(f.endswith("_target-mesh.ply") for f in vis)


def test_scene_eval_cli_synthetic(tmp_path):
    from spsg_tpu.cli import test_scene as scene_cli

    out = str(tmp_path / "out_scene")
    scene_cli.main(
        [
            "--synthetic_scenes", "1",
            "--output", out,
            "--nf_gen", "4",
            "--max_input_height", "16",
            "--style_width", "48",
            "--style_height", "32",
            "--num_to_vis", "1",
        ]
    )
    files = os.listdir(out)
    assert any(f.endswith("_pred-mesh.ply") or f.endswith("_target-mesh.ply") for f in files)
    assert any(f.endswith("_pred.png") for f in files)
    assert any(f.endswith("_pred-depth.png") for f in files)


def test_datagen_cli_end_to_end(tmp_path):
    """mesh -> scan -> chunk -> semantics -> category, all via the CLI."""
    import struct

    import numpy as np

    from spsg_tpu.cli import datagen as dg
    from spsg_tpu.ops import mesh as mesh_ops

    # labeled floor mesh
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    colors = np.full((4, 3), 120, np.uint8)
    mesh_path = str(tmp_path / "room.ply")
    mesh_ops.save_ply(mesh_path, verts, faces, colors)
    region_path = str(tmp_path / "room_semseg.ply")
    with open(region_path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0", "element vertex 4",
               "property float x", "property float y", "property float z",
               "element face 2", "property list uchar int vertex_indices",
               "property int category_id", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        f.write(verts.astype("<f4").tobytes())
        for i in range(2):
            f.write(struct.pack("B", 3))
            f.write(faces[i].astype("<i4").tobytes())
            f.write(struct.pack("<i", 5))

    scans = str(tmp_path / "scans")
    dg.main(["scan", "--mesh", mesh_path, "--output_dir", scans,
             "--voxelsize", "0.08", "--num_frames", "6"])
    assert os.path.isfile(os.path.join(scans, "room__cmp__0.sdf"))

    chunks_dir = str(tmp_path / "chunks")
    dg.main(["chunk", "--inc", os.path.join(scans, "room__inc__0"),
             "--cmp", os.path.join(scans, "room__cmp__0"),
             "--output_dir", chunks_dir, "--name", "room",
             "--chunk_dims", "16", "16", "16", "--min_surface_voxels", "20"])
    cmp_chunks = [f for f in os.listdir(chunks_dir) if "__cmp__" in f]
    assert cmp_chunks

    dg.main(["semantics", "--region_ply", region_path,
             "--sdf_glob", os.path.join(chunks_dir, "*__cmp__*.sdf"),
             "--samples_per_face", "200"])
    sem_chunks = [f for f in os.listdir(chunks_dir) if "__sem__" in f]
    assert len(sem_chunks) == len(cmp_chunks)

    dg.main(["category", "--output_dir", str(tmp_path)])
    assert os.path.isfile(str(tmp_path / "category.npz"))
    assert os.path.isfile(str(tmp_path / "Category_list.png"))


def test_datagen_frames_to_2d_training(tmp_path):
    """Closes the datagen -> 2D-loss loop (VERDICT r1 item 4): scan with
    frame export -> chunk with frame association -> train with use_2d=True
    consuming the exported frames (reference frame pipeline
    data_util.py:764-787,862-902 + datagen frame selection Scene.h:51-96)."""
    import numpy as np

    from spsg_tpu.cli import datagen as dg
    from spsg_tpu.cli import train as train_cli
    from spsg_tpu.ops import mesh as mesh_ops

    # a colored open box (floor + 2 walls) so frames see actual geometry
    verts = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],
         [-1, -1, 1], [1, -1, 1], [-1, 1, 1]], np.float32)
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 1, 5], [0, 5, 4], [0, 3, 6], [0, 6, 4]],
        np.int64)
    colors = np.stack([np.full(7, 200), np.full(7, 90), np.full(7, 40)], 1).astype(np.uint8)
    mesh_path = str(tmp_path / "boxroom.ply")
    mesh_ops.save_ply(mesh_path, verts, faces, colors)

    scans = str(tmp_path / "scans")
    frames = str(tmp_path / "frames")
    dg.main(["scan", "--mesh", mesh_path, "--output_dir", scans,
             "--voxelsize", "0.08", "--num_frames", "8",
             "--chance_drop_frames", "0.5",
             "--export_frames", "--frame_path", frames])
    scene_dir = os.path.join(frames, "boxroom")
    assert os.path.isfile(os.path.join(scene_dir, "depth", "0.png"))
    assert os.path.isfile(os.path.join(scene_dir, "color", "0.jpg"))
    assert os.path.isfile(os.path.join(scene_dir, "camera", "0.txt"))
    assert os.path.isfile(os.path.join(scans, "boxroom__cmp__0.traj.npz"))

    chunks_dir = str(tmp_path / "chunks")
    dg.main(["chunk", "--inc", os.path.join(scans, "boxroom__inc__0"),
             "--cmp", os.path.join(scans, "boxroom__cmp__0"),
             "--output_dir", chunks_dir, "--name", "boxroom",
             "--chunk_dims", "16", "16", "16", "--min_surface_voxels", "20"])
    assoc = [f for f in os.listdir(chunks_dir) if f.endswith(".txt") and "__cmp__" in f]
    assert assoc, "no frame-association files written"
    ids = [int(l) for l in open(os.path.join(chunks_dir, assoc[0])).read().splitlines()]
    assert ids and all(0 <= i < 8 for i in ids)

    inc_chunks = sorted(f for f in os.listdir(chunks_dir) if "__inc__" in f)
    flist = str(tmp_path / "train.txt")
    with open(flist, "w") as f:
        f.write("\n".join(inc_chunks) + "\n")

    save = str(tmp_path / "run")
    train_cli.main([
        "--data_path", chunks_dir, "--train_file_list", flist,
        "--val_file_list", flist, "--save", save,
        "--input_dim", "16", "--nf_gen", "4", "--batch_size", "2",
        "--max_epoch", "1", "--num_iters_geo_only", "0",
        "--weight_depth_loss", "1", "--weight_disc_loss", "0.5",
        "--weight_semantic_loss", "0",
        "--frame_info_path", chunks_dir, "--frame_path", frames,
        "--style_width", "48", "--style_height", "32",
        "--max_depth_fill_iters", "4", "--lr", "1e-3",
    ])
    log = open(os.path.join(save, "log_val.csv")).read()
    assert "depth" in log.splitlines()[0]
    # the 2D losses actually ran: depth-loss column is not the -1 sentinel
    import csv
    rows = list(csv.DictReader(open(os.path.join(save, "log_val.csv"))))
    assert float(rows[-1]["train_loss(depth)"]) != -1.0
    assert float(rows[-1]["train_loss(disc)"]) != -1.0


def test_train_cli_steps_per_call(tmp_path):
    """--steps_per_call 2 (Trainer.step_many dispatch batching) trains the
    same curriculum: per-epoch validation rows exist, losses are finite, and
    checkpoints land — including a curriculum-boundary window flush
    (num_iters_geo_only forces a flags change mid-epoch)."""
    from spsg_tpu.cli import train as train_cli

    save = str(tmp_path / "run_spc")
    train_cli.main(
        [
            "--synthetic_chunks", "8",
            "--save", save,
            "--input_dim", "16",
            "--nf_gen", "4",
            "--batch_size", "2",
            "--max_epoch", "2",
            "--weight_disc_loss", "0",
            "--weight_depth_loss", "0",
            "--num_iters_geo_only", "3",  # flags flip mid-window
            "--steps_per_call", "2",
            "--no_vis",
        ]
    )
    rows = open(os.path.join(save, "log_val.csv")).read().splitlines()
    assert len(rows) >= 3  # header + one row per epoch
    import numpy as np

    vals = [float(x) for x in rows[-1].split(",")[2:] if x]
    assert all(np.isfinite(v) or v == -1.0 for v in vals)
    assert any(f.startswith("model-epoch") for f in os.listdir(save))
