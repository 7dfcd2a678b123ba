"""Full data-path integration: virtual scan -> room scene files -> chunk
cutting -> semantic extension -> ChunkDataset -> collate -> one train step.
Covers the entire offline + online pipeline with zero external data."""

import os

import jax
import numpy as np

from spsg_tpu.data import formats, pipeline
from spsg_tpu.datagen import chunks, fusion, scan, semantics
from spsg_tpu.training import StepFlags, TrainConfig
from spsg_tpu.training.state import init_states
from spsg_tpu.training.step import Trainer

DIMS = (16, 16, 16)


def _make_room_chunks(tmp_path, name, seed):
    verts = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    colors = np.full((4, 3), 150, np.uint8)
    traj = scan.orbit_trajectory(np.zeros(3), radius=1.4, height=1.1, num_frames=6)
    cfg = fusion.FusionConfig(voxelsize=0.08)
    inc = str(tmp_path / f"{name}_scan_inc")
    cmp_ = str(tmp_path / f"{name}_scan_cmp")
    scan.virtual_scan(verts, faces, colors, traj, inc, cmp_, fusion_cfg=cfg, seed=seed)
    chunk_dir = str(tmp_path / "chunks")
    files = chunks.cut_scene_to_chunks(
        inc, cmp_, chunk_dir, name, chunk_dims=DIMS, min_surface_voxels=50
    )
    assert files, "no chunks produced"
    # semantic extension: label the floor plane (z=0) as class 5
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-1, 1, 800), rng.uniform(-1, 1, 800), np.zeros(800)], axis=1
    )
    labels = np.full(800, 5)
    for f in files:
        sem_path = f.replace("__inc__", "__sem__")
        semantics.extend_sdf_file(f.replace("__inc__", "__cmp__"), sem_path, pts, labels)
    return files


def test_scan_to_train_step(tmp_path):
    files = []
    for i in range(2):
        files += _make_room_chunks(tmp_path, f"room{i}", seed=i)
    ds = pipeline.ChunkDataset(files, truncation=3.0, load_semantic=True, augment_hue=True)
    assert len(ds) >= 2
    s0 = ds[0]
    assert s0["input"].shape == DIMS + (4,)
    assert s0["semantics"].max() <= 14
    assert (s0["semantics"] == 5).sum() > 0  # splatted floor labels survived
    assert s0["known"].min() <= 1  # known space present

    batch = pipeline.collate([ds[0], ds[1]])
    batch.pop("name")
    batch["weight_occ"] = np.ones(())

    cfg = TrainConfig(input_dim=DIMS, nf_gen=4, batch_size=2,
                      weight_disc_loss=0.0, weight_depth_loss=0.0)
    gen_state, _ = init_states(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg)
    flags = StepFlags(pred_sdf=True, pred_color=True, pred_semantic=True)
    _, _, metrics = trainer.step(gen_state, None, batch, jax.random.PRNGKey(1), flags)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_semantic"]))


def test_batch_iterator(tmp_path):
    files = _make_room_chunks(tmp_path, "roomX", seed=7)
    ds = pipeline.ChunkDataset(files, truncation=3.0, load_semantic=True)
    n = 0
    for batch in pipeline.batch_iterator(ds, batch_size=1, shuffle=True, seed=0):
        assert batch["input"].shape[0] == 1
        n += 1
    assert n == len(ds)


def test_disk_frame_loading(tmp_path):
    """RGB-D frame loading from the reference's on-disk layout
    (scene/depth/N.png 16-bit mm, scene/color/N.jpg, scene/camera/N.txt —
    data_util.py:837-902), single- and multi-frame."""
    from PIL import Image

    files = _make_room_chunks(tmp_path, "sceneA_room0", seed=2)
    # frame files for every chunk
    frame_info = tmp_path / "frameinfo"
    frame_info.mkdir()
    scene_dir = tmp_path / "frames" / "sceneA"
    for sub in ("depth", "color", "camera"):
        (scene_dir / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fid in (0, 1):
        depth_mm = (rng.random((48, 64)) * 3000 + 500).astype(np.uint16)
        Image.fromarray(depth_mm, mode="I;16").save(scene_dir / "depth" / f"{fid}.png")
        color = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(color).save(scene_dir / "color" / f"{fid}.jpg")
        pose = np.eye(4)
        intr = np.eye(4)
        intr[0, 0] = intr[1, 1] = 60.0
        intr[0, 2] = 32.0
        intr[1, 2] = 24.0
        lines = [" ".join(str(x) for x in row) for row in np.vstack([pose, intr])]
        (scene_dir / "camera" / f"{fid}.txt").write_text("\n".join(lines))
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0].replace("__inc__", "__cmp__")
        (frame_info / f"{name}.txt").write_text("0\n1\n")

    ds = pipeline.ChunkDataset(
        files, truncation=3.0, load_semantic=True,
        frame_info_path=str(frame_info), frame_path=str(tmp_path / "frames"),
        image_dims=(64, 48), load_depth=True, randomize_frames=False,
    )
    s = ds[0]
    assert s["images_depth"].shape == (48, 64)
    assert s["images_color"].shape == (3, 48, 64)
    assert s["images_view"].shape == (4, 4)
    assert s["images_intrinsic"].shape == (4,)
    assert 0.4 < s["images_depth"].mean() < 4.0  # meters

    ds2 = pipeline.ChunkDataset(
        files, truncation=3.0, load_semantic=True,
        frame_info_path=str(frame_info), frame_path=str(tmp_path / "frames"),
        image_dims=(64, 48), load_depth=True, randomize_frames=False,
        max_num_frames=2,
    )
    s2 = ds2[0]
    assert s2["images_depth"].shape == (2, 48, 64)
    assert s2["images_view"].shape == (2, 4, 4)


def test_torch_bilinear_resize_matches_torch():
    """torch_bilinear_resize == F.interpolate(mode='bilinear',
    align_corners=False) including the down-then-up low-pass used by
    --subsample_tgt2d_factor (reference scene_dataloader.py:161-167)."""
    import pytest

    torch = pytest.importorskip("torch")
    import numpy as np

    from spsg_tpu.data.pipeline import torch_bilinear_resize

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 48, 64)).astype(np.float32)
    t = torch.from_numpy(x)[None]
    for f in (2, 3, 4):
        small_t = torch.nn.functional.interpolate(
            t, scale_factor=1.0 / f, mode="bilinear", align_corners=False
        )
        up_t = torch.nn.functional.interpolate(
            small_t, size=(48, 64), mode="bilinear", align_corners=False
        )
        small = torch_bilinear_resize(x, small_t.shape[2], small_t.shape[3], scale=f)
        assert small.shape == tuple(small_t.shape[1:])
        np.testing.assert_allclose(small, small_t.numpy()[0], atol=2e-5, rtol=1e-4)
        up = torch_bilinear_resize(small, 48, 64)
        np.testing.assert_allclose(up, up_t.numpy()[0], atol=2e-5, rtol=1e-4)
    # odd output sizes (non-divisible factor) hit the edge-clamp path
    small = torch_bilinear_resize(x, 17, 23)
    small_t = torch.nn.functional.interpolate(
        t, size=(17, 23), mode="bilinear", align_corners=False
    )
    np.testing.assert_allclose(small, small_t.numpy()[0], atol=2e-5, rtol=1e-4)
