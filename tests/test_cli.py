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
