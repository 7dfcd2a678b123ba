"""Multi-host execution test: two real processes, a coordinator, and the
actual training CLI (SURVEY.md §5 distributed-backend row; the reference has
no distributed execution at all, so this is TPU-native-only surface).

Each process gets 2 virtual CPU devices, so the global mesh spans 4 devices
across 2 processes; the gradient all-reduce crosses the process boundary via
the gloo CPU collectives backend."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    save = str(tmp_path / "run")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=repo,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            SPSG_COORDINATOR=f"127.0.0.1:{port}",
            SPSG_NUM_PROCESSES="2",
            SPSG_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "spsg_tpu.cli.train",
                 "--distributed", "--synthetic_chunks", "32",
                 "--save", save, "--input_dim", "16", "--nf_gen", "4",
                 "--batch_size", "4", "--max_epoch", "1",
                 "--weight_disc_loss", "0", "--weight_depth_loss", "0",
                 "--num_iters_geo_only", "1", "--lr", "1e-3"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=repo,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    # both processes joined the same job over 4 global devices
    assert "process 0/2, 2 local / 4 global devices" in outs[0], outs[0][-2000:]
    assert "process 1/2" in outs[1]
    # primary-only writes: checkpoint + logs exist exactly once (shared dir)
    assert any(f.startswith("model-epoch") for f in os.listdir(save))
    assert os.path.isfile(os.path.join(save, "log_val.csv"))
    # the validation metrics line only prints on the primary
    assert "val_iou(occ)" in outs[0]
    assert "val_iou(occ)" not in outs[1]
