"""Log aggregation tests (reference print_log semantics, train.py:286-396)."""

import numpy as np

from spsg_tpu.utils.logging import LOSS_KEYS, MetricsAccumulator, make_header


def test_means_filter_sentinels_but_not_adversarial():
    acc = MetricsAccumulator()
    acc.add({"loss": 1.0, "loss_sdf": -1.0, "loss_disc": -0.5, "loss_gen": -2.0})
    acc.add({"loss": 3.0, "loss_sdf": 0.5, "loss_disc": 0.5, "loss_gen": 2.0})
    m = acc.means()
    assert m["loss"] == 2.0
    assert m["loss_sdf"] == 0.5  # -1 sentinel filtered
    assert m["loss_disc"] == 0.0  # wgan-style negatives kept
    assert m["loss_gen"] == 0.0
    assert m["loss_color"] == -1.0  # never reported -> sentinel


def test_header_layout():
    h = make_header(["train"])
    assert h[0] == "epoch" and h[1] == "iter"
    assert h[2] == "train_loss(total)"
    assert h[-1] == "time"
    assert len(h) == 2 + len(LOSS_KEYS) + 1
