import numpy as np

from upsnet_tpu.config import default_config, update_config
from upsnet_tpu.ops.anchors import anchors_for_level, generate_cell_anchors, pyramid_anchors


def test_cell_anchor_sizes():
    # stride 16, scale 8 -> the classic Detectron 128^2-area anchors.
    a = generate_cell_anchors(16)
    w = a[:, 2] - a[:, 0] + 1
    h = a[:, 3] - a[:, 1] + 1
    # ratio 1 anchor is exactly 128x128
    i = np.argmin(np.abs(w / h - 1))
    assert w[i] == 128 and h[i] == 128
    # areas approximately preserved across ratios
    np.testing.assert_allclose(w * h, 128 * 128, rtol=0.1)


def test_anchor_grid_layout():
    a = anchors_for_level(2, 3, 4)
    assert a.shape == (2 * 3 * 3, 4)
    # second cell in x is shifted by stride
    np.testing.assert_allclose(a[3] - a[0], [4, 0, 4, 0])
    # second row is shifted by stride in y
    np.testing.assert_allclose(a[9] - a[0], [0, 4, 0, 4])


def test_pyramid_anchor_counts():
    anchors = pyramid_anchors((64, 128))
    sizes = [(16, 32), (8, 16), (4, 8), (2, 4), (1, 2)]
    for a, (fh, fw) in zip(anchors, sizes):
        assert a.shape == (fh * fw * 3, 4)


def test_config_yaml_merge(tmp_path):
    cfg = default_config()
    cfg2 = update_config(
        cfg,
        {
            "symbol": "resnet_101_upsnet",
            "gpus": "0,1,2,3",
            "train": {"lr": 0.005, "decay_iteration": [240000, 320000]},
            "network": {"backbone": "resnet101", "bogus_key": 1},
        },
    )
    assert cfg2.symbol == "resnet_101_upsnet"
    assert cfg2.num_devices == 4
    assert cfg2.train.lr == 0.005
    assert cfg2.train.decay_iteration == (240000, 320000)
    assert cfg2.network.backbone == "resnet101"
    # untouched defaults survive
    assert cfg2.train.momentum == 0.9
    assert cfg.train.lr == 0.02  # original is immutable
