"""Multi-scale / flip TTA end-to-end on the tiny synthetic config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import load_config
from upsnet_tpu.data.synthetic import SyntheticDataset
from upsnet_tpu.evaluation.inference import run_evaluation
from upsnet_tpu.evaluation.tta import _greedy_nms_per_class, fuse_host


def test_greedy_class_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
    scores = np.array([0.9, 0.8, 0.7])
    classes = np.array([1, 1, 1])
    keep = _greedy_nms_per_class(boxes, scores, classes, 0.5, 10)
    assert keep.tolist() == [0, 2]
    # different class survives
    keep = _greedy_nms_per_class(boxes, scores, np.array([1, 2, 1]), 0.5, 10)
    assert keep.tolist() == [0, 1, 2]


def test_fuse_host_basic():
    cfg = load_config("experiments/upsnet_tiny_synthetic.yaml")
    h, w = 32, 32
    num_stuff = cfg.dataset.num_stuff
    seg = np.zeros((h, w, cfg.dataset.num_seg_classes), np.float32)
    seg[:, :, 0] = 2.0
    seg[8:16, 8:16, num_stuff] = 6.0  # thing class 1 evidence
    boxes = np.array([[8.0, 8.0, 15.0, 15.0]])
    scores = np.array([0.95])
    classes = np.array([1])
    masks = np.full((1, 28, 28), 8.0, np.float32)
    pan, keep = fuse_host(cfg, seg, boxes, scores, classes, masks)
    assert keep[0]
    assert pan[12, 12] == num_stuff + 0
    assert pan[0, 0] == 0


@pytest.mark.slow
def test_run_evaluation_tta_smoke():
    cfg = load_config("experiments/upsnet_tiny_synthetic.yaml")
    cfg = cfg.replace(test=dataclasses.replace(
        cfg.test, multi_scale=(96,), flip_test=True))
    ds = SyntheticDataset(cfg, num_images=2, training=False)
    # training=False sample() needs training dataset for GT-based eval
    ds_eval = SyntheticDataset(cfg, num_images=2, training=True)
    ds.load_gt = ds_eval.load_gt  # reuse GT for the evaluators
    res = run_evaluation(cfg, ds, max_images=2)
    assert "panoptic" in res and "boxes" in res
    assert np.isfinite(res["panoptic"]["All"]["pq"])
