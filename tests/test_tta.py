"""Multi-scale / flip TTA end-to-end on the tiny synthetic config.

Since VERDICT r1 item #8, TTA fuses through the SAME device
``panoptic_fuse`` as the single-scale path (``tta.fuse_tta`` resamples the
merged evidence onto the base bucket's quarter canvas) — the former
host-side re-implementation is gone, so fusion cannot drift.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.config import load_config
from upsnet_tpu.data.synthetic import SyntheticDataset
from upsnet_tpu.evaluation.inference import run_evaluation
from upsnet_tpu.evaluation.tta import _greedy_nms_per_class, fuse_tta


def test_greedy_class_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
    scores = np.array([0.9, 0.8, 0.7])
    classes = np.array([1, 1, 1])
    keep = _greedy_nms_per_class(boxes, scores, classes, 0.5, 10)
    assert keep.tolist() == [0, 2]
    # different class survives
    keep = _greedy_nms_per_class(boxes, scores, np.array([1, 2, 1]), 0.5, 10)
    assert keep.tolist() == [0, 1, 2]


def test_fuse_tta_matches_device_fusion():
    """fuse_tta == panoptic_fuse on the same (resampled) evidence — the
    pinning test from VERDICT r1 #8, now structural: fuse_tta calls the
    device fusion, so this asserts the resample/pad plumbing."""
    from upsnet_tpu.models.upsnet import panoptic_fuse

    cfg = load_config("experiments/upsnet_tiny_synthetic.yaml")
    num_stuff = cfg.dataset.num_stuff
    oh, ow = 128, 160  # == base bucket -> base_scale 1, no resize loss
    bucket = (128, 160)
    rng = np.random.RandomState(0)
    seg_avg = rng.randn(oh, ow, cfg.dataset.num_seg_classes).astype(np.float32)
    boxes = np.array([[8.0, 8.0, 60.0, 60.0], [70.0, 30.0, 120.0, 90.0]],
                     np.float32)
    scores = np.array([0.95, 0.9], np.float32)
    classes = np.array([1, 2], np.int32)
    masks = rng.randn(2, 28, 28).astype(np.float32) + 2.0

    pan_map, keep, (pb, ps, pc, pm, pv) = fuse_tta(
        cfg, seg_avg, boxes, scores, classes, masks,
        base_scale=1.0, bucket=bucket, content_hw=(oh, ow),
    )
    assert pan_map.shape == (oh, ow)
    assert keep[:2].any()

    # reference: call panoptic_fuse directly on the same quarter evidence
    import cv2

    seg_q = cv2.resize(seg_avg, (ow // 4, oh // 4),
                       interpolation=cv2.INTER_LINEAR)
    d = cfg.test.max_det
    pb2 = np.zeros((d, 4), np.float32)
    ps2 = np.zeros((d,), np.float32)
    pc2 = np.zeros((d,), np.int32)
    pm2 = np.zeros((d, 28, 28), np.float32)
    pv2 = np.zeros((d,), bool)
    pb2[:2], ps2[:2], pc2[:2], pm2[:2], pv2[:2] = (
        boxes, scores, classes, masks, True,
    )
    want_map, want_keep = panoptic_fuse(
        jnp.asarray(seg_q), jnp.asarray(pb2), jnp.asarray(pc2),
        jnp.asarray(pm2), jnp.asarray(ps2), jnp.asarray(pv2),
        score_thresh=float(cfg.test.panoptic_score_thresh),
        overlap_thresh=float(cfg.test.panoptic_mask_overlap_thresh),
        num_stuff=num_stuff,
    )
    want_full = cv2.resize(
        np.asarray(want_map).astype(np.int32), (ow, oh),
        interpolation=cv2.INTER_NEAREST,
    )
    np.testing.assert_array_equal(pan_map, want_full)
    np.testing.assert_array_equal(keep, np.asarray(want_keep))


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


@pytest.mark.slow
def test_run_evaluation_mesh_matches_single_device():
    """Mesh-batched eval (images grouped n_dev at a time through the
    sharded predict step, final partial group padded) produces the same
    evaluator outputs as the per-image single-device path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = load_config("experiments/upsnet_tiny_synthetic.yaml")
    ds = SyntheticDataset(cfg, num_images=3, training=False)  # 3 < n_dev:
    # exercises the padded partial-group flush
    got = run_evaluation(cfg, ds, max_images=3, use_mesh=True)
    want = run_evaluation(cfg, ds, max_images=3, use_mesh=False)

    def flat(d, prefix=""):
        out = {}
        for k, v in sorted(d.items()):
            if isinstance(v, dict):
                out.update(flat(v, f"{prefix}{k}/"))
            else:
                out[f"{prefix}{k}"] = v
        return out

    g, w = flat(got), flat(want)
    assert g.keys() == w.keys()
    for k in g:
        np.testing.assert_allclose(g[k], w[k], err_msg=k)
