"""Crowd-region ignore handling (VERDICT r1 item #4).

COCO ``iscrowd`` boxes must act as ignore regions in target assignment
(Detectron lineage the reference inherits): anchors/proposals mostly inside
a crowd region leave the negative pool — crowd pixels never become hard
negatives — while confident fg matches to real GT still train.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.targets import (
    crowd_overlap,
    proposal_mask_targets,
    rpn_targets,
)


def test_crowd_overlap_is_ioa():
    boxes = jnp.asarray([[0.0, 0, 9, 9], [20, 20, 29, 29], [0, 0, 39, 39]])
    crowd = jnp.asarray([[0.0, 0, 19, 19]])
    valid = jnp.asarray([True])
    ioa = np.asarray(crowd_overlap(boxes, crowd, valid))
    np.testing.assert_allclose(ioa[0], 1.0)  # fully inside
    np.testing.assert_allclose(ioa[1], 0.0)  # disjoint
    np.testing.assert_allclose(ioa[2], 0.25)  # quarter covered
    # invalid crowd rows contribute nothing
    ioa2 = np.asarray(crowd_overlap(boxes, crowd, jnp.asarray([False])))
    assert (ioa2 == 0).all()


def _rpn_setup():
    anchors = jnp.asarray(
        [
            [0.0, 0, 15, 15],     # on the real GT
            [40, 40, 55, 55],     # inside the crowd region
            [100, 100, 115, 115], # plain background
        ]
    )
    gt = jnp.asarray([[0.0, 0, 15, 15]])
    gt_valid = jnp.asarray([True])
    crowd = jnp.asarray([[32.0, 32, 63, 63]])
    crowd_valid = jnp.asarray([True])
    hw = jnp.asarray([128.0, 128.0])
    return anchors, gt, gt_valid, crowd, crowd_valid, hw


def test_rpn_crowd_anchor_leaves_negative_pool():
    anchors, gt, gt_valid, crowd, crowd_valid, hw = _rpn_setup()
    key = jax.random.PRNGKey(0)
    with_crowd = rpn_targets(
        key, anchors, gt, gt_valid, hw, batch_size=4,
        crowd_boxes=crowd, crowd_valid=crowd_valid,
    )
    without = rpn_targets(key, anchors, gt, gt_valid, hw, batch_size=4)
    labels_w = np.asarray(with_crowd.labels)
    labels_wo = np.asarray(without.labels)
    assert labels_wo[1] == 0  # without crowd info: hard negative
    assert labels_w[1] == -1  # with crowd info: don't-care
    assert labels_w[0] == 1 and labels_w[2] == 0  # rest unchanged


def test_roi_crowd_proposal_excluded_from_bg():
    proposals = jnp.asarray(
        [
            [0.0, 0, 15, 15],     # fg (matches GT)
            [40, 40, 55, 55],     # inside crowd -> must be ignored
            [100, 100, 115, 115], # clean bg
        ]
    )
    pvalid = jnp.ones((3,), bool)
    gt = jnp.asarray([[0.0, 0, 15, 15]])
    gt_classes = jnp.asarray([2], jnp.int32)
    gt_valid = jnp.asarray([True])
    gt_masks = jnp.ones((1, 32, 32), jnp.float32)
    crowd = jnp.asarray([[32.0, 32, 63, 63]])
    crowd_valid = jnp.asarray([True])

    def run(**kw):
        return proposal_mask_targets(
            jax.random.PRNGKey(1), proposals, pvalid, gt, gt_classes,
            gt_valid, gt_masks, batch_rois=8, fg_fraction=0.5,
            mask_scale=0.25, **kw,
        )

    with_crowd = run(crowd_boxes=crowd, crowd_valid=crowd_valid)
    rois = np.asarray(with_crowd.rois)
    ok = np.asarray(with_crowd.valid)
    fg = np.asarray(with_crowd.fg)
    # the crowd proposal never appears as a valid background sample
    is_crowd_box = (rois == np.array([40, 40, 55, 55], np.float32)).all(1)
    assert not (is_crowd_box & ok & ~fg).any()
    # but clean bg still sampled, and fg still trains
    is_clean_bg = (rois == np.array([100, 100, 115, 115], np.float32)).all(1)
    assert (is_clean_bg & ok).any()
    assert fg.any()

    without = run()
    rois0 = np.asarray(without.rois)
    ok0 = np.asarray(without.valid)
    fg0 = np.asarray(without.fg)
    assert ((rois0 == np.array([40, 40, 55, 55], np.float32)).all(1)
            & ok0 & ~fg0).any()


def test_forward_train_accepts_crowd_batch(rng):
    """End-to-end: the jitted train forward takes crowd keys and stays
    finite (micro model, one step)."""
    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import build_model, forward_train
    from upsnet_tpu.ops.anchors import pyramid_anchors

    cfg = default_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, num_classes=5, num_seg_classes=7, num_stuff=3),
        network=dataclasses.replace(
            cfg.network, backbone="resnet_test", fpn_feature_dim=32,
            rcnn_fc_dim=64, fcn_head_dim=16, compute_dtype="float32",
            dcn_impl="gather", norm="gn"),
        train=dataclasses.replace(
            cfg.train, rpn_pre_nms_top_n=32, rpn_post_nms_top_n=16,
            batch_rois=8, rpn_batch_size=16, max_gt_instances=4,
            max_crowd_instances=2, remat=False),
    )
    model = build_model(cfg)
    h = w = 64
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors((h, w)))
    batch = {
        "images": x,
        "im_hw": jnp.asarray([[64.0, 64.0]]),
        "gt_boxes": jnp.asarray([[[4.0, 4, 20, 20]] * 4]),
        "gt_classes": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.asarray([[True, False, False, False]]),
        "gt_masks": jnp.ones((1, 4, h // 4, w // 4), jnp.float32),
        "seg_gt": jnp.zeros((1, h // 4, w // 4), jnp.int32),
        "crowd_boxes": jnp.asarray([[[30.0, 30, 50, 50], [0, 0, 0, 0]]]),
        "crowd_valid": jnp.asarray([[True, False]]),
    }
    total, losses = forward_train(
        model, params, cfg, anchors, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(total))
    assert set(losses) == {"rpn_cls", "rpn_bbox", "cls", "bbox", "mask",
                           "seg", "pano"}
