import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.anchors import pyramid_anchors
from upsnet_tpu.ops.boxes import encode_boxes, pairwise_iou
from upsnet_tpu.ops.proposals import pyramid_proposals
from upsnet_tpu.ops.targets import proposal_mask_targets, rpn_targets

IM = (64, 64)


def make_rpn_outputs(target_box, rng):
    """Tiny pyramid where exactly one anchor is boosted toward target_box."""
    anchors = pyramid_anchors(IM)
    cls, bbox = [], []
    # find best anchor on level 1 (stride 8)
    a = anchors[1]
    iou = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(target_box[None])))[:, 0]
    best = int(np.argmax(iou))
    for li, al in enumerate(anchors):
        h = -(-IM[0] // (4 * 2**li))
        w = -(-IM[1] // (4 * 2**li))
        n_anchor = 3
        c = np.zeros((h, w, n_anchor * 2), np.float32)
        c[..., 0::2] = 4.0  # background wins everywhere
        b = rng.randn(h, w, n_anchor * 4).astype(np.float32) * 0.01
        if li == 1:
            cell, anc = divmod(best, 3)
            yy, xx = divmod(cell, w)
            c[yy, xx, anc * 2] = 0.0
            c[yy, xx, anc * 2 + 1] = 6.0  # strong foreground
            delta = np.asarray(
                encode_boxes(jnp.asarray(a[best][None]), jnp.asarray(target_box[None]))
            )[0]
            b[yy, xx, anc * 4 : anc * 4 + 4] = delta
        cls.append(jnp.asarray(c))
        bbox.append(jnp.asarray(b))
    return cls, bbox, [jnp.asarray(x) for x in anchors]


def test_pyramid_proposals_recovers_boosted_box(rng):
    target = np.array([10.0, 12.0, 40.0, 44.0], np.float32)
    cls, bbox, anchors = make_rpn_outputs(target, rng)
    rois, scores, valid = pyramid_proposals(
        tuple(cls), tuple(bbox), tuple(anchors), jnp.asarray([64.0, 64.0]),
        pre_nms_top_n=50, post_nms_top_n=20, nms_thresh=0.7,
    )
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(rois[0]), target, atol=0.5)
    # scores sorted descending among valid
    s = np.asarray(scores)[np.asarray(valid)]
    assert np.all(np.diff(s) <= 1e-6)


def test_rpn_targets_basic():
    key = jax.random.PRNGKey(0)
    anchors = jnp.asarray(
        np.array(
            [
                [10, 10, 30, 30],  # perfect match to gt
                [12, 12, 32, 32],  # high overlap
                [40, 40, 60, 60],  # background
                [-10, -5, 20, 20],  # straddles border -> don't care
            ],
            np.float32,
        )
    )
    gt = jnp.asarray(np.array([[10, 10, 30, 30]], np.float32))
    t = rpn_targets(
        key, anchors, gt, jnp.asarray([True]), jnp.asarray([64.0, 64.0]),
        batch_size=4,
    )
    labels = np.asarray(t.labels)
    assert labels[0] == 1  # IoU 1.0
    assert labels[3] == -1  # straddling
    assert labels[2] == 0  # sampled bg (only candidate)
    # fg bbox target encodes to ~zero deltas for the perfect match
    np.testing.assert_allclose(np.asarray(t.bbox_targets[0]), 0.0, atol=1e-5)


def test_proposal_mask_targets_fg_assignment():
    key = jax.random.PRNGKey(1)
    gt_boxes = jnp.asarray(np.array([[8, 8, 24, 24], [32, 32, 56, 56]], np.float32))
    gt_classes = jnp.asarray(np.array([3, 7], np.int32))
    gt_valid = jnp.asarray([True, True])
    masks = np.zeros((2, 64, 64), np.float32)
    masks[0, 8:25, 8:25] = 1
    masks[1, 32:57, 32:57] = 1
    proposals = jnp.asarray(
        np.array([[9, 9, 25, 25], [30, 30, 58, 58], [0, 40, 10, 60]], np.float32)
    )
    pvalid = jnp.asarray([True, True, True])
    t = proposal_mask_targets(
        key, proposals, pvalid, gt_boxes, gt_classes, gt_valid,
        jnp.asarray(masks), batch_rois=16, fg_fraction=0.5,
    )
    labels = np.asarray(t.labels)
    fg = np.asarray(t.fg)
    rois = np.asarray(t.rois)
    assert fg.sum() >= 4  # 2 close proposals + 2 appended GT boxes
    for i in np.where(fg)[0]:
        assert labels[i] in (3, 7)
        # mask target mostly 1 inside a fg roi matching its gt region
        mt = np.asarray(t.mask_targets[i])
        assert mt.mean() > 0.5
    # bg slots labeled 0
    assert np.all(labels[~fg] == 0)
    # rois levels in range
    assert np.all((np.asarray(t.levels) >= 0) & (np.asarray(t.levels) <= 3))
    assert rois.shape == (16, 4)
