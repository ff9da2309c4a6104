"""The 7-term UPSNet loss stack (SURVEY.md §3.3 return dict).

  rpn_cls + rpn_bbox + cls + bbox + mask + w_seg * (seg [+ seg_roi]) +
  w_pano * pano

Conventions follow the Detectron lineage the reference inherits: 2-way
softmax RPN objectness; smooth-L1 with beta = 1/9 for RPN bbox and beta = 1
for RCNN bbox; per-pixel sigmoid BCE on the GT-class mask channel; softmax
CE with ignore label 255 for the semantic and panoptic heads.

All functions take explicit validity masks (static-shape padding) and
normalize the way the reference does (per sampled anchor/RoI count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred, target, beta: float):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def softmax_ce(logits, labels, valid):
    """Mean softmax cross-entropy over valid entries. labels int, logits
    (..., C), valid broadcastable bool."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    ll = jnp.where(valid, ll, 0.0)
    return -jnp.sum(ll) / jnp.maximum(jnp.sum(valid), 1.0)


def rpn_cls_loss(cls_logits_flat, labels):
    """cls_logits_flat (N, 2); labels (N,) in {1 fg, 0 bg, -1 ignore}."""
    valid = labels >= 0
    return softmax_ce(cls_logits_flat, jnp.maximum(labels, 0), valid)


def rpn_bbox_loss(bbox_pred_flat, targets, fg_mask, norm, beta: float = 1.0 / 9.0):
    l = smooth_l1(bbox_pred_flat.astype(jnp.float32), targets, beta)
    l = jnp.sum(l * fg_mask[:, None])
    return l / jnp.maximum(norm, 1.0)


def rcnn_cls_loss(cls_score, labels, valid):
    return softmax_ce(cls_score, labels, valid)


def rcnn_bbox_loss(bbox_pred, labels, bbox_targets, fg, valid, beta: float = 1.0):
    """Class-specific regression: slice the 4 deltas of the GT class.

    bbox_pred (R, 4*C); labels (R,); bbox_targets (R, 4); fg (R,) bool.
    Normalized by the number of valid sampled RoIs (Detectron convention).
    """
    r = bbox_pred.shape[0]
    pred = bbox_pred.reshape(r, -1, 4).astype(jnp.float32)
    sel = jnp.take_along_axis(
        pred, labels[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    l = smooth_l1(sel, bbox_targets, beta).sum(-1)
    l = jnp.where(fg, l, 0.0)
    return jnp.sum(l) / jnp.maximum(jnp.sum(valid), 1.0)


def mask_loss(mask_logits, labels, mask_targets, fg):
    """Per-pixel BCE on the GT-class channel of fg RoIs.

    mask_logits (R, M, M, C); labels (R,); mask_targets (R, M, M) in {0,1}.
    """
    sel = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        labels[:, None, None, None].astype(jnp.int32),
        axis=-1,
    )[..., 0]
    bce = jnp.maximum(sel, 0) - sel * mask_targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    bce = jnp.mean(bce, axis=(1, 2))
    return jnp.sum(jnp.where(fg, bce, 0.0)) / jnp.maximum(jnp.sum(fg), 1.0)


def seg_loss(seg_logits, seg_gt, ignore: int = 255):
    """Semantic CE at 1/4 scale; seg_gt (B, H, W) with 255 = ignore."""
    valid = seg_gt != ignore
    labels = jnp.where(valid, seg_gt, 0)
    return softmax_ce(seg_logits, labels, valid)


def seg_roi_loss(seg_logits, seg_gt, gt_boxes_seg, gt_valid, crop: int = 28,
                 ignore: int = 255):
    """RoI re-weighted semantic loss (paper §3.2): crop logits and GT inside
    each GT box, resize to crop^2 with nearest sampling, CE over the crops.

    seg_logits (H, W, C) single image; gt_boxes_seg (G, 4) in seg scale.
    """
    h, w, c = seg_logits.shape
    m = crop

    def crop_one(box):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1 + 1.0, 1.0)
        bh = jnp.maximum(y2 - y1 + 1.0, 1.0)
        ys = y1 + (jnp.arange(m, dtype=jnp.float32) + 0.5) / m * bh - 0.5
        xs = x1 + (jnp.arange(m, dtype=jnp.float32) + 0.5) / m * bw - 0.5
        yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
        lg = seg_logits[yi][:, xi]  # (m, m, C)
        gt = seg_gt[yi][:, xi]  # (m, m)
        return lg, gt

    lgs, gts = jax.vmap(crop_one)(gt_boxes_seg)
    valid = (gts != ignore) & gt_valid[:, None, None]
    labels = jnp.where(valid, gts, 0)
    return softmax_ce(lgs, labels, valid)


def panoptic_loss(pan_logits, pan_gt, ignore: int = 255):
    """CE over the (S + G + 1)-channel panoptic stack. pan_logits (K, H, W),
    pan_gt (H, W) int with 255 ignore."""
    logits = jnp.moveaxis(pan_logits, 0, -1)  # (H, W, K)
    valid = pan_gt != ignore
    labels = jnp.where(valid, pan_gt, 0)
    return softmax_ce(logits, labels, valid)
