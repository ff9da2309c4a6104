"""Training-time target assignment — on device, inside the jitted step.

Replaces two reference CPU/numpy modules (SURVEY.md §2.2, §3.3):

  * RPN anchor targets (fg/bg sampling + bbox deltas) — Detectron rules:
    anchors straddling the image border are don't-care; fg = IoU >= 0.7 or
    per-GT argmax; bg = IoU < 0.3; sample ``rpn_batch_size`` anchors at
    <= 50% fg.
  * ``ProposalMaskTarget`` — RoI sampling for the box/mask heads: append GT
    boxes to proposals, fg = IoU >= 0.5, sample ``batch_rois`` at 25% fg;
    emit labels, class-specific bbox deltas (weights 10,10,5,5), FPN level
    assignment, and 28x28 mask targets cropped from rasterized GT masks.

The reference does all of this in numpy mid-step (a real bottleneck and a
host round-trip, SURVEY.md §3.3); here it is vectorized jnp + jax.random so
the whole train step is one XLA program.

Random sampling uses the uniform-priority + top_k trick: among eligible
candidates, take the k with highest random priority — equivalent to uniform
sampling without replacement, fully static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from upsnet_tpu.ops.boxes import encode_boxes, fpn_level_assignment, pairwise_iou
from upsnet_tpu.ops.roi_align import _axis_hat, _sample_coords


def crowd_overlap(boxes: jnp.ndarray, crowd_boxes: jnp.ndarray,
                  crowd_valid: jnp.ndarray) -> jnp.ndarray:
    """Max intersection-over-box-area (IoA) of each box vs crowd regions.

    Detectron-lineage crowd handling (the reference inherits it through
    ``proposal_mask_target.py``): candidates mostly inside an ``iscrowd``
    GT region are *ignore* — excluded from the negative pool so crowd
    pixels never become hard negatives (VERDICT r1 item #4).
    """
    x1 = jnp.maximum(boxes[:, None, 0], crowd_boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], crowd_boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], crowd_boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], crowd_boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1 + 1, 0) * jnp.maximum(y2 - y1 + 1, 0)
    area = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1),
        1.0,
    )
    ioa = inter / area[:, None]
    ioa = jnp.where(crowd_valid[None, :], ioa, 0.0)
    return jnp.max(ioa, axis=1) if crowd_boxes.shape[0] else jnp.zeros(
        boxes.shape[0]
    )


def _sample_k(key, eligible: jnp.ndarray, k: int):
    """Pick up to k True positions uniformly. Returns (idx (k,), valid (k,))."""
    n = eligible.shape[0]
    pri = jax.random.uniform(key, (n,))
    pri = jnp.where(eligible, pri, -1.0)
    if k > n:  # fewer candidates than slots: pad with invalid entries
        pri = jnp.pad(pri, (0, k - n), constant_values=-1.0)
    top_pri, idx = jax.lax.top_k(pri, k)
    valid = top_pri >= 0  # eligible entries always outrank the -1 fill
    idx = jnp.minimum(idx, n - 1)
    return idx, valid


class RPNTargets(NamedTuple):
    labels: jnp.ndarray  # (N,) int32: 1 fg, 0 bg, -1 don't care
    bbox_targets: jnp.ndarray  # (N, 4)
    bbox_inside: jnp.ndarray  # (N,) float: 1 for fg anchors
    norm: jnp.ndarray  # scalar: count of sampled anchors


@functools.partial(jax.jit, static_argnames=("batch_size", "fg_fraction"))
def rpn_targets(
    key: jax.Array,
    anchors: jnp.ndarray,  # (N, 4) all levels concatenated
    gt_boxes: jnp.ndarray,  # (G, 4) padded
    gt_valid: jnp.ndarray,  # (G,) bool
    im_hw: jnp.ndarray,  # (2,) actual image extent
    batch_size: int = 256,
    fg_fraction: float = 0.5,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    straddle_thresh: float = 0.0,
    crowd_boxes: jnp.ndarray | None = None,  # (Gc, 4) iscrowd regions
    crowd_valid: jnp.ndarray | None = None,  # (Gc,) bool
    crowd_thresh: float = 0.7,
) -> RPNTargets:
    n = anchors.shape[0]
    inside = (
        (anchors[:, 0] >= -straddle_thresh)
        & (anchors[:, 1] >= -straddle_thresh)
        & (anchors[:, 2] < im_hw[1] + straddle_thresh)
        & (anchors[:, 3] < im_hw[0] + straddle_thresh)
    )
    iou = pairwise_iou(anchors, gt_boxes)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)
    # per-GT best anchors also fg (ties included, Detectron behavior)
    gt_best = jnp.max(iou, axis=0, keepdims=True)  # (1, G)
    is_gt_argmax = jnp.any(
        (iou == gt_best) & (gt_best > 0) & gt_valid[None, :], axis=1
    )
    fg = inside & ((max_iou >= positive_overlap) | is_gt_argmax)
    bg = inside & (max_iou < negative_overlap) & ~fg
    if crowd_boxes is not None and crowd_boxes.shape[0]:
        in_crowd = crowd_overlap(anchors, crowd_boxes, crowd_valid) >= crowd_thresh
        fg = fg & ~in_crowd  # crowd regions are ignore, not supervision
        bg = bg & ~in_crowd

    k_fg = int(batch_size * fg_fraction)
    kf, kb = jax.random.split(key)
    fg_idx, fg_ok = _sample_k(kf, fg, k_fg)
    n_fg = jnp.sum(fg_ok)
    k_bg = batch_size - k_fg
    bg_idx, bg_ok = _sample_k(kb, bg, batch_size)  # oversample, trim below
    # use batch_size - n_fg background anchors
    bg_rank = jnp.cumsum(bg_ok.astype(jnp.int32)) - 1
    bg_take = bg_ok & (bg_rank < batch_size - n_fg)

    # scatter only the *taken* samples: padded top_k slots hold indices of
    # arbitrary anchors, so writing -1 through them would erase labels set
    # by the other pool — route untaken writes to the out-of-range index n
    # and let mode="drop" discard them.
    labels = jnp.full((n,), -1, jnp.int32)
    labels = labels.at[jnp.where(bg_take, bg_idx, n)].set(0, mode="drop")
    labels = labels.at[jnp.where(fg_ok, fg_idx, n)].set(1, mode="drop")

    matched = gt_boxes[argmax_gt]
    bbox_targets = encode_boxes(anchors, matched)
    bbox_inside = (labels == 1).astype(jnp.float32)
    norm = jnp.maximum(jnp.sum(labels >= 0).astype(jnp.float32), 1.0)
    del k_bg
    return RPNTargets(labels, bbox_targets, bbox_inside, norm)


class RoITargets(NamedTuple):
    rois: jnp.ndarray  # (R, 4)
    valid: jnp.ndarray  # (R,) bool
    labels: jnp.ndarray  # (R,) int32 class (0 = background)
    bbox_targets: jnp.ndarray  # (R, 4) deltas to matched GT
    fg: jnp.ndarray  # (R,) bool
    levels: jnp.ndarray  # (R,) int32 FPN level index (0 -> P2)
    mask_targets: jnp.ndarray  # (R, M, M) float in [0, 1]
    matched_gt: jnp.ndarray  # (R,) int32 index of matched GT


@functools.partial(
    jax.jit,
    static_argnames=("batch_rois", "fg_fraction", "mask_size", "mask_scale"),
)
def proposal_mask_targets(
    key: jax.Array,
    proposals: jnp.ndarray,  # (P, 4)
    proposal_valid: jnp.ndarray,  # (P,) bool
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_classes: jnp.ndarray,  # (G,) int32, 1..num_classes-1
    gt_valid: jnp.ndarray,  # (G,) bool
    gt_masks: jnp.ndarray,  # (G, Hm, Wm) float/uint8 rasterized instance masks
    batch_rois: int = 512,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.0,
    bbox_weights: tuple = (10.0, 10.0, 5.0, 5.0),
    mask_size: int = 28,
    mask_scale: float = 1.0,  # gt_masks resolution relative to image coords
    crowd_boxes: jnp.ndarray | None = None,  # (Gc, 4) iscrowd regions
    crowd_valid: jnp.ndarray | None = None,
    crowd_thresh: float = 0.7,
) -> RoITargets:
    # Detectron appends GT boxes to the proposal set.
    cand = jnp.concatenate([proposals, gt_boxes], axis=0)
    cand_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    iou = pairwise_iou(cand, gt_boxes)
    iou = jnp.where(gt_valid[None, :] & cand_valid[:, None], iou, 0.0)
    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    fg = cand_valid & (max_iou >= fg_thresh)
    bg = cand_valid & (max_iou < bg_thresh_hi) & (max_iou >= bg_thresh_lo)
    if crowd_boxes is not None and crowd_boxes.shape[0]:
        # Detectron _filter_crowd_proposals: proposals mostly covered by a
        # crowd region are removed from the sampling pools entirely
        in_crowd = (
            crowd_overlap(cand, crowd_boxes, crowd_valid) >= crowd_thresh
        ) & ~fg  # a confident fg match to a real GT still trains
        bg = bg & ~in_crowd

    k_fg = int(batch_rois * fg_fraction)
    kf, kb = jax.random.split(key)
    fg_idx, fg_ok = _sample_k(kf, fg, k_fg)
    n_fg = jnp.sum(fg_ok)
    bg_idx, bg_ok = _sample_k(kb, bg, batch_rois)
    bg_rank = jnp.cumsum(bg_ok.astype(jnp.int32)) - 1
    bg_take = bg_ok & (bg_rank < batch_rois - n_fg)

    # Layout: first k_fg slots = fg samples, rest = bg samples.
    k_bg = batch_rois - k_fg
    sel_idx = jnp.concatenate([fg_idx, bg_idx[:k_bg]])
    sel_fg = jnp.concatenate([fg_ok, jnp.zeros((k_bg,), bool)])
    sel_ok = jnp.concatenate([fg_ok, bg_take[:k_bg]])

    rois = cand[sel_idx]
    m_gt = argmax_gt[sel_idx]
    labels = jnp.where(sel_fg, gt_classes[m_gt], 0)
    labels = jnp.where(sel_ok, labels, 0).astype(jnp.int32)
    bbox_targets = encode_boxes(rois, gt_boxes[m_gt], bbox_weights)
    levels = fpn_level_assignment(rois) - 2

    # Mask targets: bilinear crop of the matched GT mask inside each fg RoI
    # to mask_size^2, then binarize at 0.5 — the on-device equivalent of the
    # reference's polygon crop/resize (done at gt_masks resolution). Only
    # the first k_fg slots feed the mask loss (models/upsnet.py slices
    # [:, :k_fg]), and the crop runs as dense separable-hat matmuls
    # ``Ky @ M @ Kx^T`` — a vmapped per-RoI gather ROIAlign here measured
    # 1.27s of the 1.77s b8 train forward (per-row gather latency); the
    # dense form is MXU work on a (k_fg, Hm, Wm) mask stack instead.
    hm, wm = gt_masks.shape[-2:]
    s = 2  # sampling_ratio, as the reference's GPU mask crop
    ps = mask_size * s
    fg_gt = m_gt[:k_fg]
    fg_masks = gt_masks[fg_gt].astype(jnp.float32)  # (k_fg, Hm, Wm)
    roi_in_mask = rois[:k_fg] * mask_scale
    y, x = _sample_coords(roi_in_mask, 1.0, mask_size, s)
    sy = y[:, :, 0, :, 0].reshape(k_fg, ps)
    sx = x[:, 0, :, 0, :].reshape(k_fg, ps)
    ones = jnp.ones((k_fg,), bool)
    ky = _axis_hat(sy, hm, ones, jnp.float32)  # (k_fg, PS, Hm)
    kx = _axis_hat(sx, wm, ones, jnp.float32)  # (k_fg, PS, Wm)
    t = jnp.einsum("rsh,rhw->rsw", ky, fg_masks)
    crops = jnp.einsum("rsw,rtw->rst", t, kx)
    crops = crops.reshape(k_fg, mask_size, s, mask_size, s).mean(axis=(2, 4))
    mask_targets = jnp.concatenate(
        [
            (crops >= 0.5).astype(jnp.float32),
            jnp.zeros((batch_rois - k_fg, mask_size, mask_size), jnp.float32),
        ],
        axis=0,
    )

    return RoITargets(
        rois=rois,
        valid=sel_ok,
        labels=labels,
        bbox_targets=bbox_targets,
        fg=sel_fg & sel_ok,
        levels=levels.astype(jnp.int32),
        mask_targets=mask_targets,
        matched_gt=m_gt.astype(jnp.int32),
    )
