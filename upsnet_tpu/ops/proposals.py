"""RPN proposal generation over the FPN pyramid ("PyramidProposal").

Reference: uber-research/UPSNet
``upsnet/operators/modules/pyramid_proposal.py`` (SURVEY.md §2.2) — a mixed
numpy/torch/CUDA hot-path module. Rebuilt as one jitted function:

  per level: 2-way softmax objectness -> decode anchor deltas -> clip to the
  *actual* image window (im_info, not the padded canvas) -> drop tiny boxes
  -> static top-k; then concat levels -> joint greedy NMS -> static top-k.

Everything static-shape: padded slots carry score -inf and a False validity
bit. No host round-trips (the reference dropped to numpy here every step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from upsnet_tpu.ops.boxes import box_wh, clip_boxes, decode_boxes
from upsnet_tpu.ops.nms import nms_padded


def _level_proposals(
    cls_logits: jnp.ndarray,  # (H, W, A*2)
    bbox_deltas: jnp.ndarray,  # (H, W, A*4)
    anchors: jnp.ndarray,  # (H*W*A, 4)
    im_hw: jnp.ndarray,  # (2,) actual image height/width in the canvas
    pre_nms_top_n: int,
    min_size: float,
):
    h, w, a2 = cls_logits.shape
    a = a2 // 2
    n = h * w * a
    logits = cls_logits.reshape(n, 2).astype(jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)[:, 1]
    deltas = bbox_deltas.reshape(n, 4).astype(jnp.float32)
    boxes = decode_boxes(anchors, deltas)
    boxes = clip_boxes(boxes, im_hw)
    bw, bh = box_wh(boxes)
    ok = (bw >= min_size + 1.0) & (bh >= min_size + 1.0) if min_size > 0 else (
        (bw > 0) & (bh > 0)
    )
    scores = jnp.where(ok, scores, -jnp.inf)
    k = min(pre_nms_top_n, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return boxes[top_idx], top_scores


@functools.partial(
    jax.jit,
    static_argnames=(
        "pre_nms_top_n", "post_nms_top_n", "nms_thresh", "min_size",
        "joint_nms_cap",
    ),
)
def pyramid_proposals(
    cls_logits: tuple[jnp.ndarray, ...],  # per level (H, W, A*2)
    bbox_deltas: tuple[jnp.ndarray, ...],
    anchors: tuple[jnp.ndarray, ...],  # per level (N_l, 4) constants
    im_hw: jnp.ndarray,  # (2,) float: actual image size in canvas pixels
    pre_nms_top_n: int = 1000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    joint_nms_cap: int = 4096,
):
    """Single-image proposal generation.

    joint_nms_cap bounds the box set entering the cross-level NMS (the
    O(N^2) suppression matrix): the train config's 2000/level x 5 levels
    would need a 310MB IoU matrix per image; candidates ranked below ~4096
    essentially never reach the post-NMS top-1000. Set 0 to disable.

    Returns (rois (post_nms_top_n, 4), scores (post_nms_top_n,), valid bool).
    vmap over the batch axis for batched use.
    """
    all_boxes, all_scores = [], []
    for cl, bd, an in zip(cls_logits, bbox_deltas, anchors):
        b, s = _level_proposals(cl, bd, an, im_hw, pre_nms_top_n, min_size)
        all_boxes.append(b)
        all_scores.append(s)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    if joint_nms_cap and boxes.shape[0] > joint_nms_cap:
        scores, idx = jax.lax.top_k(scores, joint_nms_cap)
        boxes = boxes[idx]
    valid = jnp.isfinite(scores)
    idx, keep = nms_padded(boxes, scores, nms_thresh, post_nms_top_n, valid)
    safe = jnp.maximum(idx, 0)
    rois = jnp.where(keep[:, None], boxes[safe], 0.0)
    roi_scores = jnp.where(keep, scores[safe], -jnp.inf)
    return rois, roi_scores, keep
