"""Box utilities: IoU, encode/decode, clip, flip.

Semantics follow the Detectron-lineage helpers the reference uses
(uber-research/UPSNet ``upsnet/bbox/bbox_transform.py``): boxes are
``(x1, y1, x2, y2)`` with the **legacy +1 convention** — ``width = x2 - x1 + 1``
— which the released UPSNet checkpoints were trained with, so decode/encode
must match it exactly for parity (SURVEY.md §7.3 hard part #2).

All functions are pure jnp, jit-friendly, and shape-polymorphic over leading
batch dims where noted. Padded/invalid boxes are handled by callers via
validity masks; these helpers never branch on data.
"""

from __future__ import annotations

import jax.numpy as jnp

# Detectron clamps dw/dh before exp to avoid overflow: log(1000/16).
BBOX_XFORM_CLIP = float(jnp.log(1000.0 / 16.0))


def box_wh(boxes: jnp.ndarray, offset: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    w = boxes[..., 2] - boxes[..., 0] + offset
    h = boxes[..., 3] - boxes[..., 1] + offset
    return w, h


def box_area(boxes: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
    w, h = box_wh(boxes, offset)
    return jnp.maximum(w, 0.0) * jnp.maximum(h, 0.0)


def pairwise_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, offset: float = 1.0
) -> jnp.ndarray:
    """IoU matrix of shape (..., N, M) for boxes1 (..., N, 4), boxes2 (..., M, 4)."""
    a1 = box_area(boxes1, offset)[..., :, None]
    a2 = box_area(boxes2, offset)[..., None, :]
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def encode_boxes(
    boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    offset: float = 1.0,
) -> jnp.ndarray:
    """Box regression targets (dx, dy, dw, dh) from `boxes` to `gt_boxes`."""
    w, h = box_wh(boxes, offset)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    gw, gh = box_wh(gt_boxes, offset)
    gcx = gt_boxes[..., 0] + 0.5 * gw
    gcy = gt_boxes[..., 1] + 0.5 * gh
    wx, wy, ww, wh_ = weights
    w = jnp.maximum(w, 1e-6)
    h = jnp.maximum(h, 1e-6)
    dx = wx * (gcx - cx) / w
    dy = wy * (gcy - cy) / h
    dw = ww * jnp.log(jnp.maximum(gw, 1e-6) / w)
    dh = wh_ * jnp.log(jnp.maximum(gh, 1e-6) / h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    boxes: jnp.ndarray,
    deltas: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    offset: float = 1.0,
) -> jnp.ndarray:
    """Apply (dx, dy, dw, dh) deltas to boxes. deltas (..., N, 4)."""
    w, h = box_wh(boxes, offset)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh_ = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh_, BBOX_XFORM_CLIP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    # Detectron: x2 = cx + 0.5*w - 1 under the +1 convention.
    return jnp.stack(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcx + 0.5 * pw - offset,
            pcy + 0.5 * ph - offset,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, im_hw, offset: float = 1.0) -> jnp.ndarray:
    """Clip boxes to [0, W-1] x [0, H-1] (im_hw = (height, width) in pixels)."""
    h, w = im_hw[0], im_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0.0, w - offset)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - offset)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - offset)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes(boxes: jnp.ndarray, im_width, offset: float = 1.0) -> jnp.ndarray:
    """Horizontal flip (training augmentation; also flip-TTA de-flip)."""
    x1 = im_width - offset - boxes[..., 2]
    x2 = im_width - offset - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def fpn_level_assignment(
    boxes: jnp.ndarray,
    k_min: int = 2,
    k_max: int = 5,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    offset: float = 1.0,
) -> jnp.ndarray:
    """FPN paper RoI-to-level: k = floor(k0 + log2(sqrt(wh)/224)), clamped.

    Reference: ProposalMaskTarget / FPNRoIAlign level routing (SURVEY.md §2.2).
    """
    w, h = box_wh(boxes, offset)
    s = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    k = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-12))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32)
