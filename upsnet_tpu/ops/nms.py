"""Static-shape greedy NMS for TPU.

Replaces the reference's CUDA bitmask NMS (uber-research/UPSNet
``upsnet/operators/src/nms/``) with a jit-compiled XLA formulation:

1. sort boxes by score (invalid/padded boxes carry score -inf and sort last);
2. build the pairwise "i suppresses j" matrix for i < j with IoU > thresh;
3. iterate ``keep[j] = not any_i(keep[i] & sup[i, j])`` to fixpoint.

The fixpoint of (3) is exactly greedy NMS: a box is suppressed iff some
higher-scored *kept* box overlaps it. Convergence needs at most
`suppression-chain depth` iterations (rarely > a dozen); we run a
``lax.while_loop`` until the keep vector stops changing, which stays inside
one compiled program (no data-dependent recompiles). O(N^2) IoU work maps to
VPU-friendly dense ops; for the N <= ~5k boxes on the RPN path this is far
below one MXU matmul of the backbone.

Returns fixed-size outputs (indices padded with -1) — static shapes are the
central TPU design translation (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from upsnet_tpu.ops.boxes import pairwise_iou


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    offset: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a padded box set.

    Args:
      boxes: (N, 4) float.
      scores: (N,) float.
      iou_thresh: suppression IoU threshold.
      max_out: number of output slots (static).
      valid: optional (N,) bool; False rows are ignored.
      offset: 1.0 for the Detectron legacy +1 box convention.

    Returns:
      (indices, keep_valid): (max_out,) int32 indices into the input (padded
      with -1), and (max_out,) bool validity mask. Indices are ordered by
      descending score, matching the reference's output ordering.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    if valid is not None:
        scores = jnp.where(valid, scores, neg_inf)

    order = jnp.argsort(-scores)  # stable sort: ties keep input order
    sboxes = boxes[order]
    sscores = scores[order]
    svalid = sscores > neg_inf

    iou = pairwise_iou(sboxes, sboxes, offset=offset)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    sup = (iou > iou_thresh) & upper  # sup[i, j]: i (higher score) kills j
    sup = sup & svalid[:, None] & svalid[None, :]

    def body(keep):
        # j survives iff no kept higher-priority box suppresses it.
        suppressed = jnp.any(keep[:, None] & sup, axis=0)
        return ~suppressed & svalid

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def step(state):
        keep, _ = state
        return body(keep), keep

    keep0 = svalid
    keep, _ = jax.lax.while_loop(cond, step, (body(keep0), keep0))

    # Select top max_out kept boxes in score order.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1  # rank among kept
    take = keep & (rank < max_out)
    out_idx = jnp.full((max_out,), -1, dtype=jnp.int32)
    out_idx = out_idx.at[jnp.where(take, rank, max_out)[:n]].set(
        order.astype(jnp.int32), mode="drop"
    )
    out_valid = out_idx >= 0
    return out_idx, out_valid


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_thresh: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    offset: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the coordinate-offset trick (boxes of different
    classes never overlap), as used for final detection filtering."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    shifted = boxes + (classes.astype(boxes.dtype) * 2.0 * max_coord)[:, None]
    return nms_padded(shifted, scores, iou_thresh, max_out, valid, offset)
