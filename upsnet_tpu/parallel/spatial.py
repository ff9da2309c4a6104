"""Spatial partitioning of the dense panoptic fusion (SURVEY.md §5.7).

The reference's only answer to large spatial extents (Cityscapes 1024x2048,
multi-scale to ~2048) is batch=1 brute force. The TPU-native analogue of
sequence/context parallelism for dense 2-D maps: shard the (S + N + 1,
H, W) panoptic logit stack across mesh devices by image ROWS via
``shard_map``. Everything in the fusion is row-local except MaskRemoval's
greedy keep decision, which needs GLOBAL mask areas — those are one
``psum`` per scan step over the 'model' axis, riding ICI.

Bit-identical to the single-device ops/panoptic.py fusion (asserted in
tests on the 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from upsnet_tpu.ops import panoptic as pan_ops


def _fuse_shard(seg_lg, boxes, classes, mask_logits, scores, valid,
                *, score_thresh, overlap_thresh, num_stuff, axis):
    """Body run per device on a row slab of seg_lg (Hs, W, C)."""
    seg_lg = seg_lg.astype(jnp.float32)
    keep_score = valid & (scores >= score_thresh)
    slab_hw = (seg_lg.shape[0], seg_lg.shape[1])
    # paste into this slab only: shift boxes into slab coordinates
    row0 = jax.lax.axis_index(axis) * slab_hw[0]
    boxes_q = boxes * 0.25
    boxes_slab = boxes_q - jnp.array([0.0, row0, 0.0, row0], boxes_q.dtype)
    pasted = pan_ops.mask_term(
        jax.nn.sigmoid(mask_logits), boxes_slab, slab_hw
    )

    # MaskRemoval with global areas (psum over the spatial axis)
    bin_masks = pasted >= 0.5

    def step(claimed, xs):
        m, ok = xs
        area = jax.lax.psum(jnp.sum(m), axis)
        fresh = jax.lax.psum(jnp.sum(m & ~claimed), axis)
        keep = ok & (area > 0) & (
            fresh / jnp.maximum(area, 1.0) >= overlap_thresh
        )
        return claimed | (m & keep), keep

    init = jnp.zeros(slab_hw, bool)
    _, keep = jax.lax.scan(step, init, (bin_masks, keep_score))

    pan_map = pan_ops.panoptic_argmax_stream(
        seg_lg, boxes_slab, jnp.maximum(classes - 1, 0), mask_logits, keep,
        num_stuff,
    )
    return pan_map, keep


def spatial_panoptic_fuse(
    mesh: Mesh,
    seg_logits: jnp.ndarray,  # (H, W, C) single image, H % axis size == 0
    boxes: jnp.ndarray,  # (D, 4) image coords
    classes: jnp.ndarray,
    mask_logits: jnp.ndarray,  # (D, M, M)
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    score_thresh: float,
    overlap_thresh: float,
    num_stuff: int,
    axis: str = "model",
):
    """Row-sharded §3.4 fusion. Returns (pan_map (H, W), keep (D,))."""
    body = functools.partial(
        _fuse_shard,
        score_thresh=score_thresh,
        overlap_thresh=overlap_thresh,
        num_stuff=num_stuff,
        axis=axis,
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return fn(seg_logits, boxes, classes, mask_logits, scores, valid)
