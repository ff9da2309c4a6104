"""Panoptic head ops: MaskMatching, MaskRemoval, SegTerm/MaskTerm, fusion.

The reference implements these as four torch/numpy modules
(``upsnet/operators/modules/{mask_matching, mask_removal, unary_logits}.py``)
assembled in ``resnet_upsnet.py``; the fusion math is SURVEY.md §3.4 / the
UPSNet paper §3.3. Everything here is pure jnp on padded detection sets and
runs on device — masks never round-trip to host until PNG encode.

Panoptic logits Z over (num_stuff + N_inst + 1) channels at 1/4 scale:
  Z[j]            = X_stuff_j                          (stuff channels)
  Z[S + i]        = SegTerm_i + MaskTerm_i             (instance channels)
  Z[S + N_inst]   = max_c X_thing_c - max_i SegTerm_i  (unknown channel)
where SegTerm_i = X_thing[class_i] inside box_i (0 outside) and MaskTerm_i =
the 28x28 mask logits pasted into the box. Per-pixel argmax wins; the
unknown channel maps to VOID.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from upsnet_tpu.ops.mask_paste import paste_masks

IGNORE = 255


def _box_window(boxes: jnp.ndarray, hw: tuple[int, int], dtype) -> jnp.ndarray:
    """(N, H, W) indicator of each box's pixel window (inclusive coords)."""
    h, w = hw
    ys = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    xs = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    x2 = boxes[:, 2][:, None, None]
    y2 = boxes[:, 3][:, None, None]
    win = (ys >= jnp.floor(y1)) & (ys <= jnp.ceil(y2)) & (
        xs >= jnp.floor(x1)
    ) & (xs <= jnp.ceil(x2))
    return win.astype(dtype)


def seg_term(
    seg_logits: jnp.ndarray,  # (H, W, C) semantic logits, stuff first
    boxes: jnp.ndarray,  # (N, 4) in seg-logit (1/4-scale) coordinates
    classes: jnp.ndarray,  # (N,) thing class index in [0, num_thing)
    num_stuff: int,
) -> jnp.ndarray:
    """SegTerm: per instance, its thing-class semantic channel masked to its
    box (0 outside). Returns (N, H, W)."""
    h, w, _ = seg_logits.shape
    thing = seg_logits[:, :, num_stuff:]  # (H, W, T)
    chan = jnp.moveaxis(thing, -1, 0)[classes]  # (N, H, W)
    win = _box_window(boxes, (h, w), chan.dtype)
    return chan * win


def mask_term(
    mask_logits: jnp.ndarray,  # (N, M, M)
    boxes: jnp.ndarray,  # (N, 4) in seg-logit coordinates
    out_hw: tuple[int, int],
) -> jnp.ndarray:
    """MaskTerm: paste per-instance mask logits into canvases (0 outside)."""
    return paste_masks(mask_logits, boxes, out_hw)


class PanopticLogits(NamedTuple):
    logits: jnp.ndarray  # (S + N + 1, H, W)
    num_stuff: int


def panoptic_logits(
    seg_logits: jnp.ndarray,  # (H, W, C)
    boxes: jnp.ndarray,  # (N, 4) seg-scale
    classes: jnp.ndarray,  # (N,) thing class in [0, num_thing)
    mask_logits: jnp.ndarray,  # (N, M, M)
    inst_valid: jnp.ndarray,  # (N,) bool
    num_stuff: int,
) -> PanopticLogits:
    """Assemble the (S + N + 1, H, W) panoptic logit stack (§3.4 steps 1-3)."""
    h, w, _ = seg_logits.shape
    stuff = jnp.moveaxis(seg_logits[:, :, :num_stuff], -1, 0)  # (S, H, W)
    seg_t = seg_term(seg_logits, boxes, classes, num_stuff)  # (N, H, W)
    mask_t = mask_term(mask_logits, boxes, (h, w))
    inst = seg_t + mask_t
    neg = jnp.asarray(-1e4, inst.dtype)
    inst = jnp.where(inst_valid[:, None, None], inst, neg)
    # unknown = max over thing channels - max over instance SegTerms
    thing_max = jnp.max(seg_logits[:, :, num_stuff:], axis=-1)  # (H, W)
    seg_t_masked = jnp.where(inst_valid[:, None, None], seg_t, neg)
    inst_max = jnp.max(seg_t_masked, axis=0)
    has_inst = jnp.any(inst_valid)
    inst_max = jnp.where(has_inst, inst_max, 0.0)
    unknown = (thing_max - inst_max)[None]
    return PanopticLogits(
        jnp.concatenate([stuff, inst, unknown], axis=0), num_stuff
    )


@functools.partial(jax.jit, static_argnames=("num_stuff",))
def panoptic_argmax(
    seg_logits, boxes, classes, mask_logits, inst_valid, num_stuff: int
):
    """Per-pixel argmax over the panoptic logit stack.

    Returns (pan_id (H, W) int32, logits stack). Channel semantics:
    [0, S) stuff, [S, S+N) instances, S+N unknown/VOID.
    """
    pl = panoptic_logits(
        seg_logits, boxes, classes, mask_logits, inst_valid, num_stuff
    )
    return jnp.argmax(pl.logits, axis=0).astype(jnp.int32), pl.logits


@functools.partial(jax.jit, static_argnames=("num_stuff",))
def panoptic_argmax_stream(
    seg_logits, boxes, classes, mask_logits, inst_valid, num_stuff: int
):
    """Per-pixel argmax WITHOUT materializing the (S+N+1, H, W) stack.

    Bit-identical to ``panoptic_argmax(...)[0]`` (asserted in
    tests/test_panoptic_ops.py): computes (max, argmax) per channel group
    — stuff along the lane axis, instances along their own axis, the
    unknown scalar — and combines with the concat order's first-wins
    tie-break (stuff < instances < unknown). Avoids the channel-major
    moveaxis + concat of 154 x (H/4, W/4) f32 maps that made the stacked
    form ~10 ms of the b8 fusion stage; used on the inference path where
    the full stack (needed only by the training CE loss) is waste.
    """
    h, w, _ = seg_logits.shape
    n = mask_logits.shape[0]
    stuff = seg_logits[:, :, :num_stuff]
    stuff_max = jnp.max(stuff, -1)
    stuff_arg = jnp.argmax(stuff, -1)

    seg_t = seg_term(seg_logits, boxes, classes, num_stuff)  # (N, H, W)
    mask_t = mask_term(mask_logits, boxes, (h, w))
    inst = seg_t + mask_t
    neg = jnp.asarray(-1e4, inst.dtype)
    inst = jnp.where(inst_valid[:, None, None], inst, neg)
    inst_max = jnp.max(inst, 0)
    inst_arg = jnp.argmax(inst, 0)

    thing_max = jnp.max(seg_logits[:, :, num_stuff:], axis=-1)
    seg_t_masked = jnp.where(inst_valid[:, None, None], seg_t, neg)
    segt_max = jnp.where(jnp.any(inst_valid), jnp.max(seg_t_masked, 0), 0.0)
    unknown = thing_max - segt_max

    stuff_wins = (stuff_max >= inst_max) & (stuff_max >= unknown)
    inst_wins = inst_max >= unknown
    pan = jnp.where(
        stuff_wins,
        stuff_arg,
        jnp.where(inst_wins, num_stuff + inst_arg, num_stuff + n),
    )
    return pan.astype(jnp.int32)


def mask_removal(
    masks: jnp.ndarray,  # (N, H, W) binary/prob masks, SORTED by score desc
    valid: jnp.ndarray,  # (N,) bool
    overlap_keep_thresh: float = 0.5,
) -> jnp.ndarray:
    """Greedy de-overlap (inference): walk detections in descending score
    order; keep one iff the fraction of its mask not yet claimed is >= the
    threshold; kept masks claim their pixels. Returns (N,) keep mask.

    Reference: ``upsnet/operators/modules/mask_removal.py`` (SURVEY.md §2.2).
    Implemented as a lax.scan with an (H, W) claimed canvas in carry.
    """
    bin_masks = masks >= 0.5

    def step(claimed, xs):
        m, ok = xs
        area = jnp.sum(m)
        fresh = jnp.sum(m & ~claimed)
        keep = ok & (area > 0) & (fresh / jnp.maximum(area, 1.0) >= overlap_keep_thresh)
        claimed = claimed | (m & keep)
        return claimed, keep

    init = jnp.zeros(masks.shape[1:], bool)
    # unroll: each step is ~2us of VPU work on a (H/4, W/4) canvas — the
    # scan's per-iteration dispatch dominates; unrolling fuses 8 steps into
    # one XLA computation without changing the (inherently greedy) order.
    _, keep = jax.lax.scan(step, init, (bin_masks, valid), unroll=8)
    return keep


@functools.partial(jax.jit, static_argnames=("num_stuff", "ignore"))
def mask_matching(
    seg_gt: jnp.ndarray,  # (H, W) int32 semantic GT (stuff first), 255 ignore
    gt_masks: jnp.ndarray,  # (G, H, W) instance masks (0/1)
    gt_valid: jnp.ndarray,  # (G,) bool
    to_unknown: jnp.ndarray,  # (G,) bool: route this GT to the unknown class
    num_stuff: int,
    ignore: int = IGNORE,
) -> jnp.ndarray:
    """Build the panoptic-head GT index map for the panoptic CE loss.

    stuff pixels -> their stuff channel id; pixels of GT instance i -> channel
    ``num_stuff + i``; instances flagged ``to_unknown`` (the reference
    randomly relabels ~30% during training as augmentation, paper §3.3) ->
    the unknown channel ``num_stuff + G``; thing pixels covered by no
    instance -> ignore.

    Reference: ``upsnet/operators/modules/mask_matching.py``.
    """
    g = gt_masks.shape[0]
    unknown_idx = num_stuff + g
    is_stuff = (seg_gt < num_stuff) & (seg_gt != ignore)
    out = jnp.where(is_stuff, seg_gt, ignore).astype(jnp.int32)
    # later instances overwrite earlier ones on overlap (reference order)
    chan = jnp.where(to_unknown, unknown_idx, num_stuff + jnp.arange(g))
    chan = jnp.where(gt_valid, chan, ignore).astype(jnp.int32)

    def step(out, xs):
        m, c = xs
        out = jnp.where((m > 0) & (c != ignore), c, out)
        return out, None

    out, _ = jax.lax.scan(step, out, (gt_masks, chan), unroll=8)
    return out
