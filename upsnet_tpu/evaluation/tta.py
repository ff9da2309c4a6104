"""Multi-scale + horizontal-flip test-time augmentation.

Reference behavior (SURVEY.md §6, the "UPSNet-50-M" rows; §2.3 multi-scale
inference for the Cityscapes-w-COCO config): run the network at several
scales (and mirrored), average the semantic logits, merge detections with
one more round of per-class NMS, then run the §3.4 panoptic fusion on the
combined evidence.

Per image:
  1. every (scale, flip) runs the normal jitted predict step;
  2. semantic logits are de-flipped, cropped to content, resized to the
     original resolution, and averaged;
  3. detections are mapped to original coordinates (de-flip + unscale),
     concatenated, per-class-NMS'd (host greedy, <= #runs x max_det boxes),
     top max_det kept; mask logits follow their detection (de-flipped);
  4. fusion runs the SAME device ``panoptic_fuse`` as the single-scale
     path, on the merged evidence resampled to the base bucket's quarter
     scale — one fusion implementation, no host/device drift (VERDICT r1
     item #8; previously a separate host fusion re-implemented the math).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from upsnet_tpu.config.defaults import Config


def _greedy_nms_per_class(boxes, scores, classes, thresh, max_out):
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        same = classes == classes[i]
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(xx2 - xx1 + 1, 0) * np.maximum(yy2 - yy1 + 1, 0)
        iou = inter / (areas[i] + areas - inter)
        suppressed |= same & (iou > thresh)
    return np.array(keep, np.int64)


@functools.partial(
    jax.jit, static_argnames=("score_thresh", "overlap_thresh", "num_stuff")
)
def _fuse_device(seg_lg, boxes, classes, ms_logits, scores, valid, *,
                 score_thresh: float, overlap_thresh: float, num_stuff: int):
    """The single-scale path's fusion, reused verbatim for TTA evidence
    (one compile per bucket shape)."""
    from upsnet_tpu.models.upsnet import panoptic_fuse

    return panoptic_fuse(
        seg_lg, boxes, classes, ms_logits, scores, valid,
        score_thresh=score_thresh, overlap_thresh=overlap_thresh,
        num_stuff=num_stuff,
    )


def fuse_tta(cfg: Config, seg_avg, boxes, scores, classes, mask_logits,
             base_scale: float, bucket: tuple, content_hw: tuple):
    """Fuse TTA-merged evidence with the device ``panoptic_fuse``.

    seg_avg (oh, ow, C) averaged logits at ORIGINAL resolution; detections
    in original coordinates. Evidence is resampled onto the base bucket's
    quarter-scale canvas (the frame the single-scale path fuses in), fused
    on device, and the channel map is mapped back to original resolution.

    Returns (pan_map (oh, ow) int32 channel indices, keep (max_det,) bool,
    padded detection arrays in original coords).
    """
    import cv2
    import jax.numpy as jnp

    oh, ow = seg_avg.shape[:2]
    rh, rw = content_hw
    qh, qw = bucket[0] // 4, bucket[1] // 4
    cqh, cqw = max(rh // 4, 1), max(rw // 4, 1)
    seg_q = cv2.resize(seg_avg, (cqw, cqh), interpolation=cv2.INTER_LINEAR)
    seg_canvas = np.zeros((qh, qw, seg_avg.shape[-1]), np.float32)
    seg_canvas[:cqh, :cqw] = seg_q

    d = cfg.test.max_det
    pb = np.zeros((d, 4), np.float32)
    ps = np.zeros((d,), np.float32)
    pc = np.zeros((d,), np.int32)
    pm = np.zeros((d,) + mask_logits.shape[1:], np.float32)
    pv = np.zeros((d,), bool)
    n = min(len(boxes), d)
    pb[:n] = boxes[:n] * base_scale  # orig -> base-canvas coords
    ps[:n] = scores[:n]
    pc[:n] = classes[:n]
    pm[:n] = mask_logits[:n]
    pv[:n] = True

    pan_q, keep = _fuse_device(
        jnp.asarray(seg_canvas), jnp.asarray(pb), jnp.asarray(pc),
        jnp.asarray(pm), jnp.asarray(ps), jnp.asarray(pv),
        score_thresh=float(cfg.test.panoptic_score_thresh),
        overlap_thresh=float(cfg.test.panoptic_mask_overlap_thresh),
        num_stuff=int(cfg.dataset.num_stuff),
    )
    pan_q = np.asarray(pan_q)[:cqh, :cqw]
    pan_full = cv2.resize(
        pan_q.astype(np.int32), (ow, oh), interpolation=cv2.INTER_NEAREST
    )
    return pan_full, np.asarray(keep), (pb / base_scale, ps, pc, pm, pv)


def predict_image_tta(cfg: Config, dataset, i: int, params, predict_by_bucket):
    """Run all (scale, flip) variants for one image; returns the same
    output contract as postprocess_image consumes, already in original
    coordinates."""
    import cv2
    import jax
    import jax.numpy as jnp

    scales = list(cfg.test.scales) + [
        s for s in cfg.test.multi_scale if s not in cfg.test.scales
    ]
    flips = [False, True] if cfg.test.flip_test else [False]
    seg_sum = None
    n_seg = 0
    all_boxes, all_scores, all_classes, all_masks = [], [], [], []
    oh = ow = None
    image_id = None
    base = None  # (scale, bucket, content_hw) of the first variant
    for ts in scales:
        for fl in flips:
            s = dataset.sample(i, target_scale=ts, hflip=fl)
            oh, ow = (int(v) for v in s["orig_hw"])
            image_id = s["image_id"]
            rh, rw = (int(v) for v in s["im_hw"])
            bucket = tuple(s["images"].shape[:2])
            if base is None:
                base = (float(s["scale"]), bucket, (rh, rw))
            out = predict_by_bucket[bucket](
                params,
                {
                    "images": jnp.asarray(s["images"])[None],
                    "im_hw": jnp.asarray(s["im_hw"])[None],
                },
            )
            out = jax.tree.map(lambda x: np.asarray(x[0]), out)
            # semantic: crop content, de-flip, resize to orig, accumulate
            seg = out["seg_logits"][: max(rh // 4, 1), : max(rw // 4, 1)]
            if fl:
                seg = seg[:, ::-1]
            seg = cv2.resize(seg, (ow, oh), interpolation=cv2.INTER_LINEAR)
            seg_sum = seg if seg_sum is None else seg_sum + seg
            n_seg += 1
            # detections to original coords
            valid = out["det_valid"]
            boxes = out["boxes"][valid]
            masks = out["mask_logits"][valid]
            if fl:
                x1 = rw - 1.0 - boxes[:, 2]
                x2 = rw - 1.0 - boxes[:, 0]
                boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], -1)
                masks = masks[:, :, ::-1]
            boxes = boxes / float(s["scale"])
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, ow - 1)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, oh - 1)
            all_boxes.append(boxes)
            all_scores.append(out["scores"][valid])
            all_classes.append(out["classes"][valid])
            all_masks.append(masks)

    boxes = np.concatenate(all_boxes, 0)
    scores = np.concatenate(all_scores, 0)
    classes = np.concatenate(all_classes, 0)
    masks = np.concatenate(all_masks, 0)
    keep = _greedy_nms_per_class(
        boxes, scores, classes, cfg.test.nms_thresh, cfg.test.max_det
    )
    order = keep[np.argsort(-scores[keep], kind="stable")]
    boxes, scores, classes, masks = (
        boxes[order], scores[order], classes[order], masks[order],
    )
    seg_avg = seg_sum / n_seg
    base_scale, base_bucket, content_hw = base
    pan_map, pan_keep, padded = fuse_tta(
        cfg, seg_avg, boxes, scores, classes, masks,
        base_scale, base_bucket, content_hw,
    )
    pb, ps, pc, pm, pv = padded
    n = int(pv.sum())
    return {
        "image_id": image_id,
        "orig_hw": (oh, ow),
        "boxes": pb[:n],
        "scores": ps[:n],
        "classes": pc[:n],
        "mask_logits": pm[:n],
        "seg_pred": seg_avg.argmax(-1).astype(np.int32),
        "pan_map": pan_map,
        "pan_keep": pan_keep[:n],
    }
