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
  4. host-side fusion mirrors ops/panoptic.py at original resolution.
"""

from __future__ import annotations

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


def _paste_logits(mask_logit, box, hw):
    """Paste an M x M logit map into an (H, W) canvas (zeros outside)."""
    import cv2

    h, w = hw
    x1, y1, x2, y2 = box
    x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
    x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
    bw = max(x2i - x1i + 1, 1)
    bh = max(y2i - y1i + 1, 1)
    m = cv2.resize(mask_logit, (bw, bh), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((h, w), np.float32)
    xs0, ys0 = max(x1i, 0), max(y1i, 0)
    xs1, ys1 = min(x2i + 1, w), min(y2i + 1, h)
    if xs1 > xs0 and ys1 > ys0:
        out[ys0:ys1, xs0:xs1] = m[ys0 - y1i : ys1 - y1i, xs0 - x1i : xs1 - x1i]
    return out


def fuse_host(cfg: Config, seg_logits, boxes, scores, classes, mask_logits):
    """Host-side §3.4 fusion at original resolution (TTA path).

    seg_logits (H, W, C) averaged; detections sorted by descending score.
    Returns (pan_channel_map (H, W), keep (D,) bool) with the same channel
    convention as the device fusion.
    """
    h, w, _ = seg_logits.shape
    num_stuff = cfg.dataset.num_stuff
    d = len(boxes)
    keep_score = scores >= cfg.test.panoptic_score_thresh
    # MaskRemoval
    claimed = np.zeros((h, w), bool)
    keep = np.zeros(d, bool)
    pasted_prob = []
    for i in range(d):
        p = 1.0 / (1.0 + np.exp(-_paste_logits(mask_logits[i], boxes[i], (h, w))))
        pasted_prob.append(p)
        if not keep_score[i]:
            continue
        m = p >= 0.5
        area = m.sum()
        fresh = (m & ~claimed).sum()
        if area > 0 and fresh / area >= cfg.test.panoptic_mask_overlap_thresh:
            keep[i] = True
            claimed |= m
    # logits stack
    stuff = np.moveaxis(seg_logits[:, :, :num_stuff], -1, 0)
    thing = seg_logits[:, :, num_stuff:]
    chans = [stuff]
    inst = np.full((d, h, w), -1e4, np.float32)
    seg_terms = np.full((d, h, w), -1e4, np.float32)
    ys = np.arange(h)
    xs = np.arange(w)
    for i in range(d):
        if not keep[i]:
            continue
        x1, y1, x2, y2 = boxes[i]
        win_y = (ys >= np.floor(y1)) & (ys <= np.ceil(y2))
        win_x = (xs >= np.floor(x1)) & (xs <= np.ceil(x2))
        win = win_y[:, None] & win_x[None, :]
        st = thing[:, :, int(classes[i]) - 1] * win
        seg_terms[i] = np.where(keep[i], st, -1e4)
        mt = _paste_logits(mask_logits[i], boxes[i], (h, w))
        inst[i] = st + mt
    chans.append(inst)
    thing_max = thing.max(-1)
    inst_max = seg_terms.max(0) if keep.any() else np.zeros((h, w), np.float32)
    inst_max = np.where(np.isfinite(inst_max) & (inst_max > -1e3), inst_max, 0.0)
    chans.append((thing_max - inst_max)[None])
    z = np.concatenate(chans, axis=0)
    return z.argmax(0).astype(np.int32), keep


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
    for ts in scales:
        for fl in flips:
            s = dataset.sample(i, target_scale=ts, hflip=fl)
            oh, ow = (int(v) for v in s["orig_hw"])
            image_id = s["image_id"]
            rh, rw = (int(v) for v in s["im_hw"])
            bucket = tuple(s["images"].shape[:2])
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
    pan_map, pan_keep = fuse_host(cfg, seg_avg, boxes, scores, classes, masks)
    return {
        "image_id": image_id,
        "orig_hw": (oh, ow),
        "boxes": boxes,
        "scores": scores,
        "classes": classes,
        "mask_logits": masks,
        "seg_pred": seg_avg.argmax(-1).astype(np.int32),
        "pan_map": pan_map,
        "pan_keep": pan_keep,
    }
