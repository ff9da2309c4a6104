"""Predict-path stage attribution on the real chip.

Times each forward_predict stage as its own jitted function at flagship
shapes (b8, 832x1344, bf16), with the previous stage's outputs as
inputs, so stage costs sum ~to the full path.

    python tools/bench_predict_stages.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=4, warmup=2, perturb=0):
    import jax

    def call(i):
        a = list(args)
        eps = np.asarray(1e-6 * (i + 1),
                        dtype=jax.tree.leaves(a[perturb])[0].dtype)
        a[perturb] = jax.tree.map(lambda v: v + eps, a[perturb])
        out = fn(*a)
        return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    for i in range(warmup):
        call(i)
    t0 = time.perf_counter()
    for i in range(n):
        call(warmup + i)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import (
        Detections,
        _detection_nms,
        _pool_boxes,
        build_model,
        forward_predict,
        panoptic_fuse,
    )
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.ops.boxes import clip_boxes, decode_boxes
    from upsnet_tpu.ops.proposals import pyramid_proposals

    print(f"backend={jax.default_backend()}")
    cfg = default_config()
    tc, net, dsc = cfg.test, cfg.network, cfg.dataset
    b = 8
    bucket = tuple(tc.image_buckets[0])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + bucket + (3,)))["params"]
    # realistic |offset| ~ 1-2 px fields, same as bench.py: the deform
    # kernels' candidate-skip makes cost offset-dependent, and zero-init
    # offsets are the degenerate best case
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _perturb_offset_convs

    params = _perturb_offset_convs(params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors(bucket))
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (b,) + bucket + (3,)) * 30.0
    im_hw = jnp.tile(jnp.asarray([[800.0, 1333.0]], jnp.float32), (b, 1))

    # stage 1: extract, with sub-stages (each jitted standalone)
    bk_j = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, method=lambda m, x: m.backbone_net(x)))
    t = timed(bk_j, params, images, perturb=1)
    print(f"  backbone: {t*1e3:7.1f} ms")
    cs = bk_j(params, images)
    fpn_j = jax.jit(lambda p, c_: model.apply(
        {"params": p}, c_, method=lambda m, c: m.fpn(c)))
    t = timed(fpn_j, params, cs, perturb=1)
    print(f"  fpn: {t*1e3:7.1f} ms")
    pyr = fpn_j(params, cs)
    rpn_j = jax.jit(lambda p, py: model.apply(
        {"params": p}, py, method=lambda m, y: m.rpn(y)))
    t = timed(rpn_j, params, pyr, perturb=1)
    print(f"  rpn head: {t*1e3:7.1f} ms")
    fcn_j = jax.jit(lambda p, py: model.apply(
        {"params": p}, py, method=lambda m, y: m.fcn_head(y[:4])))
    t = timed(fcn_j, params, pyr, perturb=1)
    print(f"  fcn head (dcn x{net.fcn_num_layers}): {t*1e3:7.1f} ms")

    extract = jax.jit(lambda p, im: model.apply({"params": p}, im,
                                                method="extract"))
    t = timed(extract, params, images, perturb=1)
    print(f"extract (backbone+fpn+rpn+fcn): {t*1e3:7.1f} ms")
    pyramid, rpn_cls, rpn_bbox, fcn_logits = extract(params, images)

    # stage 2: proposals
    prop = jax.jit(lambda cls, bb, hw: jax.vmap(
        lambda c_, d_, h_: pyramid_proposals(
            c_, d_, anchors, h_, pre_nms_top_n=tc.rpn_pre_nms_top_n,
            post_nms_top_n=tc.rpn_post_nms_top_n,
            nms_thresh=tc.rpn_nms_thresh,
        ))(cls, bb, hw))
    t = timed(prop, tuple(rpn_cls), tuple(rpn_bbox), im_hw)
    print(f"proposals+NMS: {t*1e3:7.1f} ms")
    rois, _, roi_valid = prop(tuple(rpn_cls), tuple(rpn_bbox), im_hw)

    # stage 3: box pooling + box head
    def box_stage(pyramid, rois):
        pooled = _pool_boxes(pyramid, rois, net.pooled_size_box,
                             impl=net.roi_align_impl)
        r = rois.shape[1]
        cls_score, bbox_pred = model.apply(
            {"params": params},
            pooled.reshape(b * r, net.pooled_size_box, net.pooled_size_box,
                           -1),
            method="box_branch")
        return cls_score, bbox_pred

    box_j = jax.jit(box_stage)
    t = timed(box_j, pyramid, rois, perturb=1)
    print(f"box pool+head (r={rois.shape[1]}): {t*1e3:7.1f} ms")
    cls_score, bbox_pred = box_j(pyramid, rois)

    # stage 4: decode + per-class NMS
    c = cls_score.shape[-1]
    r = rois.shape[1]

    def det_stage(cls_score, bbox_pred, rois, roi_valid, im_hw):
        scores = jax.nn.softmax(cls_score.astype(jnp.float32), -1)
        scores = scores.reshape(b, r, c)
        deltas = bbox_pred.astype(jnp.float32).reshape(b, r, c, 4)

        def one(rois_i, deltas_i, scores_i, valid_i, hw):
            boxes_pc = decode_boxes(rois_i[:, None, :], deltas_i,
                                    tuple(net.bbox_reg_weights))
            boxes_pc = clip_boxes(boxes_pc, hw)
            scores_i = jnp.where(valid_i[:, None], scores_i, 0.0)
            return _detection_nms(boxes_pc, scores_i, tc, c)

        return jax.vmap(one)(rois, deltas, scores, roi_valid, im_hw)

    det_j = jax.jit(det_stage)
    t = timed(det_j, cls_score, bbox_pred, rois, roi_valid, im_hw)
    print(f"decode+per-class NMS: {t*1e3:7.1f} ms")
    det_boxes, det_scores, det_classes, det_valid = det_j(
        cls_score, bbox_pred, rois, roi_valid, im_hw)

    # stage 5: mask pooling + mask head
    def mask_stage(pyramid, det_boxes, det_classes):
        pooled = _pool_boxes(pyramid, det_boxes, net.pooled_size_mask,
                             impl=net.roi_align_impl)
        d = det_boxes.shape[1]
        logits = model.apply(
            {"params": params},
            pooled.reshape(b * d, net.pooled_size_mask, net.pooled_size_mask,
                           -1),
            method="mask_branch").astype(jnp.float32)
        return jnp.take_along_axis(
            logits, det_classes.reshape(-1)[:, None, None, None].astype(
                jnp.int32), axis=-1,
        )[..., 0].reshape(b, d, net.mask_size, net.mask_size)

    mask_j = jax.jit(mask_stage)
    t = timed(mask_j, pyramid, det_boxes, det_classes, perturb=1)
    print(f"mask pool+head (d={det_boxes.shape[1]}): {t*1e3:7.1f} ms")
    mask_logits = mask_j(pyramid, det_boxes, det_classes)

    # stage 6: panoptic fusion
    fuse = jax.jit(lambda fcn, bx, cl, ml, sc, va: jax.vmap(
        functools.partial(
            panoptic_fuse, score_thresh=tc.panoptic_score_thresh,
            overlap_thresh=tc.panoptic_mask_overlap_thresh,
            num_stuff=dsc.num_stuff,
        ))(fcn, bx, cl, ml, sc, va))
    t = timed(fuse, fcn_logits, det_boxes, det_classes, mask_logits,
              det_scores, det_valid, perturb=3)
    print(f"panoptic fusion: {t*1e3:7.1f} ms")

    # full path for reference
    full = jax.jit(lambda p, im, hw: forward_predict(
        model, p, cfg, anchors, {"images": im, "im_hw": hw}))
    t = timed(full, params, images, im_hw, perturb=1)
    print(f"FULL predict: {t*1e3:7.1f} ms ({b/t:.1f} img/s)")


if __name__ == "__main__":
    main()
