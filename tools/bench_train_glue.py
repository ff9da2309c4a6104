"""Attribute the train-forward glue cost (everything between `extract`
and the losses): proposal NMS, RPN target assignment, RoI/mask target
sampling. Run on the real chip:

    python tools/bench_train_glue.py [--batch 8]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.ops.nms import nms_padded
    from upsnet_tpu.ops.proposals import pyramid_proposals
    from upsnet_tpu.ops.targets import proposal_mask_targets, rpn_targets

    print(f"backend={jax.default_backend()}")
    cfg = default_config()
    tc = cfg.train
    b = args.batch
    bucket = tuple(tc.image_buckets[0])
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors(bucket))
    n_anchors = [a.shape[0] for a in anchors]
    key = jax.random.PRNGKey(0)

    # fake RPN outputs at flagship shapes
    shapes = [(bucket[0] // s, bucket[1] // s) for s in (4, 8, 16, 32, 64)]
    cls = tuple(jax.random.normal(key, (b, h, w, 6), jnp.float32)
                for h, w in shapes)
    bbox = tuple(jax.random.normal(key, (b, h, w, 12), jnp.float32) * 0.1
                 for h, w in shapes)
    im_hw = jnp.tile(jnp.asarray([[800.0, 1333.0]], jnp.float32), (b, 1))

    prop = jax.jit(lambda cls, bbox, im_hw: jax.vmap(
        lambda c, d, hw: pyramid_proposals(
            c, d, anchors, hw,
            pre_nms_top_n=tc.rpn_pre_nms_top_n,
            post_nms_top_n=tc.rpn_post_nms_top_n,
            nms_thresh=tc.rpn_nms_thresh,
        )
    )(cls, bbox, im_hw))
    t = timed(prop, cls, bbox, im_hw)
    print(f"pyramid_proposals train ({tc.rpn_pre_nms_top_n}/lvl -> "
          f"{tc.rpn_post_nms_top_n}): {t*1e3:7.1f} ms")

    # bare NMS at the joint-cap size
    nb = 4096
    boxes = jax.random.uniform(key, (b, nb, 4), jnp.float32, 0, 800)
    boxes = jnp.concatenate(
        [boxes[..., :2], boxes[..., :2] + 16 + boxes[..., 2:] * 0.2], -1)
    scores = jax.random.uniform(key, (b, nb), jnp.float32)
    bare = jax.jit(lambda bx, s: jax.vmap(
        lambda bb, ss: nms_padded(bb, ss, 0.7, tc.rpn_post_nms_top_n)
    )(bx, s))
    t = timed(bare, boxes, scores, perturb=1)
    print(f"bare nms {nb} -> {tc.rpn_post_nms_top_n} x{b}: {t*1e3:7.1f} ms")

    # rpn_targets
    gt = jax.random.uniform(key, (b, 20, 4), jnp.float32, 0, 700)
    gt = jnp.concatenate([gt[..., :2], gt[..., :2] + 30 + gt[..., 2:] * 0.1],
                         -1)
    gt_valid = jnp.ones((b, 20), bool)
    anchors_cat = jnp.concatenate(anchors, axis=0)
    rpnt = jax.jit(lambda gt: jax.vmap(
        lambda k, g, v, hw: rpn_targets(
            k, anchors_cat, g, v, hw,
            batch_size=tc.rpn_batch_size, fg_fraction=tc.rpn_fg_fraction,
        )
    )(jax.random.split(key, b), gt, gt_valid, im_hw))
    t = timed(rpnt, gt)
    print(f"rpn_targets ({sum(n_anchors)} anchors): {t*1e3:7.1f} ms")

    # proposal_mask_targets
    rois = jax.random.uniform(key, (b, tc.rpn_post_nms_top_n, 4),
                              jnp.float32, 0, 700)
    rois = jnp.concatenate(
        [rois[..., :2], rois[..., :2] + 20 + rois[..., 2:] * 0.2], -1)
    roi_valid = jnp.ones((b, tc.rpn_post_nms_top_n), bool)
    gt_classes = jax.random.randint(key, (b, 20), 1, 81)
    gq = (bucket[0] // 4, bucket[1] // 4)
    gt_masks = (jax.random.uniform(key, (b, 20) + gq) > 0.7).astype(jnp.uint8)

    pmt = jax.jit(lambda rois: jax.vmap(
        lambda k, r, rv, g, gc, gv, gm: proposal_mask_targets(
            k, r, rv, g, gc, gv, gm,
            batch_rois=tc.batch_rois, fg_fraction=tc.fg_fraction,
            mask_scale=0.25,
        )
    )(jax.random.split(key, b), rois, roi_valid, gt, gt_classes, gt_valid,
      gt_masks))
    t = timed(pmt, rois)
    print(f"proposal_mask_targets (512 of {tc.rpn_post_nms_top_n}): "
          f"{t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
