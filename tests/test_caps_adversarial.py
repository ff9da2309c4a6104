"""Adversarial validation of the pipeline's static candidate caps.

The TPU rebuild replaces the reference's dynamic box sets with static
score-ranked pools (SURVEY.md §7.1): the joint RPN NMS pool is capped at
``joint_nms_cap`` (ops/proposals.py) and the detection NMS pool at
``detection_nms_pool`` (models/upsnet.py). Both caps are argued harmless
in comments; this file PROVES it on synthetic dense scenes — thousands
of overlapping high-score boxes spread across classes and levels — by
asserting the capped pipeline produces the identical top-K set as an
uncapped run (reference semantics: Detectron pre/post-NMS top-N,
SURVEY.md §3.3). Also pins jit cache stability across same-shape calls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.config import default_config
from upsnet_tpu.models.upsnet import _detection_nms
from upsnet_tpu.ops.anchors import pyramid_anchors
from upsnet_tpu.ops.nms import nms_padded
from upsnet_tpu.ops.proposals import pyramid_proposals


def _rpn_outputs(rng, image_hw, hot_clusters=60):
    """Synthetic per-level RPN maps with dense hot spots.

    Random logits everywhere plus ``hot_clusters`` spatial clusters of
    strongly positive objectness on every level — each cluster yields
    dozens of heavily-overlapping decoded anchors, the dense-scene case
    the joint cap must survive.
    """
    anchors = pyramid_anchors(image_hw)
    cls_logits, bbox_deltas = [], []
    for lvl, an in enumerate(anchors):
        stride = 4 * (2 ** lvl)
        h, w = image_hw[0] // stride, image_hw[1] // stride
        a = an.shape[0] // (h * w)
        logits = rng.randn(h, w, a * 2).astype(np.float32)
        for _ in range(hot_clusters):
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            ys = slice(max(cy - 2, 0), min(cy + 3, h))
            xs = slice(max(cx - 2, 0), min(cx + 3, w))
            # drive the objectness logit (odd channels) up
            logits[ys, xs, 1::2] += rng.uniform(4.0, 8.0)
        deltas = (rng.randn(h, w, a * 4) * 0.1).astype(np.float32)
        cls_logits.append(jnp.asarray(logits))
        bbox_deltas.append(jnp.asarray(deltas))
    return tuple(cls_logits), tuple(bbox_deltas), tuple(
        jnp.asarray(a) for a in anchors
    )


def test_joint_rpn_nms_cap_matches_uncapped():
    rng = np.random.RandomState(0)
    image_hw = (256, 320)
    cls_logits, bbox_deltas, anchors = _rpn_outputs(rng, image_hw)
    im_hw = jnp.asarray([256.0, 320.0])

    kw = dict(pre_nms_top_n=1000, post_nms_top_n=1000, nms_thresh=0.7)
    rois_c, sc_c, keep_c = pyramid_proposals(
        cls_logits, bbox_deltas, anchors, im_hw, joint_nms_cap=4096, **kw
    )
    rois_u, sc_u, keep_u = pyramid_proposals(
        cls_logits, bbox_deltas, anchors, im_hw, joint_nms_cap=0, **kw
    )
    # 5 levels x 1000 = 5000 candidates > 4096: the cap is active.
    # The top-100 post-NMS proposals feed everything downstream.
    top = 100
    assert bool(jnp.all(keep_c[:top] == keep_u[:top]))
    np.testing.assert_allclose(
        np.asarray(rois_c[:top]), np.asarray(rois_u[:top]), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(sc_c[:top]), np.asarray(sc_u[:top]), rtol=0, atol=0
    )


def _reference_per_class_nms(boxes_pc, scores_pc, cfg_test, num_classes):
    """Uncapped per-class NMS (the reference's Detectron semantics,
    SURVEY.md §3.3): full candidate set per class, per-class greedy NMS,
    global top-max_det by score."""
    rr = boxes_pc.shape[0]

    def per_class(c_boxes, c_scores):
        ok = c_scores >= cfg_test.score_thresh
        sc = jnp.where(ok, c_scores, -jnp.inf)
        idx, keep = nms_padded(
            c_boxes, sc, cfg_test.nms_thresh, rr, jnp.isfinite(sc)
        )
        safe = jnp.maximum(idx, 0)
        return c_boxes[safe], jnp.where(keep, sc[safe], -jnp.inf), keep

    boxes_t = jnp.moveaxis(boxes_pc[:, 1:], 1, 0)
    scores_t = scores_pc[:, 1:].T
    nb, ns, nk = jax.vmap(per_class)(boxes_t, scores_t)
    flat_boxes = nb.reshape(-1, 4)
    flat_scores = ns.reshape(-1)
    flat_cls = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[:, None], nk.shape
    ).reshape(-1)
    top_sc, top_i = jax.lax.top_k(flat_scores, cfg_test.max_det)
    return flat_boxes[top_i], top_sc, flat_cls[top_i], jnp.isfinite(top_sc)


def _crowd_scene(rng, rr=512, num_classes=21, n_objects=120, dups=4):
    """A crowd: many same-class objects, each covered by several nearly
    duplicate proposals — the scenario that broke a 256-per-class cap."""
    boxes = np.zeros((rr, 4), np.float32)
    scores = np.full((rr, num_classes), 1e-4, np.float32)
    crowd_cls = 1  # "person"
    i = 0
    for obj in range(n_objects):
        cx, cy = rng.uniform(40, 1200), rng.uniform(40, 760)
        wdt, hgt = rng.uniform(20, 60), rng.uniform(40, 120)
        for d in range(dups):
            if i >= rr:
                break
            jx, jy = rng.uniform(-2, 2), rng.uniform(-2, 2)
            boxes[i] = [cx - wdt / 2 + jx, cy - hgt / 2 + jy,
                        cx + wdt / 2 + jx, cy + hgt / 2 + jy]
            scores[i, crowd_cls] = 0.9 - 0.002 * obj - 0.05 * d
            i += 1
    # remaining rois: random boxes with random class scores above thresh
    while i < rr:
        x1, y1 = rng.uniform(0, 1200), rng.uniform(0, 700)
        boxes[i] = [x1, y1, x1 + rng.uniform(10, 120), y1 + rng.uniform(10, 120)]
        c = rng.randint(2, num_classes)
        scores[i, c] = rng.uniform(0.05, 0.8)
        i += 1
    # per-class decoded boxes: same box every class (worst case: all
    # candidates of every class coincide spatially)
    boxes_pc = np.tile(boxes[:, None, :], (1, num_classes, 1))
    return jnp.asarray(boxes_pc), jnp.asarray(scores)


def test_detection_nms_pool_matches_uncapped_reference():
    rng = np.random.RandomState(1)
    cfg = default_config()
    num_classes = 21
    boxes_pc, scores_pc = _crowd_scene(rng, num_classes=num_classes)

    got = _detection_nms(boxes_pc, scores_pc, cfg.test, num_classes)
    want = _reference_per_class_nms(boxes_pc, scores_pc, cfg.test, num_classes)

    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_detection_nms_pool_truncation_is_loud():
    """When the pool genuinely truncates (pool smaller than the number of
    above-threshold candidates with adversarial overlap), the capped run
    may differ — assert the default pool (2048) does NOT truncate for a
    512-RoI crowd scene, i.e. the candidate count stays under the pool."""
    rng = np.random.RandomState(2)
    cfg = default_config()
    boxes_pc, scores_pc = _crowd_scene(rng, num_classes=21)
    n_above = int(np.sum(np.asarray(scores_pc)[:, 1:] >= cfg.test.score_thresh))
    assert n_above < cfg.test.detection_nms_pool


def test_dense_multiclass_scene_matches():
    """Dense scene variant: candidates spread over many classes with
    non-trivial per-RoI class mixtures (softmax-like rows)."""
    rng = np.random.RandomState(3)
    cfg = default_config()
    num_classes = 31
    rr = 600
    logits = rng.randn(rr, num_classes).astype(np.float32) * 2.0
    hot = rng.randint(1, num_classes, rr)
    logits[np.arange(rr), hot] += rng.uniform(2, 6, rr).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    boxes = np.zeros((rr, 4), np.float32)
    # clustered boxes: 80 clusters of ~8 overlapping boxes
    for i in range(rr):
        cl = i % 80
        cx, cy = 50 + (cl % 10) * 120, 50 + (cl // 10) * 90
        jx, jy = rng.uniform(-6, 6), rng.uniform(-6, 6)
        boxes[i] = [cx + jx, cy + jy, cx + jx + 80, cy + jy + 64]
    boxes_pc = np.tile(boxes[:, None, :], (1, num_classes, 1))

    got = _detection_nms(
        jnp.asarray(boxes_pc), jnp.asarray(scores), cfg.test, num_classes
    )
    want = _reference_per_class_nms(
        jnp.asarray(boxes_pc), jnp.asarray(scores), cfg.test, num_classes
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_proposals_compile_cache_stable():
    """Same-shape calls must not recompile (bucketed compile-count
    stability): run pyramid_proposals twice with different data and
    assert the jit cache has exactly one entry for the signature."""
    rng = np.random.RandomState(4)
    image_hw = (128, 128)
    base = pyramid_proposals._cache_size()
    for seed in (5, 6):
        r2 = np.random.RandomState(seed)
        cls_logits, bbox_deltas, anchors = _rpn_outputs(
            r2, image_hw, hot_clusters=5
        )
        pyramid_proposals(
            cls_logits, bbox_deltas, anchors, jnp.asarray([128.0, 128.0]),
            pre_nms_top_n=256, post_nms_top_n=128, nms_thresh=0.7,
        )
    assert pyramid_proposals._cache_size() == base + 1
