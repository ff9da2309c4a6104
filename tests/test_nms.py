import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.nms import batched_class_nms, nms_padded


def greedy_nms_reference(boxes, scores, thresh, offset=1.0):
    """Pure-numpy greedy NMS (the reference CUDA kernel's semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0] + offset) * (boxes[:, 3] - boxes[:, 1] + offset)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(xx2 - xx1 + offset, 0)
        h = np.maximum(yy2 - yy1 + offset, 0)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return np.array(keep)


def test_nms_matches_greedy(rng):
    for trial in range(5):
        n = 200
        boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (n, 2))
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = greedy_nms_reference(boxes, scores, 0.5)
        idx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 100)
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, ref[:100])


def test_nms_respects_valid_mask(rng):
    n = 50
    boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 10
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.arange(n) < 30
    idx, ok = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40, jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(ok)]
    assert np.all(got < 30)
    ref = greedy_nms_reference(boxes[:30], scores[:30], 0.5)
    np.testing.assert_array_equal(got, ref[:40])


def test_nms_max_out_truncation(rng):
    n = 64
    # All disjoint boxes -> nothing suppressed; truncate to max_out by score.
    xs = np.arange(n, dtype=np.float32) * 100
    boxes = np.stack([xs, xs * 0, xs + 10, xs * 0 + 10], axis=1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx, ok = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 10)
    assert np.asarray(ok).sum() == 10
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(-scores)[:10])


def test_class_nms_separates_classes(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    # Same class: second suppressed.
    idx, ok = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.array([1, 1]), 0.5, 10
    )
    assert np.asarray(ok).sum() == 1
    # Different classes: both kept.
    idx, ok = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.array([1, 2]), 0.5, 10
    )
    assert np.asarray(ok).sum() == 2
