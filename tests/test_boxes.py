import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops import boxes as B


def test_iou_basic():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])  # 10x10 under +1 convention
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 29.0, 29.0]])
    iou = B.pairwise_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)


def test_encode_decode_roundtrip(rng):
    boxes = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:]) + 2
    gt = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + np.abs(gt[:, 2:]) + 2
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = B.encode_boxes(jnp.asarray(boxes), jnp.asarray(gt), w)
    rec = B.decode_boxes(jnp.asarray(boxes), deltas, w)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-2)


def test_clip_and_flip():
    b = jnp.array([[-5.0, -5.0, 200.0, 90.0]])
    c = B.clip_boxes(b, (100, 150))
    np.testing.assert_allclose(np.asarray(c), [[0.0, 0.0, 149.0, 90.0]])
    f = B.flip_boxes(c, 150)
    np.testing.assert_allclose(np.asarray(f), [[0.0, 0.0, 149.0, 90.0]])
    f2 = B.flip_boxes(jnp.array([[10.0, 0.0, 20.0, 5.0]]), 100)
    np.testing.assert_allclose(np.asarray(f2), [[79.0, 0.0, 89.0, 5.0]])


def test_fpn_level_assignment():
    def box_of_size(s):
        return [0.0, 0.0, s - 1.0, s - 1.0]

    b = jnp.array([box_of_size(s) for s in (16, 112, 224, 448, 896)])
    levels = B.fpn_level_assignment(b)
    np.testing.assert_array_equal(np.asarray(levels), [2, 3, 4, 5, 5])
