import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.mask_paste import paste_masks
from upsnet_tpu.ops.panoptic import (
    mask_matching,
    mask_removal,
    panoptic_argmax,
    seg_term,
)


def test_paste_masks_geometry():
    mask = np.full((4, 28, 28), 5.0, np.float32)
    boxes = np.array(
        [
            [8, 8, 23, 23],
            [0, 0, 31, 31],
            [-4, -4, 10, 10],  # partially outside
            [30, 30, 40, 40],  # mostly outside
        ],
        np.float32,
    )
    out = np.asarray(paste_masks(jnp.asarray(mask), jnp.asarray(boxes), (32, 32)))
    assert out.shape == (4, 32, 32)
    # constant-5 mask inside box, 0 outside
    np.testing.assert_allclose(out[0, 10:22, 10:22], 5.0, atol=1e-5)
    np.testing.assert_allclose(out[0, :8, :], 0.0)
    np.testing.assert_allclose(out[0, :, 25:], 0.0)
    np.testing.assert_allclose(out[1, 1:31, 1:31], 5.0, atol=1e-5)
    np.testing.assert_allclose(out[2, 2:9, 2:9], 5.0, atol=1e-5)
    assert out[3, :30, :30].sum() == 0


def test_seg_term_crops_channel():
    h, w = 16, 16
    seg = np.zeros((h, w, 5), np.float32)  # 2 stuff + 3 thing
    seg[:, :, 2] = 1.0  # thing class 0 channel
    seg[:, :, 3] = 7.0  # thing class 1 channel
    boxes = jnp.asarray(np.array([[4, 4, 8, 8]], np.float32))
    out = np.asarray(seg_term(jnp.asarray(seg), boxes, jnp.asarray([1]), num_stuff=2))
    np.testing.assert_allclose(out[0, 5, 5], 7.0)
    np.testing.assert_allclose(out[0, 0, 0], 0.0)
    np.testing.assert_allclose(out[0, 12, 12], 0.0)


def test_panoptic_argmax_semantics():
    h, w, num_stuff, num_thing = 16, 16, 2, 3
    seg = np.zeros((h, w, num_stuff + num_thing), np.float32)
    seg[:, :, 0] = 2.0  # stuff 0 wins by default
    seg[4:12, 4:12, 2] = 6.0  # thing class 0 strong in a region
    boxes = np.array([[4, 4, 11, 11], [0, 0, 3, 3]], np.float32)
    classes = np.array([0, 1], np.int32)
    masks = np.zeros((2, 28, 28), np.float32)
    masks[0] = 10.0  # instance 0 mask logits strongly positive
    masks[1] = -10.0
    pan, logits = panoptic_argmax(
        jnp.asarray(seg), jnp.asarray(boxes), jnp.asarray(classes),
        jnp.asarray(masks), jnp.asarray([True, True]), num_stuff,
    )
    pan = np.asarray(pan)
    assert pan[8, 8] == num_stuff + 0  # instance 0 claims its box interior
    assert pan[0, 8] == 0  # stuff elsewhere
    assert pan[14, 14] == 0
    # invalid instances can't win
    pan2, _ = panoptic_argmax(
        jnp.asarray(seg), jnp.asarray(boxes), jnp.asarray(classes),
        jnp.asarray(masks), jnp.asarray([False, False]), num_stuff,
    )
    assert np.all(np.asarray(pan2) < num_stuff + 2 + 1)
    assert not np.any(np.asarray(pan2) == num_stuff)


def test_panoptic_unknown_channel():
    # strong thing evidence but no instance covers it -> unknown wins
    h, w, num_stuff = 8, 8, 2
    seg = np.zeros((h, w, 4), np.float32)
    seg[:, :, 0] = 1.0
    seg[2:6, 2:6, 3] = 9.0  # thing evidence, no detection there
    boxes = np.array([[0, 0, 1, 1]], np.float32)
    masks = np.full((1, 28, 28), -10.0, np.float32)
    pan, _ = panoptic_argmax(
        jnp.asarray(seg), jnp.asarray(boxes), jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(masks), jnp.asarray([True]), num_stuff,
    )
    unknown_idx = num_stuff + 1
    assert np.asarray(pan)[4, 4] == unknown_idx


def test_mask_removal_greedy():
    h, w = 16, 16
    m = np.zeros((3, h, w), np.float32)
    m[0, 0:8, 0:8] = 1  # highest score
    m[1, 0:8, 0:8] = 1  # duplicate -> removed
    m[2, 8:16, 8:16] = 1  # disjoint -> kept
    keep = np.asarray(
        mask_removal(jnp.asarray(m), jnp.asarray([True, True, True]), 0.5)
    )
    np.testing.assert_array_equal(keep, [True, False, True])
    # partial overlap above threshold survives
    m[1] = 0
    m[1, 4:12, 0:8] = 1  # half covered by mask 0
    keep = np.asarray(
        mask_removal(jnp.asarray(m), jnp.asarray([True, True, True]), 0.5)
    )
    np.testing.assert_array_equal(keep, [True, True, True])


def test_mask_matching_map():
    h, w, num_stuff = 8, 8, 2
    seg_gt = np.full((h, w), 1, np.int32)  # stuff class 1 everywhere
    seg_gt[0:4, 0:4] = 3  # thing class region
    seg_gt[7, 7] = 255  # ignore
    gmasks = np.zeros((2, h, w), np.float32)
    gmasks[0, 0:4, 0:4] = 1
    gmasks[1, 5:7, 5:7] = 1
    out = np.asarray(
        mask_matching(
            jnp.asarray(seg_gt), jnp.asarray(gmasks),
            jnp.asarray([True, True]), jnp.asarray([False, True]), num_stuff,
        )
    )
    assert out[2, 2] == num_stuff + 0  # instance 0 channel
    assert out[6, 6] == num_stuff + 2  # routed to unknown (G=2)
    assert out[4, 0] == 1  # stuff persists
    assert out[7, 7] == 255  # ignore persists


def test_panoptic_argmax_stream_bit_identical():
    """The streaming (no-stack) argmax must match the stacked argmax
    bit-for-bit, including first-wins tie-breaks across channel groups."""
    from upsnet_tpu.ops.panoptic import panoptic_argmax_stream

    rng = np.random.RandomState(7)
    h, w, num_stuff, num_thing, n = 32, 40, 5, 6, 9
    for trial in range(4):
        seg = rng.randn(h, w, num_stuff + num_thing).astype(np.float32) * 3
        if trial >= 2:
            # engineered ties: quantize logits so exact-equal maxima are
            # common between stuff/instance/unknown channels
            seg = np.round(seg)
        boxes = np.stack(
            [
                rng.uniform(0, w - 8, n),
                rng.uniform(0, h - 8, n),
                rng.uniform(8, w, n),
                rng.uniform(8, h, n),
            ],
            axis=1,
        ).astype(np.float32)
        boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 2)
        boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 2)
        classes = rng.randint(0, num_thing, n).astype(np.int32)
        masks = (rng.randn(n, 28, 28) * 4).astype(np.float32)
        if trial >= 2:
            masks = np.round(masks)
        valid = rng.rand(n) > (0.9 if trial == 3 else 0.3)
        args = (
            jnp.asarray(seg), jnp.asarray(boxes), jnp.asarray(classes),
            jnp.asarray(masks), jnp.asarray(valid),
        )
        want, _ = panoptic_argmax(*args, num_stuff)
        got = panoptic_argmax_stream(*args, num_stuff)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
