"""Windowed Pallas ROIAlign vs the gather reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (no TPU in the test env)."""
    real = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _pyramid(rng, b, c=32):
    shapes = [(32, 80), (16, 40), (8, 20), (4, 10)]
    return tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for h, w in shapes
    ), (4, 8, 16, 32)


def test_window_matches_gather(rng):
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched
    from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window

    feats, strides = _pyramid(rng, 2)
    rois = rng.uniform(0, 250, (2, 12, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(4, 60, (2, 12, 2))
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (2, 12)), jnp.int32)

    ref = fpn_roi_align_batched(feats, rois, levels, pooled=7,
                                strides=strides)
    got = fpn_roi_align_window(feats, rois, levels, pooled=7,
                               strides=strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_window_multi_strip_extreme_aspect(rng):
    """RoIs wider/taller than one window force the strip loop."""
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched
    from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window

    feats, strides = _pyramid(rng, 1, c=16)
    # at P2 (stride 4, 32x80 cells, window 32x64): a 300px-wide roi spans
    # 75 cells -> 2 column strips; a full-height roi spans all rows
    rois = jnp.asarray(
        np.array(
            [
                [[2.0, 40.0, 310.0, 58.0],   # wide, thin
                 [8.0, 1.0, 20.0, 126.0],    # tall, thin
                 [0.0, 0.0, 318.0, 126.0],   # whole image
                 [300.0, 120.0, 316.0, 126.0]],  # corner
            ],
            np.float32,
        )
    )
    levels = jnp.zeros((1, 4), jnp.int32)  # pin everything to P2

    ref = fpn_roi_align_batched(feats, rois, levels, pooled=7,
                                strides=strides)
    got = fpn_roi_align_window(feats, rois, levels, pooled=7,
                               strides=strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_window_outside_and_mask_pool(rng):
    """Partially-outside rois (zero-contribution samples) + pooled=14."""
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched
    from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window

    feats, strides = _pyramid(rng, 1, c=16)
    rois = jnp.asarray(
        np.array(
            [[[-30.0, -20.0, 50.0, 40.0],
              [250.0, 90.0, 400.0, 200.0],
              [100.0, 30.0, 180.0, 100.0]]],
            np.float32,
        )
    )
    levels = jnp.asarray([[0, 1, 2]], jnp.int32)

    ref = fpn_roi_align_batched(feats, rois, levels, pooled=14,
                                strides=strides)
    got = fpn_roi_align_window(feats, rois, levels, pooled=14,
                               strides=strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_window_through_custom_vjp(rng):
    """impl='window' routes through fpn_roi_align_batched and keeps the
    dense custom backward."""
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched

    feats, strides = _pyramid(rng, 1, c=16)
    rois = rng.uniform(0, 200, (1, 6, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(8, 50, (1, 6, 2))
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (1, 6)), jnp.int32)

    ref = fpn_roi_align_batched(feats, rois, levels, pooled=7,
                                strides=strides)
    got = fpn_roi_align_batched(feats, rois, levels, pooled=7,
                                strides=strides, impl="window")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def loss(f, impl):
        return jnp.sum(
            fpn_roi_align_batched(f, rois, levels, pooled=7, strides=strides,
                                  impl=impl).astype(jnp.float32) ** 2
        )

    g_ref = jax.grad(lambda f: loss(f, "gather"))(feats)
    g_win = jax.grad(lambda f: loss(f, "window"))(feats)
    for a, b in zip(g_win, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_window_bwd_kernel_matches_dense(rng):
    """The per-RoI window-RMW backward kernel == the dense-matmul
    backward, including multi-strip RoIs and all levels."""
    from upsnet_tpu.ops.roi_align import _fpn_roi_align_bwd
    from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window_bwd

    feats, strides = _pyramid(rng, 2, c=16)
    rois = rng.uniform(0, 250, (2, 8, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(4, 120, (2, 8, 2))
    # force one multi-strip roi (window at P2 is 32x64 cells = 128x256 px)
    rois[0, 0] = [2.0, 4.0, 310.0, 120.0]
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (2, 8)), jnp.int32)
    g = jnp.asarray(rng.randn(2, 8, 7, 7, 16).astype(np.float32))

    shapes = tuple(f.shape for f in feats)
    dtypes = tuple(str(f.dtype) for f in feats)
    ref = _fpn_roi_align_bwd(rois, levels, shapes,
                             tuple(jnp.dtype(d) for d in dtypes), g,
                             pooled=7, sampling_ratio=2, strides=strides)
    got = fpn_roi_align_window_bwd(shapes, dtypes, rois, levels, g,
                                   pooled=7, sampling_ratio=2,
                                   strides=strides)
    for l, (a, b) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=f"level {l}")


def test_window_bwd_pooled14(rng):
    """Mask-pool shape (pooled=14 -> pq_pad 200 != 196 padding path)."""
    from upsnet_tpu.ops.roi_align import _fpn_roi_align_bwd
    from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window_bwd

    feats, strides = _pyramid(rng, 1, c=16)
    rois = rng.uniform(0, 200, (1, 4, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(8, 60, (1, 4, 2))
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (1, 4)), jnp.int32)
    g = jnp.asarray(rng.randn(1, 4, 14, 14, 16).astype(np.float32))

    shapes = tuple(f.shape for f in feats)
    dtypes = tuple(str(f.dtype) for f in feats)
    ref = _fpn_roi_align_bwd(rois, levels, shapes,
                             tuple(jnp.dtype(d) for d in dtypes), g,
                             pooled=14, sampling_ratio=2, strides=strides)
    got = fpn_roi_align_window_bwd(shapes, dtypes, rois, levels, g,
                                   pooled=14, sampling_ratio=2,
                                   strides=strides)
    for l, (a, b) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=f"level {l}")
