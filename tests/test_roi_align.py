import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.roi_align import fpn_roi_align, roi_align


def bilinear_ref(feat, y, x):
    """Detectron bilinear_interpolate semantics, scalar, numpy."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def roi_align_ref(feat, rois, pooled, scale, ratio):
    """Pure-numpy ROIAlign with the reference CUDA kernel's semantics."""
    n = rois.shape[0]
    c = feat.shape[-1]
    out = np.zeros((n, pooled, pooled, c), np.float32)
    for i in range(n):
        x1, y1, x2, y2 = rois[i] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / pooled, rh / pooled
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + ph * bh + (iy + 0.5) * bh / ratio
                        x = x1 + pw * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear_ref(feat, y, x)
                out[i, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 127.0, 95.0],
            [30.0, 10.0, 50.0, 30.0],
            [-8.0, -8.0, 140.0, 100.0],  # exceeds bounds
            [10.0, 10.0, 10.5, 10.5],  # tiny
        ],
        np.float32,
    )
    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2)
    ref = roi_align_ref(feat, rois, 7, 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_roi_align_chunked_equals_unchunked(rng):
    feat = rng.randn(16, 16, 4).astype(np.float32)
    rois = rng.uniform(0, 60, (10, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + 8
    a = roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2, chunk=4)
    b = roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2, chunk=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fpn_roi_align_matches_single_level(rng):
    shapes = [(32, 48), (16, 24), (8, 12), (4, 6)]
    feats = [rng.randn(h, w, 8).astype(np.float32) for h, w in shapes]
    strides = (4, 8, 16, 32)
    rois = np.array(
        [
            [8.0, 8.0, 60.0, 60.0],
            [0.0, 0.0, 120.0, 100.0],
            [16.0, 16.0, 100.0, 90.0],
            [5.0, 5.0, 20.0, 30.0],
        ],
        np.float32,
    )
    levels = np.array([0, 2, 1, 3], np.int32)
    got = fpn_roi_align(
        tuple(jnp.asarray(f) for f in feats),
        jnp.asarray(rois),
        jnp.asarray(levels),
        pooled=7,
        sampling_ratio=2,
        strides=strides,
    )
    for i, lev in enumerate(levels):
        ref = roi_align_ref(feats[lev], rois[i : i + 1], 7, 1.0 / strides[lev], 2)
        np.testing.assert_allclose(np.asarray(got[i]), ref[0], atol=1e-4)


def test_batched_matches_per_image(rng):
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched

    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    strides = (4, 8, 16, 32)
    b = 2
    feats = [rng.randn(b, h, w, 8).astype(np.float32) for h, w in shapes]
    rois = rng.uniform(0, 50, (b, 6, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(4, 30, (b, 6, 2))
    levels = rng.randint(0, 4, (b, 6)).astype(np.int32)
    got = fpn_roi_align_batched(
        tuple(jnp.asarray(f) for f in feats), jnp.asarray(rois),
        jnp.asarray(levels), pooled=7, sampling_ratio=2, strides=strides,
    )
    for bi in range(b):
        ref = fpn_roi_align(
            tuple(jnp.asarray(f[bi]) for f in feats), jnp.asarray(rois[bi]),
            jnp.asarray(levels[bi]), pooled=7, sampling_ratio=2,
            strides=strides,
        )
        np.testing.assert_allclose(
            np.asarray(got[bi]), np.asarray(ref), atol=1e-4
        )


def test_batched_chunked_equals(rng):
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched

    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    strides = (4, 8, 16, 32)
    feats = [rng.randn(1, h, w, 4).astype(np.float32) for h, w in shapes]
    rois = rng.uniform(0, 50, (1, 10, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + 10
    levels = rng.randint(0, 4, (1, 10)).astype(np.int32)
    args = (tuple(jnp.asarray(f) for f in feats), jnp.asarray(rois),
            jnp.asarray(levels))
    a = fpn_roi_align_batched(*args, pooled=5, strides=strides, chunk=4)
    c = fpn_roi_align_batched(*args, pooled=5, strides=strides, chunk=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_custom_backward_matches_autodiff(rng):
    """The dense separable-hat VJP must be the exact adjoint of the
    packed-corner gather forward (same Detectron clamp/inside semantics)."""
    from upsnet_tpu.ops.roi_align import (
        _fpn_roi_align_batched_impl,
        fpn_roi_align_batched,
    )

    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    strides = (4, 8, 16, 32)
    b = 2
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, 8).astype(np.float32))
        for h, w in shapes
    )
    rois = rng.uniform(-10, 70, (b, 12, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(1, 40, (b, 12, 2))
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (b, 12)).astype(np.int32))
    cot = jnp.asarray(rng.randn(b, 12, 5, 5, 8).astype(np.float32))

    def f_custom(fs):
        return fpn_roi_align_batched(fs, rois, levels, pooled=5,
                                     strides=strides)

    def f_auto(fs):
        return _fpn_roi_align_batched_impl(fs, rois, levels, pooled=5,
                                           strides=strides)

    out_c, vjp_c = jax.vjp(f_custom, feats)
    out_a, vjp_a = jax.vjp(f_auto, feats)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_a), atol=1e-5)
    g_c = vjp_c(cot)[0]
    g_a = vjp_a(cot)[0]
    for gc, ga, (h, w) in zip(g_c, g_a, shapes):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(ga), atol=2e-4,
            err_msg=f"level {h}x{w}",
        )
    # rois/levels get no gradient (reference CUDA kernel semantics)
    gr = jax.grad(lambda r: jnp.sum(fpn_roi_align_batched(
        feats, r, levels, pooled=5, strides=strides)))(rois)
    assert np.allclose(np.asarray(gr), 0.0)


def test_dense_forward_matches_gather(rng):
    """fpn_roi_align_dense (MXU matmul path) == packed-corner gather."""
    from upsnet_tpu.ops.roi_align import (
        _fpn_roi_align_batched_impl,
        fpn_roi_align_batched,
        fpn_roi_align_dense,
    )

    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    strides = (4, 8, 16, 32)
    b = 2
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, 8).astype(np.float32))
        for h, w in shapes
    )
    rois = rng.uniform(-10, 70, (b, 9, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(1, 40, (b, 9, 2))
    rois = jnp.asarray(rois)
    levels = jnp.asarray(rng.randint(0, 4, (b, 9)).astype(np.int32))
    ref = _fpn_roi_align_batched_impl(feats, rois, levels, pooled=5,
                                      strides=strides)
    got = fpn_roi_align_dense(feats, rois, levels, pooled=5, strides=strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    # and through the public impl switch (custom VJP attached)
    got2 = fpn_roi_align_batched(feats, rois, levels, pooled=5,
                                 strides=strides, impl="dense")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-4)
