"""ROIAlign over single feature maps and the fused FPN pyramid.

Replaces the reference's CUDA ROIAlign (uber-research/UPSNet
``upsnet/operators/src/roialign/``, wrapped by
``upsnet/operators/modules/roialign.py``) with an XLA gather formulation.

Semantics match the Detectron-lineage kernel the reference ships
(pre-``aligned=True`` convention — no half-pixel shift; SURVEY.md §7.3 hard
part #2): each P x P output bin averages ``sampling_ratio**2`` bilinear
samples placed at uniform sub-bin centers; samples outside
``[-1, H] x [-1, W]`` contribute zero; coordinates clamp to ``[0, size-1]``.

TPU design notes:
  * Static shapes: RoI count is padded; invalid RoIs produce garbage bins
    that callers mask out (never NaN: coords are clamped).
  * ``fpn_roi_align`` flattens all pyramid levels into ONE (sum HW, C)
    buffer and computes per-RoI flat indices using its assigned level's
    (stride, height, width, row-offset) — a single gather does the work the
    reference does with four per-level kernel launches + scatter-back.
  * RoIs are processed in chunks via ``lax.map`` to bound the transient
    gather footprint (4 corners x P^2 x S^2 rows per RoI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.anchors import FPN_STRIDES


def _bilinear_corners(y, x, height, width):
    """Corner indices + weights with Detectron clamping.

    y, x: sample coords, any broadcastable shape. height/width may be arrays
    (per-sample, for the fused multi-level path) or scalars.
    Returns (y_low, x_low, y_high, x_high, w_ll, w_lh, w_hl, w_hh, inside).
    """
    inside = (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.floor(y)
    x_low = jnp.floor(x)
    # If y_low >= height - 1: snap to the last row (y becomes integral).
    y_snap = y_low >= height - 1
    x_snap = x_low >= width - 1
    y_low = jnp.where(y_snap, height - 1, y_low)
    x_low = jnp.where(x_snap, width - 1, x_low)
    y = jnp.where(y_snap, y_low, y)
    x = jnp.where(x_snap, x_low, x)
    y_high = jnp.where(y_snap, y_low, y_low + 1)
    x_high = jnp.where(x_snap, x_low, x_low + 1)
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    zero = jnp.zeros_like(ly)
    w_ll = jnp.where(inside, hy * hx, zero)
    w_lh = jnp.where(inside, hy * lx, zero)
    w_hl = jnp.where(inside, ly * hx, zero)
    w_hh = jnp.where(inside, ly * lx, zero)
    return (
        y_low.astype(jnp.int32),
        x_low.astype(jnp.int32),
        y_high.astype(jnp.int32),
        x_high.astype(jnp.int32),
        w_ll,
        w_lh,
        w_hl,
        w_hh,
    )


def _sample_coords(rois, spatial_scale, pooled: int, sampling_ratio: int):
    """Sample-point coordinates (N, P, P, S, S) in feature-map space."""
    s = sampling_ratio
    roi_x1 = rois[:, 0] * spatial_scale
    roi_y1 = rois[:, 1] * spatial_scale
    roi_x2 = rois[:, 2] * spatial_scale
    roi_y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(roi_x2 - roi_x1, 1.0)
    roi_h = jnp.maximum(roi_y2 - roi_y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled
    ph = jnp.arange(pooled, dtype=rois.dtype)
    iy = (jnp.arange(s, dtype=rois.dtype) + 0.5) / s
    # y = y1 + (ph + (iy + .5)/S) * bin_h
    ys = (
        roi_y1[:, None, None]
        + (ph[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]
    )  # (N, P, S)
    xs = (
        roi_x1[:, None, None]
        + (ph[None, :, None] + iy[None, None, :]) * bin_w[:, None, None]
    )
    y = ys[:, :, None, :, None]  # (N, P, 1, S, 1)
    x = xs[:, None, :, None, :]  # (N, 1, P, 1, S)
    y = jnp.broadcast_to(y, (rois.shape[0], pooled, pooled, s, s))
    x = jnp.broadcast_to(x, (rois.shape[0], pooled, pooled, s, s))
    return y, x


def _gather_average(flat_feats, flat_idx4, weights4, pooled, sampling_ratio):
    """Gather 4 corners and average over the sample grid.

    flat_idx4 / weights4: (4, N, P, P, S, S). Returns (N, P, P, C).
    """
    n = flat_idx4.shape[1]
    c = flat_feats.shape[-1]
    out = jnp.zeros((n, pooled, pooled, c), dtype=flat_feats.dtype)
    for k in range(4):
        rows = flat_feats[flat_idx4[k].reshape(-1)]
        rows = rows.reshape(n, pooled, pooled, sampling_ratio, sampling_ratio, c)
        out = out + jnp.sum(
            rows * weights4[k][..., None].astype(flat_feats.dtype), axis=(3, 4)
        )
    return out / float(sampling_ratio * sampling_ratio)


@functools.partial(
    jax.jit, static_argnames=("pooled", "sampling_ratio", "spatial_scale", "chunk")
)
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    pooled: int = 7,
    spatial_scale: float = 0.25,
    sampling_ratio: int = 2,
    chunk: int = 64,
) -> jnp.ndarray:
    """Single-level ROIAlign. features (H, W, C), rois (N, 4) image coords.

    Returns (N, pooled, pooled, C).
    """
    h, w, c = features.shape
    flat = features.reshape(h * w, c)

    def one_chunk(rois_chunk):
        y, x = _sample_coords(rois_chunk, spatial_scale, pooled, sampling_ratio)
        yl, xl, yh, xh, wll, wlh, whl, whh = _bilinear_corners(y, x, float(h), float(w))
        idx4 = jnp.stack(
            [yl * w + xl, yl * w + xh, yh * w + xl, yh * w + xh], axis=0
        )
        w4 = jnp.stack([wll, wlh, whl, whh], axis=0)
        return _gather_average(flat, idx4, w4, pooled, sampling_ratio)

    n = rois.shape[0]
    if n <= chunk:
        return one_chunk(rois)
    pad = (-n) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    out = jax.lax.map(one_chunk, rois_p.reshape(-1, chunk, 4))
    return out.reshape(-1, pooled, pooled, c)[:n]


def _pyramid_meta(shapes, strides):
    """Static per-level (offset, H, W, scale) tables for the fused gather."""
    offsets, hs, ws, scales = [], [], [], []
    off = 0
    for (h, w, _), s in zip(shapes, strides):
        offsets.append(off)
        hs.append(h)
        ws.append(w)
        scales.append(1.0 / s)
        off += h * w
    return (
        np.array(offsets, np.int32),
        np.array(hs, np.float32),
        np.array(ws, np.float32),
        np.array(scales, np.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("pooled", "sampling_ratio", "strides", "chunk", "impl"),
)
def fpn_roi_align_batched(
    features: tuple[jnp.ndarray, ...],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
    chunk: int = 1024,
    impl: str = "gather",
) -> jnp.ndarray:
    """Batched fused ROIAlign — custom-VJP wrapper.

    Forward: packed-corner gather (default) or dense separable-hat matmuls
    (``impl='dense'``, `fpn_roi_align_dense`) — identical semantics,
    different TPU cost model (latency-bound gather rows vs MXU FLOPs).
    Backward: always dense separable-hat matmuls (`_fpn_roi_align_bwd`)
    instead of XLA's row-serial scatter-add — the reference's CUDA ROIAlign
    backward uses atomics (``upsnet/operators/src/roialign``); the TPU
    equivalent is MXU accumulation, not scatter.
    """
    meta = tuple((tuple(f.shape), str(f.dtype)) for f in features)
    return _roi_align_core(features, rois, levels, pooled, sampling_ratio,
                           strides, chunk, meta, impl)


def _fwd_impl(impl):
    if impl == "dense":
        return fpn_roi_align_dense
    if impl == "window" and jax.default_backend() in ("tpu", "axon"):
        from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window

        return lambda f, r, l, p, sr, st, chunk: fpn_roi_align_window(
            f, r, l, p, sr, st
        )
    return _fpn_roi_align_batched_impl


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _roi_align_core(features, rois, levels, pooled, sampling_ratio, strides,
                    chunk, meta, impl):
    return _fwd_impl(impl)(
        features, rois, levels, pooled, sampling_ratio, strides, chunk
    )


def _roi_align_core_fwd(features, rois, levels, pooled, sampling_ratio,
                        strides, chunk, meta, impl):
    out = _fwd_impl(impl)(
        features, rois, levels, pooled, sampling_ratio, strides, chunk
    )
    return out, (rois, levels)


def _roi_align_core_bwd(pooled, sampling_ratio, strides, chunk, meta, impl,
                        res, g):
    rois, levels = res
    shapes = tuple(m[0] for m in meta)
    dtypes = tuple(jnp.dtype(m[1]) for m in meta)
    if impl == "window" and jax.default_backend() in ("tpu", "axon"):
        # gradient twin of the windowed forward kernel: per-RoI window
        # RMW instead of the dense full-canvas scan accumulator
        from upsnet_tpu.ops.roi_align_pallas import fpn_roi_align_window_bwd

        grads = fpn_roi_align_window_bwd(
            shapes, tuple(str(d) for d in dtypes), rois, levels, g,
            pooled, sampling_ratio, strides
        )
    else:
        grads = _fpn_roi_align_bwd(
            rois, levels, shapes, dtypes, g, pooled, sampling_ratio, strides
        )
    g_rois = jnp.zeros_like(rois)
    g_lev = np.zeros(levels.shape, dtype=jax.dtypes.float0)
    return grads, g_rois, g_lev


_roi_align_core.defvjp(_roi_align_core_fwd, _roi_align_core_bwd)


def _axis_hat(coords: jnp.ndarray, size: int, mask: jnp.ndarray, dtype):
    """Dense per-axis bilinear weights with Detectron clamp semantics.

    coords: (N, PS) sample positions on this axis. Returns (N, PS, size):
    ``K[i, s, y] = 1[-1 <= c <= size] * max(0, 1 - |clip(c, 0, size-1) - y|)``
    — exactly the forward's per-axis factor (clip covers the edge snap; the
    outside-window indicator is separable because the forward's ``inside``
    is an AND of per-axis conditions).
    """
    inside = (coords >= -1.0) & (coords <= float(size))
    c = jnp.clip(coords, 0.0, float(size - 1))
    grid = jnp.arange(size, dtype=coords.dtype)
    k = jnp.maximum(1.0 - jnp.abs(c[..., None] - grid), 0.0)
    k = k * (inside & mask[:, None])[..., None]
    return k.astype(dtype)


def _fpn_roi_align_bwd(rois, levels, shapes, dtypes, g, pooled: int,
                       sampling_ratio: int, strides):
    """grad wrt the feature pyramid: per level, accumulate
    ``Ky^T @ g_samples @ Kx`` over ROI chunks (MXU matmuls, no scatter)."""
    s = sampling_ratio
    ps = pooled * s
    bsz, r = rois.shape[:2]
    n = bsz * r
    rois_f = rois.reshape(n, 4)
    lev_f = levels.reshape(n).astype(jnp.int32)

    # samples grad: (B, R, P, P, C) -> (N, PS, PS, C), each bin's grad
    # spread uniformly over its S^2 samples
    c_dim = g.shape[-1]
    gs = g.reshape(n, pooled, pooled, c_dim)
    gs = jnp.repeat(jnp.repeat(gs, s, axis=1), s, axis=2) / float(s * s)

    ck = min(64, r)
    while r % ck:
        ck -= 1
    nck = r // ck
    bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), nck)

    grads = []
    for l, (shape, stride) in enumerate(zip(shapes, strides)):
        _, h, w, c = shape
        scale = 1.0 / stride
        y, x = _sample_coords(rois_f * scale, 1.0, pooled, s)
        sy = y[:, :, 0, :, 0].reshape(n, ps)  # (N, P, S) -> (N, PS)
        sx = x[:, 0, :, 0, :].reshape(n, ps)
        mask = lev_f == l
        cdt = dtypes[l]
        ky = _axis_hat(sy, h, mask, cdt).reshape(bsz * nck, ck, ps, h)
        kx = _axis_hat(sx, w, mask, cdt).reshape(bsz * nck, ck, ps, w)
        gs_l = gs.astype(cdt).reshape(bsz * nck, ck, ps, ps, c_dim)

        def step(carry, xs):
            ky_c, gs_c, kx_c, b = xs
            # x-contraction first (batched small-K): v[k,s,c,w]
            v = jnp.einsum("kstc,ktw->kscw", gs_c, kx_c)
            # big matmul, (k,s)-leading on both operands -> no layout
            # transposes: gl[h,c,w] = sum_{k,s} ky[k,s,h] v[k,s,c,w]
            gl = jnp.einsum("ksh,kscw->hcw", ky_c, v,
                            preferred_element_type=jnp.float32)
            return carry.at[b].add(gl), None

        # accumulate in (H, C, W) layout; transpose ONCE at the end
        init = jnp.zeros((bsz, h, c, w), jnp.float32)
        acc, _ = jax.lax.scan(step, init, (ky, gs_l, kx, bidx))
        grads.append(jnp.moveaxis(acc, 2, 3).astype(cdt))
    return tuple(grads)


@functools.partial(
    jax.jit, static_argnames=("pooled", "sampling_ratio", "strides", "chunk")
)
def fpn_roi_align_dense(
    features: tuple[jnp.ndarray, ...],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
    chunk: int = 64,
) -> jnp.ndarray:
    """Dense separable-hat ROIAlign forward: ``out_i = Ky_i @ F @ Kx_i^T``.

    Same semantics as the packed-corner gather (cross-tested), but all
    MXU matmuls instead of an XLA gather — per chunk of ROIs and level:
    ``t = einsum(Ky, F)`` contracts the feature rows, then ``einsum(t, Kx)``
    the columns, and the S x S sample grid average-pools to P x P bins.
    ROIs not assigned to a level contribute zero via masked Ky. Gather cost
    on TPU is per-row and latency-bound; this trades ~1.3x more FLOPs on
    non-assigned levels for full systolic-array throughput.
    """
    s = sampling_ratio
    ps = pooled * s
    bsz, r = rois.shape[:2]
    n = bsz * r
    c_dim = features[0].shape[-1]
    rois_f = rois.reshape(n, 4)
    lev_f = levels.reshape(n).astype(jnp.int32)

    ck = min(chunk, r)
    while r % ck:
        ck -= 1
    nck = r // ck
    bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), nck)

    out = jnp.zeros((bsz * nck, ck, ps, ps, c_dim), jnp.float32)
    for l, (f, stride) in enumerate(zip(features, strides)):
        _, h, w, _ = f.shape
        y, x = _sample_coords(rois_f * (1.0 / stride), 1.0, pooled, s)
        sy = y[:, :, 0, :, 0].reshape(n, ps)
        sx = x[:, 0, :, 0, :].reshape(n, ps)
        mask = lev_f == l
        ky = _axis_hat(sy, h, mask, f.dtype).reshape(bsz * nck, ck, ps, h)
        kx = _axis_hat(sx, w, mask, f.dtype).reshape(bsz * nck, ck, ps, w)

        def step(carry, xs):
            ky_c, kx_c, b, o = xs
            fb = jax.lax.dynamic_index_in_dim(f, b, axis=0, keepdims=False)
            # t[k,s,w,c] = sum_h ky[k,s,h] * F[h,w,c]
            t = jnp.einsum("ksh,hwc->kswc", ky_c, fb)
            o = o + jnp.einsum("kswc,ktw->kstc", t, kx_c,
                               preferred_element_type=jnp.float32)
            return carry, o

        _, out = jax.lax.scan(step, 0, (ky, kx, bidx, out))
    # average the S x S samples per bin
    out = out.reshape(bsz * nck, ck, pooled, s, pooled, s, c_dim)
    out = jnp.mean(out, axis=(3, 5))
    return out.reshape(bsz, r, pooled, pooled, c_dim).astype(features[0].dtype)


@functools.partial(
    jax.jit, static_argnames=("pooled", "sampling_ratio", "strides", "chunk")
)
def _fpn_roi_align_batched_impl(
    features: tuple[jnp.ndarray, ...],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
    chunk: int = 1024,
) -> jnp.ndarray:
    """Batched fused ROIAlign with patch-gather corner packing.

    TPU cost of XLA gather is per gathered ROW, independent of row width
    (see deform_conv.deform_conv2d_mxu notes). Packing each pixel's 2x2
    neighborhood into one row via two shifted concats turns the 4 corner
    gathers per bilinear sample into ONE, and flattening (batch, roi) into
    a single index space avoids XLA's slow batched-gather lowering — ~4x
    over the per-corner, vmapped formulation.

    Args:
      features: per-level (B, H_l, W_l, C).
      rois: (B, R, 4); levels: (B, R) int32 in [0, num_levels).
    Returns:
      (B, R, pooled, pooled, C).
    """
    bsz = features[0].shape[0]
    c = features[0].shape[-1]
    s = sampling_ratio
    # pack each level: zero-pad bottom/right, pile [v, right, down, diag]
    packed, offsets_l, h_t, w_t, wp_t, sc_t = [], [], [], [], [], []
    row_off = 0
    for f, stride in zip(features, strides):
        _, h, w, _ = f.shape
        fp = jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pk = jnp.concatenate([fp, jnp.roll(fp, -1, axis=2)], axis=-1)
        pk = jnp.concatenate([pk, jnp.roll(pk, -1, axis=1)], axis=-1)
        packed.append(pk.reshape(bsz, (h + 1) * (w + 1), 4 * c))
        offsets_l.append(row_off)
        h_t.append(h)
        w_t.append(w)
        wp_t.append(w + 1)
        sc_t.append(1.0 / stride)
        row_off += (h + 1) * (w + 1)
    per_img = row_off
    # flat buffer over (level, batch): rows [lvl_off * B ... ] — simpler:
    # concat levels per image then images: row = b * per_img + lvl_off + ...
    flat = jnp.concatenate(packed, axis=1).reshape(bsz * per_img, 4 * c)
    off_t = jnp.asarray(np.array(offsets_l, np.int32))
    h_t = jnp.asarray(np.array(h_t, np.float32))
    w_t = jnp.asarray(np.array(w_t, np.float32))
    wp_t = jnp.asarray(np.array(wp_t, np.int32))
    sc_t = jnp.asarray(np.array(sc_t, np.float32))

    r = rois.shape[1]
    rois_f = rois.reshape(bsz * r, 4)
    lev_f = levels.reshape(bsz * r).astype(jnp.int32)
    img_f = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), r)

    def do_chunk(args):
        rois_c, lev_c, img_c = args
        scale = sc_t[lev_c]
        lh = h_t[lev_c]
        lw = w_t[lev_c]
        lwp = wp_t[lev_c]
        loff = off_t[lev_c]
        y, x = _sample_coords(rois_c * scale[:, None], 1.0, pooled, s)
        ext = (slice(None),) + (None,) * 4
        hh = lh[ext]
        ww = lw[ext]
        inside = (y >= -1.0) & (y <= hh) & (x >= -1.0) & (x <= ww)
        y = jnp.clip(y, 0.0, None)
        x = jnp.clip(x, 0.0, None)
        yl = jnp.floor(y)
        xl = jnp.floor(x)
        # Detectron snap: at the far edge the sample collapses onto the
        # last row/col (fraction 0) — packed zeros at pad make high taps 0.
        y_snap = yl >= hh - 1
        x_snap = xl >= ww - 1
        yl = jnp.where(y_snap, hh - 1, yl)
        xl = jnp.where(x_snap, ww - 1, xl)
        ly = jnp.where(y_snap, 0.0, y - yl)
        lx = jnp.where(x_snap, 0.0, x - xl)
        base = (
            (img_c[ext] * per_img + loff[ext])
            + yl.astype(jnp.int32) * lwp[ext]
            + xl.astype(jnp.int32)
        )
        patch = flat[base.reshape(-1)].reshape(base.shape + (4, c))
        okf = inside.astype(flat.dtype)
        ly = ly.astype(flat.dtype)
        lx = lx.astype(flat.dtype)
        wts = (
            jnp.stack(
                [(1 - ly) * (1 - lx), (1 - ly) * lx, ly * (1 - lx), ly * lx],
                axis=-1,
            )
            * okf[..., None]
        )
        sampled = jnp.einsum("npqijk,npqijkc->npqijc", wts, patch)
        return jnp.mean(sampled, axis=(3, 4))

    n = rois_f.shape[0]
    if n <= chunk:
        out = do_chunk((rois_f, lev_f, img_f))
    else:
        pad = (-n) % chunk
        args = (
            jnp.pad(rois_f, ((0, pad), (0, 0))).reshape(-1, chunk, 4),
            jnp.pad(lev_f, (0, pad)).reshape(-1, chunk),
            jnp.pad(img_f, (0, pad)).reshape(-1, chunk),
        )
        out = jax.lax.map(do_chunk, args).reshape(-1, pooled, pooled, c)[:n]
    return out.reshape(bsz, r, pooled, pooled, c)


@functools.partial(
    jax.jit, static_argnames=("pooled", "sampling_ratio", "strides", "chunk")
)
def fpn_roi_align(
    features: tuple[jnp.ndarray, ...],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
    chunk: int = 64,
) -> jnp.ndarray:
    """Fused multi-level ROIAlign over the FPN pyramid (P2..P5).

    The reference's ``FPNRoIAlign`` launches one CUDA ROIAlign per level and
    scatters results back by RoI (SURVEY.md §2.2). Here all levels live in
    one flattened (sum HW, C) buffer; each RoI's gather indices are computed
    against its own level's geometry, so one gather serves every level.

    Args:
      features: per-level (H_l, W_l, C) maps, same C.
      rois: (N, 4) boxes in image coordinates.
      levels: (N,) int32 in [0, len(features)) — FPN level per RoI
        (k - k_min from ``fpn_level_assignment``).
    Returns:
      (N, pooled, pooled, C).
    """
    shapes = tuple(f.shape for f in features)
    off_t, h_t, w_t, sc_t = _pyramid_meta(shapes, strides)
    c = shapes[0][2]
    flat = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
    off_t = jnp.asarray(off_t)
    h_t, w_t, sc_t = jnp.asarray(h_t), jnp.asarray(w_t), jnp.asarray(sc_t)

    def one_chunk(args):
        rois_chunk, lev = args
        scale = sc_t[lev]  # (chunk,)
        lh = h_t[lev]
        lw = w_t[lev]
        loff = off_t[lev]
        # Per-RoI scale: scale roi coords by its level's spatial scale.
        y, x = _sample_coords(
            rois_chunk * scale[:, None], 1.0, pooled, sampling_ratio
        )
        ext = (slice(None),) + (None,) * 4
        yl, xl, yh, xh, wll, wlh, whl, whh = _bilinear_corners(
            y, x, lh[ext], lw[ext]
        )
        lwi = lw.astype(jnp.int32)[ext]
        base = loff[ext]
        idx4 = jnp.stack(
            [
                base + yl * lwi + xl,
                base + yl * lwi + xh,
                base + yh * lwi + xl,
                base + yh * lwi + xh,
            ],
            axis=0,
        )
        w4 = jnp.stack([wll, wlh, whl, whh], axis=0)
        return _gather_average(flat, idx4, w4, pooled, sampling_ratio)

    n = rois.shape[0]
    levels = levels.astype(jnp.int32)
    if n <= chunk:
        return one_chunk((rois, levels))
    pad = (-n) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    lev_p = jnp.pad(levels, (0, pad))
    out = jax.lax.map(
        one_chunk, (rois_p.reshape(-1, chunk, 4), lev_p.reshape(-1, chunk))
    )
    return out.reshape(-1, pooled, pooled, c)[:n]
