"""Pallas TPU ROIAlign: per-RoI window DMA + joint-hat matmul.

The XLA gather formulation (`ops/roi_align.py`) pays per-ROW gather
latency: P^2 * S^2 sample rows per RoI -> ~1.6M rows for the predict
path's 1000-RoI box pooling at b8 (~100ms real, measured ~66ns/row).
This kernel replaces them with ONE strided window DMA per RoI
(~8k DMAs instead of 1.6M row fetches) and computes all bins with a
single MXU matmul:

    sampled[(i, j), c] = sum_{h, w} Ky[i, h] * Kx[j, w] * win[h, w, c]
                       = (W_joint (M, WH*WW) @ win (WH*WW, C))
    out[(p, q), c]     = A (P^2, M) @ sampled            # S^2 bin average

where Ky/Kx are the separable per-axis bilinear hats with Detectron
clamp semantics (identical to `roi_align._axis_hat`; the reference CUDA
kernel is `upsnet/operators/src/roialign`). The joint weights are built
in VMEM from two broadcasted iota fields (h = lane >> log2(WW),
w = lane & (WW-1); WW is a power of two), so no transposes or gathers
appear on the hot path.

RoIs larger than the (WH, WW)-cell window are handled exactly by a
dynamic-bound strip loop: cell space is partitioned into window-sized
strips, each strip DMAs its block and accumulates its partial matmul;
cells outside the strip get zero hat weight (edge-clamped strips mask
`cell >= strip_origin` so no cell is counted twice). Typical RoIs fit
in one strip (window = 32x64 cells covers 128x256 px at P2 stride 4).

Level routing: ONE pallas_call for the whole pyramid — all four level
features are passed as HBM refs and each RoI's window DMA source is
switched on its assigned level inside the kernel, with G RoIs handled
per program (grid B x R/G). The earlier one-call-per-level design paid
per-program fixed overhead 4 x B x R times, 3/4 of them dead
level-mismatch skips — that overhead, not compute, dominated the b8
1000-RoI box pooling stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upsnet_tpu.ops.anchors import FPN_STRIDES
from upsnet_tpu.ops.roi_align import _sample_coords


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_ge(x: int) -> int:
    return 1 << (x - 1).bit_length()




def _window_kernel(meta_ref, syx_ref, x2, x3, x4, x5, out_ref, win, wj,
                   samp, sem, *, whl: int, wwl: int, log2w: int, ps: int,
                   psb: int, pooled: int, s: int, g_rois: int):
    """One (batch, roi-group) program: G RoIs, any FPN level each.

    All four level features arrive as HBM refs; each RoI's DMA source is
    switched on its assigned level (meta slot 0) with ``pl.when`` — one
    pallas_call for the whole pyramid instead of one per level, and G
    RoIs per program, so the per-program fixed overhead (the dominant
    cost of the one-RoI-per-program version: 4 levels x B x R programs,
    3/4 of them dead level-mismatch skips) is paid B x R / G times.
    Per-level geometry (logical h/w, padded h/w, strip counts) rides in
    per-RoI SMEM meta slots instead of python statics.
    """
    b_idx = pl.program_id(0)
    k = whl * wwl
    m = ps * psb
    c = win.shape[-1]
    pq_pad = out_ref.shape[2]
    xs = (x2, x3, x4, x5)

    lane = jax.lax.broadcasted_iota(jnp.int32, (psb, k), 1)
    h_of = lane >> log2w
    w_of = lane & (wwl - 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (psb, 1), 0)
    eff_w = wwl - 8  # logical strip width; see alignment note below

    # S^2-sample bin average as a small constant matmul, built from iota:
    # sample row r = i*PSB + j -> bin (i//s)*P + (j//s). PSB and s are
    # powers of two (shifts); the bin index divides by P via the float
    # reciprocal (exact for these small ints).
    log2psb = psb.bit_length() - 1
    log2s = s.bit_length() - 1
    r_i = jax.lax.broadcasted_iota(jnp.int32, (pq_pad, m), 1)
    b_i = jax.lax.broadcasted_iota(jnp.int32, (pq_pad, m), 0)
    i_of = r_i >> log2psb
    j_of = r_i & (psb - 1)
    p_of = jnp.floor(
        b_i.astype(jnp.float32) * (1.0 / pooled)
    ).astype(jnp.int32)
    q_of = b_i - p_of * pooled
    avg = jnp.where(
        ((i_of >> log2s) == p_of) & ((j_of >> log2s) == q_of)
        & (j_of < ps) & (b_i < pooled * pooled),
        1.0 / (s * s), 0.0,
    )

    for gi in range(g_rois):
        lev = meta_ref[0, gi, 0, 0]
        row0 = meta_ref[0, gi, 0, 1]
        col0 = meta_ref[0, gi, 0, 2]
        n_sh = meta_ref[0, gi, 0, 3]
        n_sw = meta_ref[0, gi, 0, 4]
        hl = meta_ref[0, gi, 0, 5]  # logical level rows
        wl = meta_ref[0, gi, 0, 6]  # logical level cols
        hl_pad = meta_ref[0, gi, 0, 7]  # padded rows (>= whl)
        wl_pad = meta_ref[0, gi, 0, 8]  # padded cols (>= wwl, % 8)

        samp[...] = jnp.zeros((m, c), jnp.float32)
        # sample coords as (PSB, 1) columns (host-padded to psb with -1e9;
        # pad rows also masked below via row_i < ps)
        sy_col = jnp.transpose(syx_ref[0, gi, 0:1, :])
        sx_col = jnp.transpose(syx_ref[0, gi, 1:2, :])
        hlf = hl.astype(jnp.float32)
        wlf = wl.astype(jnp.float32)
        in_y = (sy_col >= -1.0) & (sy_col <= hlf) & (row_i < ps)
        in_x = (sx_col >= -1.0) & (sx_col <= wlf) & (row_i < ps)
        cy = jnp.clip(sy_col, 0.0, hlf - 1.0)
        cx = jnp.clip(sx_col, 0.0, wlf - 1.0)

        def strip(s_idx, carry):
            sh = s_idx // n_sw
            sw = s_idx - sh * n_sw
            s0 = row0 + sh * whl
            s0c = jnp.minimum(s0, hl_pad - whl)
            c0 = col0 + sw * eff_w
            # the W dim is sublane-tiled in HBM, so the DMA column start
            # must be 8-aligned: floor-align and keep the logical strip 8
            # cells narrower than the window so alignment never uncovers
            # logical cells (wl_pad and wl_pad - wwl are multiples of 8)
            c0a = (jnp.minimum(c0, wl_pad - wwl) // 8) * 8
            for l in range(4):
                @pl.when(lev == l)
                def _start(l=l):
                    pltpu.make_async_copy(
                        xs[l].at[b_idx, pl.ds(s0c, whl), pl.ds(c0a, wwl)],
                        win, sem,
                    ).start()
            cell_h = s0c + h_of
            cell_w = c0a + w_of
            # per-axis hats over EXACTLY this strip's logical cell range
            # (edge-clamped windows overlap neighbours; the masks keep the
            # strip partition exact so no cell is counted twice)
            vy = jnp.maximum(
                1.0 - jnp.abs(cy - cell_h.astype(jnp.float32)), 0.0
            )
            vy = jnp.where(in_y & (cell_h >= s0), vy, 0.0)  # (psb, k)
            vx = jnp.maximum(
                1.0 - jnp.abs(cx - cell_w.astype(jnp.float32)), 0.0
            )
            vx = jnp.where(
                in_x & (cell_w >= c0) & (cell_w < c0 + eff_w), vx, 0.0
            )
            for i in range(ps):
                wj[i * psb:(i + 1) * psb, :] = (vx * vy[i:i + 1, :]).astype(
                    wj.dtype
                )
            # wait via an equal-shape descriptor (same dst/sem/byte count
            # regardless of which level's DMA was started)
            pltpu.make_async_copy(
                xs[0].at[b_idx, pl.ds(0, whl), pl.ds(0, wwl)], win, sem
            ).wait()
            samp[...] += jax.lax.dot_general(
                wj[:], win[:].reshape(k, c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, n_sh * n_sw, strip, 0)

        out = jax.lax.dot_general(
            avg, samp[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, gi] = out.astype(out_ref.dtype)


def _window_prep(features, rois, levels, pooled, s, strides,
                 pad_values: bool = True):
    """Shared host-side prep for the window fwd/bwd kernels: padded level
    geometry, per-RoI strip meta (SMEM) and sample coords (VMEM).
    `features` entries need only carry .shape when pad_values=False (the
    backward uses geometry only; feats_pad is returned as None)."""
    ps = pooled * s
    assert s in (1, 2, 4), s  # shift-based sub-bin indexing
    bsz, r_n = rois.shape[:2]
    n = bsz * r_n
    rois_f = rois.reshape(n, 4)
    lev_f = levels.reshape(n).astype(jnp.int32)

    # shared window: sized for the largest level, floored so tiny test
    # pyramids stay cheap; wwl must be a pow2 > 8 (lane-shift indexing)
    h2, w2 = features[0].shape[1:3]
    whl = min(32, max(8, _round_up(h2, 8)))
    wwl = min(64, max(16, _pow2_ge(min(w2 + 8, 64))))
    psb = max(8, _pow2_ge(ps))

    feats_pad, geom = [], []
    for f in features:
        _, hl, wl, _ = f.shape
        hl_pad = max(whl, _round_up(hl, 8))
        wl_pad = max(wwl, _round_up(wl, 8))
        if pad_values:
            if (hl_pad, wl_pad) != (hl, wl):
                f = jnp.pad(
                    f, ((0, 0), (0, hl_pad - hl), (0, wl_pad - wl), (0, 0))
                )
            feats_pad.append(f)
        geom.append((hl, wl, hl_pad, wl_pad))
    if not pad_values:
        feats_pad = None
    geom_arr = jnp.asarray(geom, jnp.int32)  # (4, 4)

    # per-level sample coords, then select each RoI's assigned level
    sy_l, sx_l = [], []
    for stride in strides:
        y, x = _sample_coords(rois_f * (1.0 / stride), 1.0, pooled, s)
        sy_l.append(y[:, :, 0, :, 0].reshape(n, ps))
        sx_l.append(x[:, 0, :, 0, :].reshape(n, ps))
    lev_ix = lev_f[None, :, None]  # (1, n, 1)
    sy = jnp.take_along_axis(jnp.stack(sy_l), lev_ix, axis=0)[0]  # (n, ps)
    sx = jnp.take_along_axis(jnp.stack(sx_l), lev_ix, axis=0)[0]
    hl_r = geom_arr[lev_f, 0]
    wl_r = geom_arr[lev_f, 1]
    hlp_r = geom_arr[lev_f, 2]
    wlp_r = geom_arr[lev_f, 3]

    cy = jnp.clip(sy, 0.0, (hl_r - 1).astype(jnp.float32)[:, None])
    cx = jnp.clip(sx, 0.0, (wl_r - 1).astype(jnp.float32)[:, None])
    row0 = jnp.floor(jnp.min(cy, axis=1)).astype(jnp.int32)
    rhi = jnp.ceil(jnp.max(cy, axis=1)).astype(jnp.int32)
    col0 = jnp.floor(jnp.min(cx, axis=1)).astype(jnp.int32)
    chi = jnp.ceil(jnp.max(cx, axis=1)).astype(jnp.int32)
    n_sh = (rhi - row0) // whl + 1
    n_sw = (chi - col0) // (wwl - 8) + 1
    zero = jnp.zeros_like(lev_f)
    meta = jnp.stack(
        [lev_f, row0, col0, n_sh, n_sw, hl_r, wl_r, hlp_r, wlp_r,
         zero, zero, zero, zero, zero, zero, zero], axis=1,
    ).reshape(bsz, r_n, 1, 16)
    syx = jnp.stack([sy, sx], axis=1)
    syx = jnp.pad(syx, ((0, 0), (0, 0), (0, psb - ps)),
                  constant_values=-1e9)
    syx = syx.reshape(bsz, r_n, 2, psb)

    # RoIs per program: amortize fixed per-program overhead
    g_rois = next(g for g in (8, 4, 2, 1) if r_n % g == 0)
    return feats_pad, geom, meta, syx, whl, wwl, psb, g_rois


@functools.partial(
    jax.jit, static_argnames=("pooled", "sampling_ratio", "strides")
)
def fpn_roi_align_window(
    features: tuple[jnp.ndarray, ...],
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
) -> jnp.ndarray:
    """Batched fused FPN ROIAlign via the window kernel.

    Same semantics/returns as `roi_align.fpn_roi_align_batched` (forward
    only — `fpn_roi_align_window_bwd` below is its gradient twin). One
    pallas_call for the whole pyramid: small levels are zero-padded up to
    the shared (whl, wwl) window (their out-of-level cells get zero hat
    weight, so padding never changes values).
    """
    s = sampling_ratio
    ps = pooled * s
    bsz, r_n = rois.shape[:2]
    c = features[0].shape[-1]
    feats_pad, _, meta, syx, whl, wwl, psb, g_rois = _window_prep(
        features, rois, levels, pooled, s, strides
    )
    log2w = wwl.bit_length() - 1
    pq_pad = _round_up(pooled * pooled, 8)
    m = ps * psb
    kernel = functools.partial(
        _window_kernel, whl=whl, wwl=wwl, log2w=log2w, ps=ps, psb=psb,
        pooled=pooled, s=s, g_rois=g_rois,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, r_n // g_rois),
        in_specs=[
            pl.BlockSpec((1, g_rois, 1, 16), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g_rois, 2, psb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, g_rois, pq_pad, c), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, r_n, pq_pad, c), features[0].dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((whl, wwl, c), features[0].dtype),
            pltpu.VMEM((m, whl * wwl), features[0].dtype),
            pltpu.VMEM((m, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, syx, *feats_pad)
    out = out[:, :, : pooled * pooled]
    return out.reshape(bsz, r_n, pooled, pooled, c)


def _window_bwd_kernel(meta_ref, syx_ref, g_ref, z2, z3, z4, z5,
                       o2, o3, o4, o5, win, wg, sem, *, whl: int, wwl: int,
                       log2w: int, ps: int, psb: int, pooled: int, s: int,
                       g_rois: int):
    """Gradient twin of `_window_kernel`: per strip, the (k, c) window
    gradient is ONE transposed hat matmul  wj^T (k, m) @ gsamp (m, c)
    and is accumulated into the per-level f32 grad canvas in HBM by a
    read-modify-write window DMA. TPU grid programs run sequentially on
    the core and every write DMA is waited on before the next read of a
    possibly-overlapping window starts, so the RMW is race-free. This
    replaces the dense-matmul backward (`roi_align._fpn_roi_align_bwd`)
    whose full-canvas (H, C, W) scan accumulator — not its FLOPs — was
    the measured floor (~194 ms @ 512 RoIs, STATUS.md r2).
    """
    del z2, z3, z4, z5  # aliased with o2..o5; zero-filled by the caller
    b_idx = pl.program_id(0)
    k = whl * wwl
    m = ps * psb
    c = win.shape[-1]
    pq_pad = g_ref.shape[2]
    outs = (o2, o3, o4, o5)

    lane = jax.lax.broadcasted_iota(jnp.int32, (psb, k), 1)
    h_of = lane >> log2w
    w_of = lane & (wwl - 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (psb, 1), 0)
    eff_w = wwl - 8

    # transposed bin-average operator: avg_t[(i, j), (p, q)] (m, pq_pad),
    # same membership condition as the forward's avg
    log2psb = psb.bit_length() - 1
    log2s = s.bit_length() - 1
    r_i = jax.lax.broadcasted_iota(jnp.int32, (m, pq_pad), 0)
    b_i = jax.lax.broadcasted_iota(jnp.int32, (m, pq_pad), 1)
    i_of = r_i >> log2psb
    j_of = r_i & (psb - 1)
    p_of = jnp.floor(
        b_i.astype(jnp.float32) * (1.0 / pooled)
    ).astype(jnp.int32)
    q_of = b_i - p_of * pooled
    avg_t = jnp.where(
        ((i_of >> log2s) == p_of) & ((j_of >> log2s) == q_of)
        & (j_of < ps) & (b_i < pooled * pooled),
        1.0 / (s * s), 0.0,
    )

    for gi in range(g_rois):
        lev = meta_ref[0, gi, 0, 0]
        row0 = meta_ref[0, gi, 0, 1]
        col0 = meta_ref[0, gi, 0, 2]
        n_sh = meta_ref[0, gi, 0, 3]
        n_sw = meta_ref[0, gi, 0, 4]
        hl = meta_ref[0, gi, 0, 5]
        wl = meta_ref[0, gi, 0, 6]
        hl_pad = meta_ref[0, gi, 0, 7]
        wl_pad = meta_ref[0, gi, 0, 8]

        # per-sample grad rows: gsamp (m, c) = avg_t @ g[gi]
        gsamp = jax.lax.dot_general(
            avg_t, g_ref[0, gi].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        sy_col = jnp.transpose(syx_ref[0, gi, 0:1, :])
        sx_col = jnp.transpose(syx_ref[0, gi, 1:2, :])
        hlf = hl.astype(jnp.float32)
        wlf = wl.astype(jnp.float32)
        in_y = (sy_col >= -1.0) & (sy_col <= hlf) & (row_i < ps)
        in_x = (sx_col >= -1.0) & (sx_col <= wlf) & (row_i < ps)
        cy = jnp.clip(sy_col, 0.0, hlf - 1.0)
        cx = jnp.clip(sx_col, 0.0, wlf - 1.0)

        def strip(s_idx, carry):
            sh = s_idx // n_sw
            sw = s_idx - sh * n_sw
            s0 = row0 + sh * whl
            s0c = jnp.minimum(s0, hl_pad - whl)
            c0 = col0 + sw * eff_w
            c0a = (jnp.minimum(c0, wl_pad - wwl) // 8) * 8
            # read current window of the grad canvas (f32 RMW)
            for l in range(4):
                @pl.when(lev == l)
                def _read(l=l):
                    pltpu.make_async_copy(
                        outs[l].at[b_idx, pl.ds(s0c, whl), pl.ds(c0a, wwl)],
                        win, sem,
                    ).start()
            cell_h = s0c + h_of
            cell_w = c0a + w_of
            vy = jnp.maximum(
                1.0 - jnp.abs(cy - cell_h.astype(jnp.float32)), 0.0
            )
            vy = jnp.where(in_y & (cell_h >= s0), vy, 0.0)  # (psb, k)
            vx = jnp.maximum(
                1.0 - jnp.abs(cx - cell_w.astype(jnp.float32)), 0.0
            )
            vx = jnp.where(
                in_x & (cell_w >= c0) & (cell_w < c0 + eff_w), vx, 0.0
            )
            # joint hat block (same build as the forward), then ONE
            # transposed matmul: wg (k, c) = wj^T (k, m) @ gsamp (m, c)
            for i in range(ps):
                wg[i * psb:(i + 1) * psb, :] = (vx * vy[i:i + 1, :]).astype(
                    wg.dtype
                )
            pltpu.make_async_copy(
                outs[0].at[b_idx, pl.ds(0, whl), pl.ds(0, wwl)], win, sem
            ).wait()
            win[...] += jax.lax.dot_general(
                wg[:], gsamp,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(whl, wwl, c)
            for l in range(4):
                @pl.when(lev == l)
                def _write(l=l):
                    pltpu.make_async_copy(
                        win,
                        outs[l].at[b_idx, pl.ds(s0c, whl), pl.ds(c0a, wwl)],
                        sem,
                    ).start()
            # wait before the next (possibly overlapping) strip/RoI reads
            pltpu.make_async_copy(
                win, outs[0].at[b_idx, pl.ds(0, whl), pl.ds(0, wwl)], sem
            ).wait()
            return carry

        jax.lax.fori_loop(0, n_sh * n_sw, strip, 0)


@functools.partial(
    jax.jit,
    static_argnames=("shapes", "dtypes", "pooled", "sampling_ratio",
                     "strides"),
)
def fpn_roi_align_window_bwd(
    shapes: tuple,   # ((B, H, W, C), ...) per level
    dtypes: tuple,   # per-level feature dtypes
    rois: jnp.ndarray,
    levels: jnp.ndarray,
    g: jnp.ndarray,  # (B, R, P, P, C) upstream grad
    pooled: int = 7,
    sampling_ratio: int = 2,
    strides: tuple[int, ...] = FPN_STRIDES[:4],
) -> tuple[jnp.ndarray, ...]:
    """grad wrt the feature pyramid for `fpn_roi_align_window`.

    Numerically equivalent to `roi_align._fpn_roi_align_bwd` (asserted in
    tests); `shapes`/`dtypes` describe the pyramid (values not needed).
    """
    s = sampling_ratio
    ps = pooled * s
    bsz, r_n = rois.shape[:2]
    c = shapes[0][-1]
    phantom = tuple(jax.ShapeDtypeStruct(sh, dt)
                    for sh, dt in zip(shapes, dtypes))
    _, geom, meta, syx, whl, wwl, psb, g_rois = _window_prep(
        phantom, rois, levels, pooled, s, strides, pad_values=False
    )
    log2w = wwl.bit_length() - 1
    pq_pad = _round_up(pooled * pooled, 8)
    m = ps * psb

    gq = g.reshape(bsz, r_n, pooled * pooled, c)
    if pq_pad != pooled * pooled:
        gq = jnp.pad(gq, ((0, 0), (0, 0), (0, pq_pad - pooled * pooled),
                          (0, 0)))

    zeros = [
        jnp.zeros((bsz, hp, wp, c), jnp.float32) for (_, _, hp, wp) in geom
    ]
    kernel = functools.partial(
        _window_bwd_kernel, whl=whl, wwl=wwl, log2w=log2w, ps=ps, psb=psb,
        pooled=pooled, s=s, g_rois=g_rois,
    )
    grads = pl.pallas_call(
        kernel,
        grid=(bsz, r_n // g_rois),
        in_specs=[
            pl.BlockSpec((1, g_rois, 1, 16), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g_rois, 2, psb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rois, pq_pad, c),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(z.shape, jnp.float32) for z in zeros
        ),
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        scratch_shapes=[
            pltpu.VMEM((whl, wwl, c), jnp.float32),
            pltpu.VMEM((m, whl * wwl), jnp.dtype(dtypes[0])),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, syx, gq, *zeros)
    return tuple(
        gl[:, :hl, :wl].astype(dt)
        for gl, (hl, wl, _, _), dt in zip(grads, geom, dtypes)
    )
