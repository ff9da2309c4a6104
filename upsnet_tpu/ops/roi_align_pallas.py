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

Level routing: one pallas_call per FPN level over all RoIs; programs
whose RoI is assigned elsewhere skip the DMA/compute and emit zeros,
and the four per-level outputs are summed (masking is exclusive).
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


def _win_dims(hl: int, wl: int) -> tuple[int, int, int]:
    """Per-level (window rows, window cols, padded width).

    Window cols: largest power of two <= min(wl_pad, 64) — the lane-shift
    cell indexing and the (WH, WW, C) -> (WH*WW, C) sublane merge need a
    pow2, %8 width. The feature W is padded to a multiple of 8 so every
    8-aligned DMA column start stays in bounds; wwl > 8 keeps the logical
    strip width (wwl - 8) positive.
    """
    assert wl >= 9, wl
    wl_pad = _round_up(wl, 8)
    wwl = min(64, 1 << (wl_pad.bit_length() - 1))
    assert wwl > 8 and wl_pad >= wwl and (wl_pad - wwl) % 8 == 0
    return min(32, hl), wwl, wl_pad


def _window_kernel(meta_ref, syx_ref, x_hbm, out_ref, win, wj, samp, sem, *,
                   hl: int, wl: int, wl_pad: int, whl: int, wwl: int,
                   log2w: int, ps: int, psb: int, pooled: int, s: int):
    """One (batch, roi) program."""
    b_idx = pl.program_id(0)
    k = whl * wwl
    m = ps * psb
    c = win.shape[-1]
    pq_pad = out_ref.shape[2]

    live = meta_ref[0, 0, 0, 0]
    row0 = meta_ref[0, 0, 0, 1]
    col0 = meta_ref[0, 0, 0, 2]
    n_sh = meta_ref[0, 0, 0, 3]
    n_sw = meta_ref[0, 0, 0, 4]

    samp[...] = jnp.zeros((m, c), jnp.float32)

    @pl.when(live == 1)
    def _compute():
        # sample coords as (PSB, 1) columns (host-padded to psb with -1e9;
        # pad rows also masked below via row_i < ps)
        sy_col = jnp.transpose(syx_ref[0, 0, 0:1, :])
        sx_col = jnp.transpose(syx_ref[0, 0, 1:2, :])
        row_i = jax.lax.broadcasted_iota(jnp.int32, (psb, 1), 0)
        in_y = (sy_col >= -1.0) & (sy_col <= float(hl)) & (row_i < ps)
        in_x = (sx_col >= -1.0) & (sx_col <= float(wl)) & (row_i < ps)
        cy = jnp.clip(sy_col, 0.0, float(hl - 1))
        cx = jnp.clip(sx_col, 0.0, float(wl - 1))

        lane = jax.lax.broadcasted_iota(jnp.int32, (psb, k), 1)
        h_of = lane >> log2w
        w_of = lane & (wwl - 1)

        eff_w = wwl - 8  # logical strip width; see alignment note below

        def strip(s_idx, carry):
            sh = s_idx // n_sw
            sw = s_idx - sh * n_sw
            s0 = row0 + sh * whl
            s0c = jnp.minimum(s0, hl - whl)
            c0 = col0 + sw * eff_w
            # the W dim is sublane-tiled in HBM, so the DMA column start
            # must be 8-aligned: floor-align and keep the logical strip 8
            # cells narrower than the window so alignment never uncovers
            # logical cells (wl_pad and wl_pad - wwl are multiples of 8)
            c0a = (jnp.minimum(c0, wl_pad - wwl) // 8) * 8
            dma = pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(s0c, whl), pl.ds(c0a, wwl)], win, sem
            )
            dma.start()
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
            dma.wait()
            samp[...] += jax.lax.dot_general(
                wj[:], win[:].reshape(k, c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, n_sh * n_sw, strip, 0)

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
    a = jnp.where(
        ((i_of >> log2s) == p_of) & ((j_of >> log2s) == q_of)
        & (j_of < ps) & (b_i < pooled * pooled),
        1.0 / (s * s), 0.0,
    )
    out = jax.lax.dot_general(
        a.astype(samp.dtype), samp[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _level_call(x, syx, meta, wl: int, pooled: int, s: int):
    """x (B, Hl, Wl_pad, C); syx (B, R, 2, PSB) f32; meta (B, R, 1, 8)
    int32; wl = semantic (unpadded) level width."""
    b, hl, wl_pad, c = x.shape
    r_n = syx.shape[1]
    ps = pooled * s
    assert s in (1, 2, 4), s  # shift-based sub-bin indexing
    psb = max(8, _pow2_ge(ps))
    assert syx.shape[-1] == psb, (syx.shape, psb)
    whl, wwl, wl_pad2 = _win_dims(hl, wl)
    assert wl_pad2 == wl_pad, (wl_pad2, wl_pad)
    log2w = wwl.bit_length() - 1
    m = ps * psb
    pq_pad = _round_up(pooled * pooled, 8)

    kernel = functools.partial(
        _window_kernel, hl=hl, wl=wl, wl_pad=wl_pad, whl=whl, wwl=wwl,
        log2w=log2w, ps=ps, psb=psb, pooled=pooled, s=s,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, r_n),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2, psb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, pq_pad, c), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_n, pq_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((whl, wwl, c), x.dtype),
            pltpu.VMEM((m, whl * wwl), x.dtype),
            pltpu.VMEM((m, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, syx, x)


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
    only — the dense custom VJP handles gradients).
    """
    if any(f.shape[2] < 9 for f in features):
        # degenerate pyramid (tiny test configs: P5 can be 4x4) — the
        # window/strip machinery needs >= 9 columns; use the gather impl
        from upsnet_tpu.ops.roi_align import _fpn_roi_align_batched_impl

        return _fpn_roi_align_batched_impl(
            features, rois, levels, pooled, sampling_ratio, strides, 1024
        )
    s = sampling_ratio
    ps = pooled * s
    bsz, r_n = rois.shape[:2]
    n = bsz * r_n
    rois_f = rois.reshape(n, 4)
    lev_f = levels.reshape(n).astype(jnp.int32)

    out = None
    for l, (f, stride) in enumerate(zip(features, strides)):
        _, hl, wl, _ = f.shape
        whl, wwl, wl_pad = _win_dims(hl, wl)
        if wl_pad != wl:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, wl_pad - wl), (0, 0)))
        y, x = _sample_coords(rois_f * (1.0 / stride), 1.0, pooled, s)
        sy = y[:, :, 0, :, 0].reshape(n, ps)
        sx = x[:, 0, :, 0, :].reshape(n, ps)
        live = (lev_f == l).astype(jnp.int32)
        cy = jnp.clip(sy, 0.0, float(hl - 1))
        cx = jnp.clip(sx, 0.0, float(wl - 1))
        row0 = jnp.floor(jnp.min(cy, axis=1)).astype(jnp.int32)
        rhi = jnp.ceil(jnp.max(cy, axis=1)).astype(jnp.int32)
        col0 = jnp.floor(jnp.min(cx, axis=1)).astype(jnp.int32)
        chi = jnp.ceil(jnp.max(cx, axis=1)).astype(jnp.int32)
        n_sh = (rhi - row0) // whl + 1
        n_sw = (chi - col0) // (wwl - 8) + 1
        zero = jnp.zeros_like(live)
        meta = jnp.stack(
            [live, row0, col0, n_sh * live, n_sw * live,
             zero, zero, zero], axis=1,
        ).reshape(bsz, r_n, 1, 8)
        psb = max(8, _pow2_ge(ps))
        syx = jnp.stack([sy, sx], axis=1)
        syx = jnp.pad(syx, ((0, 0), (0, 0), (0, psb - ps)),
                      constant_values=-1e9)
        syx = syx.reshape(bsz, r_n, 2, psb)
        o = _level_call(f, syx, meta, wl, pooled, s)
        out = o if out is None else out + o
    out = out[:, :, : pooled * pooled]
    return out.reshape(bsz, r_n, pooled, pooled, features[0].shape[-1])
