"""Shift-based deformable sampling kernels (round-3 speed-of-light rewrite).

STATUS: FROZEN / EXPERIMENTAL (VERDICT r3 #8). Opt-in via
``network.dcn_impl: shift`` only — never the routed default. Measured
(r3, b8 P2-scale): ties the hat-matmul kernels of
``deform_conv_pallas.py`` at trained/smooth offsets and collapses at
random ±max_dy offset fields, so it wins nowhere the router could pick
it. Kept because its live-(a,s)-skip VPU-FMA design is the natural next
step if hat-matmul issue overhead ever dominates again; do not extend it
without a routed-win benchmark.

Replaces: uber-research/UPSNet ``upsnet/operators/src/deform_conv/``
deformable_im2col fwd + the three backward CUDA kernels (SURVEY.md §2.1)
— as an alternative formulation to the hat-matmul kernels in
``deform_conv_pallas.py`` (which remain the default route).

Why shifts instead of hat matmuls
---------------------------------
Every hat-matmul formulation contracts a (Wp, W) horizontal-hat operand
with ≤ 2 nonzeros per column — the MXU does Wp/2 ≈ 200x redundant FLOPs
and, worse, the cost is paid per (row, candidate) as thousands of thin
matmuls whose issue overhead dominates (measured ~10-20% MFU). The
bilinear sample is really

    out[i, j] = Σ_a Σ_s  vy(i,j,a) · hx(i,j,s) · y[i + a - r - 1, j + s]

with `a` a small set of vertical candidates and `s` a small set of
horizontal SHIFTS — and a shifted read of a (rows, W, C) tile is a free
sublane-offset slice on TPU. So the kernel does one fused-multiply-add of
the whole (rb, W, C) row-block per live (tap, a, s) triple, on the VPU,
with zero redundant FLOPs:

    acc += coef(rb, W, 1) * win[a : a + rb, pad_l + s : pad_l + s + W, tap]

Cost model (b8 P2 208x336x128, 9 taps): at trained offsets (|off| ~ 2 px,
spatially smooth) ~3x3 live (a, s) pairs/tap -> ~12 GFLOP of VPU FMAs per
layer ≈ 6-15 ms, vs 60-90 ms for the hat-matmul kernels. Worst case
(random ±6 px fields) the per-block live ranges widen to the full window
and the cost approaches the hat-matmul kernels' — bounded, not
catastrophic. Dead (a, s) pairs skip via @pl.when on max(coef) (a scalar
VPU reduce), so constant-offset fields run exactly the 4 bilinear-corner
FMAs per tap.

All 9 taps are processed in ONE kernel invocation (tap-major lane blocks
of the project-first output), amortizing the per-program fixed cost
(~16 us) that made the per-tap kernels dispatch-bound.

Backward = two gather-style passes, NO read-modify-write canvas:
  * grad-to-input is computed by the ADJOINT kernel — for a source row
    block, gather the contributions of every output pixel whose hats
    reach it (the window structure is symmetric) and write each f32
    VMEM-accumulated block exactly once. This removes the round-2/3
    RMW-canvas (sequential-grid hazard + a full f32 HBM canvas).
  * offset grads (gsy, gsx) come from a forward-oriented pass using
    d/dy hat = -sign (zero at the peak), matching the reference CUDA
    backward's subgradient convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_rb(h: int) -> int | None:
    for cand in (16, 8):
        if h % cand == 0:
            return cand
    return None


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _shift_fwd_kernel(sy_ref, sx_ref, y_hbm, out_ref, win, acc, sem, *,
                      h: int, w: int, wp: int, c: int, k: int, r: int,
                      pad_l: int, rb: int):
    """One (batch, row-block) program; all k taps.

    sy_ref/sx_ref: (k, 1, rb, w) f32 absolute sample coords per tap.
    y_hbm: (B, Hpad, Wp, k*c) projected tap values (tap-major lane blocks).
    win: (rb + 2r + 2, Wp, k*c) VMEM halo window; acc: (rb, w, c) f32.
    """
    b_idx = pl.program_id(0)
    rb_idx = pl.program_id(1)
    i0 = rb_idx * rb
    a_n = 2 * r + 3
    win_rows = rb + 2 * r + 2

    dma = pltpu.make_async_copy(
        y_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()

    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0).astype(jnp.float32)
        + jnp.float32(i0)
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1).astype(
        jnp.float32
    )

    acc[...] = jnp.zeros_like(acc)
    dma.wait()

    # Dynamic (unaligned) sublane slicing is not expressible on TPU, so the
    # shift loop is a STATIC unroll over the reachable window with a scalar
    # liveness guard per shift — only the ~2-3 live shifts do any work.
    s_hi_static = min(pad_l - 1, wp - w - pad_l)
    for tap in range(k):
        sy_t = sy_ref[tap, 0]  # (rb, w)
        sx_t = sx_ref[tap, 0]
        inside = (
            (sy_t > -1.0) & (sy_t < float(h))
            & (sx_t > -1.0) & (sx_t < float(w))
        ).astype(jnp.float32)
        a_f = sy_t - rows + (r + 1.0)  # vy = hat(a_f - a)
        d = sx_t - cols                # hx = hat(d - s)
        a_lo = jnp.clip(jnp.floor(jnp.min(a_f)).astype(jnp.int32), 0, a_n - 1)
        a_hi = jnp.clip(jnp.ceil(jnp.max(a_f)).astype(jnp.int32), 0, a_n - 1)
        d_lo = jnp.floor(jnp.min(d))
        d_hi = jnp.ceil(jnp.max(d))

        def body_a(a, _, a_f=a_f, d=d, inside=inside, d_lo=d_lo, d_hi=d_hi,
                   tap=tap):
            vy = jnp.maximum(1.0 - jnp.abs(a_f - a.astype(jnp.float32)), 0.0)
            vy = vy * inside

            @pl.when(jnp.max(vy) > 0.0)
            def _():
                for s in range(-(pad_l - 1), s_hi_static + 1):

                    @pl.when((d_lo <= float(s)) & (float(s) <= d_hi))
                    def _(s=s):
                        coef = vy * jnp.maximum(
                            1.0 - jnp.abs(d - float(s)), 0.0
                        )

                        @pl.when(jnp.max(coef) > 0.0)
                        def _():
                            slab = win[
                                pl.ds(a, rb), pad_l + s:pad_l + s + w,
                                tap * c:(tap + 1) * c,
                            ]
                            acc[...] += (
                                coef[..., None] * slab.astype(jnp.float32)
                            )

            return 0

        jax.lax.fori_loop(a_lo, a_hi + 1, body_a, 0)

    out_ref[0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "pad_l"))
def _shift_fwd(y_pad, sy, sx, r: int, pad_l: int):
    k, b, h, w = sy.shape
    _, hpad, wp, kc = y_pad.shape
    c = kc // k
    rb = _pick_rb(h)
    n_blocks = h // rb
    win_rows = rb + 2 * r + 2

    kernel = functools.partial(
        _shift_fwd_kernel, h=h, w=w, wp=wp, c=c, k=k, r=r, pad_l=pad_l, rb=rb
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # y_pad stays in HBM
        ],
        out_specs=pl.BlockSpec((1, rb, w, c), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, kc), y_pad.dtype),
            pltpu.VMEM((rb, w, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(sy, sx, y_pad)


# --------------------------------------------------------------------------
# backward 1: adjoint (grad to y_pad) — gather formulation, no RMW canvas
# --------------------------------------------------------------------------


def _shift_adj_kernel(fld_hbm, g_hbm, gy_ref, gwin, fwin, acc, sem, sem2, *,
                      wp: int, w: int, c: int, k: int, r: int, pad_l: int,
                      pad_gc: int, rb: int):
    """One (batch, source-row-block, tap) program.

    Source position (R, C) of y_pad receives from output pixel
    (i = R - 1 - a, j = C - pad_l - s):

        gy[R, C] = Σ_a Σ_s hat(e(i,j) + r + 1 - a) · hat(dxf(i,j) - s)
                           · m(i,j) · g[i, j]

    where e = sy - i (the dy field), dxf = sx - j, m the inside mask —
    all precomputed per tap and padded so that, in padded-g coordinates
    (row' = i + 2r + 3, col' = j + pad_gc), the window for a source block
    [R0, R0+rb) is rows [R0, R0 + rb + 2r + 2) and the slab for (a, s)
    starts at row offset (2r + 2 - a), column (pad_gc - pad_l - s).

    fld_hbm: (k, 3, B, Hg, Wg) f32 — planes (e, dxf, m); masked pixels
    carry e = dxf = 0 (inside the live range — the mask plane kills their
    contribution without poisoning the min/max range computation).
    g_hbm: (B, Hg, Wg, C) output cotangent, padded the same way.
    gy_ref out block: (1, rb, wp, c) for this tap.
    """
    b_idx = pl.program_id(0)
    rb_idx = pl.program_id(1)
    tap = pl.program_id(2)
    r0 = rb_idx * rb
    a_n = 2 * r + 3
    win_rows = rb + 2 * r + 2

    # g window is tap-independent: fetch once per (batch, row-block)
    @pl.when(tap == 0)
    def _():
        dma_g = pltpu.make_async_copy(
            g_hbm.at[b_idx, pl.ds(r0, win_rows)], gwin, sem
        )
        dma_g.start()
        dma_g.wait()

    dma_f = pltpu.make_async_copy(
        fld_hbm.at[tap, :, b_idx, pl.ds(r0, win_rows)], fwin, sem2
    )
    dma_f.start()
    acc[...] = jnp.zeros_like(acc)
    dma_f.wait()

    # live ranges from the windowed fields (masked pixels carry e=dxf=0,
    # inside the ranges, so they never widen them)
    e_min, e_max = jnp.min(fwin[0]), jnp.max(fwin[0])
    d_min, d_max = jnp.min(fwin[1]), jnp.max(fwin[1])
    # vy = hat(e + r + 1 - a) alive iff a in (e + r, e + r + 2)
    a_lo = jnp.clip(jnp.floor(e_min + r).astype(jnp.int32), 0, a_n - 1)
    a_hi = jnp.clip(jnp.ceil(e_max + r + 2.0).astype(jnp.int32), 0, a_n - 1)

    # static shift unroll: lane (column) slice offsets must be static on
    # TPU, so s runs over the full static window with a scalar liveness
    # guard per s (dead shifts skip even the coefficient build)
    # |dxf| <= dx_eff + something < pad_l - 1 by the wrapper's clipping, so
    # hx can only be nonzero for |s| <= pad_l - 1; col0 then stays inside
    # [1, 2*pad_l - 1] ⊆ [0, wg - wp] by construction of wg
    s_left, s_right = -(pad_l - 1), pad_l - 1

    # the candidate loop is ALSO a static unroll: fwin row slices land on
    # the sublane dim, where only static (or 8-aligned) offsets lower
    for a in range(a_n):
        row0 = 2 * r + 2 - a
        af = float(r + 1 - a)

        @pl.when((a_lo <= a) & (a <= a_hi))
        def _(a=a, row0=row0, af=af):
            e_s = fwin[0, row0:row0 + rb, :]   # (rb, Wg)
            m_s = fwin[2, row0:row0 + rb, :]
            vy_full = jnp.maximum(1.0 - jnp.abs(e_s + af), 0.0) * m_s

            @pl.when(jnp.max(vy_full) > 0.0)
            def _():
                for s in range(s_left, s_right + 1):
                    col0 = pad_gc - pad_l - s

                    @pl.when(
                        (jnp.floor(d_min) <= float(s))
                        & (float(s) <= jnp.ceil(d_max))
                    )
                    def _(s=s, col0=col0, row0=row0, vy_full=vy_full):
                        dx_s = fwin[1, row0:row0 + rb, col0:col0 + wp]
                        vy = vy_full[:, col0:col0 + wp]
                        coef = vy * jnp.maximum(
                            1.0 - jnp.abs(dx_s - float(s)), 0.0
                        )

                        @pl.when(jnp.max(coef) > 0.0)
                        def _():
                            slab = gwin[row0:row0 + rb, col0:col0 + wp, :]
                            acc[...] += (
                                coef[..., None] * slab.astype(jnp.float32)
                            )

    gy_ref[0] = acc[...].astype(gy_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "pad_l", "hpad", "wp"))
def _shift_adjoint(g, sy, sx, r: int, pad_l: int, hpad: int, wp: int):
    """grad wrt y_pad: (B, Hpad, Wp, k*c), from cotangent g (B, H, W, c)."""
    k, b, h, w = sy.shape
    c = g.shape[-1]
    rb = _pick_rb(hpad)
    assert rb is not None, hpad
    n_blocks = hpad // rb
    win_rows = rb + 2 * r + 2
    a_n = 2 * r + 3

    # fields at the output grid, then pad into adjoint coordinates
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    inside = (
        (sy > -1.0) & (sy < float(h)) & (sx > -1.0) & (sx < float(w))
    )
    e = jnp.where(inside, sy - iy, 0.0)
    dxf = jnp.where(inside, sx - ix, 0.0)
    m = inside.astype(jnp.float32)
    fld = jnp.stack([e, dxf, m], axis=1)  # (k, 3, b, h, w)

    pad_gc = 2 * pad_l
    wg = _round_up(wp + 2 * pad_l, 128)
    # padded-g row' = i + (2r + 3); need rows [0, hpad - 1 + win_rows)
    top = a_n
    bottom = max(hpad + win_rows - top - h, 0)
    right = wg - pad_gc - w
    fld_pad = jnp.pad(
        fld, ((0, 0), (0, 0), (0, 0), (top, bottom), (pad_gc, right))
    )
    g_pad = jnp.pad(g, ((0, 0), (top, bottom), (pad_gc, right), (0, 0)))

    kernel = functools.partial(
        _shift_adj_kernel, wp=wp, w=w, c=c, k=k, r=r, pad_l=pad_l,
        pad_gc=pad_gc, rb=rb,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks, k),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # fld_pad
            pl.BlockSpec(memory_space=pl.ANY),  # g_pad
        ],
        out_specs=pl.BlockSpec(
            (1, rb, wp, c), lambda bi, ri, ti: (bi, ri, 0, ti),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hpad, wp, k * c), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wg, c), g.dtype),
            pltpu.VMEM((3, win_rows, wg), jnp.float32),
            pltpu.VMEM((rb, wp, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(fld_pad, g_pad)


# --------------------------------------------------------------------------
# backward 2: offset gradients (gsy, gsx) — forward-oriented pass
# --------------------------------------------------------------------------


def _shift_off_kernel(sy_ref, sx_ref, g_ref, y_hbm, gsy_ref, gsx_ref, win,
                      gyx, sem, *, h: int, w: int, wp: int, c: int, k: int,
                      r: int, pad_l: int, rb: int):
    """Per (batch, row-block), all k taps: gsy/gsx at every output pixel.

    gsy[i,j] = Σ_a Σ_s dvy · hx · Σ_c win[...] g[i,j,c]
    gsx[i,j] = Σ_a Σ_s vy · dhx · Σ_c win[...] g[i,j,c]

    with dvy = -sign(a_f - a) on |a_f - a| < 1 (sign(0) = 0 — the
    reference CUDA backward's subgradient at the hat peak).
    """
    b_idx = pl.program_id(0)
    rb_idx = pl.program_id(1)
    i0 = rb_idx * rb
    a_n = 2 * r + 3
    win_rows = rb + 2 * r + 2

    dma = pltpu.make_async_copy(
        y_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()

    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0).astype(jnp.float32)
        + jnp.float32(i0)
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1).astype(
        jnp.float32
    )
    dma.wait()

    gf32 = g_ref[0].astype(jnp.float32)  # (rb, w, c)
    s_hi_static = min(pad_l - 1, wp - w - pad_l)

    for tap in range(k):
        sy_t = sy_ref[tap, 0]
        sx_t = sx_ref[tap, 0]
        inside = (
            (sy_t > -1.0) & (sy_t < float(h))
            & (sx_t > -1.0) & (sx_t < float(w))
        ).astype(jnp.float32)
        a_f = sy_t - rows + (r + 1.0)
        d = sx_t - cols
        a_lo = jnp.clip(jnp.floor(jnp.min(a_f)).astype(jnp.int32), 0,
                        a_n - 1)
        a_hi = jnp.clip(jnp.ceil(jnp.max(a_f)).astype(jnp.int32), 0,
                        a_n - 1)
        d_lo = jnp.floor(jnp.min(d))
        d_hi = jnp.ceil(jnp.max(d))

        gyx[...] = jnp.zeros_like(gyx)

        def body_a(a, _, a_f=a_f, d=d, inside=inside, d_lo=d_lo, d_hi=d_hi,
                   tap=tap):
            af_rel = a_f - a.astype(jnp.float32)
            vy = jnp.maximum(1.0 - jnp.abs(af_rel), 0.0) * inside
            dvy = jnp.where(jnp.abs(af_rel) < 1.0, -jnp.sign(af_rel), 0.0)
            dvy = dvy * inside

            @pl.when((jnp.max(vy) > 0.0) | (jnp.max(jnp.abs(dvy)) > 0.0))
            def _():
                for s in range(-(pad_l - 1), s_hi_static + 1):

                    @pl.when((d_lo <= float(s)) & (float(s) <= d_hi))
                    def _(s=s):
                        d_rel = d - float(s)
                        hx = jnp.maximum(1.0 - jnp.abs(d_rel), 0.0)
                        dhx = jnp.where(
                            jnp.abs(d_rel) < 1.0, -jnp.sign(d_rel), 0.0
                        )
                        slab = win[
                            pl.ds(a, rb), pad_l + s:pad_l + s + w,
                            tap * c:(tap + 1) * c,
                        ]
                        p = jnp.sum(slab.astype(jnp.float32) * gf32, axis=-1)
                        gyx[0] += (dvy * hx) * p
                        gyx[1] += (vy * dhx) * p

            return 0

        jax.lax.fori_loop(a_lo, a_hi + 1, body_a, 0)
        gsy_ref[tap, 0] = gyx[0]
        gsx_ref[tap, 0] = gyx[1]


@functools.partial(jax.jit, static_argnames=("r", "pad_l"))
def _shift_offset_grads(y_pad, sy, sx, g, r: int, pad_l: int):
    k, b, h, w = sy.shape
    _, hpad, wp, kc = y_pad.shape
    c = kc // k
    rb = _pick_rb(h)
    n_blocks = h // rb
    win_rows = rb + 2 * r + 2

    kernel = functools.partial(
        _shift_off_kernel, h=h, w=w, wp=wp, c=c, k=k, r=r, pad_l=pad_l, rb=rb
    )
    gsy, gsx = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # y_pad in HBM
        ],
        out_specs=(
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, rb, w), lambda bi, ri: (0, bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((k, b, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, kc), y_pad.dtype),
            pltpu.VMEM((2, rb, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(sy, sx, g, y_pad)
    return gsy, gsx


# --------------------------------------------------------------------------
# custom-VJP sampling op + the conv wrapper
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deform_sample_shift(y_pad, sy, sx, r: int, pad_l: int):
    """Σ_taps bilinear-sample of y_pad (B, Hpad, Wp, k*c) at per-tap coords
    sy/sx (k, B, H, W) -> (B, H, W, c)."""
    return _shift_fwd(y_pad, sy, sx, r, pad_l)


def _dss_fwd(y_pad, sy, sx, r, pad_l):
    return _shift_fwd(y_pad, sy, sx, r, pad_l), (y_pad, sy, sx)


def _dss_bwd(r, pad_l, res, g):
    y_pad, sy, sx = res
    _, hpad, wp, _ = y_pad.shape
    gy = _shift_adjoint(g, sy, sx, r, pad_l, hpad, wp)
    gsy, gsx = _shift_offset_grads(y_pad, sy, sx, g, r, pad_l)
    return gy.astype(y_pad.dtype), gsy.astype(sy.dtype), gsx.astype(sx.dtype)


deform_sample_shift.defvjp(_dss_fwd, _dss_bwd)


def shift_route_ok(shape, cout: int, max_dy: int, max_dx: int,
                   dilation: int, k: int = 9) -> bool:
    """Static eligibility of the shift kernel for this layer shape."""
    b, h, w, cin = shape
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if cout % 128 != 0 or _pick_rb(h) is None:
        return False
    r = max_dy + dilation
    pad_l = max_dx + dilation + 2
    hpad = _round_up(h + 2 * (r + 2), _pick_rb(h))
    if _pick_rb(hpad) is None:
        return False
    rb = 16 if h % 16 == 0 else 8
    wp = _round_up(w + 2 * pad_l, 128)
    win_rows = rb + 2 * r + 2
    # fwd VMEM: full-k window + f32 acc + out block (+ small coord blocks)
    vmem = (
        win_rows * wp * k * cout * 2
        + rb * w * cout * 4
        + rb * w * cout * 2
    )
    return vmem < 56 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "dilation", "max_dy", "max_dx",
                     "boundary_grad"),
)
def deform_conv2d_pallas_shift(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
    dilation: int = 1,
    max_dy: int = 6,
    max_dx: int = 6,
    boundary_grad: str = "clip",
) -> jnp.ndarray:
    """Deformable conv via project-first + the 9-tap shift kernel.

    Exact (vs the unbounded gather path) for |dy| <= max_dy AND
    |dx| <= max_dx; offsets beyond are clipped to the window edge with
    ``boundary_grad`` semantics ('clip' zero / 'straight_through' unit
    gradient at the clamp). The 'auto' wrapper routes out-of-window
    offset fields to the exact gather path at runtime.
    """
    from upsnet_tpu.ops.deform_conv import clip_offsets

    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2
    r_eff = max_dy + dilation
    dx_eff = max_dx + dilation
    pad_rows = r_eff + 2
    pad_l = dx_eff + 2
    rb = _pick_rb(h)
    wp = _round_up(w + 2 * pad_l, 128)
    hpad = _round_up(h + 2 * pad_rows, rb)

    # project-first: one MXU matmul -> (B, H, W, k*cout) tap-major lanes
    wk = jnp.moveaxis(weight, 0, 1).reshape(cin, k * cout).astype(x.dtype)
    y = jnp.dot(x.reshape(-1, cin), wk, preferred_element_type=x.dtype)
    y_pad = jnp.pad(
        y.reshape(b, h, w, k * cout),
        ((0, 0), (pad_rows, hpad - h - pad_rows), (pad_l, wp - w - pad_l),
         (0, 0)),
    )

    off_y = clip_offsets(
        offsets[..., 0::2].astype(jnp.float32), float(max_dy), boundary_grad
    )  # (b, h, w, k)
    off_x = clip_offsets(
        offsets[..., 1::2].astype(jnp.float32), float(max_dx), boundary_grad
    )
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    krow = (jnp.arange(k, dtype=jnp.float32) // kernel_size - half) * dilation
    kcol = (jnp.arange(k, dtype=jnp.float32) % kernel_size - half) * dilation
    sy = jnp.moveaxis(iy + krow + off_y, -1, 0)  # (k, b, h, w)
    sx = jnp.moveaxis(ix + kcol + off_x, -1, 0)

    out = deform_sample_shift(y_pad, sy, sx, r_eff, pad_l)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
