"""Pallas TPU kernel for deformable-conv bilinear sampling.

The performance-critical piece of the semantic head (SURVEY.md §2.1): per
output pixel, a bilinearly-weighted 2x2 fetch at a learned fractional
offset. XLA's gather lowers this to per-row DMAs (~25x off roofline);
``deform_conv2d_mxu`` re-expresses it as dense hat-function matmuls but
streams the hat matrices through HBM. This kernel keeps everything in VMEM
and fuses the whole row computation into ONE systolic-array matmul:

  for each output row i:
    Wmat[j, (a, c)] = hat(sy[i,j] - (i+a)) * hat(sx[i,j] - (c-1)) * inside
    out[i] = Wmat (W, A*Wp) @ X (A*Wp, C)       # A = 2*max_dy+3 candidates

where X is the window of A consecutive (padded) feature rows — a contiguous
VMEM slice. hat(t) = max(0, 1 - |t|) reproduces the two-corner bilinear
weights exactly, so results match the reference kernel whenever every
vertical offset satisfies |dy| <= max_dy (horizontal offsets unrestricted).

Grid: (batch, row blocks of RB=8). The feature map stays in HBM; each
program DMAs its (RB + 2*max_dy + 2)-row halo window once (2.75x overlap).

Backward: jax.custom_vjp with the jnp hat-sampling math as the VJP —
training correctness without a hand-written transpose kernel (forward
dominates the production profile; SURVEY.md §7.3 #3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # output rows per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sample_kernel(sy_ref, syt_ref, sx_ref, y_hbm, out_ref, win, sem, *,
                   h: int, w: int, wp: int, c: int, r: int, rb: int):
    """One (batch, row-block) program — separable-hat formulation.

    Everything is built in "transposed" orientation — weight rows on
    sublanes, output pixels on lanes — so no vector transposes and no
    per-lane dynamic slicing are needed; the MXU contracts over dim 0 of
    both operands.

    The bilinear weight factors as hat(dy) * hat(dx), and the vertical
    factor is constant per output pixel (column of the matmul), so it is
    applied AFTER the matmul: candidate a contributes
    ``vy_a ⊙ (hx^T win[li+a])`` with vy_a a (w, 1) sublane vector (from
    the pre-transposed syt input) broadcast over the c lanes. The hat
    matrix hx (wp, w) is built and cast to bf16 ONCE per row; per
    candidate the VPU does only the (w, c) post-multiply+accumulate —
    ~3x less VPU traffic than folding vy into the matmul operand (the
    round-2 kernel rebuilt and re-cast the (wp, w) operand per
    candidate, which WAS the measured joint-weight-build floor).

    Candidate skip: vertical candidate a contributes iff some pixel of the
    row has |sy - (i + a - (r+1))| < 1, i.e. a lies in the width-2 interval
    (min(sy) - i + r, max(sy) - i + r + 2). The candidate loop runs only
    over that data-dependent integer range (dynamic-bound fori_loop with a
    register accumulator — no per-candidate predicates or scratch
    round-trips). Trained DCN offsets sit near 0 (offset convs are
    zero-init; |dy| <= 2 is typical at 1/4 scale), so typically ~2-4 of
    the a_n = 2*max_dy + 3 candidates run — the same sparsity the
    reference's gather exploits implicitly. Skipping is exact: a skipped
    candidate's vy row is identically zero.
    """
    rb_idx = pl.program_id(1)
    i0 = rb_idx * rb
    a_n = 2 * r + 3
    win_rows = rb + 2 * r + 2

    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        y_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()

    # row q of cols_t holds the column coordinate (q - 1) for all pixels
    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0).astype(jnp.float32)
        - 1.0
    )
    dma.wait()

    for li in range(rb):
        sy_r = sy_ref[0, li:li + 1, :]  # (1, w)
        sx_r = sx_ref[0, li:li + 1, :]
        sy_col = syt_ref[0, 0, :, li:li + 1]  # (w, 1) same values as sy_r
        inside = (
            (sy_r > -1.0) & (sy_r < float(h))
            & (sx_r > -1.0) & (sx_r < float(w))
        )  # (1, w)
        hx = jnp.maximum(1.0 - jnp.abs(sx_r - cols_t), 0.0)  # (wp, w)
        hx = jnp.where(inside, hx, 0.0).astype(win.dtype)
        i_glob = jnp.float32(i0 * 1.0) + li
        base = i_glob - (r + 1.0)  # candidate a samples source row base + a
        # live range: a in (min(sy)-base-1, max(sy)-base+1) as an integer
        # interval -> [floor(min-base), ceil(max-base)] (endpoints with
        # |dy| = 1 exactly have vy = 0; including them is harmless)
        a_lo = jnp.maximum(
            jnp.floor(jnp.min(sy_r) - base).astype(jnp.int32), 0
        )
        a_hi = jnp.minimum(
            jnp.ceil(jnp.max(sy_r) - base).astype(jnp.int32), a_n - 1
        )

        def body(a, acc_v):
            part = jax.lax.dot_general(
                hx, win[pl.dslice(li + a, 1)][0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (w, c)
            vy = jnp.maximum(
                1.0 - jnp.abs(sy_col - (base + a.astype(jnp.float32))), 0.0
            )  # (w, 1), broadcasts over the c lanes
            return acc_v + vy * part

        acc = jax.lax.fori_loop(
            a_lo, a_hi + 1, body, jnp.zeros((w, c), jnp.float32)
        )
        out_ref[0, li] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_dy",))
def _sample_pallas(y_pad, sy, sx, max_dy: int):
    """y_pad (B, Hpad, Wp, C) bf16/f32; sy, sx (B, H, W) f32 sample coords.

    Returns (B, H, W, C) sampled values. Hpad = H + 2*(max_dy + 2); Wp is
    the horizontally padded + 128-aligned width (coordinate of col c is
    c - 1; columns beyond w + 2 are zero and unreachable by hat).
    """
    b, hpad, wp, c = y_pad.shape
    _, h, w = sy.shape
    r = max_dy
    # rows per program: fixed per-program overhead (~16us: DMA issue +
    # scaffolding) dominates this kernel, so take the largest candidate
    # that divides h AND fits the 48MB VMEM check (h=208 flagship: 104
    # usually fails the check at P2 widths, landing on 16; small test
    # shapes keep the RB=8 default)
    rb = RB
    for cand in (104, 16):  # must be %8 (sublane block rule) and divide h
        if h % cand == 0 and h > cand:
            win_b = (cand + 2 * r + 2) * wp * c * y_pad.dtype.itemsize
            out_b = cand * w * c * y_pad.dtype.itemsize
            if win_b + 3 * out_b < 48 * 1024 * 1024:
                rb = cand
                break
    n_blocks = h // rb
    assert h % rb == 0, (h, rb)
    win_rows = rb + 2 * r + 2
    a_n = 2 * r + 3

    # per-block transposed sy: (b, n_blocks, w, rb) so the kernel reads a
    # (w, 1) vertical-hat column per row without an in-kernel transpose
    syt = sy.reshape(b, n_blocks, rb, w).swapaxes(2, 3)

    kernel = functools.partial(
        _sample_kernel, h=h, w=w, wp=wp, c=c, r=r, rb=rb
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rb, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, rb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # y_pad stays in HBM
        ],
        out_specs=pl.BlockSpec((1, rb, w, c), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, c), y_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # v5e VMEM is 128MB
        ),
    )(sy, syt, sx, y_pad)


def _pick_rb(h: int, w: int, wp: int, c: int, r: int, itemsize: int) -> int:
    """Rows per program: fixed per-program overhead (~16us: DMA issue +
    scaffolding) dominates, so take the largest candidate that divides h
    AND fits the 48MB VMEM check (h=208 flagship: 104; small test shapes
    keep the RB=8 default)."""
    rb = RB
    for cand in (104, 16):  # must be %8 (sublane block rule) and divide h
        if h % cand == 0 and h > cand:
            win_b = (cand + 2 * r + 2) * wp * c * itemsize
            out_b = cand * w * c * itemsize
            if win_b + 3 * out_b < 48 * 1024 * 1024:
                rb = cand
                break
    return rb


def _sample9_kernel(sy_ref, syt_ref, sx_ref, y_hbm, out_ref, win, sem, *,
                    h: int, w: int, wp: int, c: int, r: int, rb: int):
    """All-taps fused variant of ``_sample_kernel``: one (batch, row-block,
    tap) program per grid step, taps innermost. The output block's index
    map ignores the tap dim, so Pallas keeps it resident in VMEM across
    the 9 tap steps and writes HBM once — replacing 9 separate pallas
    calls + 8 XLA accumulation ops, which measured ~2.9 ms per call of
    pure scheduling overhead against ~0.5 ms of actual kernel time
    (tools/bench_deform_incontext.py). Per-tap math is identical to
    ``_sample_kernel`` including the bf16 tap-sequential accumulation
    order, so results match the chained form."""
    b_idx = pl.program_id(0)
    rb_idx = pl.program_id(1)
    t_idx = pl.program_id(2)
    i0 = rb_idx * rb
    win_rows = rb + 2 * r + 2
    a_n = 2 * r + 3

    dma = pltpu.make_async_copy(
        y_hbm.at[t_idx, b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()
    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0).astype(jnp.float32)
        - 1.0
    )
    first = t_idx == 0
    dma.wait()

    for li in range(rb):
        sy_r = sy_ref[0, 0, 0, li:li + 1, :]  # (1, w)
        sx_r = sx_ref[0, 0, 0, li:li + 1, :]
        sy_col = syt_ref[0, 0, 0, :, li:li + 1]  # (w, 1)
        inside = (
            (sy_r > -1.0) & (sy_r < float(h))
            & (sx_r > -1.0) & (sx_r < float(w))
        )
        hx = jnp.maximum(1.0 - jnp.abs(sx_r - cols_t), 0.0)
        hx = jnp.where(inside, hx, 0.0).astype(win.dtype)
        i_glob = jnp.float32(i0 * 1.0) + li
        base = i_glob - (r + 1.0)
        a_lo = jnp.maximum(
            jnp.floor(jnp.min(sy_r) - base).astype(jnp.int32), 0
        )
        a_hi = jnp.minimum(
            jnp.ceil(jnp.max(sy_r) - base).astype(jnp.int32), a_n - 1
        )

        def body(a, acc_v):
            part = jax.lax.dot_general(
                hx, win[pl.dslice(li + a, 1)][0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vy = jnp.maximum(
                1.0 - jnp.abs(sy_col - (base + a.astype(jnp.float32))), 0.0
            )
            return acc_v + vy * part

        acc = jax.lax.fori_loop(
            a_lo, a_hi + 1, body, jnp.zeros((w, c), jnp.float32)
        )
        val = acc.astype(out_ref.dtype)

        @pl.when(first)
        def _():
            out_ref[0, li] = val

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, li] = out_ref[0, li] + val


@functools.partial(jax.jit, static_argnames=("max_dy",))
def _sample_pallas9(y_pad9, sy9, sx9, max_dy: int):
    """Fused 9-tap sampling: y_pad9 (9, B, Hpad, Wp, C) tap-major padded
    projections; sy9, sx9 (9, B, H, W) f32 per-tap sample coords. Returns
    the tap-SUM (B, H, W, C) in y dtype (bf16 adds in tap order — the
    same accumulation the chained per-tap form produces)."""
    t_n, b, hpad, wp, c = y_pad9.shape
    _, _, h, w = sy9.shape
    assert t_n == 9
    r = max_dy
    rb = _pick_rb(h, w, wp, c, r, y_pad9.dtype.itemsize)
    n_blocks = h // rb
    win_rows = rb + 2 * r + 2

    syt9 = sy9.reshape(t_n, b, n_blocks, rb, w).swapaxes(3, 4)
    sy9b = sy9.reshape(t_n, b, n_blocks, rb, w)
    sx9b = sx9.reshape(t_n, b, n_blocks, rb, w)

    kernel = functools.partial(
        _sample9_kernel, h=h, w=w, wp=wp, c=c, r=r, rb=rb
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks, t_n),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rb, w),
                         lambda bi, ri, ti: (ti, bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, rb),
                         lambda bi, ri, ti: (ti, bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, rb, w),
                         lambda bi, ri, ti: (ti, bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # y_pad9 stays in HBM
        ],
        out_specs=pl.BlockSpec((1, rb, w, c),
                               lambda bi, ri, ti: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y_pad9.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, c), y_pad9.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(sy9b, syt9, sx9b, y_pad9)


CT = 256  # default output columns per program in the column-tiled kernel
CTW = 384  # its source-column window (CT + 2*max_dx + 4, rounded to 128)


def _col_tile(w: int, max_dx: int, dilation: int) -> tuple[int, int] | None:
    """Pick (ct, ctw) for the column-tiled kernel, or None.

    ct must divide w (so every program covers a full block), be 8-aligned
    (the DMA column start lands on the sublane-tiled dim), and >= 128 (MXU
    lane width). The LARGEST eligible ct minimizes the program count —
    per-program fixed overhead (~16us) dominates these kernels, so fewer,
    bigger programs win (measured: banding w=336 into 168-col blocks was
    ~1.75x slower than untiled despite 3.5x less VPU hat-build work).
    """
    halo = 2 * (max_dx + dilation + 2)
    best = None
    for ct in range(128, min(w, 257), 8):
        if w % ct == 0:
            best = ct
    if best is None:
        return None
    return best, _round_up(best + halo, 8)


def _sample_kernel_tiled(sy_ref, sx_ref, y_hbm, out_ref, win, sem, *,
                         h: int, w: int, c: int, r: int, max_dx: int,
                         ct: int, ctw: int):
    """Column-tiled variant: grid (batch, row blocks, col blocks).

    Same separable-hat math as _sample_kernel, but each program covers ct
    output columns and DMAs only its (win_rows, ctw) source window — VMEM
    stays bounded for arbitrarily wide inputs (Cityscapes 512+, multi-scale
    1024-wide quarter-res maps) and the horizontal hat build shrinks to the
    |dx| <= max_dx band (offsets are pre-clipped in the wrapper, mirroring
    the vertical clamp; the auto wrapper routes larger offsets to the exact
    path).
    """
    rb_idx = pl.program_id(1)
    cb_idx = pl.program_id(2)
    i0 = rb_idx * RB
    c0 = cb_idx * ct
    a_n = 2 * r + 3
    win_rows = RB + 2 * r + 2

    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        y_hbm.at[b_idx, pl.ds(i0 + 1, win_rows), pl.ds(c0, ctw)], win, sem
    )
    dma.start()

    # window col q holds global column coordinate c0 + q - (max_dx + 2)
    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (ctw, ct), 0).astype(jnp.float32)
        + c0.astype(jnp.float32)
        - (max_dx + 2.0)
    )
    dma.wait()

    for li in range(RB):
        # coords arrive as (1, RB, nct, ct); pick this program's column
        # block with a dynamic SUBLANE index (ct need not divide 128)
        sy_r = sy_ref[0, li, pl.dslice(cb_idx, 1), :]  # (1, ct)
        sx_r = sx_ref[0, li, pl.dslice(cb_idx, 1), :]
        inside = (
            (sy_r > -1.0) & (sy_r < float(h))
            & (sx_r > -1.0) & (sx_r < float(w))
        )
        hx = jnp.maximum(1.0 - jnp.abs(sx_r - cols_t), 0.0)  # (CTW, CT)
        hx = jnp.where(inside, hx, 0.0)
        i_glob = jnp.float32(i0 * 1.0) + li
        base = i_glob - (r + 1.0)
        # candidate-skip range loop (see _sample_kernel): exact
        a_lo = jnp.maximum(
            jnp.floor(jnp.min(sy_r) - base).astype(jnp.int32), 0
        )
        a_hi = jnp.minimum(
            jnp.ceil(jnp.max(sy_r) - base).astype(jnp.int32), a_n - 1
        )

        def body(a, acc_v):
            vy = jnp.maximum(
                1.0 - jnp.abs(sy_r - (base + a.astype(jnp.float32))), 0.0
            )
            return acc_v + jax.lax.dot_general(
                (hx * vy).astype(win.dtype), win[pl.dslice(li + a, 1)][0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            a_lo, a_hi + 1, body, jnp.zeros((ct, c), jnp.float32)
        )
        out_ref[0, li] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_dy", "max_dx", "ct", "ctw")
)
def _sample_pallas_tiled(y_pad, sy, sx, max_dy: int, max_dx: int,
                         ct: int = CT, ctw: int = CTW):
    """Column-tiled sampling. y_pad (B, Hpad, w + ctw - ct with left/right
    padding laid out by the wrapper, C); w % ct == 0."""
    b, hpad, wp2, c = y_pad.shape
    _, h, w = sy.shape
    r = max_dy
    assert h % RB == 0 and w % ct == 0, (h, w, ct)
    nct = w // ct
    # (B, H, nct, ct) coord layout: the TPU lane-dim block rule requires
    # the last dim be %128 or the full array dim — ct is only %8, so give
    # every program the full (nct, ct) trailing block and let the kernel
    # pick its column block by dynamic sublane index (RB*w floats, ~10KB)
    sy4 = sy.reshape(b, h, nct, ct)
    sx4 = sx.reshape(b, h, nct, ct)
    kernel = functools.partial(
        _sample_kernel_tiled, h=h, w=w, c=c, r=r, max_dx=max_dx,
        ct=ct, ctw=ctw,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h // RB, nct),
        in_specs=[
            pl.BlockSpec((1, RB, nct, ct), lambda bi, ri, ci: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, nct, ct), lambda bi, ri, ci: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, RB, ct, c), lambda bi, ri, ci: (bi, ri, ci, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((RB + 2 * r + 2, ctw, c), y_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(sy4, sx4, y_pad)


def _sample_ref(y_pad, sy, sx, max_dy: int, col_off: int = 1):
    """jnp reference of the same hat-sampling math (used for the VJP and
    for interpret-mode equivalence tests). col_off = number of left pad
    columns (1 untiled, max_dx + 2 tiled)."""
    b, hpad, wp, c = y_pad.shape
    _, h, w = sy.shape
    r = max_dy
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(wp, dtype=jnp.float32) - float(col_off)
    inside = (sy > -1.0) & (sy < h) & (sx > -1.0) & (sx < w)
    vx = jnp.maximum(1.0 - jnp.abs(sx[..., None] - cols), 0.0)
    vx = vx * inside[..., None].astype(vx.dtype)
    out = jnp.zeros((b, h, w, c), y_pad.dtype)
    for a in range(-(r + 1), r + 2):
        vy = jnp.maximum(1.0 - jnp.abs(sy - (iy + a)), 0.0)
        x_a = jax.lax.dynamic_slice(
            y_pad, (0, r + 2 + a, 0, 0), (b, h, wp, c)
        )
        t = jnp.einsum(
            "bijw,biwc->bijc", vx.astype(y_pad.dtype), x_a,
            preferred_element_type=y_pad.dtype,
        )
        out = out + vy[..., None].astype(y_pad.dtype) * t
    return out


# ---------------------------------------------------------------------------
# hand-written backward kernel (VERDICT r1 item #3; RMW rewrite r3)
#
# The VJP of deform_sample has three parts, all expressible with the same
# hat-tile structure as the forward:
#   * grad_y: transpose of the per-row matmul — for candidate a,
#     gacc[li + a] += vx (wp, w) @ (vy ⊙ g_row) (w, c); the per-block
#     window accumulator is read-modify-written straight into the full
#     (B, Hpad, Wp, C) f32 grad canvas in HBM (TPU grid programs run
#     sequentially on the core and the write DMA is waited before the next
#     program's overlapping read starts — same race-free RMW pattern as
#     roi_align_pallas._window_bwd_kernel). This replaced the round-2
#     scheme (private per-block (B, nb, win_pad, wp, C) buffers + a
#     3-pass XLA overlap-add), whose write amplification and per-block
#     zeroing were ~40% of the backward at small offsets;
#   * grad_sy[j] = sum_a dvy[j] * sum_c part_a[j, c] * g[j, c]
#   * grad_sx[j] = sum_a  vy[j] * sum_c dpart_a[j, c] * g[j, c]
#     where [part_a; dpart_a] (2w, c) = [vx, dvx]^T (wp, 2w) @ win_a
#     (wp, c) — ONE stacked matmul per candidate instead of two (the
#     stacked operand is built and cast once per row).
#
# This replaces the round-1 fallback (jax.vjp through the dense jnp
# reference), which materialized (B, H, W, Wp) hat tensors in HBM and ran
# ~3x slower than the kernel while using GBs of temps.
# ---------------------------------------------------------------------------


def _sample_bwd_kernel(sy_ref, syt_ref, sx_ref, g_ref, y_hbm, z_hbm,
                       canvas_ref, gsyt_ref, gsxt_ref, win, gacc, sem, sem2,
                       *, h: int, w: int, wp: int, c: int, r: int,
                       col_off: int, rb: int):
    """Backward with the same post-matmul vertical-hat factoring as the
    forward. Per candidate a:

      grad-to-window:  gacc[li+a] += vx^T-matmul of (vy ⊙ g_row)
      offset grads:    [part_a; dpart_a] = [vx, dvx] (wp, 2w) ^T win_a
                       in ONE stacked matmul; gsy += dvy ⊙ Σ_c(part ⊙ g),
                       gsx += vy ⊙ Σ_c(dpart ⊙ g)

    using Σ_q vx[q,j] Σ_c win[q,c] g[j,c] = Σ_c part[j,c] g[j,c] — the
    hadamard-colsum against the (wp, w) E-matrix becomes a (w, c)
    hadamard-rowsum, and the per-candidate (wp, w) joint-weight build
    disappears (vx/dvx are built + cast once per row). vy/dvy live as
    (w, 1) sublane columns (from syt), so gsy/gsx accumulate in
    transposed (w, rb) orientation; the caller transposes them back.

    gacc is the program's slice of the f32 grad canvas, fetched by a
    read-modify-write window DMA (sequential grid ⇒ race-free; the write
    is waited before returning so the next program's overlapping read
    observes it).
    """
    del z_hbm  # aliased with canvas_ref; zero-filled by the caller
    rb_idx = pl.program_id(1)
    i0 = rb_idx * rb
    a_n = 2 * r + 3
    win_rows = rb + 2 * r + 2

    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        y_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()
    rmw = pltpu.make_async_copy(
        canvas_ref.at[b_idx, pl.ds(i0 + 1, win_rows)], gacc, sem2
    )
    rmw.start()

    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0).astype(jnp.float32)
        - jnp.float32(col_off)
    )
    dma.wait()
    rmw.wait()

    for li in range(rb):
        sy_r = sy_ref[0, li:li + 1, :]  # (1, w)
        sx_r = sx_ref[0, li:li + 1, :]
        sy_col = syt_ref[0, 0, :, li:li + 1]  # (w, 1)
        inside = (
            (sy_r > -1.0) & (sy_r < float(h))
            & (sx_r > -1.0) & (sx_r < float(w))
        )
        dx = sx_r - cols_t  # (wp, w)
        vx_t = jnp.maximum(1.0 - jnp.abs(dx), 0.0)
        vx_t = jnp.where(inside, vx_t, 0.0).astype(win.dtype)
        dvx_t = jnp.where(
            (jnp.abs(dx) < 1.0) & inside, -jnp.sign(dx), 0.0
        ).astype(win.dtype)
        vdv = jnp.concatenate([vx_t, dvx_t], axis=1)  # (wp, 2w)
        g_row = g_ref[0, li]  # (w, c)
        gf32 = g_row.astype(jnp.float32)
        i_glob = jnp.float32(i0 * 1.0) + li
        base = i_glob - (r + 1.0)
        # candidate-skip range loop (see _sample_kernel): vy > 0 and
        # dvy != 0 share the support |dy| < 1 (sign(0) = 0), so the same
        # live range covers all three gradient contributions.
        a_lo = jnp.maximum(
            jnp.floor(jnp.min(sy_r) - base).astype(jnp.int32), 0
        )
        a_hi = jnp.minimum(
            jnp.ceil(jnp.max(sy_r) - base).astype(jnp.int32), a_n - 1
        )

        def body(a, carry):
            gy, gx = carry
            dy = sy_col - (base + a.astype(jnp.float32))  # (w, 1)
            vy = jnp.maximum(1.0 - jnp.abs(dy), 0.0)
            dvy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
            # grad to the y window: vx @ (vy ⊙ g_row)
            gw_op = (vy * g_row).astype(win.dtype)  # (w, c)
            contrib = jax.lax.dot_general(
                vx_t, gw_op,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (wp, c)
            gacc[pl.dslice(li + a, 1)] += contrib[None]
            win_a = win[pl.dslice(li + a, 1)][0]  # (wp, c)
            pd = jax.lax.dot_general(
                vdv, win_a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2w, c): part rows then dpart rows
            gy = gy + dvy * jnp.sum(pd[:w] * gf32, axis=1, keepdims=True)
            gx = gx + vy * jnp.sum(pd[w:] * gf32, axis=1, keepdims=True)
            return gy, gx

        zero = jnp.zeros((w, 1), jnp.float32)
        gsy_acc, gsx_acc = jax.lax.fori_loop(
            a_lo, a_hi + 1, body, (zero, zero)
        )
        gsyt_ref[0, 0, :, li:li + 1] = gsy_acc
        gsxt_ref[0, 0, :, li:li + 1] = gsx_acc

    wr = pltpu.make_async_copy(
        gacc, canvas_ref.at[b_idx, pl.ds(i0 + 1, win_rows)], sem2
    )
    wr.start()
    wr.wait()


@functools.partial(jax.jit, static_argnames=("max_dy", "col_off"))
def _sample_pallas_bwd(y_pad, sy, sx, g, max_dy: int, col_off: int = 1):
    """Backward of _sample_pallas (and, with col_off = max_dx + 2, of the
    column-tiled forward — the bwd kernel processes full rows, whose VMEM
    footprint stays small even at Cityscapes widths). Returns
    (grad_y_pad, grad_sy, grad_sx).

    The grad canvas is accumulated in-kernel by window RMW (see the block
    comment above), so the only HBM temp is the (B, Hpad, Wp, C) f32
    canvas itself — the round-2 per-block gwin buffers (3x write
    amplification + per-block VMEM zeroing + a 3-pass XLA overlap-add)
    are gone, which also lifts the old rb=8 OOM ceiling: rb=16 fits
    comfortably and halves the per-program fixed cost.
    """
    b, hpad, wp, c = y_pad.shape
    _, h, w = sy.shape
    r = max_dy
    rb = RB
    for cand in (16,):  # win+gacc VMEM at rb=16, wp=384: ~12 MB — fine
        if h % cand == 0:
            rb = cand
            break
    n_blocks = h // rb
    win_rows = rb + 2 * r + 2

    syt = sy.reshape(b, n_blocks, rb, w).swapaxes(2, 3)
    zeros = jnp.zeros((b, hpad, wp, c), jnp.float32)

    kernel = functools.partial(
        _sample_bwd_kernel, h=h, w=w, wp=wp, c=c, r=r,
        col_off=col_off, rb=rb,
    )
    grad, gsyt, gsxt = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rb, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, rb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, w, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # y_pad stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # zeroed canvas (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, w, rb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, rb), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hpad, wp, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blocks, w, rb), jnp.float32),
            jax.ShapeDtypeStruct((b, n_blocks, w, rb), jnp.float32),
        ),
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, c), y_pad.dtype),
            pltpu.VMEM((win_rows, wp, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # v5e VMEM is 128MB
        ),
    )(sy, syt, sx, g, y_pad, zeros)
    gsy = gsyt.swapaxes(2, 3).reshape(b, h, w).astype(sy.dtype)
    gsx = gsxt.swapaxes(2, 3).reshape(b, h, w).astype(sx.dtype)
    return grad.astype(y_pad.dtype), gsy, gsx


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def deform_sample(y_pad, sy, sx, max_dy: int):
    return _sample_pallas(y_pad, sy, sx, max_dy)


def _fwd(y_pad, sy, sx, max_dy):
    return _sample_pallas(y_pad, sy, sx, max_dy), (y_pad, sy, sx)


def _bwd(max_dy, res, g):
    y_pad, sy, sx = res
    return _sample_pallas_bwd(y_pad, sy, sx, g, max_dy)


deform_sample.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def deform_sample_tiled(y_pad, sy, sx, max_dy: int, max_dx: int,
                        ct: int = CT, ctw: int = CTW):
    return _sample_pallas_tiled(y_pad, sy, sx, max_dy, max_dx, ct, ctw)


def _fwd_t(y_pad, sy, sx, max_dy, max_dx, ct, ctw):
    out = _sample_pallas_tiled(y_pad, sy, sx, max_dy, max_dx, ct, ctw)
    return out, (y_pad, sy, sx)


def _bwd_t(max_dy, max_dx, ct, ctw, res, g):
    # the hand-written full-row backward kernel, with the tiled layout's
    # column origin (left pad = max_dx + 2)
    y_pad, sy, sx = res
    return _sample_pallas_bwd(y_pad, sy, sx, g, max_dy, col_off=max_dx + 2)


deform_sample_tiled.defvjp(_fwd_t, _bwd_t)


def pallas_route(shape, cout: int, max_dy: int, dilation: int):
    """Static routing decision shared by deform_conv2d_pallas and the
    'auto' exactness wrapper (ops/deform_conv.deform_conv2d_auto).

    Returns (route, max_dx): route in {"untiled", "tiled", "mxu"};
    max_dx is the horizontal clip bound of the fast path (None when
    horizontal offsets are unrestricted — untiled and mxu paths contract
    the full padded row).
    """
    b, h, w, cin = shape
    wp_ = _round_up(w + 2, 128)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # NOTE (round 3): a 9-tap shift-FMA kernel (deform_shift_pallas.py,
    # opt-in via DeformConv(impl='shift') / dcn_impl='shift') was built and
    # measured as a candidate default: at trained (constant) offsets it ties this
    # kernel (~68 ms vs ~69 ms P2 b8 const ±2 px) because BOTH designs hit
    # the same VMEM-traffic floor (acc read-modify-write + slab reads per
    # live candidate), and at random offset fields its per-BLOCK a×s live-
    # range product collapses (522 ms vs 140 ms at σ=2). It stays available
    # and tested, but the hat-matmul kernels remain the default route.
    # NOTE: the mt (sample-first joint-K) kernel measured SLOWER than the
    # per-tap kernel at flagship shapes (117 vs 101 ms/layer b8 P2): every
    # hat-matmul formulation is bound by materializing the joint bilinear
    # weights through the VPU, and the per-tap variant already sits at
    # that floor with the smallest constant. Keep "mt" available via
    # deform_conv2d_pallas_mt (tested, exact) but do not route to it.
    if not on_tpu or cout % 128 != 0:
        return "mxu", None
    # h need not be a multiple of RB: deform_conv2d_pallas zero-pads the
    # rows up to the block size and slices the result — exact, because the
    # padded rows project to zero and the hat sample of an all-zero row
    # contributes zero (the same zeros the shorter map's boundary padding
    # held). This keeps the small FPN levels (P4 52x84, P5 26x42 at the
    # flagship bucket) on the fast kernel instead of the dense mxu path.
    max_dx = max_dy  # same clip both axes; the tiled ctw is sized to fit
    tile = _col_tile(w, max_dx, dilation)
    # VMEM budget for the untiled kernel: halo window + per-row hat matrix
    # (f32 + bf16 matmul operand) + f32 accumulator + out block, ~16MB cap.
    vmem_est = (
        (RB + 2 * (max_dy + dilation) + 2) * wp_ * cout * 2  # window
        + wp_ * w * 6  # hx f32 + bf16 operand
        + w * cout * 4  # accumulator
        + RB * w * cout * 4  # out block
    )
    # Column tiling is the VMEM fallback only: banding the horizontal hat
    # at w=336 measured SLOWER (107 vs 61 ms/layer at zero offsets) — the
    # kernel cost is dominated by per-PROGRAM fixed overhead (~16us: DMA
    # issue + scaffolding), not the VPU hat build, and tiling doubles the
    # program count. (The tiled path still beats the old XLA-vjp backward:
    # it now shares the hand-written full-row backward kernel.)
    if vmem_est > 13 * 1024 * 1024:
        return ("tiled", max_dx) if tile is not None else ("mxu", None)
    return "untiled", None


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "dilation", "max_dy", "boundary_grad"),
)
def deform_conv2d_pallas(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
    dilation: int = 1,
    max_dy: int = 6,
    boundary_grad: str = "clip",
) -> jnp.ndarray:
    """Deformable conv: project-first + Pallas hat-matmul sampling.

    Same interface/semantics as ops.deform_conv.deform_conv2d_mxu (exact
    for |dy| <= max_dy). Any H is accepted: rows are zero-padded to the
    8-row block size and sliced after (exact — see pallas_route).
    """
    from upsnet_tpu.ops.deform_conv import clip_offsets, deform_conv2d_mxu

    b, h, w, cin = x.shape
    cout_ = weight.shape[-1]
    route, max_dx = pallas_route(x.shape, cout_, max_dy, dilation)
    if route in ("untiled", "tiled") and h % RB != 0:
        # zero-pad rows to the block size and slice after — exact (padded
        # rows project to zero; the hat sample of a zero row contributes
        # the same zero the boundary padding held). See pallas_route.
        h8 = _round_up(h, RB)
        x = jnp.pad(x, ((0, 0), (0, h8 - h), (0, 0), (0, 0)))
        offsets = jnp.pad(offsets, ((0, 0), (0, h8 - h), (0, 0), (0, 0)))
        out = deform_conv2d_pallas(
            x, offsets, weight, bias, kernel_size, dilation, max_dy,
            boundary_grad,
        )
        return out[:, :h]
    if route == "mt":
        return deform_conv2d_pallas_mt(
            x, offsets, weight, bias, kernel_size, dilation, max_dy
        )
    if route == "tiled":
        # wide inputs (Cityscapes 512+): column-tiled kernel, |dx| clipped
        return _deform_conv2d_pallas_tiled(
            x, offsets, weight, bias, kernel_size, dilation, max_dy, max_dx,
            boundary_grad,
        )
    if route == "mxu":
        return deform_conv2d_mxu(
            x, offsets, weight, bias, kernel_size, dilation, max_dy,
            boundary_grad,
        )
    return _untiled_dispatch(
        kernel_size, dilation, max_dy, boundary_grad, x, offsets, weight,
        bias,
    )


def _pertap_untiled(x, offsets, weight, bias, kernel_size, dilation, max_dy,
                    boundary_grad):
    """Per-tap untiled path: 9 pads + 9 ``deform_sample`` kernels + chained
    accumulation. This is the TRAINING form — every piece (the sample
    kernels' custom VJPs, the RMW-canvas backward, the save_dcn remat
    interaction) is the round-3/4 tuned path."""
    from upsnet_tpu.ops.deform_conv import clip_offsets

    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2
    wp = _round_up(w + 2, 128)

    wk = jnp.moveaxis(weight, 0, 1).reshape(cin, k * cout).astype(x.dtype)
    y = jnp.dot(x.reshape(-1, cin), wk, preferred_element_type=x.dtype)
    y = y.reshape(b, h, w, k, cout)
    # one candidate radius for all taps: covers |dy| <= max_dy plus the
    # tap's own +-dilation integer row shift
    r_eff = max_dy + dilation
    pad_rows = r_eff + 2

    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
    for tap in range(k):
        kh, kw = divmod(tap, kernel_size)
        y_pad = jnp.pad(
            y[:, :, :, tap],
            ((0, 0), (pad_rows, pad_rows), (1, wp - w - 1), (0, 0)),
        )
        # vertical offsets clipped into the reachable window (see
        # deform_conv2d_mxu): edge sample instead of silent zero
        dy = clip_offsets(
            offsets[..., 2 * tap].astype(jnp.float32), float(max_dy),
            boundary_grad,
        )
        sy = iy + (kh - half) * dilation + dy
        sx = ix + (kw - half) * dilation + offsets[..., 2 * tap + 1].astype(jnp.float32)
        out = out + deform_sample(y_pad, sy, sx, r_eff)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _fused_untiled(x, offsets, weight, bias, kernel_size, dilation, max_dy,
                   boundary_grad):
    """All-taps-fused untiled forward: one ``_sample_pallas9`` call
    replaces the 9 chained sample kernels + 8 XLA accumulations (measured
    ~2.9 ms/call of scheduling overhead vs ~0.5 ms kernel time —
    tools/bench_deform_incontext.py). Same per-tap math and bf16 tap
    accumulation order as ``_pertap_untiled``."""
    from upsnet_tpu.ops.deform_conv import clip_offsets

    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    assert k == 9, k
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2
    wp = _round_up(w + 2, 128)
    r_eff = max_dy + dilation
    pad_rows = r_eff + 2

    x2 = x.reshape(-1, cin)
    # 9 separate matmuls whose outputs XLA writes straight into the
    # tap-major stack (no (B,H,W,9,C) -> (9,B,H,W,C) transpose op)
    y9 = jnp.stack(
        [
            jnp.dot(x2, weight[t].astype(x.dtype),
                    preferred_element_type=x.dtype)
            for t in range(k)
        ],
        axis=0,
    ).reshape(k, b, h, w, cout)
    y_pad9 = jnp.pad(
        y9,
        ((0, 0), (0, 0), (pad_rows, pad_rows), (1, wp - w - 1), (0, 0)),
    )

    off_y = clip_offsets(
        jnp.moveaxis(offsets[..., 0::2], 3, 0).astype(jnp.float32),
        float(max_dy), boundary_grad,
    )  # (9, b, h, w)
    off_x = jnp.moveaxis(offsets[..., 1::2], 3, 0).astype(jnp.float32)
    iy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    ky = jnp.asarray(
        [(t // kernel_size - half) * dilation for t in range(k)],
        jnp.float32,
    )[:, None, None, None]
    kx = jnp.asarray(
        [(t % kernel_size - half) * dilation for t in range(k)],
        jnp.float32,
    )[:, None, None, None]
    sy9 = iy + ky + off_y
    sx9 = ix + kx + off_x
    out = _sample_pallas9(y_pad9, sy9, sx9, r_eff)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _untiled_dispatch(kernel_size, dilation, max_dy, boundary_grad, x,
                      offsets, weight, bias):
    """Primal (inference): the fused all-taps kernel. Differentiated
    (training): the custom_vjp fwd rule below swaps in the per-tap path,
    so the tuned RMW-canvas backward kernels and save_dcn remat behavior
    are exactly what they were — the fused kernel never runs under grad."""
    return _fused_untiled(
        x, offsets, weight, bias, kernel_size, dilation, max_dy,
        boundary_grad,
    )


def _untiled_dispatch_fwd(kernel_size, dilation, max_dy, boundary_grad, x,
                          offsets, weight, bias):
    out, vjp = jax.vjp(
        lambda x_, o_, w_, b_: _pertap_untiled(
            x_, o_, w_, b_, kernel_size, dilation, max_dy, boundary_grad
        ),
        x, offsets, weight, bias,
    )
    return out, vjp


def _untiled_dispatch_bwd(kernel_size, dilation, max_dy, boundary_grad, vjp,
                          g):
    return vjp(g)


_untiled_dispatch.defvjp(_untiled_dispatch_fwd, _untiled_dispatch_bwd)


def _deform_conv2d_pallas_tiled(x, offsets, weight, bias, kernel_size,
                                dilation, max_dy, max_dx,
                                boundary_grad="clip"):
    """Column-tiled variant (wide inputs / banded horizontal hats);
    |dy| <= max_dy and |dx| <= max_dx (both clipped to the window edge)."""
    from upsnet_tpu.ops.deform_conv import clip_offsets

    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2

    wk = jnp.moveaxis(weight, 0, 1).reshape(cin, k * cout).astype(x.dtype)
    y = jnp.dot(x.reshape(-1, cin), wk, preferred_element_type=x.dtype)
    y = y.reshape(b, h, w, k, cout)
    r_eff = max_dy + dilation
    dx_eff = max_dx + dilation
    pad_rows = r_eff + 2
    ct, ctw = _col_tile(w, max_dx, dilation)
    left = dx_eff + 2
    right = (ctw - ct) - left
    assert right >= dx_eff + 2, (right, dx_eff)

    off_y = clip_offsets(offsets[..., 0::2].astype(jnp.float32),
                         float(max_dy), boundary_grad)
    off_x = clip_offsets(offsets[..., 1::2].astype(jnp.float32),
                         float(max_dx), boundary_grad)
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
    for tap in range(k):
        kh, kw = divmod(tap, kernel_size)
        y_pad = jnp.pad(
            y[:, :, :, tap],
            ((0, 0), (pad_rows, pad_rows), (left, right), (0, 0)),
        )
        sy = iy + (kh - half) * dilation + off_y[..., tap]
        sx = ix + (kw - half) * dilation + off_x[..., tap]
        out = out + deform_sample_tiled(y_pad, sy, sx, r_eff, dx_eff, ct, ctw)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Multi-tap sample-first kernels ("mt"): all 9 taps share one halo window.
#
# The reference CUDA kernel (MXNet deformable_im2col lineage) samples the
# INPUT and GEMMs the weights afterwards; the round-1/2 kernels above
# project-first instead (sample x @ W_tap per tap), which forces 9 separate
# pallas_calls, 9 window DMAs, and per-tap (wp, w) matmuls whose K=wp is too
# small to keep the MXU busy. Sampling first restores the reference
# structure AND merges the 9 taps into one kernel:
#
#   per output row, per vertical candidate a:
#     part (9*Wpd, C) = hx_stack (wp, 9*Wpd)^T @ win[li+a] (wp, C)
#     acc += vy_stack[:, a:a+1] * part        # per-pixel vertical weight
#
# One window DMA per program, K=wp and M=9*Wpd per matmul (vs M=w), and the
# vertical hat applied as a column-broadcast multiply AFTER the matmul (the
# per-(tap, candidate) joint-weight builds are gone). The conv weights are
# applied outside as one (B*H*W, 9*Cin) @ (9*Cin, Cout) GEMM.
# ---------------------------------------------------------------------------

MT_RB = 2  # output rows per program (fwd mt kernel)
MT_G = 3  # taps per backward kernel call (VMEM budget)


def _sample_mt_kernel(sy_ref, sx_ref, syt_ref, x_hbm, out_ref, win, hxs,
                      wj, xj, sem, *, h: int, w: int, wp: int, c: int,
                      r: int, taps: int, wpd: int, group: int):
    """Joint-K formulation: per (row, tap-group) ONE MXU matmul.

    The candidate dimension folds into K: W_joint[(a, q), (t, j)] =
    vy[a, t, j] * hx[q, t, j] against X_joint[(a, q), :] = win[li+a, q, :].
    K = a_n*wp (~6.5k) and M = group*wpd (~1.2k) amortize MXU issue latency
    that a per-candidate loop pays 17x (measured: per-candidate fori_loop
    ~105ms/layer, joint-K ~? — see STATUS). All slab stores are lane/sublane
    aligned (wp, wpd multiples of 128), fixing round-1's misaligned-store
    penalty on the same structure.
    """
    rb_idx = pl.program_id(1)
    i0 = rb_idx * MT_RB
    a_n = 2 * r + 3
    win_rows = MT_RB + 2 * r + 2
    n_groups = (taps + group - 1) // group

    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()
    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wp, wpd), 0).astype(jnp.float32)
        - 1.0
    )
    dma.wait()

    for li in range(MT_RB):
        for t in range(taps):
            sy_r = sy_ref[0, li, t:t + 1, :]  # (1, wpd)
            sx_r = sx_ref[0, li, t:t + 1, :]
            inside = (
                (sy_r > -1.0) & (sy_r < float(h))
                & (sx_r > -1.0) & (sx_r < float(w))
            )
            hx = jnp.maximum(1.0 - jnp.abs(sx_r - cols_t), 0.0)
            hxs[:, t * wpd:(t + 1) * wpd] = jnp.where(inside, hx, 0.0).astype(
                hxs.dtype
            )
        # X_joint: stacked candidate windows (a_n*wp, c)
        for a in range(a_n):
            xj[a * wp:(a + 1) * wp] = win[li + a]
        i_glob = jnp.float32(i0 * 1.0) + li
        for g in range(n_groups):
            t0 = g * group
            g_taps = min(group, taps - t0)
            for a in range(a_n):
                for tl in range(g_taps):
                    t = t0 + tl
                    sy_r = sy_ref[0, li, t:t + 1, :]  # (1, wpd)
                    vy = jnp.maximum(
                        1.0 - jnp.abs(sy_r - (i_glob + (a - (r + 1)))), 0.0
                    )
                    wj[a * wp:(a + 1) * wp, tl * wpd:(tl + 1) * wpd] = (
                        vy * hxs[:, t * wpd:(t + 1) * wpd].astype(jnp.float32)
                    ).astype(wj.dtype)
            part = jax.lax.dot_general(
                wj[:], xj[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (group*wpd, c)
            for tl in range(g_taps):
                out_ref[0, li, t0 + tl] = part[
                    tl * wpd:(tl + 1) * wpd
                ].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_dy",))
def _sample_pallas_mt(x_pad, sy, sx, syt, max_dy: int):
    """x_pad (B, Hpad, Wp, C); sy/sx (B, H, T, Wpd) f32 (cols >= w hold
    -1e9 sentinels); syt (B, nb, T*Wpd, MT_RB). Returns (B, H, T, Wpd, C)."""
    b, hpad, wp, c = x_pad.shape
    _, h, taps, wpd = sy.shape
    r = max_dy
    assert h % MT_RB == 0, (h, MT_RB)
    n_blocks = h // MT_RB
    win_rows = MT_RB + 2 * r + 2
    a_n = 2 * r + 3
    group = MT_G

    # `w=wpd` only loosens the `inside` upper bound on sx: sx in [w, wpd)
    # resolves to 0 anyway because source columns >= w are zero-padded and
    # unreachable by the hat (same argument as _sample_pallas's docstring).
    kernel = functools.partial(
        _sample_mt_kernel, h=h, w=wpd, wp=wp, c=c, r=r, taps=taps, wpd=wpd,
        group=group,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, taps * wpd, MT_RB),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, MT_RB, taps, wpd, c), lambda bi, ri: (bi, ri, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, taps, wpd, c), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, c), x_pad.dtype),
            pltpu.VMEM((wp, taps * wpd), x_pad.dtype),
            pltpu.VMEM((a_n * wp, group * wpd), x_pad.dtype),
            pltpu.VMEM((a_n * wp, c), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # v5e VMEM is 128MB
        ),
    )(sy, sx, syt, x_pad)


def _sample_mt_bwd_kernel(sy_ref, sx_ref, syt_ref, g_ref, x_hbm, gwin_ref,
                          gsy_ref, gsx_ref, win, hxs, dvxs, srow, gyr, gxr,
                          sem, *, h: int, wp: int, c: int, r: int, taps: int,
                          wpd: int, win_pad: int):
    """Backward of the mt sampling for one tap GROUP (taps <= MT_G).

    Per (li, a): grad to the shared window rides two merged matmuls
    (K = taps*wpd and K = c); offset grads use the hadamard-colsum identity
    gsy = dvy * sum_q(hx .* E), gsx = vy * sum_q(dvx .* E) with
    E = win[li+a] @ g_row^T. gwin accumulates bf16 in the out block —
    each window row receives at most MT_RB in-program adds (exact order
    reconstructed by the caller's f32 overlap-add)."""
    rb_idx = pl.program_id(1)
    i0 = rb_idx * MT_RB
    a_n = 2 * r + 3
    win_rows = MT_RB + 2 * r + 2

    b_idx = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(i0 + 1, win_rows)], win, sem
    )
    dma.start()
    cols_t = (
        jax.lax.broadcasted_iota(jnp.int32, (wp, wpd), 0).astype(jnp.float32)
        - 1.0
    )
    gwin_ref[0, 0] = jnp.zeros((win_pad, wp, c), gwin_ref.dtype)
    dma.wait()

    for li in range(MT_RB):
        for t in range(taps):
            sy_r = sy_ref[0, li, t:t + 1, :]
            sx_r = sx_ref[0, li, t:t + 1, :]
            inside = (
                (sy_r > -1.0) & (sy_r < float(h))
                & (sx_r > -1.0) & (sx_r < float(wpd))
            )
            dx = sx_r - cols_t
            hx = jnp.maximum(1.0 - jnp.abs(dx), 0.0)
            hxs[:, t * wpd:(t + 1) * wpd] = jnp.where(inside, hx, 0.0).astype(
                hxs.dtype
            )
            dvx = jnp.where((jnp.abs(dx) < 1.0) & inside, -jnp.sign(dx), 0.0)
            dvxs[:, t * wpd:(t + 1) * wpd] = dvx.astype(dvxs.dtype)
            # row-oriented sy stack (lane-offset stores, no vector transpose)
            srow[:, t * wpd:(t + 1) * wpd] = sy_r
        i_glob = jnp.float32(i0 * 1.0) + li
        sy_col = syt_ref[0, 0, :, li:li + 1]  # (taps*wpd, 1)
        sy_row = srow[:]  # (1, taps*wpd)
        g_li = g_ref[0, li].reshape(taps * wpd, c)
        gyr[...] = jnp.zeros((1, taps * wpd), jnp.float32)
        gxr[...] = jnp.zeros((1, taps * wpd), jnp.float32)
        for a in range(a_n):
            dy_col = sy_col - (i_glob + (a - (r + 1)))  # (taps*wpd, 1)
            vy_col = jnp.maximum(1.0 - jnp.abs(dy_col), 0.0)
            gs = (vy_col * g_li).astype(win.dtype)  # (taps*wpd, c)
            contrib = jax.lax.dot_general(
                hxs[:], gs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (wp, c)
            gwin_ref[0, 0, li + a] += contrib.astype(gwin_ref.dtype)
            e = jax.lax.dot_general(
                win[li + a], g_li,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (wp, taps*wpd)
            hxe = jnp.sum(hxs[:].astype(jnp.float32) * e, axis=0,
                          keepdims=True)  # (1, taps*wpd)
            dxe = jnp.sum(dvxs[:].astype(jnp.float32) * e, axis=0,
                          keepdims=True)
            dy_row = sy_row - (i_glob + (a - (r + 1)))
            vy_row = jnp.maximum(1.0 - jnp.abs(dy_row), 0.0)
            dvy_row = jnp.where(jnp.abs(dy_row) < 1.0, -jnp.sign(dy_row), 0.0)
            gyr[...] += dvy_row * hxe
            gxr[...] += vy_row * dxe
        for t in range(taps):  # (1, wpd) lane slices, no cross-sublane moves
            gsy_ref[0, li, t:t + 1, :] = gyr[:, t * wpd:(t + 1) * wpd]
            gsx_ref[0, li, t:t + 1, :] = gxr[:, t * wpd:(t + 1) * wpd]


@functools.partial(jax.jit, static_argnames=("max_dy",))
def _sample_pallas_mt_bwd(x_pad, sy, sx, syt, g, max_dy: int):
    """Backward of _sample_pallas_mt for one tap group.

    Returns (grad_x_pad_f32, grad_sy, grad_sx); grad_x_pad accumulated via
    the caller-side f32 overlap-add of per-block windows."""
    b, hpad, wp, c = x_pad.shape
    _, h, taps, wpd = sy.shape
    r = max_dy
    n_blocks = h // MT_RB
    win_rows = MT_RB + 2 * r + 2
    win_pad = _round_up(win_rows, MT_RB)

    kernel = functools.partial(
        _sample_mt_bwd_kernel, h=h, wp=wp, c=c, r=r, taps=taps, wpd=wpd,
        win_pad=win_pad,
    )
    gwin, gsy, gsx = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, taps * wpd, MT_RB),
                         lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MT_RB, taps, wpd, c),
                         lambda bi, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, win_pad, wp, c),
                         lambda bi, ri: (bi, ri, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MT_RB, taps, wpd), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_blocks, win_pad, wp, c), x_pad.dtype),
            jax.ShapeDtypeStruct((b, h, taps, wpd), jnp.float32),
            jax.ShapeDtypeStruct((b, h, taps, wpd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_rows, wp, c), x_pad.dtype),
            pltpu.VMEM((wp, taps * wpd), x_pad.dtype),
            pltpu.VMEM((wp, taps * wpd), x_pad.dtype),
            pltpu.VMEM((1, taps * wpd), jnp.float32),
            pltpu.VMEM((1, taps * wpd), jnp.float32),
            pltpu.VMEM((1, taps * wpd), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # v5e VMEM is 128MB
        ),
    )(sy, sx, syt, g, x_pad)

    # overlap-add: block t's window row q lands on x_pad row 1 + t*MT_RB + q
    grad = jnp.zeros((b, hpad, wp, c), jnp.float32)
    for k in range(win_pad // MT_RB):
        seg = gwin[:, :, k * MT_RB:(k + 1) * MT_RB].astype(jnp.float32)
        seg = seg.reshape(b, n_blocks * MT_RB, wp, c)
        start = 1 + k * MT_RB
        end = min(start + n_blocks * MT_RB, hpad)
        grad = jax.lax.dynamic_update_slice(
            grad,
            jax.lax.dynamic_slice(
                grad, (0, start, 0, 0), (b, end - start, wp, c)
            ) + seg[:, : end - start],
            (0, start, 0, 0),
        )
    return grad, gsy, gsx


def _mt_syt(sy):
    """Column-oriented sy for the kernels: (B, n_blocks, T*Wpd, MT_RB).

    The last-two block dims must be Mosaic-legal: T*Wpd divides 8 and the
    lane dim equals the full MT_RB extent (a (1, T*Wpd, h) layout with a
    size-MT_RB lane block is rejected by the TPU lowering)."""
    b, h, taps, wpd = sy.shape
    syt = sy.transpose(0, 2, 3, 1).reshape(b, taps * wpd, h)
    return syt.reshape(b, taps * wpd, h // MT_RB, MT_RB).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def deform_sample_mt(x_pad, sy, sx, max_dy: int):
    """Multi-tap sampling with hand-written fwd+bwd kernels.

    x_pad (B, Hpad, Wp, C); sy/sx (B, H, T, Wpd). Returns (B, H, T, Wpd, C).
    """
    return _sample_pallas_mt(x_pad, sy, sx, _mt_syt(sy), max_dy)


def _mt_fwd(x_pad, sy, sx, max_dy):
    return deform_sample_mt(x_pad, sy, sx, max_dy), (x_pad, sy, sx)


def _mt_bwd(max_dy, res, g):
    x_pad, sy, sx = res
    b, h, taps, wpd = sy.shape
    gx = None
    gsy_parts, gsx_parts = [], []
    for t0 in range(0, taps, MT_G):
        t1 = min(t0 + MT_G, taps)
        sy_g = sy[:, :, t0:t1]
        sx_g = sx[:, :, t0:t1]
        g_g = g[:, :, t0:t1]
        gxg, gsy_g, gsx_g = _sample_pallas_mt_bwd(
            x_pad, sy_g, sx_g, _mt_syt(sy_g), g_g, max_dy
        )
        gx = gxg if gx is None else gx + gxg
        gsy_parts.append(gsy_g)
        gsx_parts.append(gsx_g)
    gsy = jnp.concatenate(gsy_parts, axis=2)
    gsx = jnp.concatenate(gsx_parts, axis=2)
    return gx.astype(x_pad.dtype), gsy, gsx


deform_sample_mt.defvjp(_mt_fwd, _mt_bwd)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "dilation", "max_dy")
)
def deform_conv2d_pallas_mt(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
    dilation: int = 1,
    max_dy: int = 6,
) -> jnp.ndarray:
    """Deformable conv, sample-first (reference deformable_im2col order):
    one multi-tap Pallas sampling of the input, then a single
    (B*H*W, K*Cin) @ (K*Cin, Cout) GEMM. Exact for |dy| <= max_dy
    (vertical offsets clipped to the window edge like the other impls);
    horizontal offsets unrestricted."""
    b, h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2
    r_eff = max_dy + dilation
    pad_rows = r_eff + 2
    wp = _round_up(w + 2, 128)
    wpd = _round_up(w, 128)

    x_pad = jnp.pad(x, ((0, 0), (pad_rows, pad_rows), (1, wp - w - 1), (0, 0)))
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    kh = (jnp.arange(k, dtype=jnp.float32) // kernel_size - half) * dilation
    kw = (jnp.arange(k, dtype=jnp.float32) % kernel_size - half) * dilation
    dy = jnp.clip(offsets[..., 0::2].astype(jnp.float32),
                  -float(max_dy), float(max_dy))
    sy = iy + kh[None, None, None, :] + dy  # (b, h, w, k)
    sx = ix + kw[None, None, None, :] + offsets[..., 1::2].astype(jnp.float32)
    sy = jnp.moveaxis(sy, 3, 2)  # (b, h, k, w)
    sx = jnp.moveaxis(sx, 3, 2)
    pad_cols = ((0, 0), (0, 0), (0, 0), (0, wpd - w))
    sy = jnp.pad(sy, pad_cols, constant_values=-1e9)
    sx = jnp.pad(sx, pad_cols, constant_values=-1e9)

    s = deform_sample_mt(x_pad, sy, sx, r_eff)  # (b, h, k, wpd, cin)
    s = jnp.moveaxis(s[:, :, :, :w], 2, 3)  # (b, h, w, k, cin)
    wk = weight.reshape(k * cin, cout).astype(x.dtype)
    out = jnp.dot(
        s.reshape(b * h * w, k * cin), wk, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
