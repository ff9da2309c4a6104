"""Paste per-RoI mask logits into full-image canvases, on device.

The reference pastes masks on the CPU at test time (SURVEY.md §3.2) and its
``MaskTerm`` module does the paste with torch ops for the panoptic head
(``upsnet/operators/modules/unary_logits.py``). Here one vectorized op
serves both: each canvas pixel center is inverse-mapped into the M x M mask
grid and bilinearly sampled (align_corners=False semantics, matching
``F.interpolate`` of the mask to the box size), zero outside the box.

Differentiable w.r.t. the mask logits — the panoptic loss backpropagates
through the paste into the mask head (SURVEY.md §3.3 train branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def paste_mask_one(
    mask: jnp.ndarray,  # (M, M) logits or probabilities
    box: jnp.ndarray,  # (4,) x1, y1, x2, y2 in canvas coordinates
    out_hw: tuple[int, int],
    offset: float = 1.0,
) -> jnp.ndarray:
    """Paste one mask into an (H, W) canvas (zeros outside the box)."""
    m = mask.shape[0]
    h, w = out_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1 + offset, 1.0)
    bh = jnp.maximum(y2 - y1 + offset, 1.0)
    ys = jnp.arange(h, dtype=mask.dtype)
    xs = jnp.arange(w, dtype=mask.dtype)
    # canvas pixel center -> continuous mask coordinate (align_corners=False)
    my = (ys - y1 + 0.5) / bh * m - 0.5
    mx = (xs - x1 + 0.5) / bw * m - 0.5
    inside_y = (ys >= jnp.floor(y1)) & (ys <= jnp.ceil(y2))
    inside_x = (xs >= jnp.floor(x1)) & (xs <= jnp.ceil(x2))

    def sample_axis(coord, size):
        c = jnp.clip(coord, 0.0, size - 1.0)
        lo = jnp.floor(c)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return lo, hi, frac

    yl, yh, fy = sample_axis(my, m)
    xl, xh, fx = sample_axis(mx, m)
    v_ll = mask[yl][:, xl]
    v_lh = mask[yl][:, xh]
    v_hl = mask[yh][:, xl]
    v_hh = mask[yh][:, xh]
    fy = fy[:, None]
    fx = fx[None, :]
    out = (
        v_ll * (1 - fy) * (1 - fx)
        + v_lh * (1 - fy) * fx
        + v_hl * fy * (1 - fx)
        + v_hh * fy * fx
    )
    return out * (inside_y[:, None] & inside_x[None, :])


@functools.partial(jax.jit, static_argnames=("out_hw", "offset"))
def paste_masks(
    masks: jnp.ndarray,  # (N, M, M)
    boxes: jnp.ndarray,  # (N, 4) in canvas coordinates
    out_hw: tuple[int, int],
    offset: float = 1.0,
) -> jnp.ndarray:
    """(N, M, M) masks + (N, 4) boxes -> (N, H, W) pasted canvases."""
    fn = lambda mk, bx: paste_mask_one(mk, bx, out_hw, offset)
    return jax.vmap(fn)(masks, boxes)
