"""Paste per-RoI mask logits into full-image canvases, on device.

The reference pastes masks on the CPU at test time (SURVEY.md §3.2) and its
``MaskTerm`` module does the paste with torch ops for the panoptic head
(``upsnet/operators/modules/unary_logits.py``). Here one vectorized op
serves both: each canvas pixel center is inverse-mapped into the M x M mask
grid and bilinearly sampled (align_corners=False semantics, matching
``F.interpolate`` of the mask to the box size), zero outside the box.

Bilinear sampling from a fixed M x M grid is separable, so the paste is
computed as two hat-matrix matmuls per instance —
``out = (Ry mask) Rx^T`` with Ry (H, M) / Rx (W, M) holding the 1-D
bilinear weights ``max(0, 1 - |clip(coord) - j|)`` — which puts the whole
op on the MXU instead of 4 gathers per canvas pixel per instance (the
gather formulation was ~14 ms of the b8 fusion stage; the matmul form is
~100 x 2M MACs per image, noise). HIGHEST precision keeps f32 matmul
exactness so fusion argmax ties don't move vs the gather formulation.

Differentiable w.r.t. the mask logits — the panoptic loss backpropagates
through the paste into the mask head (SURVEY.md §3.3 train branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _hat_matrix(lo, hi, span, size: int, m: int, dtype):
    """(P, m) 1-D bilinear weights for one axis of one box.

    Pixel p's continuous mask coordinate is ``(p - lo + 0.5) / span * m -
    0.5`` clipped to [0, m-1]; weight against grid node j is the hat
    ``max(0, 1 - |c - j|)``, zeroed outside the box's pixel window
    [floor(lo), ceil(hi)]. The hat at a clipped/integral coordinate puts
    weight 1 on one node — the exact values the 4-corner gather
    formulation produces.
    """
    ps = jnp.arange(size, dtype=dtype)
    c = jnp.clip((ps - lo + 0.5) / span * m - 0.5, 0.0, m - 1.0)
    j = jnp.arange(m, dtype=dtype)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - j[None, :]))
    inside = (ps >= jnp.floor(lo)) & (ps <= jnp.ceil(hi))
    return wgt * inside[:, None]


def paste_mask_one(
    mask: jnp.ndarray,  # (M, M) logits or probabilities
    box: jnp.ndarray,  # (4,) x1, y1, x2, y2 in canvas coordinates
    out_hw: tuple[int, int],
    offset: float = 1.0,
) -> jnp.ndarray:
    """Paste one mask into an (H, W) canvas (zeros outside the box)."""
    return paste_masks(mask[None], box[None], out_hw, offset)[0]


@functools.partial(jax.jit, static_argnames=("out_hw", "offset"))
def paste_masks(
    masks: jnp.ndarray,  # (N, M, M)
    boxes: jnp.ndarray,  # (N, 4) in canvas coordinates
    out_hw: tuple[int, int],
    offset: float = 1.0,
) -> jnp.ndarray:
    """(N, M, M) masks + (N, 4) boxes -> (N, H, W) pasted canvases."""
    m = masks.shape[-1]
    h, w = out_hw
    dt = masks.dtype
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0] + offset, 1.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1] + offset, 1.0)
    ry = jax.vmap(lambda lo, hi, sp: _hat_matrix(lo, hi, sp, h, m, dt))(
        boxes[:, 1], boxes[:, 3], bh
    )  # (N, H, M)
    rx = jax.vmap(lambda lo, hi, sp: _hat_matrix(lo, hi, sp, w, m, dt))(
        boxes[:, 0], boxes[:, 2], bw
    )  # (N, W, M)
    hp = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("nhj,njk->nhk", ry, masks, precision=hp)
    return jnp.einsum("nhk,nwk->nhw", tmp, rx, precision=hp)
