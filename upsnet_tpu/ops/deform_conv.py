"""Deformable convolution (DCNv1) as gather + MXU matmul.

Replaces the reference's CUDA deformable-conv kernels (uber-research/UPSNet
``upsnet/operators/src/deform_conv/``, the MXNet-DCN port wrapped by
``upsnet/operators/modules/deform_conv.py``). Used by the semantic head on
every FPN level and by the ``-DCN`` backbone variants (SURVEY.md §2.1).

Semantics (DCNv1, Dai et al. 2017):
    y(p) = sum_k w_k . x(p + p_k * dilation + dp_k(p))
with bilinear sampling and zero padding: a sample contributes iff its
fractional position lies in (-1, H) x (-1, W); out-of-range corner taps are
zero. Offset channel layout matches the reference: ``(..., 2K)`` ordered
``(dy_0, dx_0, dy_1, dx_1, ...)`` row-major over the K = kh*kw taps.

TPU mapping: rather than materializing the (HW, K*Cin) im2col buffer (too
large at 1/4 scale), we loop over the K taps — each tap is 4 corner gathers
from the zero-padded input followed by one (HW, Cin) @ (Cin, Cout) matmul
that rides the MXU. Gradients (input scatter-add, offset, weight) come from
JAX autodiff through the gather — the reference needed three hand-written
CUDA backward kernels for this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_zero_pad(flat, y, x, h, w):
    """Bilinear sample with zero padding (MXNet deformable_im2col semantics).

    flat: (H*W, C) feature rows. y, x: (...,) fractional coords.
    Returns (..., C).
    """
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y_low = jnp.floor(y)
    x_low = jnp.floor(x)
    ly = y - y_low
    lx = x - x_low
    yl = y_low.astype(jnp.int32)
    xl = x_low.astype(jnp.int32)

    def corner(yy, xx, wgt):
        ok = inside & (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = flat[idx.reshape(-1)].reshape(idx.shape + (flat.shape[-1],))
        return vals * (wgt * ok)[..., None].astype(flat.dtype)

    return (
        corner(yl, xl, (1 - ly) * (1 - lx))
        + corner(yl, xl + 1, (1 - ly) * lx)
        + corner(yl + 1, xl, ly * (1 - lx))
        + corner(yl + 1, xl + 1, ly * lx)
    )


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation"))
def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    kernel_size: int = 3,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable 2-D convolution, stride 1, SAME padding.

    Args:
      x: (H, W, Cin) input features.
      offsets: (H, W, 2*K) learned offsets, K = kernel_size**2, channel
        order (dy_k, dx_k) per tap (reference layout).
      weight: (K, Cin, Cout) — tap-major so each tap is one MXU matmul.
      bias: optional (Cout,).
    Returns:
      (H, W, Cout).

    The stride-1 restriction matches the reference's actual usage: in the
    caffe-style ResNet the downsampling stride lives on the 1x1 convs, so
    every deformable 3x3 (semantic head and -DCN backbone) is stride 1.
    """
    h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    flat = x.reshape(h * w, cin)
    iy = jnp.arange(h, dtype=offsets.dtype)[:, None]
    ix = jnp.arange(w, dtype=offsets.dtype)[None, :]
    half = (kernel_size - 1) // 2

    out = jnp.zeros((h * w, cout), dtype=x.dtype)
    for tap in range(k):
        kh, kw = divmod(tap, kernel_size)
        dy = offsets[:, :, 2 * tap]
        dx = offsets[:, :, 2 * tap + 1]
        sy = iy + (kh - half) * dilation + dy
        sx = ix + (kw - half) * dilation + dx
        sampled = _bilinear_zero_pad(flat, sy, sx, h, w)  # (H, W, Cin)
        out = out + jnp.dot(
            sampled.reshape(h * w, cin),
            weight[tap],
            preferred_element_type=out.dtype,
        )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.reshape(h, w, cout)


def plain_conv_weight_as_deform(weight_hwio: jnp.ndarray) -> jnp.ndarray:
    """Reshape an (kh, kw, Cin, Cout) conv weight to the (K, Cin, Cout)
    tap-major layout ``deform_conv2d`` expects (zero offsets then reproduce
    the plain convolution — used by tests and by the -DCN weight surgery)."""
    kh, kw, cin, cout = weight_hwio.shape
    return weight_hwio.reshape(kh * kw, cin, cout)
