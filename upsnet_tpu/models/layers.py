"""Shared building blocks: frozen BN, deformable conv module, inits."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.ops.deform_conv import deform_conv2d_batched, deform_conv2d_mxu


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics folded into affine constants.

    The reference backbone keeps BN frozen (affine constants computed from
    the pretrained running stats, never updated — SURVEY.md §2.3). The
    converter stores scale = gamma / sqrt(var + eps), bias = beta - mean *
    scale. stop_gradient keeps them constant regardless of optimizer wiring.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        scale = jax.lax.stop_gradient(scale).astype(self.dtype)
        bias = jax.lax.stop_gradient(bias).astype(self.dtype)
        return x.astype(self.dtype) * scale + bias


def make_norm(kind: str, dtype, name: str):
    """Backbone norm factory.

    'frozen_bn' (reference behavior: affine constants from pretrained
    stats) or 'gn' (GroupNorm 32 — enables stable from-scratch training,
    which frozen-identity affines cannot: activations double per residual
    block and ReLUs die). Param names (scale/bias) match, so the converter
    and checkpoints are layout-compatible.
    """
    if kind == "gn":
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dtype,
            param_dtype=jnp.float32, name=name,
        )
    return FrozenBatchNorm(dtype=dtype, name=name)


class DeformConv(nn.Module):
    """Deformable 3x3 conv: a plain conv (zero-initialized, reference
    behavior) predicts the offset field; the deformable kernel consumes it.

    Reference: ``upsnet/operators/modules/deform_conv.py`` + the sibling
    offset conv in the head definitions (SURVEY.md §2.2).
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    # 'auto':   Pallas window kernel while all offsets fit the window,
    #           lax.cond fallback to the exact gather path beyond it —
    #           provably DCNv1-exact for arbitrary offsets (default)
    # 'pallas': VMEM hat-matmul kernel (fastest; exact for |dy| <= max_dy;
    #           falls back to 'mxu' off-TPU or for unaligned shapes)
    # 'mxu':    dense XLA hat-matmul sampling (exact for |dy| <= max_dy)
    # 'gather': unbounded-exact XLA gather path
    # 'shift':  opt-in 9-tap shift-FMA kernel (exact for |dy|,|dx| <=
    #           max_dy; ties 'pallas' at trained offsets — experimentation
    #           only, see ops/deform_shift_pallas.py)
    impl: str = "auto"
    max_dy: int = 6
    # gradient at the window clip boundary for the clipping impls
    # ('pallas'/'mxu'): 'clip' or 'straight_through' (see
    # config.defaults.NetworkConfig.dcn_boundary_grad)
    boundary_grad: str = "clip"

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        k = self.kernel_size
        offsets = nn.Conv(
            2 * k * k,
            (k, k),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,  # offsets stay fp32: sub-pixel positions
            param_dtype=jnp.float32,
            name="offset_conv",
        )(x.astype(jnp.float32))
        cin = x.shape[-1]
        weight = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k * k, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # offset probe (VERDICT r1 #2): max |dy|, |dx| plus the SATURATION
        # RATE — the fraction of offset components at >= 90% of the clip
        # window. The max of ~half a million zero-init-trained offsets is
        # a twitchy tripwire (one far-reaching position would kill a
        # healthy run); a field is only pathologically pinned when a
        # sustained FRACTION sits at the edge. Retrievable via
        # mutable=["intermediates"] (utils/dcn_probe.py); costs nothing
        # when intermediates are not requested.
        ody = jnp.abs(offsets[..., 0::2])
        odx = jnp.abs(offsets[..., 1::2])
        edge = 0.9 * float(self.max_dy)
        self.sow(
            "intermediates",
            "offset_max",
            jnp.stack([
                jnp.max(ody),
                jnp.max(odx),
                jnp.mean(((ody >= edge) | (odx >= edge)).astype(jnp.float32)),
            ]),
        )
        w = weight.astype(self.dtype)
        b = bias.astype(self.dtype) if bias is not None else None
        if self.impl == "auto":
            from upsnet_tpu.ops.deform_conv import deform_conv2d_auto

            y = deform_conv2d_auto(
                x.astype(self.dtype), offsets, w, b,
                kernel_size=k, dilation=self.dilation, max_dy=self.max_dy,
            )
        elif self.impl == "pallas":
            from upsnet_tpu.ops.deform_conv_pallas import deform_conv2d_pallas

            y = deform_conv2d_pallas(
                x.astype(self.dtype), offsets, w, b,
                kernel_size=k, dilation=self.dilation, max_dy=self.max_dy,
                boundary_grad=self.boundary_grad,
            )
        elif self.impl == "shift":
            # opt-in 9-tap shift-FMA kernel (deform_shift_pallas.py): ties
            # the hat-matmul default at trained/smooth offsets, collapses at
            # random offset fields — kept selectable for experimentation,
            # never the routed default (see pallas_route NOTE). Falls back
            # to the default route when the shape is ineligible.
            from upsnet_tpu.ops.deform_conv_pallas import deform_conv2d_pallas
            from upsnet_tpu.ops.deform_shift_pallas import (
                deform_conv2d_pallas_shift,
                shift_route_ok,
            )

            if shift_route_ok(x.shape, self.features, self.max_dy,
                              self.max_dy, self.dilation, k * k):
                y = deform_conv2d_pallas_shift(
                    x.astype(self.dtype), offsets, w, b,
                    kernel_size=k, dilation=self.dilation,
                    max_dy=self.max_dy, max_dx=self.max_dy,
                    boundary_grad=self.boundary_grad,
                )
            else:
                y = deform_conv2d_pallas(
                    x.astype(self.dtype), offsets, w, b,
                    kernel_size=k, dilation=self.dilation,
                    max_dy=self.max_dy, boundary_grad=self.boundary_grad,
                )
        elif self.impl == "mxu":
            y = deform_conv2d_mxu(
                x.astype(self.dtype), offsets, w, b,
                kernel_size=k, dilation=self.dilation, max_dy=self.max_dy,
                boundary_grad=self.boundary_grad,
            )
        else:
            y = deform_conv2d_batched(
                x.astype(self.dtype), offsets, w, b,
                kernel_size=k, dilation=self.dilation,
            )
        # named for the remat policy (train.remat_policy='save_dcn'): the
        # sampling kernels are the expensive part of the rematted extract;
        # saving their outputs (~a few tens of MB at flagship shapes) lets
        # the backward's forward-recompute DCE them entirely. The VJP only
        # needs the projected per-tap windows, rebuilt from x by one cheap
        # matmul.
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(y, "dcn_out")


def conv(features, kernel, stride=1, use_bias=False, dtype=jnp.float32, name=None,
         kernel_init=None):
    """Plain conv helper with caffe-compatible SAME padding for odd kernels."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init or nn.initializers.he_normal(),
        name=name,
    )
