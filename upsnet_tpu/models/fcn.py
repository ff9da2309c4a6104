"""Semantic segmentation (FCN) head with deformable convolutions.

Reference: uber-research/UPSNet ``upsnet/models/fcn.py`` (SURVEY.md §2.3):
P2..P5 each pass through a shared-weight subnet of stacked 3x3 deformable
convs (128 ch); every level is bilinearly upsampled to 1/4 scale (P2's
resolution), concatenated, then a 1x1 conv produces ``num_seg_classes``
logits (COCO 133 = 53 stuff first + 80 things; Cityscapes 19).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.models.layers import DeformConv, conv


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) bilinear resize, half-pixel centers (torch
    align_corners=False semantics, which the reference's F.interpolate
    upsampling in the FCN head uses)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


class FCNSubNet(nn.Module):
    channels: int = 128
    num_layers: int = 2
    with_dcn: bool = True
    dcn_impl: str = "pallas"
    dcn_max_dy: int = 6
    dcn_boundary_grad: str = "clip"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            if self.with_dcn:
                x = DeformConv(self.channels, 3, dtype=self.dtype,
                               impl=self.dcn_impl, max_dy=self.dcn_max_dy,
                               boundary_grad=self.dcn_boundary_grad,
                               name=f"dcn{i + 1}")(x)
            else:
                x = conv(self.channels, 3, use_bias=True, dtype=self.dtype,
                         name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        return x


class FCNHead(nn.Module):
    num_classes: int
    channels: int = 128
    num_layers: int = 2
    with_dcn: bool = True
    shared_subnet: bool = True
    dcn_impl: str = "pallas"
    dcn_max_dy: int = 6
    dcn_boundary_grad: str = "clip"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):  # (P2, P3, P4, P5)
        p2 = pyramid[0]
        out_hw = (p2.shape[1], p2.shape[2])
        feats = []
        shared = (
            FCNSubNet(self.channels, self.num_layers, self.with_dcn,
                      self.dcn_impl, self.dcn_max_dy,
                      dcn_boundary_grad=self.dcn_boundary_grad,
                      dtype=self.dtype, name="subnet")
            if self.shared_subnet
            else None
        )
        for i, p in enumerate(pyramid, start=2):
            net = shared if shared is not None else FCNSubNet(
                self.channels, self.num_layers, self.with_dcn,
                self.dcn_impl, self.dcn_max_dy,
                dcn_boundary_grad=self.dcn_boundary_grad,
                dtype=self.dtype, name=f"subnet{i}")
            f = net(p)
            if f.shape[1:3] != out_hw:
                f = resize_bilinear(f, out_hw)
            feats.append(f)
        x = jnp.concatenate(feats, axis=-1)
        logits = conv(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                      name="score")(x)
        # (B, H/4, W/4, num_seg_classes) and the fused 1/4-scale feature
        # (reused by the panoptic head's SegTerm — avoids recompute)
        return logits, x
