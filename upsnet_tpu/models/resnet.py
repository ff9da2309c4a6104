"""Caffe-style ResNet-50/101 backbone with frozen BatchNorm.

Reference: uber-research/UPSNet ``upsnet/models/resnet.py`` (SURVEY.md §2.3):
  * caffe weight lineage: BGR input, 0-255 range, per-channel mean
    subtraction only (handled in the data pipeline, see data/transforms.py);
  * ResNet v1 bottlenecks with the downsampling stride on the FIRST 1x1 conv
    (caffe layout — this is why every 3x3, deformable or not, is stride 1);
  * BN frozen everywhere (affine constants folded from running stats);
  * conv1 + res2 parameters frozen during training (optimizer mask,
    see train/optimizer.py);
  * ``-DCN`` variants swap the 3x3 conv of each bottleneck in res3-res5 for
    a deformable conv.

TPU-native: NHWC layout, bfloat16 compute / fp32 params, all convs fused by
XLA onto the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.models.layers import DeformConv, FrozenBatchNorm, conv, make_norm

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    # 1-block-per-stage micro backbone: same strides/interfaces, used by
    # tests and CI-style smoke runs where compile time matters
    "resnet_test": (1, 1, 1, 1),
}


class Bottleneck(nn.Module):
    features: int  # inner (3x3) width; output is 4x
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dcn_impl: str = "pallas"
    dcn_max_dy: int = 6
    dcn_boundary_grad: str = "clip"
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        residual = x
        if self.downsample:
            residual = conv(
                out_ch, 1, self.stride, dtype=self.dtype, name="shortcut_conv"
            )(x)
            residual = make_norm(self.norm, self.dtype, "shortcut_bn")(residual)
        # caffe ResNet v1: stride on the first 1x1
        y = conv(self.features, 1, self.stride, dtype=self.dtype, name="conv1")(x)
        y = make_norm(self.norm, self.dtype, "bn1")(y)
        y = nn.relu(y)
        if self.with_dcn:
            y = DeformConv(self.features, 3, use_bias=False, dtype=self.dtype,
                           impl=self.dcn_impl, max_dy=self.dcn_max_dy,
                           boundary_grad=self.dcn_boundary_grad,
                           name="conv2")(y)
        else:
            y = conv(self.features, 3, 1, dtype=self.dtype, name="conv2")(y)
        y = make_norm(self.norm, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = conv(out_ch, 1, 1, dtype=self.dtype, name="conv3")(y)
        y = make_norm(self.norm, self.dtype, "bn3")(y)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Returns (C2, C3, C4, C5) at strides (4, 8, 16, 32)."""

    depth: str = "resnet50"
    dcn_stages: Sequence[int] = ()  # stage indices in {3, 4, 5}
    dcn_impl: str = "pallas"
    dcn_max_dy: int = 6
    dcn_boundary_grad: str = "clip"
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), already mean-subtracted BGR
        blocks = STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)
        x = conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = make_norm(self.norm, self.dtype, "bn1")(x)
        x = nn.relu(x)
        # 3x3 stride-2 max pool, padding 1 (torch/caffe semantics)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        widths = (64, 128, 256, 512)
        for stage_i, (n_blocks, width) in enumerate(zip(blocks, widths), start=2):
            for b in range(n_blocks):
                x = Bottleneck(
                    features=width,
                    # res2 keeps stride 1 (input already at stride 4)
                    stride=2 if (b == 0 and stage_i > 2) else 1,
                    downsample=(b == 0),
                    with_dcn=(stage_i in self.dcn_stages),
                    dcn_impl=self.dcn_impl,
                    dcn_max_dy=self.dcn_max_dy,
                    dcn_boundary_grad=self.dcn_boundary_grad,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"res{stage_i}_{b}",
                )(x)
            outs.append(x)
        return tuple(outs)  # C2, C3, C4, C5
