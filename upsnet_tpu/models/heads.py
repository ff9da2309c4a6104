"""RCNN box head and mask head.

Reference (SURVEY.md §2.3):
  * box head: ROIAlign 7x7 -> flatten -> FC1024 -> FC1024 ->
    (cls N+1 softmax, class-specific bbox deltas);
  * mask head: ROIAlign 14x14 -> 4x conv3x3(256) -> 2x deconv -> 1x1 ->
    28x28 per-class mask logits.

ROIAlign itself is ops/roi_align.py; these modules consume pooled features
(B*R, P, P, C) so the pooling stays outside the parametered module (keeps
the heads reusable for train/eval branches with different RoI sets).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.models.layers import conv


class BoxHead(nn.Module):
    num_classes: int  # includes background
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # (R, P, P, C)
        r = pooled.shape[0]
        x = pooled.astype(self.dtype).reshape(r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc2")(x))
        cls_score = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01), name="cls_score")(x)
        bbox_pred = nn.Dense(
            self.num_classes * 4, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.001), name="bbox_pred")(x)
        return cls_score, bbox_pred


class MaskHead(nn.Module):
    num_classes: int  # includes background; channel 0 unused (Detectron)
    channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # (R, 14, 14, C) -> (R, 28, 28, num_classes)
        x = pooled.astype(self.dtype)
        for i in range(self.num_convs):
            x = nn.relu(conv(self.channels, 3, use_bias=True, dtype=self.dtype,
                             name=f"conv{i + 1}")(x))
        x = nn.relu(
            nn.ConvTranspose(
                self.channels, (2, 2), strides=(2, 2), dtype=self.dtype,
                param_dtype=jnp.float32, name="deconv")(x)
        )
        return conv(self.num_classes, 1, use_bias=True, dtype=self.dtype,
                    name="mask_score")(x)
