"""Region Proposal Network head, shared across FPN levels.

Reference: uber-research/UPSNet RPN (SURVEY.md §2.3): 3x3 conv(256) + ReLU
-> 1x1 objectness (per-anchor 2-way softmax) + 1x1 bbox deltas (4/anchor),
the SAME head applied to P2..P6. Anchor enumeration lives in ops/anchors.py.

Outputs are returned per level as (B, H, W, A*2) cls and (B, H, W, A*4) bbox
so downstream code reshapes row-major over (y, x, a) — matching the anchor
grid layout.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.models.layers import conv


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        conv_shared = conv(self.channels, 3, use_bias=True, dtype=self.dtype,
                           name="conv")
        cls_conv = conv(self.num_anchors * 2, 1, use_bias=True, dtype=self.dtype,
                        name="cls_score")
        bbox_conv = conv(self.num_anchors * 4, 1, use_bias=True, dtype=self.dtype,
                         name="bbox_pred")
        cls_out, bbox_out = [], []
        for p in pyramid:
            h = nn.relu(conv_shared(p))
            cls_out.append(cls_conv(h))
            bbox_out.append(bbox_conv(h))
        return cls_out, bbox_out
