"""Feature Pyramid Network neck.

Reference: uber-research/UPSNet ``upsnet/models/fpn.py`` (SURVEY.md §2.3):
standard FPN — 1x1 laterals (256ch) on C2..C5, top-down nearest 2x upsample
+ add, 3x3 output convs -> P2..P5; P6 = stride-2 subsample of P5 (RPN only).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from upsnet_tpu.models.layers import conv


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), nearest neighbor (torch default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):  # (C2, C3, C4, C5)
        c2, c3, c4, c5 = feats
        lat = [
            conv(self.out_channels, 1, use_bias=True, dtype=self.dtype,
                 name=f"lateral{i}")(c)
            for i, c in enumerate((c2, c3, c4, c5), start=2)
        ]
        tops = [lat[3]]
        for i in (2, 1, 0):
            tops.insert(0, lat[i] + upsample2x_nearest(tops[0]))
        ps = [
            conv(self.out_channels, 3, use_bias=True, dtype=self.dtype,
                 name=f"output{i}")(t)
            for i, t in enumerate(tops, start=2)
        ]
        p6 = ps[3][:, ::2, ::2, :]  # stride-2 subsample of P5 (RPN only)
        return tuple(ps) + (p6,)  # P2, P3, P4, P5, P6
