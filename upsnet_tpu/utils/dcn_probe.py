"""DCN offset-magnitude probe (VERDICT r1 #2).

Every DeformConv sows its per-call max |dy| / |dx| into the flax
"intermediates" collection. This utility runs the dense trunk with
intermediates enabled and reports, per deformable layer, how far the
learned offsets actually reach — the evidence for whether the clipped
Pallas window (|dy| <= dcn_max_dy) is exact for a given checkpoint, and
the trigger data for the 'auto' impl's gather fallback
(ops/deform_conv.deform_conv2d_auto).

Usage:
    stats = probe_dcn_offsets(model, params, images)
    # {"fcn_head/subnet/dcn1": {"max_dy": 3.1, "max_dx": 4.7}, ...}
"""

from __future__ import annotations

import numpy as np


def _walk(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "offset_max":
                # sow default reduce: tuple of (2,) arrays, one per call
                vals = np.stack([np.asarray(t) for t in v])
                out[prefix] = {
                    "max_dy": float(vals[:, 0].max()),
                    "max_dx": float(vals[:, 1].max()),
                }
            else:
                _walk(v, f"{prefix}/{k}" if prefix else k, out)


def probe_dcn_offsets(model, params, images) -> dict:
    """Run the dense trunk once and return {layer_path: {max_dy, max_dx}}.

    images: (B, H, W, 3) preprocessed batch. Works for the backbone -DCN
    layers and the semantic-head subnet alike (anything that sows
    'offset_max').
    """
    _, mut = model.apply(
        {"params": params}, images, method="extract",
        mutable=["intermediates"],
    )
    out: dict = {}
    _walk(mut.get("intermediates", {}), "", out)
    return out


def check_window(stats: dict, max_dy: float, max_dx: float | None = None,
                 logger=None) -> bool:
    """True iff every probed layer's offsets fit the fast-path window."""
    ok = True
    for layer, s in sorted(stats.items()):
        layer_ok = s["max_dy"] <= max_dy and (
            max_dx is None or s["max_dx"] <= max_dx
        )
        ok &= layer_ok
        if logger:
            logger.info(
                "DCN offsets %-40s max|dy|=%.2f max|dx|=%.2f %s",
                layer, s["max_dy"], s["max_dx"],
                "in-window" if layer_ok else "BEYOND WINDOW (gather fallback)",
            )
    return ok
