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
                # sow default reduce: tuple of (3,) arrays, one per call:
                # [max |dy|, max |dx|, saturation rate] (models/layers.py)
                vals = np.stack([np.asarray(t) for t in v])
                out[prefix] = {
                    "max_dy": float(vals[:, 0].max()),
                    "max_dx": float(vals[:, 1].max()),
                }
                if vals.shape[1] > 2:
                    out[prefix]["sat_frac"] = float(vals[:, 2].max())
            else:
                _walk(v, f"{prefix}/{k}" if prefix else k, out)


def stats_from_intermediates(mut) -> dict:
    """{layer_path: {max_dy, max_dx}} from a mutable-apply result."""
    out: dict = {}
    _walk(mut.get("intermediates", {}), "", out)
    return out


def make_offset_probe(model):
    """Jitted probe: (params, images) -> intermediates pytree. Used by the
    trainer every display interval (train/trainer.py) so clip saturation
    of the windowed train impls is visible in metrics.jsonl."""
    import jax

    def fn(params, images):
        _, mut = model.apply(
            {"params": params}, images, method="extract",
            mutable=["intermediates"],
        )
        return mut

    return jax.jit(fn)


class SaturationWatch:
    """Sustained-saturation detector for the windowed DCN train impls.

    Feed it the per-layer offset stats every display interval. An
    interval counts as saturated when any layer's saturation RATE (the
    fraction of offset components at >= 90% of the window,
    models/layers.py sow) exceeds ``rate``, or when the raw offset
    maximum exceeds ``hard_mult * max_dy`` (raw divergence, the r3
    ~1e5 px runaway class). Stats without a rate (older probes, unit
    fixtures) fall back to the max-based tripwire at ``frac * max_dy``
    — a twitchy statistic over ~half a million offsets, which is why
    the rate exists: the r4 rehearsal's healthy O(5-8 px) tail would
    trip a max-based detector while <<1% of the field touches the
    window. After ``patience`` consecutive saturated intervals the
    watch raises (action='fail') or returns a warning message
    (action='warn'). Gradient beyond the window is zero under
    boundary_grad='clip', so saturation is invisible in the loss curve
    — this is the loud failure VERDICT r2 #4 asks for. Unit-tested in
    tests/test_dcn_saturation.py; driven by train/trainer.py.
    """

    def __init__(self, max_dy: float, impl: str, boundary_grad: str,
                 action: str = "fail", frac: float = 0.9,
                 patience: int = 3, rate: float = 0.05,
                 hard_mult: float = 3.0):
        self.max_dy = float(max_dy)
        self.impl = impl
        self.boundary_grad = boundary_grad
        self.action = action
        self.limit = frac * float(max_dy)
        self.rate = rate
        self.hard_limit = hard_mult * float(max_dy)
        self.patience = patience
        self.streak = 0

    def _remedies(self) -> str:
        """Config-aware remedy list (VERDICT r3 Weak #3): never recommend
        the setting that is already active, and never recommend
        'straight_through' — its two-sided escape gradient is itself a
        divergence mechanism (the r3 rehearsal integrated it to ~1e5 px;
        see ops/deform_conv.clip_offsets)."""
        opts = []
        if self.boundary_grad != "damped":
            opts.append(
                "set network.dcn_boundary_grad='damped' (inward-only "
                "escape gradient through the clip)"
            )
        opts.append(f"raise network.dcn_max_dy (currently {self.max_dy:g})")
        if self.impl != "gather":
            opts.append(
                "set network.dcn_impl_train='gather' (unbounded-exact, "
                "slower)"
            )
        return "; or ".join(opts)

    def update(self, stats: dict) -> tuple[dict, str | None]:
        """-> (metrics-entry fields, warning message or None); raises
        RuntimeError on sustained saturation when action='fail'."""
        if not stats:
            return {}, None
        max_dy = max(s["max_dy"] for s in stats.values())
        max_dx = max(s["max_dx"] for s in stats.values())
        fracs = [s["sat_frac"] for s in stats.values() if "sat_frac" in s]
        # record the active impl/boundary_grad alongside the magnitudes so
        # a metrics.jsonl stream is self-describing (VERDICT r3 #6)
        entry = {
            "dcn_max_dy": max_dy,
            "dcn_max_dx": max_dx,
            "dcn_impl": self.impl,
            "dcn_boundary_grad": self.boundary_grad,
        }
        worst = max(max_dy, max_dx)
        if fracs:
            entry["dcn_sat_frac"] = max(fracs)
            saturated = (entry["dcn_sat_frac"] > self.rate
                         or worst > self.hard_limit)
        else:  # rate-less stats (older probes / unit fixtures)
            saturated = worst > self.limit
        self.streak = self.streak + 1 if saturated else 0
        if self.streak < self.patience:
            return entry, None
        cause = (
            " boundary_grad='straight_through' is the LIKELY CAUSE: its "
            "outward gradient component is fabricated (the clipped forward "
            "is constant beyond the window) and integrates without a "
            "restoring force — switch to 'damped'."
            if self.boundary_grad == "straight_through"
            else ""
        )
        if fracs:
            what = (
                f"{100 * entry['dcn_sat_frac']:.1f}% of offsets at >= 90% "
                f"of the +-{self.max_dy:g} window (max |dy| {max_dy:.2f}, "
                f"|dx| {max_dx:.2f}; trip: rate > {100 * self.rate:g}% or "
                f"max > {self.hard_limit:g})"
            )
        else:
            what = (
                f"max |dy| = {max_dy:.2f} > "
                f"{self.limit / self.max_dy:.1f} * {self.max_dy:g}"
            )
        desc = (
            f"DCN offsets saturating the train window: {what} "
            f"for {self.streak} consecutive display intervals (impl "
            f"'{self.impl}' clips with boundary_grad="
            f"'{self.boundary_grad}').{cause} Remedies: {self._remedies()}."
        )
        if self.action == "fail":
            raise RuntimeError(desc)
        self.streak = 0  # warn once per streak
        return entry, desc


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
    return stats_from_intermediates(mut)


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
