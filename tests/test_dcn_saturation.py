"""Clipped-gradient training gap (VERDICT r2 #4).

The windowed DCN train impls clip |dy| to max_dy; DCNv1 training is
unbounded (reference upsnet/operators/src/deform_conv/, SURVEY.md §2.1).
Two defenses are tested here:

1. `boundary_grad='straight_through'` — a saturated offset keeps a
   nonzero escape gradient through the clip (ops/deform_conv.py
   clip_offsets), so training can pull it back (or keep pushing, making
   the saturation telemetry fire) instead of freezing silently; a short
   SGD loop on a saturated layer must actually MOVE the offset.
2. `SaturationWatch` — the trainer-side detector that turns sustained
   window saturation into a loud failure / warning + metrics fields
   (utils/dcn_probe.py, driven by train/trainer.py every display_iter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.ops.deform_conv import (
    clip_offsets,
    deform_conv2d_batched,
    deform_conv2d_mxu,
)
from upsnet_tpu.utils.dcn_probe import SaturationWatch

MAX_DY = 2


def _inputs(rng, b=1, h=8, w=8, cin=4, cout=4):
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    weight = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.3)
    bias = jnp.asarray(np.zeros(cout, np.float32))
    return x, weight, bias


def _offsets_from_dy(dy, shape):
    """All-tap vertical offset = scalar dy, horizontal = 0."""
    off = jnp.zeros(shape[:3] + (18,), jnp.float32)
    return off.at[..., 0::2].set(dy)


def test_clip_boundary_grad_is_zero_but_straight_through_escapes(rng):
    """At a saturated offset (|dy| > max_dy) the clipped impl's offset
    gradient is exactly zero; straight_through keeps the sample-position
    gradient alive, signed like the exact unbounded path's gradient."""
    x, weight, bias = _inputs(rng)

    def loss(dy, bg):
        off = _offsets_from_dy(dy, x.shape)
        out = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                                boundary_grad=bg)
        return jnp.sum(out * out)

    def loss_exact(dy):
        off = _offsets_from_dy(dy, x.shape)
        return jnp.sum(deform_conv2d_batched(x, off, weight, bias) ** 2)

    dy_sat = jnp.asarray(MAX_DY + 1.5)
    g_clip = jax.grad(loss)(dy_sat, "clip")
    g_st = jax.grad(loss)(dy_sat, "straight_through")
    assert float(g_clip) == 0.0
    assert float(g_st) != 0.0
    # straight-through's escape gradient is the window-edge slope: same
    # sign as the exact path's gradient AT the (reachable) edge
    g_edge = jax.grad(loss_exact)(jnp.asarray(MAX_DY - 1e-3))
    assert np.sign(float(g_st)) == np.sign(float(g_edge))


def test_forward_identical_under_both_boundary_grads(rng):
    """boundary_grad changes gradients only; forwards agree to the 1e-3
    interior epsilon straight_through clips by."""
    x, weight, bias = _inputs(rng)
    off = jnp.asarray(rng.randn(*x.shape[:3], 18).astype(np.float32) * 4)
    a = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                          boundary_grad="clip")
    b = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                          boundary_grad="straight_through")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
    # strictly-inside offsets: bit-identical (the epsilon only bites at
    # the boundary)
    off_in = jnp.clip(off, -(MAX_DY - 0.5), MAX_DY - 0.5)
    a = deform_conv2d_mxu(x, off_in, weight, bias, max_dy=MAX_DY,
                          boundary_grad="clip")
    b = deform_conv2d_mxu(x, off_in, weight, bias, max_dy=MAX_DY,
                          boundary_grad="straight_through")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_straight_through_training_moves_a_saturated_offset(rng):
    """Train a saturated offset scalar against a target built from the
    exact path at dy=+1: under 'clip' SGD is frozen (grad 0); under
    'straight_through' the offset retreats into the window and the loss
    drops — the non-zero escape gradient VERDICT r2 #4 requires.

    The input is a linear ramp in the row index so the sampled value —
    and hence the loss — is monotone in dy: the window-edge slope then
    genuinely points back toward the dy=1 target (with random inputs the
    local slope at the edge may point uphill, which is a property of the
    data, not of the gradient path)."""
    _, weight, bias = _inputs(rng)
    x = jnp.broadcast_to(
        jnp.arange(8, dtype=jnp.float32)[None, :, None, None], (1, 8, 8, 4)
    ) * 0.5
    target = deform_conv2d_batched(
        x, _offsets_from_dy(jnp.asarray(1.0), x.shape), weight, bias
    )

    def loss(dy, bg):
        off = _offsets_from_dy(dy, x.shape)
        out = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                                boundary_grad=bg)
        return jnp.mean((out - target) ** 2)

    def train(bg, steps=40, lr=0.05):
        dy = jnp.asarray(MAX_DY + 2.0)  # saturated start
        g = jax.jit(jax.grad(loss), static_argnums=1)
        for _ in range(steps):
            dy = dy - lr * g(dy, bg)
        return float(dy), float(loss(dy, bg))

    dy_clip, _ = train("clip")
    assert dy_clip == MAX_DY + 2.0  # frozen: zero gradient throughout
    dy_st, loss_st = train("straight_through")
    assert dy_st < MAX_DY  # escaped back inside the window
    assert loss_st < float(loss(jnp.asarray(MAX_DY + 2.0), "clip")) * 0.5


def test_clip_offsets_semantics():
    v = jnp.asarray([-5.0, -1.0, 0.0, 3.0])
    np.testing.assert_array_equal(
        np.asarray(clip_offsets(v, 2.0, "clip")), [-2.0, -1.0, 0.0, 2.0]
    )
    st = np.asarray(clip_offsets(v, 2.0, "straight_through"))
    np.testing.assert_allclose(st, [-2.0, -1.0, 0.0, 2.0], atol=2e-3)
    dm = np.asarray(clip_offsets(v, 2.0, "damped"))
    np.testing.assert_allclose(dm, [-2.0, -1.0, 0.0, 2.0], atol=2e-3)


def test_damped_gradient_is_inward_only():
    """Beyond the window, 'damped' passes a gradient iff descent with it
    would move the offset back toward the window; inside the window it is
    the identity (same as straight_through / plain clip)."""

    def val(v, bg):
        return jnp.sum(clip_offsets(v, 2.0, bg) ** 2)

    # saturated positive offset: d(val)/dv through the clip edge is
    # positive (descent retreats inward) -> kept
    g_in = jax.grad(val)(jnp.asarray(3.0), "damped")
    assert float(g_in) > 0.0
    # flip the loss sign so the gradient points outward -> zeroed
    g_out = jax.grad(lambda v: -val(v, "damped"))(jnp.asarray(3.0))
    assert float(g_out) == 0.0
    # but straight_through keeps the outward component — the divergence
    # mechanism of VERDICT r3 Weak #2
    g_out_st = jax.grad(lambda v: -val(v, "straight_through"))(
        jnp.asarray(3.0)
    )
    assert float(g_out_st) < 0.0
    # strictly inside: identity for both
    for bg in ("damped", "straight_through"):
        g = jax.grad(val)(jnp.asarray(1.0), bg)
        assert float(g) == pytest.approx(2.0)


def test_damped_training_moves_a_saturated_offset(rng):
    """'damped' keeps the escape-hatch property: a saturated offset whose
    target lies inside the window retreats under SGD, same as
    straight_through (the inward gradient component is preserved)."""
    _, weight, bias = _inputs(rng)
    x = jnp.broadcast_to(
        jnp.arange(8, dtype=jnp.float32)[None, :, None, None], (1, 8, 8, 4)
    ) * 0.5
    target = deform_conv2d_batched(
        x, _offsets_from_dy(jnp.asarray(1.0), x.shape), weight, bias
    )

    def loss(dy):
        off = _offsets_from_dy(dy, x.shape)
        out = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                                boundary_grad="damped")
        return jnp.mean((out - target) ** 2)

    dy = jnp.asarray(MAX_DY + 2.0)
    g = jax.jit(jax.grad(loss))
    for _ in range(40):
        dy = dy - 0.05 * g(dy)
    assert float(dy) < MAX_DY  # escaped back inside the window


def test_damped_500_steps_stay_bounded_where_straight_through_diverges(rng):
    """The r3 divergence regression (VERDICT r3 next #1a): the r3
    rehearsal's mechanism was a loss that keeps asking for a farther
    sample than the window can provide — the cleanest deterministic
    model is loss = -mean(out) ("sample farther is always better").
    Beyond the window the clipped forward is constant, so the TRUE
    gradient is zero there; two-sided straight-through fabricates the
    edge sample-position gradient instead and SGD integrates it without
    bound (the ~1e5 px runaway). 500 SGD steps must keep
    max|dy| <= 2 * max_dy under 'damped' (outward component zeroed);
    the same loop under straight_through must exceed it (the pathology
    is real and the damping is what prevents it)."""
    _, weight, bias = _inputs(rng)
    # positive taps so "sample farther" helps EVERY tap: with mixed-sign
    # weights the per-tap edge gradients nearly cancel and the fabricated
    # outward pull is too weak to demonstrate the integration in 500 steps
    weight = jnp.abs(weight)
    x = jnp.broadcast_to(
        jnp.arange(32, dtype=jnp.float32)[None, :, None, None],
        (1, 32, 8, 4),
    ) * 0.5

    def loss(dy, bg):
        off = _offsets_from_dy(dy, x.shape)
        out = deform_conv2d_mxu(x, off, weight, bias, max_dy=MAX_DY,
                                boundary_grad=bg)
        # interior output rows only: out-of-bounds samples are zeroed, so
        # near the border "farther" LOSES signal and the edge gradient
        # flips inward — interior rows keep the outward pull monotone,
        # which is the regime the r3 rehearsal diverged in
        return -jnp.mean(out[:, 8:16])

    g = jax.jit(jax.grad(loss), static_argnums=1)
    # scale lr so ANY single in-window step moves dy by <= 0.25 px: the
    # regression is about INTEGRATING the fabricated outward gradient
    # over many steps (the r3 runaway), not single-step overshoot.  The
    # calibration grid avoids integer dy, where the bilinear hat's
    # -sign(0) convention makes a localized gradient spike.
    g_max = max(
        abs(float(g(jnp.asarray(v), "clip")))
        for v in np.linspace(-MAX_DY + 0.07, MAX_DY - 0.07, 40)
        if abs(v - round(v)) > 0.03
    )
    lr = 0.25 / g_max

    def train(bg, steps=500):
        dy = jnp.asarray(0.3)  # off-integer start (same spike avoidance)
        peak = 0.0
        for _ in range(steps):
            dy = dy - lr * g(dy, bg)
            peak = max(peak, abs(float(dy)))
        return peak

    peak_damped = train("damped")
    assert peak_damped <= 2 * MAX_DY, peak_damped
    # same lr, same loss: two-sided straight-through accumulates the
    # constant fabricated edge gradient and leaves the 2x window
    peak_st = train("straight_through")
    assert peak_st > 2 * MAX_DY, peak_st


def test_saturation_watch_fails_loudly_after_patience():
    watch = SaturationWatch(6, "pallas", "clip", action="fail", patience=3)
    sat = {"res5/conv2": {"max_dy": 5.9, "max_dx": 1.0},
           "fcn/dcn1": {"max_dy": 2.0, "max_dx": 0.5}}
    ok = {"res5/conv2": {"max_dy": 3.0, "max_dx": 1.0}}
    for _ in range(2):
        fields, warning = watch.update(sat)
        assert warning is None
        assert fields["dcn_max_dy"] == pytest.approx(5.9)
        assert fields["dcn_max_dx"] == pytest.approx(1.0)
    # a healthy interval resets the streak
    watch.update(ok)
    watch.update(sat)
    watch.update(sat)
    with pytest.raises(RuntimeError, match="saturating the train window"):
        watch.update(sat)


def test_saturation_watch_warn_mode_and_empty_stats():
    watch = SaturationWatch(6, "mxu", "clip", action="warn", patience=2)
    assert watch.update({}) == ({}, None)  # no DCN layers probed
    sat = {"l": {"max_dy": 6.0, "max_dx": 0.0}}
    _, w1 = watch.update(sat)
    _, w2 = watch.update(sat)
    assert w1 is None and w2 is not None
    # config-aware remedies (VERDICT r3 Weak #3): recommend 'damped',
    # never the already-active setting, never straight_through
    assert "damped" in w2 and "straight_through" not in w2
    # warn resets the streak — next update is quiet again
    _, w3 = watch.update(sat)
    assert w3 is None


def test_saturation_watch_rate_based_when_sat_frac_present():
    """With a saturation rate in the stats, the tripwire is the RATE, not
    the max: a healthy far-reaching tail (max near/over the window but
    <<rate of the field at the edge — the r4 rehearsal regime) must NOT
    trip; a pinned field (rate > 5%) must; and a raw-divergence max
    (> 3x window) trips even at low rate."""
    healthy_tail = {"l": {"max_dy": 7.3, "max_dx": 8.2, "sat_frac": 0.002}}
    pinned = {"l": {"max_dy": 5.9, "max_dx": 5.9, "sat_frac": 0.30}}
    runaway = {"l": {"max_dy": 120.0, "max_dx": 80.0, "sat_frac": 0.004}}

    w = SaturationWatch(6, "pallas", "damped", action="fail", patience=2)
    for _ in range(5):
        fields, warning = w.update(healthy_tail)
        assert warning is None
        assert fields["dcn_sat_frac"] == pytest.approx(0.002)

    w = SaturationWatch(6, "pallas", "damped", action="fail", patience=2)
    _, warning = w.update(pinned)
    assert warning is None  # patience not yet reached
    with pytest.raises(RuntimeError, match="% of offsets"):
        w.update(pinned)

    w = SaturationWatch(6, "pallas", "damped", action="warn", patience=1)
    _, warning = w.update(runaway)
    assert warning is not None and "max |dy| 120.00" in warning


def test_deform_conv_module_sows_sat_frac(rng):
    """The DeformConv sow carries [max|dy|, max|dx|, sat rate] and the
    probe walk surfaces all three (models/layers.py + dcn_probe._walk)."""
    import flax.linen as nn

    from upsnet_tpu.models.layers import DeformConv
    from upsnet_tpu.utils.dcn_probe import stats_from_intermediates

    m = DeformConv(features=8, impl="gather", max_dy=6)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    # push the offset conv bias so offsets are uniform ~5.9 px (at >= 90%
    # of the window): rate must be 1.0 and the maxima ~5.9
    params = dict(params)
    params["offset_conv"] = dict(
        params["offset_conv"],
        bias=jnp.full_like(params["offset_conv"]["bias"], 5.9),
    )
    _, mut = m.apply({"params": params}, x, mutable=["intermediates"])
    stats = stats_from_intermediates(mut)
    (layer_stats,) = stats.values()
    assert layer_stats["max_dy"] == pytest.approx(5.9, abs=1e-4)
    assert layer_stats["max_dx"] == pytest.approx(5.9, abs=1e-4)
    assert layer_stats["sat_frac"] == pytest.approx(1.0)


def test_saturation_watch_remedies_are_config_aware():
    """The remedy list must never recommend the active setting and must
    name straight_through as the likely cause when it is active
    (VERDICT r3 Weak #3: the r3 rehearsal log recommended switching to
    straight_through while straight_through was causing the runaway)."""
    sat = {"l": {"max_dy": 6.0, "max_dx": 0.0}}

    # straight_through active: named as LIKELY CAUSE, 'damped' suggested
    w = SaturationWatch(6, "pallas", "straight_through", action="warn",
                        patience=1)
    fields, msg = w.update(sat)
    assert "LIKELY CAUSE" in msg and "damped" in msg
    assert fields["dcn_boundary_grad"] == "straight_through"
    assert fields["dcn_impl"] == "pallas"

    # damped active: not re-recommended; gather + max_dy remain
    w = SaturationWatch(6, "pallas", "damped", action="warn", patience=1)
    _, msg = w.update(sat)
    assert "dcn_boundary_grad='damped'" not in msg
    assert "dcn_max_dy" in msg and "gather" in msg

    # gather impl active: the gather remedy is dropped
    w = SaturationWatch(6, "gather", "clip", action="warn", patience=1)
    _, msg = w.update(sat)
    assert "dcn_impl_train='gather'" not in msg
