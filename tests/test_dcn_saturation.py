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
    assert "straight_through" in w2
    # warn resets the streak — next update is quiet again
    _, w3 = watch.update(sat)
    assert w3 is None
