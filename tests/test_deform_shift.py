"""Shift-kernel deformable conv vs the exact gather path (interpret mode on
CPU — SURVEY.md §5.2 sanitizer stand-in).

Covers the opt-in shift route (DeformConv(impl='shift') — measured to tie
the hat-matmul default at trained offsets, see pallas_route NOTE): forward,
all three gradients, window clipping semantics, inside-mask edges, dilation,
and the odd-shape fallbacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.ops import deform_shift_pallas as dsp
from upsnet_tpu.ops.deform_conv import clip_offsets, deform_conv2d_batched


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def fake_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", fake_call)
    yield


def _setup(rng, b=1, h=16, w=20, cin=16, cout=128, off_scale=3.0, k=18):
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offsets = rng.uniform(-off_scale, off_scale, (b, h, w, k)).astype(
        np.float32
    )
    weight = rng.randn(k // 2, cin, cout).astype(np.float32) * 0.1
    return jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)


def test_shift_fwd_matches_exact(rng):
    x, offsets, weight = _setup(rng)
    exact = deform_conv2d_batched(x, offsets, weight)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, max_dy=6,
                                         max_dx=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_fwd_batch_and_bias(rng):
    x, offsets, weight = _setup(rng, b=2)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    exact = deform_conv2d_batched(x, offsets, weight, bias)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, bias, max_dy=6,
                                         max_dx=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_fwd_dilation(rng):
    x, offsets, weight = _setup(rng)
    exact = deform_conv2d_batched(x, offsets, weight, dilation=2)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, dilation=2,
                                         max_dy=6, max_dx=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_grads_match_exact(rng):
    x, offsets, weight = _setup(rng)

    def loss(fn):
        def f(x, o, w):
            return jnp.sum(fn(x, o, w).astype(jnp.float32) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    gs = loss(lambda x, o, w: dsp.deform_conv2d_pallas_shift(
        x, o, w, max_dy=6, max_dx=6))(x, offsets, weight)
    ge = loss(deform_conv2d_batched)(x, offsets, weight)
    for name, a, b in zip(("gx", "goff", "gw"), gs, ge):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-3,
            err_msg=name,
        )


def test_shift_zero_offsets_is_plain_conv(rng):
    x, _, weight = _setup(rng)
    offsets = jnp.zeros((1, 16, 20, 18), jnp.float32)
    exact = deform_conv2d_batched(x, offsets, weight)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, max_dy=6,
                                         max_dx=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_clips_to_window_edge(rng):
    """Offsets beyond +-max are clipped: must equal the gather path run on
    pre-clipped offsets (the documented fast-path semantics)."""
    x, offsets, weight = _setup(rng, off_scale=9.0)
    clipped = jnp.zeros_like(offsets).at[..., 0::2].set(
        clip_offsets(offsets[..., 0::2], 4.0)
    ).at[..., 1::2].set(clip_offsets(offsets[..., 1::2], 4.0))
    exact = deform_conv2d_batched(x, clipped, weight)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, max_dy=4,
                                         max_dx=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_samples_outside_image_are_zero(rng):
    """dy=+5 pushes the bottom rows' samples past the feature map: the
    inside-mask must zero them exactly like the reference deformable_im2col
    zeroes out-of-bounds samples."""
    x, _, weight = _setup(rng, h=16, w=20)
    offsets = jnp.zeros((1, 16, 20, 18)).at[..., 0::2].set(5.0)
    got = dsp.deform_conv2d_pallas_shift(x, offsets, weight, max_dy=6,
                                         max_dx=6)
    exact = deform_conv2d_batched(x, offsets, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-4)


def test_shift_route_eligibility(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert dsp.shift_route_ok((8, 208, 336, 128), 128, 6, 6, 1)
    # P4 (h=52) has no valid row block -> ineligible
    assert not dsp.shift_route_ok((8, 52, 84, 128), 128, 6, 6, 1)
    # odd cout -> ineligible
    assert not dsp.shift_route_ok((8, 208, 336, 128), 96, 6, 6, 1)


def test_shift_impl_via_layer(rng):
    """DeformConv(impl='shift') produces the exact-gather result; ineligible
    shapes fall back to the default pallas route (still exact)."""
    from upsnet_tpu.models.layers import DeformConv

    x = jnp.asarray(rng.randn(1, 16, 20, 16).astype(np.float32))
    layer = DeformConv(features=128, impl="shift", max_dy=4)
    ref = DeformConv(features=128, impl="gather", max_dy=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    got = layer.apply(params, x)
    want = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_shift_straight_through_boundary_grad(rng):
    """Saturated offsets keep a nonzero escape gradient with
    boundary_grad='straight_through' (zero with 'clip')."""
    x, _, weight = _setup(rng)
    offsets = jnp.zeros((1, 16, 20, 18)).at[..., 0::2].set(8.0)  # > max_dy

    def loss(o, bg):
        out = dsp.deform_conv2d_pallas_shift(
            x, o, weight, max_dy=4, max_dx=4, boundary_grad=bg
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_st = jax.grad(lambda o: loss(o, "straight_through"))(offsets)
    g_cl = jax.grad(lambda o: loss(o, "clip"))(offsets)
    assert float(jnp.max(jnp.abs(g_st[..., 0::2]))) > 0.0
    assert float(jnp.max(jnp.abs(g_cl[..., 0::2]))) == 0.0
