"""Pallas deformable-sampling kernel vs jnp references (interpret mode on
CPU — the SURVEY.md §5.2 stand-in for kernel sanitizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upsnet_tpu.ops import deform_conv_pallas as dcp
from upsnet_tpu.ops.deform_conv import deform_conv2d_batched, deform_conv2d_mxu


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (no TPU in the test env)."""
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def fake_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", fake_call)
    yield


def test_sample_pallas_matches_ref(rng):
    b, h, w, c = 2, 16, 20, 128
    r = 4
    wp = 128  # round_up(22, 128)
    y = rng.randn(b, h + 2 * (r + 2), wp, c).astype(np.float32)
    sy = (rng.randn(b, h, w) * 2 + np.arange(h)[None, :, None]).astype(np.float32)
    sx = (rng.randn(b, h, w) * 2 + np.arange(w)[None, None, :]).astype(np.float32)
    got = dcp._sample_pallas(jnp.asarray(y), jnp.asarray(sy), jnp.asarray(sx), r)
    ref = dcp._sample_ref(jnp.asarray(y), jnp.asarray(sy), jnp.asarray(sx), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_deform_conv_pallas_matches_exact(rng):
    x = rng.randn(1, 16, 20, 16).astype(np.float32)
    offsets = (rng.randn(1, 16, 20, 18) * 1.5).astype(np.float32)
    weight = rng.randn(9, 16, 128).astype(np.float32) * 0.1
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)
    )
    got = dcp.deform_conv2d_pallas(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), max_dy=6
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)


def test_mxu_variant_matches_exact(rng):
    x = rng.randn(2, 12, 14, 8).astype(np.float32)
    offsets = (rng.randn(2, 12, 14, 18) * 1.5).astype(np.float32)
    weight = rng.randn(9, 8, 6).astype(np.float32) * 0.1
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)
    )
    got = deform_conv2d_mxu(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), max_dy=6
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)


def test_pallas_gradients_flow(rng):
    x = jnp.asarray(rng.randn(1, 16, 20, 16).astype(np.float32))
    offsets = jnp.asarray((rng.randn(1, 16, 20, 18) * 0.5).astype(np.float32))
    weight = jnp.asarray(rng.randn(9, 16, 128).astype(np.float32) * 0.1)

    def loss(x, o, w):
        return jnp.sum(dcp.deform_conv2d_pallas(x, o, w, max_dy=4) ** 2)

    gx, go, gw = jax.grad(loss, argnums=(0, 1, 2))(x, offsets, weight)
    for g in (gx, go, gw):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(go).sum()) > 0


def test_pallas_backward_matches_autodiff(rng):
    """Hand-written per-tap backward kernel (incl. the candidate-skip range
    loop and, at h=64, the rb=16 row-block + RMW canvas accumulation path)
    == autodiff of the exact gather impl; offsets inside the window so the
    clip never binds."""
    x = rng.randn(1, 64, 12, 8).astype(np.float32)
    offsets = (rng.randn(1, 64, 12, 18) * 1.2).astype(np.float32)
    weight = rng.randn(9, 8, 8).astype(np.float32) * 0.1

    def loss_exact(x, o, w_):
        out = deform_conv2d_batched(x, o, w_)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_pl(x, o, w_):
        out = dcp.deform_conv2d_pallas(x, o, w_, max_dy=6)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight))
    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(*args)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_pl, g_ref, ("x", "offsets", "weight")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_padded_rows_route_matches_exact(rng, monkeypatch):
    """h % 8 != 0 (the flagship P5 26x42 shape class) zero-pads the rows
    to the block size and slices — must be exact vs the gather impl, fwd
    and grad. Routing is pinned to the pallas path (on CPU pallas_route
    would fall back to mxu and hide the padding branch)."""
    monkeypatch.setattr(dcp, "pallas_route", lambda *a: ("untiled", None))
    x = rng.randn(1, 26, 42, 16).astype(np.float32)
    # |dy| < max_dy so the window clip never binds (the exact impl is
    # unbounded; a clipped-vs-far sample difference is not what's under test)
    offsets = np.clip(rng.randn(1, 26, 42, 18) * 1.5, -5.5, 5.5).astype(
        np.float32)
    weight = rng.randn(9, 16, 128).astype(np.float32) * 0.1
    bias = rng.randn(128).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
            jnp.asarray(bias))
    exact = deform_conv2d_batched(*args)
    got = dcp.deform_conv2d_pallas.__wrapped__(*args, 3, 1, 6, "clip")
    assert got.shape == exact.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)

    def loss_exact(x, o, w_):
        return jnp.sum(deform_conv2d_batched(x, o, w_) ** 2)

    def loss_pl(x, o, w_):
        return jnp.sum(
            dcp.deform_conv2d_pallas.__wrapped__(
                x, o, w_, None, 3, 1, 6, "clip") ** 2)

    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(*args[:3])
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(*args[:3])
    for a, b, name in zip(g_pl, g_ref, ("x", "offsets", "weight")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_fused9_matches_pertap_and_exact(rng):
    """The all-taps-fused inference forward (_fused_untiled, one pallas
    call) == the per-tap training form == the exact gather impl; and
    differentiating the public dispatch routes to the per-tap VJP (grads
    == exact autodiff)."""
    x = rng.randn(2, 16, 20, 16).astype(np.float32)
    offsets = np.clip(rng.randn(2, 16, 20, 18) * 1.5, -5.5, 5.5).astype(
        np.float32)
    weight = rng.randn(9, 16, 128).astype(np.float32) * 0.1
    bias = rng.randn(128).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
            jnp.asarray(bias))
    fused = dcp._fused_untiled(*args, 3, 1, 6, "clip")
    pertap = dcp._pertap_untiled(*args, 3, 1, 6, "clip")
    exact = deform_conv2d_batched(*args)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(pertap),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(exact),
                               atol=2e-3)

    def loss_disp(x, o, w_):
        return jnp.sum(dcp._untiled_dispatch(3, 1, 6, "clip", x, o, w_,
                                             None) ** 2)

    def loss_exact(x, o, w_):
        return jnp.sum(deform_conv2d_batched(x, o, w_) ** 2)

    g_d = jax.grad(loss_disp, argnums=(0, 1, 2))(*args[:3])
    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(*args[:3])
    for a, b, name in zip(g_d, g_ref, ("x", "offsets", "weight")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_tiled_sample_matches_ref(rng):
    b, h, w, c = 1, 8, 512, 128  # wide: 2 column tiles
    r, dx = 3, 3
    left = dx + 2
    y = rng.randn(b, h + 2 * (r + 2), left + w + (dcp.CTW - dcp.CT) - left, c)
    y = y.astype(np.float32)
    sy = (rng.uniform(-2, 2, (b, h, w)) + np.arange(h)[None, :, None]).astype(np.float32)
    sx = (rng.uniform(-2, 2, (b, h, w)) + np.arange(w)[None, None, :]).astype(np.float32)
    got = dcp._sample_pallas_tiled(
        jnp.asarray(y), jnp.asarray(sy), jnp.asarray(sx), r, dx
    )
    ref = dcp._sample_ref(
        jnp.asarray(y), jnp.asarray(sy), jnp.asarray(sx), r, col_off=dx + 2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_tiled_deform_conv_matches_exact(rng):
    # wide input routes to the column-tiled kernel on TPU; in tests we call
    # the tiled wrapper directly (interpret mode)
    x = rng.randn(1, 8, 512, 16).astype(np.float32)
    offsets = (rng.randn(1, 8, 512, 18) * 1.0).astype(np.float32)
    weight = rng.randn(9, 16, 128).astype(np.float32) * 0.1
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)
    )
    got = dcp._deform_conv2d_pallas_tiled(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), None,
        3, 1, 6, 6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)


def test_tiled_p2_width_fwd_bwd_matches_exact(rng):
    """w=336 (COCO P2) routes through the banded column tiles (ct=168);
    fwd + the hand-written tiled backward vs the exact gather impl."""
    x = rng.randn(1, 8, 336, 16).astype(np.float32)
    offsets = (rng.randn(1, 8, 336, 18) * 1.2).astype(np.float32)
    weight = rng.randn(9, 16, 128).astype(np.float32) * 0.1
    assert dcp._col_tile(336, 6, 1) == (168, 192)
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)
    )
    got = dcp._deform_conv2d_pallas_tiled(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), None,
        3, 1, 6, 6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)

    def loss_exact(x, o, w_):
        return jnp.sum(deform_conv2d_batched(x, o, w_) ** 2)

    def loss_tiled(x, o, w_):
        return jnp.sum(dcp._deform_conv2d_pallas_tiled(
            x, o, w_, None, 3, 1, 6, 6) ** 2)

    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight))
    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(*args)
    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_t, g_ref, ("x", "offsets", "weight")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


def test_mt_forward_matches_exact(rng):
    """Sample-first multi-tap kernel == exact gather deform conv.
    (offset scale keeps |dy| < max_dy: the exact impl never clips)"""
    x = rng.randn(2, 16, 20, 16).astype(np.float32)
    offsets = np.clip(rng.randn(2, 16, 20, 18) * 1.5, -5.5, 5.5).astype(
        np.float32)
    weight = rng.randn(9, 16, 8).astype(np.float32) * 0.1
    bias = rng.randn(8).astype(np.float32)
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        jnp.asarray(bias),
    )
    got = dcp.deform_conv2d_pallas_mt(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        jnp.asarray(bias), max_dy=6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)


def test_mt_forward_dilation(rng):
    x = rng.randn(1, 16, 20, 8).astype(np.float32)
    offsets = (rng.randn(1, 16, 20, 18) * 1.2).astype(np.float32)
    weight = rng.randn(9, 8, 8).astype(np.float32) * 0.1
    exact = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        dilation=2,
    )
    got = dcp.deform_conv2d_pallas_mt(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
        dilation=2, max_dy=6,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=2e-3)


def test_mt_backward_matches_autodiff(rng):
    """Hand-written mt backward kernel == autodiff of the exact impl
    (offsets kept inside the window so the clip never binds)."""
    x = rng.randn(1, 8, 12, 8).astype(np.float32)
    offsets = (rng.randn(1, 8, 12, 18) * 1.2).astype(np.float32)
    weight = rng.randn(9, 8, 8).astype(np.float32) * 0.1

    def loss_exact(x, o, w_):
        out = deform_conv2d_batched(x, o, w_)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_mt(x, o, w_):
        out = dcp.deform_conv2d_pallas_mt(x, o, w_, max_dy=6)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight))
    g_ref = jax.grad(loss_exact, argnums=(0, 1, 2))(*args)
    g_mt = jax.grad(loss_mt, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_mt, g_ref, ("x", "offsets", "weight")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )
