"""'auto' deformable-conv routing + offset probe (VERDICT r1 item #2).

The fast window kernels clip |dy| (and |dx| in the tiled variant); DCNv1
offsets are unbounded. 'auto' must detect out-of-window offsets at runtime
and produce exact gather-path results for them, while matching the fast
path bit-for-bit inside the window.
"""

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.deform_conv import (
    deform_conv2d,
    deform_conv2d_auto,
    deform_conv2d_batched,
    deform_conv2d_mxu,
)

MAX_DY = 2  # small window so tests exercise the boundary cheaply


def _inputs(rng, b=2, h=8, w=8, cin=4, cout=4, off_scale=1.0):
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    offsets = jnp.asarray(
        (rng.randn(b, h, w, 18) * off_scale).astype(np.float32)
    )
    weight = jnp.asarray(rng.randn(9, cin, cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    return x, offsets, weight, bias


def test_auto_matches_fast_path_inside_window(rng):
    x, offsets, weight, bias = _inputs(rng, off_scale=0.5)
    offsets = jnp.clip(offsets, -MAX_DY, MAX_DY)
    got = deform_conv2d_auto(x, offsets, weight, bias, max_dy=MAX_DY)
    # on CPU the pallas route falls back to mxu — the point is that auto
    # picks the *window* path and matches it exactly
    want = deform_conv2d_mxu(x, offsets, weight, bias, max_dy=MAX_DY)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_is_exact_beyond_window(rng):
    x, offsets, weight, bias = _inputs(rng)
    # push one vertical offset far beyond the window
    offsets = offsets.at[0, 3, 3, 0].set(5.5)
    got = deform_conv2d_auto(x, offsets, weight, bias, max_dy=MAX_DY)
    exact = deform_conv2d_batched(x, offsets, weight, bias)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))
    # reference semantics (per-image kernel) agree
    ref = jax.vmap(lambda xi, oi: deform_conv2d(xi, oi, weight, bias))(
        x, offsets
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the clipped window path WOULD have diverged — the routing matters
    clipped = deform_conv2d_mxu(x, offsets, weight, bias, max_dy=MAX_DY)
    assert not np.allclose(np.asarray(exact), np.asarray(clipped))


def test_auto_horizontal_offsets_unrestricted_on_untiled_route(rng):
    # |dx| beyond max_dy must NOT trigger the fallback on routes that
    # contract the full row (untiled/mxu) — dx is unrestricted there
    x, offsets, weight, bias = _inputs(rng, off_scale=0.1)
    offsets = offsets.at[0, 2, 2, 1].set(4.0)  # dx tap 0
    got = deform_conv2d_auto(x, offsets, weight, bias, max_dy=MAX_DY)
    want = deform_conv2d_mxu(x, offsets, weight, bias, max_dy=MAX_DY)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_gradients_flow(rng):
    x, offsets, weight, bias = _inputs(rng, off_scale=0.5)

    def loss(w, o):
        return jnp.sum(deform_conv2d_auto(x, o, w, bias, max_dy=MAX_DY) ** 2)

    gw, go = jax.grad(loss, argnums=(0, 1))(weight, offsets)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(go)).all()
    assert float(jnp.abs(go).max()) > 0.0


def test_deform_conv_module_sows_offset_stats(rng):
    from upsnet_tpu.models.layers import DeformConv

    mod = DeformConv(4, 3, impl="gather")
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # force known offsets through the (zero-init) offset conv bias
    bias = np.zeros(18, np.float32)
    bias[0::2] = 3.0  # dy
    bias[1::2] = -1.5  # dx
    params = dict(params)
    params["offset_conv"] = {
        "kernel": params["offset_conv"]["kernel"],
        "bias": jnp.asarray(bias),
    }
    _, mut = mod.apply({"params": params}, x, mutable=["intermediates"])
    (stat,) = mut["intermediates"]["offset_max"]
    # (max|dy|, max|dx|, saturation rate); dy=3.0 is below the 0.9*8=7.2
    # edge so the rate is exactly 0
    np.testing.assert_allclose(np.asarray(stat), [3.0, 1.5, 0.0], rtol=1e-6)


def test_probe_dcn_offsets_full_model(rng):
    import dataclasses

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import build_model
    from upsnet_tpu.utils.dcn_probe import check_window, probe_dcn_offsets

    cfg = default_config()
    cfg = cfg.replace(network=dataclasses.replace(
        cfg.network, backbone="resnet_test", fpn_feature_dim=32,
        rcnn_fc_dim=64, fcn_head_dim=16, compute_dtype="float32",
        dcn_impl="gather", norm="gn"))
    model = build_model(cfg)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    stats = probe_dcn_offsets(model, params, x)
    # the semantic-head subnet runs per level -> dcn1/dcn2 probed
    assert any("dcn1" in k for k in stats)
    # zero-init offset convs -> all offsets 0 -> inside any window
    assert check_window(stats, max_dy=1.0)
    for s in stats.values():
        assert s["max_dy"] == 0.0 and s["max_dx"] == 0.0
