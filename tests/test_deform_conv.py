import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.ops.deform_conv import deform_conv2d, plain_conv_weight_as_deform


def deform_conv_ref(x, offsets, weight, kernel_size=3, dilation=1):
    """Pure-numpy DCNv1 with MXNet deformable_im2col semantics."""
    h, w, cin = x.shape
    k = kernel_size * kernel_size
    cout = weight.shape[-1]
    half = (kernel_size - 1) // 2
    out = np.zeros((h, w, cout), np.float32)
    for i in range(h):
        for j in range(w):
            for tap in range(k):
                kh, kw = divmod(tap, kernel_size)
                dy = offsets[i, j, 2 * tap]
                dx = offsets[i, j, 2 * tap + 1]
                sy = i + (kh - half) * dilation + dy
                sx = j + (kw - half) * dilation + dx
                if sy <= -1 or sy >= h or sx <= -1 or sx >= w:
                    continue
                yl, xl = int(np.floor(sy)), int(np.floor(sx))
                ly, lx = sy - yl, sx - xl
                val = np.zeros(cin, np.float32)
                for (yy, xx, wt) in [
                    (yl, xl, (1 - ly) * (1 - lx)),
                    (yl, xl + 1, (1 - ly) * lx),
                    (yl + 1, xl, ly * (1 - lx)),
                    (yl + 1, xl + 1, ly * lx),
                ]:
                    if 0 <= yy < h and 0 <= xx < w:
                        val += wt * x[yy, xx]
                out[i, j] += val @ weight[tap]
    return out


def test_deform_conv_matches_reference(rng):
    x = rng.randn(9, 11, 4).astype(np.float32)
    offsets = (rng.randn(9, 11, 18) * 1.5).astype(np.float32)
    weight = rng.randn(9, 4, 6).astype(np.float32) * 0.1
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight))
    ref = deform_conv_ref(x, offsets, weight)
    # fp32 coordinate math near floor() boundaries costs a few 1e-3; exactness
    # is checked in float64 (semantics match the reference at ~1e-7 there).
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)


def test_zero_offsets_equal_plain_conv(rng):
    x = rng.randn(8, 8, 3).astype(np.float32)
    w_hwio = rng.randn(3, 3, 3, 5).astype(np.float32) * 0.1
    offsets = np.zeros((8, 8, 18), np.float32)
    got = deform_conv2d(
        jnp.asarray(x),
        jnp.asarray(offsets),
        plain_conv_weight_as_deform(jnp.asarray(w_hwio)),
    )
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None],
        jnp.asarray(w_hwio),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_deform_conv_gradients_finite(rng):
    x = jnp.asarray(rng.randn(6, 6, 3).astype(np.float32))
    offsets = jnp.asarray((rng.randn(6, 6, 18) * 0.5).astype(np.float32))
    weight = jnp.asarray(rng.randn(9, 3, 4).astype(np.float32) * 0.1)

    def loss(x, o, w):
        return jnp.sum(deform_conv2d(x, o, w) ** 2)

    gx, go, gw = jax.grad(loss, argnums=(0, 1, 2))(x, offsets, weight)
    for g in (gx, go, gw):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(go).sum()) > 0  # offsets receive gradient


def test_deform_conv_offset_gradient_numeric(rng):
    """Finite-difference check of the offset gradient (the hard backward).

    Runs in float64 (fp32 FD noise swamps the signal) and keeps offset
    fractional parts inside (0, 1) — bilinear grad has kinks at integer
    crossings where finite differences are invalid.
    """
    with jax.enable_x64(True):
        x = jnp.asarray(rng.randn(5, 5, 2))
        offsets = jnp.asarray(0.3 + 0.4 * rng.uniform(size=(5, 5, 18)))
        weight = jnp.asarray(rng.randn(9, 2, 3) * 0.2)

        def loss(o):
            return jnp.sum(jnp.sin(deform_conv2d(x, o, weight)))

        g = jax.grad(loss)(offsets)
        eps = 1e-5
        for (i, j, c) in [(1, 1, 0), (2, 3, 5), (4, 4, 17), (0, 0, 1)]:
            op = offsets.at[i, j, c].add(eps)
            om = offsets.at[i, j, c].add(-eps)
            fd = (loss(op) - loss(om)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(g[i, j, c]), np.asarray(fd), atol=1e-5
            )


def test_batched_matches_single(rng):
    from upsnet_tpu.ops.deform_conv import deform_conv2d_batched

    x = rng.randn(2, 9, 11, 4).astype(np.float32)
    offsets = (rng.randn(2, 9, 11, 18) * 1.5).astype(np.float32)
    weight = rng.randn(9, 4, 6).astype(np.float32) * 0.1
    bias = rng.randn(6).astype(np.float32)
    got = deform_conv2d_batched(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), jnp.asarray(bias)
    )
    for b in range(2):
        ref = deform_conv2d(
            jnp.asarray(x[b]), jnp.asarray(offsets[b]), jnp.asarray(weight),
            jnp.asarray(bias),
        )
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref), atol=2e-4)
