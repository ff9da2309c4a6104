"""Bisect the Pallas deform-sampling kernel cost on the real chip.

Variants isolate: candidate count (a_n), row-block size, projection+pad
glue vs kernel proper, and achievable MXU rate for an equivalent-FLOPs
dense matmul. Usage:  python tools/bench_deform_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=4, warmup=2):
    import jax

    def call(i):
        a = list(args)
        eps = np.asarray(1e-6 * (i + 1),
                         dtype=jax.tree.leaves(a[0])[0].dtype)
        a[0] = jax.tree.map(lambda v: v + eps, a[0])
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        return float(np.asarray(leaf.ravel()[0]))

    for i in range(warmup):
        call(i)
    t0 = time.perf_counter()
    for i in range(n):
        call(warmup + i)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.ops.deform_conv_pallas import (
        _sample_pallas,
        deform_conv2d_pallas,
    )

    print(f"backend={jax.default_backend()}")
    b, h, w, c = 8, 208, 336, 128
    key = jax.random.PRNGKey(0)

    # --- equivalent-FLOPs single dense matmul: achievable MXU rate --------
    lhs = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    rhs = jax.random.normal(key, (4096, 4096), jnp.bfloat16)

    @jax.jit
    def big(lhs, rhs=rhs):
        return jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)

    t = timed(big, lhs)
    fl = 2 * 4096**3
    print(f"dense 4096^3 matmul: {t*1e3:7.1f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    # --- kernel proper (one tap), varying candidate radius ----------------
    for r in (6, 3, 1):
        pad_rows = r + 2
        wp = 384
        y_pad = jax.random.normal(
            key, (b, h + 2 * pad_rows, wp, c), jnp.bfloat16)
        sy = jax.random.uniform(key, (b, h, w), jnp.float32, 0, h)
        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        sy = jnp.clip(sy, iy - r, iy + r)  # keep |dy| <= r
        sx = jax.random.uniform(key, (b, h, w), jnp.float32, 0, w)

        fn = jax.jit(lambda y, s1, s2, r=r: _sample_pallas(y, s1, s2, r))
        t = timed(fn, y_pad, sy, sx)
        a_n = 2 * r + 3
        fl = 2 * b * h * a_n * wp * w * c
        print(f"sample_pallas r={r} (a_n={a_n}): {t*1e3:7.1f} ms  "
              f"eff {fl/t/1e12:6.1f} TFLOP/s")

    # --- full layer (9 taps incl. projection + pads) ----------------------
    # offset scale sweep: the kernels skip vertical candidates with no
    # support in a row (@pl.when), so cost is data-dependent — trained
    # offsets concentrate near 0 (zero-init offset convs), random +-6 is
    # the worst case.
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    weight = jax.random.normal(key, (9, c, c), jnp.float32) * 0.05
    fn = jax.jit(lambda x, o, w_: deform_conv2d_pallas(x, o, w_, None, 3, 1,
                                                       max_dy=6))
    for scale in (6.0, 2.0, 0.5, 0.0):
        offsets = jax.random.uniform(
            key, (b, h, w, 18), jnp.float32, -scale, scale)
        t = timed(fn, x, offsets, weight)
        print(f"full layer (9 taps, max_dy=6, |off|<={scale}): "
              f"{t*1e3:7.1f} ms")

    # --- projection-only glue ---------------------------------------------
    @jax.jit
    def proj(x, weight=weight):
        wk = jnp.moveaxis(weight, 0, 1).reshape(c, 9 * c).astype(x.dtype)
        y = jnp.dot(x.reshape(-1, c), wk, preferred_element_type=x.dtype)
        y = y.reshape(b, h, w, 9, c)
        outs = []
        for tap in range(9):
            outs.append(jnp.pad(
                y[:, :, :, tap], ((0, 0), (8, 8), (1, 384 - w - 1), (0, 0))))
        return sum(o[:, 8:-8, :w] for o in outs)

    t = timed(proj, x)
    print(f"projection+pad glue only: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
