"""Bisect the cin=256 deform layer anomaly: projection vs glue vs kernel.

bench_deform_impls measured the P2 cin=256 per-tap layer at ~139 ms real
vs ~38 ms for cin=128 — far beyond the 2x projection-matmul delta. This
times each piece standalone at both cins.

    python tools/bench_deform_l1.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=4, warmup=2):
    import jax

    def call(i):
        a = list(args)
        eps = np.asarray(1e-6 * (i + 1), dtype=jax.tree.leaves(a[0])[0].dtype)
        a[0] = jax.tree.map(lambda v: v + eps, a[0])
        out = fn(*a)
        return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

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
        _round_up,
        deform_sample,
    )

    print(f"backend={jax.default_backend()}")
    b, h, w = 8, 208, 336
    cout = 128
    rng = np.random.RandomState(0)
    const18 = rng.uniform(-2.0, 2.0, (18,)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    for cin in (256, 128):
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        weight = jax.random.normal(key, (9, cin, cout), jnp.float32) * 0.05
        offc = jnp.broadcast_to(jnp.asarray(const18), (b, h, w, 18))
        wp = _round_up(w + 2, 128)

        @jax.jit
        def proj(x, weight=weight):
            wk = jnp.moveaxis(weight, 0, 1).reshape(cin, 9 * cout)
            wk = wk.astype(x.dtype)
            y = jnp.dot(x.reshape(-1, cin), wk, preferred_element_type=x.dtype)
            return y.reshape(b, h, w, 9, cout)

        t = timed(proj, x)
        print(f"cin={cin} proj only: {t*1e3:7.1f} ms")

        @jax.jit
        def proj_pads(x, weight=weight):
            y = proj.__wrapped__(x, weight)
            acc = jnp.zeros((b, h, w, cout), y.dtype)
            for tap in range(9):
                y_pad = jnp.pad(
                    y[:, :, :, tap],
                    ((0, 0), (9, 9), (1, wp - w - 1), (0, 0)))
                acc = acc + y_pad[:, 9:-9, 1:w + 1]
            return acc

        t = timed(proj_pads, x)
        print(f"cin={cin} proj + 9 pads + acc: {t*1e3:7.1f} ms")

        @jax.jit
        def full(x, offsets=offc, weight=weight):
            y = proj.__wrapped__(x, weight)
            iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            out = jnp.zeros((b, h, w, cout), x.dtype)
            r_eff = 7
            for tap in range(9):
                kh, kw = divmod(tap, 3)
                y_pad = jnp.pad(
                    y[:, :, :, tap],
                    ((0, 0), (9, 9), (1, wp - w - 1), (0, 0)))
                dy = jnp.clip(offsets[..., 2 * tap], -6.0, 6.0)
                sy = iy + (kh - 1) + dy
                sx = ix + (kw - 1) + offsets[..., 2 * tap + 1]
                out = out + deform_sample(y_pad, sy, sx, r_eff)
            return out

        t = timed(full, x)
        print(f"cin={cin} full (proj+pads+9 kernels): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
