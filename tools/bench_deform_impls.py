"""Compare deform-conv impls at trained-like (constant, small) offsets.

The official bench perturbs offset-conv BIASES, so inference sees
CONSTANT per-tap offsets ~|2| px — the candidate live range per row is
2-3, and the per-tap kernels' cost is dominated by the XLA glue around
the 9 pallas calls (9 pads + 9 output accumulations), not the sampling.
The mt (sample-first, one kernel) route amortizes that glue; this tool
measures both (and the mxu fallback) at P2/P3 flagship shapes for both
subnet layers (256->128 and 128->128).

    python tools/bench_deform_impls.py
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
        deform_conv2d_pallas,
        deform_conv2d_pallas_mt,
    )

    print(f"backend={jax.default_backend()}")
    b = 8
    rng = np.random.RandomState(0)
    # constant per-tap offsets in [-2, 2] (what bias-only offset convs give)
    const18 = rng.uniform(-2.0, 2.0, (18,)).astype(np.float32)

    for (h, w), cin in (((208, 336), 256), ((208, 336), 128),
                        ((104, 168), 128), ((52, 84), 128), ((32, 48), 128)):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        weight = jax.random.normal(key, (9, cin, 128), jnp.float32) * 0.05
        offc = jnp.broadcast_to(jnp.asarray(const18), (b, h, w, 18))
        offr = jax.random.uniform(key, (b, h, w, 18), jnp.float32, -2.0, 2.0)
        for name, fn in (
            ("pertap", lambda x, o, w_: deform_conv2d_pallas(
                x, o, w_, None, 3, 1, 6)),
            ("mt", lambda x, o, w_: deform_conv2d_pallas_mt(
                x, o, w_, None, 3, 1, 6)),
        ):
            jf = jax.jit(fn)
            tc = timed(jf, x, offc, weight)
            tr = timed(jf, x, offr, weight)
            print(f"{h}x{w} cin={cin} {name:6s}: const2 {tc*1e3:7.1f} ms"
                  f"   rand2 {tr*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
