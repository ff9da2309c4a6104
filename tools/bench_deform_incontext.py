"""Standalone vs in-context deform_sample cost at the exact flagship
configuration (r_eff=7, const +-2 offsets, P2 shape).

bench_deform_l1 shows the 9 kernels + glue at ~35 ms/layer while
bench_deform_kernel's standalone sample at r=1 is ~1 ms — this probe
measures the standalone kernel at the IN-CONTEXT config (r=7, live
range 2) and a 9x chained version, isolating per-call scheduling cost.

    python tools/bench_deform_incontext.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=8, warmup=2):
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

    from upsnet_tpu.ops.deform_conv_pallas import _sample_pallas

    print(f"backend={jax.default_backend()}")
    b, h, w, c = 8, 208, 336, 128
    r = 7  # r_eff = max_dy 6 + dilation 1
    wp = 384
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (b, h + 2 * (r + 2), wp, c), jnp.bfloat16)
    iy = np.arange(h, dtype=np.float32)[None, :, None]
    ix = np.arange(w, dtype=np.float32)[None, None, :]
    # constant +-2-style offsets: live range 2 candidates per row
    sy = jnp.asarray(np.broadcast_to(iy + 1.37, (b, h, w)).copy())
    sx = jnp.asarray(np.broadcast_to(ix - 0.81, (b, h, w)).copy())

    one = jax.jit(lambda y, s1, s2: _sample_pallas(y, s1, s2, r))
    t = timed(one, y, sy, sx)
    print(f"standalone sample r={r} live=2: {t*1e3:7.1f} ms")

    # 9 chained calls + bf16 accumulate: the layer's kernel+accum structure
    # with NO projection/pad glue
    @jax.jit
    def nine(y, s1, s2):
        out = jnp.zeros((b, h, w, c), y.dtype)
        for tap in range(9):
            out = out + _sample_pallas(y, s1 + 0.01 * tap, s2, r)
        return out

    t = timed(nine, y, sy, sx)
    print(f"9 chained samples + accum: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
