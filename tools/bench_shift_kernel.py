"""Shift-kernel deform conv on the real chip vs the hat-matmul kernels.

Measures fwd and full grad at several offset regimes (constant bias-like
fields = what trained checkpoints show; random fields = adversarial worst
case) at the flagship P2 shape. Usage:

    python tools/bench_shift_kernel.py [--batch 8]
"""

from __future__ import annotations

import argparse
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
        leaf = jax.tree.leaves(out)[0]
        return float(np.asarray(leaf.ravel()[0]))

    for i in range(warmup):
        call(i)
    t0 = time.perf_counter()
    for i in range(n):
        call(warmup + i)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=208)
    ap.add_argument("--width", type=int, default=336)
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.ops.deform_conv_pallas import deform_conv2d_pallas
    from upsnet_tpu.ops.deform_shift_pallas import deform_conv2d_pallas_shift

    print(f"backend={jax.default_backend()}")
    b, h, w, c = args.batch, args.height, args.width, args.cin
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    weight = jax.random.normal(key, (9, c, 128), jnp.float32) * 0.05

    regimes = {
        "const2": jnp.tile(
            jax.random.uniform(key, (1, 1, 1, 18), jnp.float32, -2.0, 2.0),
            (b, h, w, 1),
        ),
        "rand05": jax.random.normal(key, (b, h, w, 18), jnp.float32) * 0.5,
        "rand2": jax.random.normal(key, (b, h, w, 18), jnp.float32) * 2.0,
        "rand6": jax.random.normal(key, (b, h, w, 18), jnp.float32) * 6.0,
    }
    impls = {
        "shift": lambda x, o, w_: deform_conv2d_pallas_shift(
            x, o, w_, None, 3, 1, max_dy=6, max_dx=6
        ),
        "hatmm": lambda x, o, w_: deform_conv2d_pallas(
            x, o, w_, None, 3, 1, max_dy=6
        ),
    }
    for rname, off in regimes.items():
        for iname, fn in impls.items():
            fwd = jax.jit(lambda x, o, w_, fn=fn: fn(x, o, w_))
            t_f = timed(fwd, x, off, weight)
            line = f"{iname}[{rname:7s}] b{b} {h}x{w}x{c}: fwd {t_f*1e3:7.1f} ms"
            if not args.fwd_only:
                def loss(x, o, w_, fn=fn):
                    return jnp.sum(fn(x, o, w_).astype(jnp.float32) ** 2)

                gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                t_b = timed(gr, x, off, weight)
                line += f"   grad {t_b*1e3:7.1f} ms   ratio {t_b/t_f:4.1f}x"
            print(line, flush=True)


if __name__ == "__main__":
    main()
