"""ROIAlign fwd/bwd variants on the real chip.

    python tools/bench_roialign.py [--rois 512] [--pooled 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=4, warmup=2, perturb=0):
    import jax

    def call(i):
        a = list(args)
        eps = np.asarray(1e-6 * (i + 1),
                         dtype=jax.tree.leaves(a[perturb])[0].dtype)
        a[perturb] = jax.tree.map(lambda v: v + eps, a[perturb])
        out = fn(*a)
        return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    for i in range(warmup):
        call(i)
    t0 = time.perf_counter()
    for i in range(n):
        call(warmup + i)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=512)
    ap.add_argument("--pooled", type=int, default=7)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.ops.roi_align import (
        fpn_roi_align_batched,
        fpn_roi_align_dense,
    )

    print(f"backend={jax.default_backend()} rois={args.rois} "
          f"pooled={args.pooled}")
    b, p = args.batch, args.pooled
    key = jax.random.PRNGKey(0)
    levels_hw = [(208, 336), (104, 168), (52, 84), (26, 42)]
    pyramid = tuple(
        jax.random.normal(key, (b, lh, lw, 256), jnp.bfloat16)
        for lh, lw in levels_hw
    )
    rois = jax.random.uniform(key, (b, args.rois, 4), jnp.float32, 0, 600)
    rois = jnp.concatenate(
        [jnp.minimum(rois[..., :2], rois[..., 2:]),
         jnp.maximum(rois[..., :2], rois[..., 2:]) + 16], -1)
    lv = jax.random.randint(key, (b, args.rois), 0, 4)

    for impl in ("gather", "dense", "window"):
        fwd = jax.jit(lambda py, r, l, impl=impl: fpn_roi_align_batched(
            py, r, l, pooled=p, impl=impl))
        t = timed(fwd, pyramid, rois, lv, perturb=1)
        print(f"fwd[{impl:6s}]: {t*1e3:7.1f} ms")

    for ck in (64, 128, 256):
        dense = jax.jit(lambda py, r, l, ck=ck: fpn_roi_align_dense(
            py, r, l, pooled=p, chunk=ck))
        t = timed(dense, pyramid, rois, lv, perturb=1)
        print(f"fwd[dense ck={ck:3d}]: {t*1e3:7.1f} ms")

    for impl in ("gather", "window"):
        def loss(py, r, l, impl=impl):
            return jnp.sum(fpn_roi_align_batched(
                py, r, l, pooled=p, impl=impl).astype(jnp.float32) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=0))
        t = timed(bwd, pyramid, rois, lv, perturb=1)
        label = "custom dense" if impl == "gather" else "window RMW"
        print(f"bwd[{label}] (impl={impl}): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
