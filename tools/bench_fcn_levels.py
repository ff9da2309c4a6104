"""Attribute FCN-head (semantic head) cost per FPN level on the real chip.

The stage profile shows the FCN head dominating the predict path; this
bisects it: one shared FCNSubNet call per level (P2..P5 at the flagship
832x1344 bucket /4../32 shapes), plus the upsample+concat+score glue.

    python tools/bench_fcn_levels.py
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
        eps = np.asarray(1e-6 * (i + 1), dtype=jax.tree.leaves(a[-1])[0].dtype)
        a[-1] = jax.tree.map(lambda v: v + eps, a[-1])
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

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.fcn import FCNHead
    from upsnet_tpu.ops.deform_conv_pallas import pallas_route

    print(f"backend={jax.default_backend()}")
    cfg = default_config()
    net = cfg.network
    b = 8
    bucket = tuple(cfg.test.image_buckets[0])  # (832, 1344)
    head = FCNHead(
        num_classes=cfg.dataset.num_seg_classes,
        channels=net.fcn_head_dim,
        num_layers=net.fcn_num_layers,
        with_dcn=net.fcn_with_dcn,
        dcn_impl=net.dcn_impl,
        dcn_max_dy=net.dcn_max_dy,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    pyr = []
    for lvl in range(2, 6):
        h, w = bucket[0] // (1 << lvl), bucket[1] // (1 << lvl)
        pyr.append(jax.random.normal(key, (b, h, w, 256), jnp.bfloat16))
        route, _ = pallas_route((b, h, w, net.fcn_head_dim), net.fcn_head_dim,
                                net.dcn_max_dy, 1)
        print(f"P{lvl}: {h}x{w}  deform route={route}")
    params = head.init(key, pyr)["params"]

    full = jax.jit(lambda p, py: head.apply({"params": p}, py))
    t = timed(full, params, tuple(pyr))
    print(f"FULL fcn head: {t*1e3:7.1f} ms")

    # per-level subnet cost (shared subnet applied to one level)
    from upsnet_tpu.models.fcn import FCNSubNet

    sub = FCNSubNet(net.fcn_head_dim, net.fcn_num_layers, net.fcn_with_dcn,
                    net.dcn_impl, net.dcn_max_dy, dtype=jnp.bfloat16)
    sp = {"params": params["subnet"]}
    for lvl, p in zip(range(2, 6), pyr):
        fn = jax.jit(lambda pp, x: sub.apply(pp, x))
        t = timed(fn, sp, p)
        print(f"  subnet on P{lvl} ({p.shape[1]}x{p.shape[2]}): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
