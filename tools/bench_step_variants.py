"""Time the full train step under remat variants at the flagship shape.

The r4 recon series pinned the fused step at ~1.19 s (raw grad 0.96 s,
optimizer 0.05 s). remat=True re-runs the whole extract forward inside
the backward; if the un-rematted activations fit v5e's 16 GB HBM, the
backward skips that recompute — worth ~a full trunk forward per step.
This measures, at b8 832x1344 max_gt=100 (the bench.py train shape):

    remat=True  policy=save_dcn   (the current default)
    remat=True  policy=''         (plain full remat)
    remat=False                   (no recompute; may OOM)

Usage: python tools/bench_step_variants.py [--variants save_dcn,none,off]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def make_batch(cfg, bucket, batch_size):
    from upsnet_tpu.data.pipeline import collate
    from upsnet_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(cfg, num_images=batch_size, training=True)
    return collate([ds.build_sample(i) for i in range(batch_size)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="save_dcn,none,off")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import build_model
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.parallel.steps import make_train_step
    from upsnet_tpu.train.optimizer import make_optimizer

    base = default_config()
    base = base.replace(
        network=dataclasses.replace(base.network, dcn_impl_train="pallas")
    )
    b = 8
    bucket = base.test.image_buckets[0]
    model = build_model(base)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(bucket) + (3,)))["params"]
    anchors = tuple(
        jnp.asarray(a)
        for a in pyramid_anchors(tuple(bucket), scale=base.network.anchor_scale,
                                 ratios=base.network.anchor_ratios))
    batch_np = make_batch(base, bucket, b)
    print(f"bucket {bucket} b{b} max_gt {batch_np['gt_boxes'].shape[1]}",
          flush=True)

    for variant in args.variants.split(","):
        if variant == "off":
            tc = dataclasses.replace(base.train, remat=False)
        elif variant == "none":
            tc = dataclasses.replace(base.train, remat=True, remat_policy="")
        else:
            tc = dataclasses.replace(base.train, remat=True,
                                     remat_policy="save_dcn")
        cfg = base.replace(train=tc)
        optimizer = make_optimizer(cfg, params0)
        step = make_train_step(model, cfg, anchors, optimizer)
        params = jax.tree.map(jnp.asarray, params0)
        opt_state = optimizer.init(params)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        try:
            t0 = time.perf_counter()
            params, opt_state, m = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
            _ = float(np.asarray(m["total"]))
            print(f"[{variant:8s}] compile+first: "
                  f"{time.perf_counter() - t0:6.1f}s", flush=True)
            # steady state: back-to-back, sync once
            staged = []
            for i in range(args.iters):
                bi = dict(batch,
                          images=batch["images"] + np.float32(1e-3 * (i + 1)))
                _ = np.asarray(bi["images"][0, 0, 0, 0])
                staged.append(bi)
            totals = []
            t0 = time.perf_counter()
            for i, bi in enumerate(staged):
                params, opt_state, m = step(params, opt_state, bi,
                                            jax.random.PRNGKey(i + 2))
                totals.append(m["total"])
            _ = [float(np.asarray(t)) for t in totals]
            dt = (time.perf_counter() - t0) / args.iters
            print(f"[{variant:8s}] step: {dt * 1e3:8.1f} ms  "
                  f"{b / dt:5.2f} img/s", flush=True)
        except Exception as e:  # OOM etc: report, keep going
            print(f"[{variant:8s}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        del params, opt_state, step
    return 0


if __name__ == "__main__":
    sys.exit(main())
