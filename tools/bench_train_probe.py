"""Probe the train-bench OOM (VERDICT r4 #2 / r5 follow-up).

bench.py's warmup train step succeeds but the 4-step back-to-back
steady-state loop dies RESOURCE_EXHAUSTED on an idle chip. Variables:
number of pre-staged wire batches (BENCH_STAGED), per-step sync
(BENCH_SYNC=1 fetches metrics every step instead of at the end), and
whether the inference program ran first (this probe never runs it).

    BENCH_STAGED=2 BENCH_SYNC=0 python tools/bench_train_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from upsnet_tpu.utils.platform import honor_env_platform

honor_env_platform()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from upsnet_tpu.config import default_config
from upsnet_tpu.data.pipeline import collate
from upsnet_tpu.data.synthetic import SyntheticDataset
from upsnet_tpu.data.wire import encode_batch
from upsnet_tpu.models.upsnet import build_model
from upsnet_tpu.ops.anchors import pyramid_anchors
from upsnet_tpu.parallel.steps import make_train_step
from upsnet_tpu.train.optimizer import make_optimizer


def main():
    staged_n = int(os.environ.get("BENCH_STAGED", "4"))
    sync_every = os.environ.get("BENCH_SYNC", "0") == "1"
    iters = int(os.environ.get("BENCH_ITERS", "4"))

    cfg = default_config()
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, dcn_impl_train="pallas")
    )
    batch_size = 8
    bucket = cfg.test.image_buckets[0]
    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + tuple(bucket) + (3,), jnp.float32),
    )["params"]
    anchors = tuple(
        jnp.asarray(a)
        for a in pyramid_anchors(tuple(bucket), scale=cfg.network.anchor_scale,
                                 ratios=cfg.network.anchor_ratios)
    )

    ds = SyntheticDataset(cfg, num_images=batch_size, image_hw=bucket,
                          training=True)
    batch = collate([ds.sample(i, np.random.RandomState(i))
                     for i in range(batch_size)])
    keep = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_valid",
            "gt_masks", "seg_gt", "crowd_boxes", "crowd_valid")
    batch = {k: np.asarray(v) for k, v in batch.items() if k in keep}
    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, cfg, anchors, optimizer)

    def put(b):
        enc = encode_batch(dict(b), cfg.network.compute_dtype,
                           image_wire="uint8")
        return {k: jnp.asarray(v) for k, v in enc.items()}

    t0 = time.perf_counter()
    params, opt_state, metrics = step(params, opt_state, put(batch),
                                      jax.random.PRNGKey(0))
    print(f"warmup: total={float(np.asarray(metrics['total'])):.3f} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    staged = []
    for i in range(staged_n):
        b_i = put(dict(batch, images=batch["images"] + np.float32(i + 1)))
        _ = np.asarray(b_i["images"][0, 0, 0, 0])
        staged.append(b_i)
    print(f"staged {staged_n} wire batches, sync_every={sync_every}",
          flush=True)

    totals = []
    t0 = time.perf_counter()
    for i in range(iters):
        b_i = staged[i % staged_n]
        params, opt_state, metrics = step(
            params, opt_state, b_i, jax.random.PRNGKey(i + 1)
        )
        if sync_every:
            totals.append(float(np.asarray(metrics["total"])))
        else:
            totals.append(metrics["total"])
    if not sync_every:
        totals = [float(np.asarray(t)) for t in totals]
    dt = time.perf_counter() - t0
    print(f"train_images_per_sec={batch_size * iters / dt:.3f} "
          f"({dt:.1f}s / {iters} steps) totals[0]={totals[0]:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
