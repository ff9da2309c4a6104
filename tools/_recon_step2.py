"""One-off: time make_train_step under the rehearsal yaml vs variants.

The r4 rehearsal's trainer loop measured 7.36 s/step (b8, 832x1344, TPU
v5e) while bench.py's train step at default config measures ~1.1 s. The
loop itself is clean (loader-wait ~0.1 s, sync'd step timing), so the gap
must be config: rehearsal uses norm=gn (bench: frozen_bn) and real
trained offsets. Time the same make_train_step under
  (a) the rehearsal yaml as-is (gn)
  (b) the rehearsal yaml with norm=frozen_bn
to attribute the gap.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def bench_variant(name, cfg):
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.data.pipeline import collate
    from upsnet_tpu.data.synthetic import SyntheticDataset
    from upsnet_tpu.models.registry import get_model
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.parallel.steps import make_train_step
    from upsnet_tpu.train.optimizer import make_optimizer

    b = cfg.train.batch_size
    bucket = tuple(cfg.train.image_buckets[0])
    model = get_model(cfg.symbol, cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + bucket + (3,)))["params"]
    anchors = tuple(
        jnp.asarray(a)
        for a in pyramid_anchors(bucket, scale=cfg.network.anchor_scale,
                                 ratios=cfg.network.anchor_ratios))
    ds = SyntheticDataset(cfg, num_images=b, image_hw=bucket, training=True)
    batch = collate([ds.sample(i, np.random.RandomState(i)) for i in range(b)])
    keep = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_valid",
            "gt_masks", "seg_gt", "crowd_boxes", "crowd_valid")
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}

    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, cfg, anchors, optimizer)
    p, s = params, opt_state
    t_c0 = time.perf_counter()
    p, s, m = step(p, s, batch, jax.random.PRNGKey(1))
    _ = float(np.asarray(m["total"]))
    print(f"[{name}] compile+first step: {time.perf_counter()-t_c0:.1f}s",
          flush=True)
    ts = []
    for i in range(4):
        b_i = dict(batch, images=batch["images"] + np.float32(1e-3 * (i + 1)))
        _ = np.asarray(b_i["images"][0, 0, 0, 0])
        t0 = time.perf_counter()
        p, s, m = step(p, s, b_i, jax.random.PRNGKey(i + 2))
        _ = float(np.asarray(m["total"]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"[{name}] step: {t*1e3:8.1f} ms  {b/t:5.2f} img/s  "
          f"(all: {[f'{x:.2f}' for x in ts]})", flush=True)


def main():
    from upsnet_tpu.config.loader import load_config

    cfg = load_config("experiments/upsnet_r50_synth_rehearsal.yaml")
    which = sys.argv[1] if len(sys.argv) > 1 else "gn"
    if which == "gn":
        bench_variant("rehearsal gn", cfg)
    elif which == "fbn":
        cfg2 = cfg.replace(network=dataclasses.replace(
            cfg.network, norm="frozen_bn"))
        bench_variant("rehearsal frozen_bn", cfg2)


if __name__ == "__main__":
    main()
