"""One-off: reconcile bench.py's train step time vs train_profile's raw grad.

Times, at identical config (flagship, max_gt=100, dcn_impl_train=pallas,
remat, perturbed offsets, b8 832x1344):
  (a) jax.grad(total_loss)                     -- what train_profile times
  (b) value_and_grad(has_aux) + optax update   -- what make_train_step runs
  (c) the actual make_train_step (donated)     -- what bench.py times
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import numpy as np


def sync(x):
    import jax
    jax.block_until_ready(x)


def timeit(fn, *args, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config
    from upsnet_tpu.data.pipeline import collate
    from upsnet_tpu.data.synthetic import SyntheticDataset
    from upsnet_tpu.models.upsnet import build_model, forward_train
    from upsnet_tpu.ops.anchors import pyramid_anchors
    from upsnet_tpu.parallel.steps import make_train_step
    from upsnet_tpu.train.optimizer import make_optimizer

    sys.path.insert(0, ".")
    from bench import _perturb_offset_convs

    cfg = default_config()
    cfg = cfg.replace(network=dataclasses.replace(
        cfg.network, dcn_impl_train="pallas"))
    b = 8
    bucket = tuple(cfg.train.image_buckets[0])
    print("bucket", bucket, "max_gt", cfg.train.max_gt_instances)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + bucket + (3,)))["params"]
    params = _perturb_offset_convs(params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors(bucket))
    ds = SyntheticDataset(cfg, num_images=b, image_hw=bucket, training=True)
    batch = collate([ds.sample(i, np.random.RandomState(i)) for i in range(b)])
    keep = ("images", "im_hw", "gt_boxes", "gt_classes", "gt_valid",
            "gt_masks", "seg_gt", "crowd_boxes", "crowd_valid")
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}

    # the train-step swap: clone model to the train impl like make_train_step
    net = cfg.network
    impl_train = net.dcn_impl_train or net.dcn_impl
    model_t = model.clone(dcn_impl=impl_train) if impl_train != net.dcn_impl else model
    cfg_t = cfg.replace(network=dataclasses.replace(net, dcn_impl=impl_train))

    key = jax.random.PRNGKey(1)

    def loss_fn(p, batch, k):
        total, _ = forward_train(model_t, p, cfg_t, anchors, batch, k)
        return total

    grad = jax.jit(jax.grad(loss_fn))
    t, _ = timeit(grad, params, batch, key)
    t, _ = timeit(grad, params, batch, key)
    print(f"(a) raw grad:             {t*1e3:8.1f} ms  {b/t:5.2f} img/s")

    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    # (b) optimizer.update alone (donated state): is the optax chain the
    # grad->step gap?
    grads = jax.tree.map(jnp.ones_like, params)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def opt_only(g, s, p):
        updates, s = optimizer.update(g, s, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, s

    p2, s2 = opt_only(grads, opt_state, params)
    sync(p2)
    ts = []
    for i in range(4):
        g_i = jax.tree.map(lambda g: g + np.float32(1e-6 * (i + 1)), grads)
        sync(g_i)
        t0 = time.perf_counter()
        p2, s2 = opt_only(g_i, s2, params)
        sync(p2)
        ts.append(time.perf_counter() - t0)
    del p2, s2, grads
    print(f"(b) optimizer only:       {min(ts)*1e3:8.1f} ms")
    opt_state = optimizer.init(params)

    step = make_train_step(model, cfg, anchors, optimizer)
    p, s = params, opt_state
    p, s, m = step(p, s, batch, key)
    sync(m["total"])
    ts = []
    for i in range(3):
        b_i = dict(batch, images=batch["images"] + np.float32(1e-3 * (i + 1)))
        _ = np.asarray(b_i["images"][0, 0, 0, 0])
        t0 = time.perf_counter()
        p, s, m = step(p, s, b_i, jax.random.PRNGKey(i + 1))
        _ = float(np.asarray(m["total"]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"(c) make_train_step:      {t*1e3:8.1f} ms  {b/t:5.2f} img/s")


if __name__ == "__main__":
    main()
