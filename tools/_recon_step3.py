"""One-off: test the split train step hypothesis.

r4 recon (tools/_recon_step.py, TPU): raw grad 960ms, optimizer-only 52ms,
but the FUSED make_train_step is 1193ms — the whole is 180ms slower than
the sum of its parts. Hypothesis: peak HBM in the fused program (params +
remat activations + grads + momentum + updates, plus donation aliasing)
crosses a threshold that forces XLA to schedule conservatively / spill.

Times, at the exact bench config (flagship, max_gt=100, pallas train
impl, remat, perturbed offsets, b8 832x1344):
  (a) fused step (make_train_step today)
  (b) split step: program1 = value_and_grad (params NOT donated),
      program2 = optimizer update + apply (params/opt_state/grads donated)
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def timeit(fn, *args, n=4, sync=None):
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


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
    print("bucket", bucket, "max_gt", cfg.train.max_gt_instances, flush=True)
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

    net = cfg.network
    impl_train = net.dcn_impl_train or net.dcn_impl
    model_t = (model.clone(dcn_impl=impl_train)
               if impl_train != net.dcn_impl else model)
    cfg_t = cfg.replace(network=dataclasses.replace(net, dcn_impl=impl_train))

    optimizer = make_optimizer(cfg, params)
    key = jax.random.PRNGKey(1)

    def loss_fn(p, batch, k):
        return forward_train(model_t, p, cfg_t, anchors, batch, k)

    which = sys.argv[1] if len(sys.argv) > 1 else "split"

    if which == "gradaux":
        # attribution: value_and_grad WITH the aux losses dict, no
        # optimizer, no donation — vs _recon_step.py's plain grad (960ms)
        prog = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        def run(k):
            (total, losses), g = prog(params, batch, k)
            return (total, g)

        t, ts = timeit(run, key, sync=jax.block_until_ready)
        print(f"(c) grad+aux:     {t*1e3:8.1f} ms  {b/t:5.2f} img/s  "
              f"({[f'{x:.3f}' for x in ts]})", flush=True)
        return

    if which == "gradonly":
        prog = jax.jit(jax.grad(lambda p, bt, k: loss_fn(p, bt, k)[0]))

        def run(k):
            return prog(params, batch, k)

        t, ts = timeit(run, key, sync=jax.block_until_ready)
        print(f"(d) grad only:    {t*1e3:8.1f} ms  {b/t:5.2f} img/s  "
              f"({[f'{x:.3f}' for x in ts]})", flush=True)
        return

    if which == "fused":
        step = make_train_step(model, cfg, anchors, optimizer)
        opt_state = optimizer.init(params)
        p, s = params, opt_state

        def run(k):
            nonlocal p, s
            p, s, m = step(p, s, batch, k)
            return m["total"]

        t, ts = timeit(run, key, sync=jax.block_until_ready)
        print(f"(a) fused step:   {t*1e3:8.1f} ms  {b/t:5.2f} img/s  "
              f"({[f'{x:.3f}' for x in ts]})", flush=True)
        return

    # --- split ---
    grad_prog = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def _apply(p, s, g):
        updates, s = optimizer.update(g, s, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, s

    apply_prog = jax.jit(_apply, donate_argnums=(0, 1, 2))

    opt_state = optimizer.init(params)
    p, s = params, opt_state

    def run(k):
        nonlocal p, s
        (total, losses), g = grad_prog(p, batch, k)
        p, s = apply_prog(p, s, g)
        return (total, p)

    t, ts = timeit(run, key, sync=jax.block_until_ready)
    print(f"(b) split step:   {t*1e3:8.1f} ms  {b/t:5.2f} img/s  "
          f"({[f'{x:.3f}' for x in ts]})", flush=True)


if __name__ == "__main__":
    main()
