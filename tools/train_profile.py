"""Train-step telemetry (VERDICT r1 items #3/#10): forward vs backward vs
component costs on the real chip, and peak-memory estimates.

    python tools/train_profile.py [--batch 8] [--impl pallas|auto|mxu|gather]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=4, warmup=2, perturb=0):
    """Relay-safe timing: the axon tunnel memoizes identical dispatches and
    block_until_ready returns early, so perturb one arg per call and
    host-materialize one output scalar (see memory: axon-tpu-environment).
    """
    import jax

    def call(i):
        a = list(args)
        # dtype-preserving nudge (a numpy f32 scalar would promote bf16!)
        leaf0 = jax.tree.leaves(a[perturb])[0]
        eps = np.asarray(1e-6 * (i + 1), dtype=leaf0.dtype)
        if isinstance(a[perturb], dict):
            a[perturb] = {k: v + eps if k == "images" else v
                          for k, v in a[perturb].items()}
        else:
            a[perturb] = a[perturb] + eps
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        # Materialize ONE scalar: np.asarray(full-leaf) would pull the whole
        # tensor through the axon tunnel (~45 MB/s) and bill transfer time
        # as compute (a 137MB deform output looked like +3000ms).
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
    ap.add_argument("--impl", default=None)
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--skip-full", action="store_true",
                    help="only the deform microbenches")
    ap.add_argument("--stages", action="store_true",
                    help="attribute train-forward cost by head ablation")
    ap.add_argument("--skip-micro", action="store_true",
                    help="skip the deform/roialign microbenches")
    ap.add_argument("--impl-train", default=None,
                    help="dcn_impl_train override (bench.py uses 'pallas')")
    ap.add_argument("--perturb-offsets", action="store_true",
                    help="bias offset convs to bench.py's +-2px magnitudes")
    ap.add_argument("--max-gt", type=int, default=20,
                    help="max_gt_instances pad (flagship default is 100; "
                         "the teacher-forced panoptic branch scales with it)")
    ap.add_argument("--only-stage", default=None,
                    help="run ONE stage ablation: extract | -pan | -fcn "
                         "(keeps each invocation under the relay timeout)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    if not args.skip_micro:
        _microbench(args, jax, jnp)

    if args.skip_full:
        return
    _full_step(args, jax, jnp)


def _microbench(args, jax, jnp):
    # --- deform sample fwd/bwd microbench (the dominant train cost) -------
    b, h, w, c = args.batch, 208, 336, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    offsets = jax.random.normal(key, (b, h, w, 18), jnp.float32) * 2.0
    weight = jax.random.normal(key, (9, c, c), jnp.float32) * 0.05

    from upsnet_tpu.ops.deform_conv import (
        deform_conv2d_auto,
        deform_conv2d_batched,
        deform_conv2d_mxu,
    )
    from upsnet_tpu.ops.deform_conv_pallas import deform_conv2d_pallas

    impls = {
        "pallas": deform_conv2d_pallas,
        "mxu": deform_conv2d_mxu,
        "gather": deform_conv2d_batched,
        "auto": deform_conv2d_auto,
    }
    for name, fn in impls.items():
        kw = {} if name == "gather" else {"max_dy": 6}
        fwd = jax.jit(lambda x, o, w_, fn=fn, kw=kw: fn(x, o, w_, None, 3, 1, **kw))
        t_f = timed(fwd, x, offsets, weight)

        def loss(x, o, w_, fn=fn, kw=kw):
            return jnp.sum(fn(x, o, w_, None, 3, 1, **kw).astype(jnp.float32) ** 2)

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            t_b = timed(gr, x, offsets, weight)
        except Exception as e:  # mxu grad OOMs at b8 (known, STATUS.md)
            print(f"deform[{name:6s}] b{b}: fwd {t_f*1e3:7.1f} ms   "
                  f"grad FAILED ({type(e).__name__})")
            continue
        print(f"deform[{name:6s}] b{b} {h}x{w}x{c}: fwd {t_f*1e3:7.1f} ms   "
              f"grad(x,off,w) {t_b*1e3:7.1f} ms   ratio {t_b/t_f:4.1f}x")

    # --- ROIAlign fwd/bwd microbench --------------------------------------
    from upsnet_tpu.ops.roi_align import fpn_roi_align_batched

    levels_hw = [(208, 336), (104, 168), (52, 84), (26, 42)]
    pyramid = tuple(
        jax.random.normal(key, (b, lh, lw, 256), jnp.bfloat16)
        for lh, lw in levels_hw
    )
    rois = jax.random.uniform(key, (b, 512, 4), jnp.float32, 0, 600)
    rois = jnp.concatenate(
        [jnp.minimum(rois[..., :2], rois[..., 2:]),
         jnp.maximum(rois[..., :2], rois[..., 2:]) + 16], -1)
    lv = jax.random.randint(key, (b, 512), 0, 4)

    roi_fwd = jax.jit(lambda p, r, l: fpn_roi_align_batched(p, r, l, pooled=7))
    t_f = timed(roi_fwd, pyramid, rois, lv, perturb=1)

    def roi_loss(p, r, l):
        return jnp.sum(
            fpn_roi_align_batched(p, r, l, pooled=7).astype(jnp.float32) ** 2
        )

    roi_bwd = jax.jit(jax.grad(roi_loss, argnums=0))
    try:
        t_b = timed(roi_bwd, pyramid, rois, lv, perturb=1)
        print(f"roialign b{b} 512 rois 7x7: fwd {t_f*1e3:7.1f} ms   "
              f"grad(pyramid) {t_b*1e3:7.1f} ms   ratio {t_b/t_f:4.1f}x")
    except Exception as e:
        print(f"roialign b{b}: fwd {t_f*1e3:7.1f} ms   grad FAILED "
              f"({type(e).__name__})")

    # free the microbench device buffers + compiled executables before the
    # full step — keeping them live OOMs the b8 step (RESOURCE_EXHAUSTED)
    del x, offsets, weight, pyramid, rois, lv, fwd, gr, roi_fwd, roi_bwd
    jax.clear_caches()
    import gc

    gc.collect()


def _one_stage(args, cfg, model, params, batch, k, make_loss, jax, jnp):
    """Time ONE ablation (grad incl.) so each run fits the relay timeout."""
    import dataclasses

    import numpy as np

    name = args.only_stage
    if name == "extract":
        def extract_loss(p, batch, k, eps):
            images = batch["images"] + eps
            outs = model.apply({"params": p}, images, method="extract")
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in jax.tree.leaves(outs))

        extract = extract_loss
        if cfg.train.remat:
            pass  # extract is the remat target itself; time it plain
        f = jax.jit(extract)
        g = jax.jit(jax.grad(extract))
        t_f = timed(f, params, batch, k, np.float32(0), n=3, warmup=1,
                    perturb=3)
        t_g = timed(g, params, batch, k, np.float32(0), n=3, warmup=1,
                    perturb=3)
        print(f"  extract (backbone+fpn+rpn+fcn): loss {t_f*1e3:7.1f} ms   "
              f"grad {t_g*1e3:7.1f} ms")
        return
    net_kw = {"-pan": {"has_panoptic_head": False},
              "-fcn": {"has_panoptic_head": False, "has_fcn_head": False}}[name]
    cfg_a = cfg.replace(network=dataclasses.replace(cfg.network, **net_kw))
    f = jax.jit(make_loss(cfg_a))
    g = jax.jit(jax.grad(make_loss(cfg_a)))
    t_f = timed(f, params, batch, k, np.float32(0), n=3, warmup=1, perturb=3)
    t_g = timed(g, params, batch, k, np.float32(0), n=3, warmup=1, perturb=3)
    print(f"  {name}: loss-only {t_f*1e3:7.1f} ms   grad {t_g*1e3:7.1f} ms")


def _full_step(args, jax, jnp):
    import gc

    from upsnet_tpu.config import default_config

    # --- full train step: fwd loss vs grad --------------------------------
    from upsnet_tpu.data.synthetic import SyntheticDataset
    from upsnet_tpu.models.upsnet import build_model, forward_train
    from upsnet_tpu.ops.anchors import pyramid_anchors

    cfg = default_config()
    if args.impl:
        cfg = cfg.replace(network=dataclasses.replace(
            cfg.network, dcn_impl=args.impl))
    if args.impl_train:
        cfg = cfg.replace(network=dataclasses.replace(
            cfg.network, dcn_impl_train=args.impl_train))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, remat=args.remat, batch_size=args.batch,
        max_gt_instances=args.max_gt))
    bucket = tuple(cfg.train.image_buckets[0])
    model = build_model(cfg)
    impl_train = cfg.network.dcn_impl_train or cfg.network.dcn_impl
    if impl_train != cfg.network.dcn_impl and hasattr(model, "dcn_impl"):
        # mirror make_train_step's swap (parallel/steps.py): profile the
        # impl the train step actually runs
        cfg = cfg.replace(network=dataclasses.replace(
            cfg.network, dcn_impl=impl_train))
        model = model.clone(dcn_impl=impl_train)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + bucket + (3,)))["params"]
    if args.perturb_offsets:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import _perturb_offset_convs

        params = _perturb_offset_convs(params)
    anchors = tuple(jnp.asarray(a) for a in pyramid_anchors(bucket))
    ds = SyntheticDataset(cfg, num_images=args.batch, image_hw=bucket,
                          training=True)
    from upsnet_tpu.data.pipeline import collate

    batch = collate([ds.sample(i, np.random.RandomState(i))
                     for i in range(args.batch)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("images", "im_hw", "gt_boxes", "gt_classes", "gt_valid",
                      "gt_masks", "seg_gt", "crowd_boxes", "crowd_valid")}

    def make_loss(cfg):
        def loss_fn(p, batch, k, eps):
            batch = dict(batch, images=batch["images"] + eps)
            total, _ = forward_train(model, p, cfg, anchors, batch, k)
            return total
        return loss_fn

    loss_fn = make_loss(cfg)
    k = jax.random.PRNGKey(1)
    if args.only_stage:
        _one_stage(args, cfg, model, params, batch, k, make_loss, jax, jnp)
        return
    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))
    try:
        t_f = timed(fwd, params, batch, k, np.float32(0), n=3, warmup=1,
                    perturb=3)
        t_g = timed(grad, params, batch, k, np.float32(0), n=3, warmup=1,
                    perturb=3)
    except Exception as e:
        print(f"full train step FAILED ({type(e).__name__}): {e}")
        return
    print(f"train b{args.batch} impl={cfg.network.dcn_impl} "
          f"remat={cfg.train.remat}: loss-only {t_f*1e3:7.1f} ms   "
          f"grad {t_g*1e3:7.1f} ms   ratio {t_g/t_f:4.1f}x   "
          f"train {args.batch/t_g:5.2f} img/s")

    if args.stages:
        # attribute the train-forward cost by ablating heads (the model
        # ignores absent-head params, so one init serves all variants)
        def extract_loss(p, batch, k, eps):
            images = batch["images"] + eps
            outs = model.apply({"params": p}, images, method="extract")
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for o in jax.tree.leaves(outs))

        f_e = jax.jit(extract_loss)
        try:
            t_e = timed(f_e, params, batch, k, np.float32(0), n=3,
                        warmup=1, perturb=3)
            print(f"  extract only (backbone+fpn+rpn+fcn): {t_e*1e3:7.1f} ms")
        except Exception as e:
            print(f"  extract only: FAILED ({type(e).__name__})")
        del f_e
        jax.clear_caches()
        gc.collect()
        for label, net_kw in (
            ("  -panoptic branch", {"has_panoptic_head": False}),
            ("  -fcn (+panoptic)", {"has_panoptic_head": False,
                                    "has_fcn_head": False}),
        ):
            cfg_a = cfg.replace(network=dataclasses.replace(
                cfg.network, **net_kw))
            f_a = jax.jit(make_loss(cfg_a))
            g_a = jax.jit(jax.grad(make_loss(cfg_a)))
            try:
                t_a = timed(f_a, params, batch, k, np.float32(0), n=3,
                            warmup=1, perturb=3)
                t_ga = timed(g_a, params, batch, k, np.float32(0), n=3,
                             warmup=1, perturb=3)
                print(f"{label}: loss-only {t_a*1e3:7.1f} ms   "
                      f"grad {t_ga*1e3:7.1f} ms")
            except Exception as e:
                print(f"{label}: FAILED ({type(e).__name__})")
            del f_a, g_a
            jax.clear_caches()
            gc.collect()
    try:
        m = grad.lower(params, batch, k, np.float32(0)).compile().memory_analysis()
        print(f"grad memory: temp {m.temp_size_in_bytes/2**30:.2f} GiB  "
              f"args {m.argument_size_in_bytes/2**30:.2f} GiB")
    except Exception as e:  # memory analysis is best-effort
        print("memory analysis unavailable:", e)


if __name__ == "__main__":
    main()
