"""Benchmark harness: end-to-end inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference's only published speed figure is ~0.2 s/image
(~5 images/sec) on a single 1080Ti/V100-class GPU at the 800px COCO scale
(UPSNet paper runtime table; BASELINE.md [L]). The BASELINE.json target is
>= 3x reference V100 images/sec at batch 8 => vs_baseline >= 3.0 against
the 5 img/s estimate.

Measures the FULL inference path on the flagship UPSNet-50 COCO config:
backbone + FPN + RPN + proposal NMS + box/mask heads + semantic head +
on-device panoptic fusion, batch 8, 832x1344 canvas, bfloat16 compute.

Also measures the FULL training step (7-term loss + grads + SGD update,
remat on) at batch 8 and reports it in the same JSON line as
``train_images_per_sec`` / ``train_vs_baseline`` (reference: ~1 img/s/GPU
at the 16-GPU batch-16 schedule — paper training setup, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMAGES_PER_SEC = 5.0  # reference paper ~0.2 s/image, single GPU
BASELINE_TRAIN_IMAGES_PER_SEC = 1.0  # reference ~1 img/s per GPU in training


def main():
    """Run the two phases in SEPARATE subprocesses and merge their JSON.

    One process per phase is load-bearing, not style: the r4/r5 train-bench
    RESOURCE_EXHAUSTED reproduced on an idle chip even after del-ing every
    inference array + jax.clear_caches() + gc.collect(), while the identical
    train construct in a fresh process (tools/bench_train_probe.py) passes
    at 8.96 img/s — buffer frees through the device relay are deferred and
    only process teardown reliably returns the HBM. Each phase therefore
    gets a clean chip, exactly like the real trainer/server processes do.
    """
    inf = _run_phase("inference")
    train = _run_phase("train")
    record = inf or {}
    if train:
        record.update(train)
    print(json.dumps(record))


def _run_phase(phase: str) -> dict | None:
    """Spawn `bench.py --phase <phase>`; parse its single JSON stdout line."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def main_inference():
    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # incl. persistent XLA compile cache on device runs

    import jax
    import jax.numpy as jnp
    import numpy as np

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import build_model, forward_predict
    from upsnet_tpu.ops.anchors import pyramid_anchors

    import dataclasses

    cfg = default_config()
    # flagship train impl (same as the flagship experiment yamls): windowed
    # Pallas kernels in the rematted backward; inference stays on 'auto'
    cfg = cfg.replace(
        network=dataclasses.replace(cfg.network, dcn_impl_train="pallas")
    )
    batch_size = 8
    bucket = cfg.test.image_buckets[0]  # (832, 1344): the 800x1333 COCO scale
    model = build_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(bucket) + (3,), jnp.float32)
    )["params"]
    params = _perturb_offset_convs(params)
    anchors = tuple(
        jnp.asarray(a)
        for a in pyramid_anchors(tuple(bucket), scale=cfg.network.anchor_scale,
                                 ratios=cfg.network.anchor_ratios)
    )

    @jax.jit
    def predict(params, images, im_hw):
        return forward_predict(
            model, params, cfg, anchors, {"images": images, "im_hw": im_hw}
        )

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(batch_size, *bucket, 3).astype(np.float32) * 30.0
    )
    im_hw = jnp.asarray(
        np.tile(np.array([[800.0, 1333.0]], np.float32), (batch_size, 1))
    )

    # warmup / compile (host-materialize: block_until_ready is unreliable
    # through remote-device relays, and identical re-dispatches can be
    # memoized — vary inputs and sync per iteration)
    out = predict(params, images, im_hw)
    _ = np.asarray(out["boxes"][0, 0])

    # single-batch latency: one synced call, min of 3
    lat_times = []
    for i in range(3):
        im_i = images + (i + 1) * 0.01
        _ = np.asarray(im_i[0, 0, 0, 0])
        t0 = time.perf_counter()
        out = predict(params, im_i, im_hw)
        _ = np.asarray(out["boxes"][0, 0])
        _ = np.asarray(out["pan_map"][0, 0, 0])
        lat_times.append(time.perf_counter() - t0)
    latency_ms = 1e3 * min(lat_times)

    # steady-state throughput (the serving construct): issue every batch
    # back-to-back — JAX async dispatch overlaps the relay's per-call host
    # work (~29 ms dispatch + result RTTs) with device compute — then
    # materialize every output. Inputs are distinct per call (staged on
    # device before the clock starts) so nothing can be memoized; the
    # wall covers first dispatch to last fetch.
    iters = 8
    staged = []
    for i in range(iters):
        im_i = images + (i + 1) * 0.01
        _ = np.asarray(im_i[0, 0, 0, 0])
        staged.append(im_i)
    t0 = time.perf_counter()
    outs = [predict(params, im_i, im_hw) for im_i in staged]
    for o in outs:
        _ = np.asarray(o["boxes"][0, 0])
        _ = np.asarray(o["pan_map"][0, 0, 0])
    ips = batch_size * iters / (time.perf_counter() - t0)

    record = {
        "metric": "upsnet50_coco_inference_images_per_sec_batch8_800px",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "batch_latency_ms": round(latency_ms, 1),
    }
    print(json.dumps(record))


def main_train():
    from upsnet_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from upsnet_tpu.config import default_config
    from upsnet_tpu.models.upsnet import build_model
    from upsnet_tpu.ops.anchors import pyramid_anchors

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
    train_ips = _bench_train(cfg, model, params, anchors, bucket, batch_size)
    record = {}
    if train_ips is not None:
        record["train_images_per_sec"] = round(train_ips, 3)
        record["train_vs_baseline"] = round(
            train_ips / BASELINE_TRAIN_IMAGES_PER_SEC, 3
        )
    print(json.dumps(record))


def _perturb_offset_convs(params):
    """Give the zero-init DCN offset convs realistic trained magnitudes.

    The deform kernels skip vertical candidates with no support per row,
    so their cost is offset-dependent: all-zero offsets (the init state)
    are the degenerate best case and would overstate throughput. Biasing
    the offset convs to produce |offset| ~ 1-2 px fields reproduces the
    magnitudes trained DCNv1 checkpoints show at 1/4 scale, making the
    benchmark representative of inference with real weights.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(42)

    def visit(tree, path=()):
        if isinstance(tree, dict):
            return {
                k: visit(v, path + (k,)) for k, v in tree.items()
            }
        # bias-only: deterministic per-(tap, axis) offsets in [-2, 2] px,
        # independent of activation scale, provably inside the +-max_dy
        # window (so the bench measures the fast path, as a trained
        # checkpoint would)
        if path and path[-2] == "offset_conv" and path[-1] == "bias":
            return jnp.asarray(
                rng.uniform(-2.0, 2.0, tree.shape).astype(np.float32)
            )
        return tree

    del jax
    return visit(params)


def _bench_train(cfg, model, params, anchors, bucket, batch_size):
    """Full train step (loss + grad + SGD update) images/sec; None on error."""
    import numpy as np

    try:
        import jax
        import jax.numpy as jnp

        from upsnet_tpu.data.pipeline import collate
        from upsnet_tpu.data.synthetic import SyntheticDataset
        from upsnet_tpu.parallel.steps import make_train_step
        from upsnet_tpu.train.optimizer import make_optimizer

        from upsnet_tpu.data.wire import encode_batch

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
            """Stage exactly what the trainer ships: the compact wire
            encoding (uint8 images + bit-packed masks, ~35 MB vs ~165 MB
            raw f32 — the flagship yamls' image_wire) so staged batches
            cannot crowd the train step's remat peak out of HBM."""
            enc = encode_batch(dict(b), cfg.network.compute_dtype,
                               image_wire="uint8")
            return {k: jnp.asarray(v) for k, v in enc.items()}

        key = jax.random.PRNGKey(0)
        # warmup/compile (params are donated: chain the returned state)
        params, opt_state, metrics = step(params, opt_state, put(batch), key)
        _ = float(np.asarray(metrics["total"]))
        # steady-state throughput, same construct as the trainer loop:
        # distinct pre-staged wire batches, steps issued back-to-back
        # chaining the donated state — async dispatch overlaps the relay's
        # per-call host work with device compute; sync once at the end.
        iters = 4
        staged = []
        for i in range(iters):
            # integral perturbation: it must survive the uint8 wire's
            # rint() so no two staged batches are byte-identical
            b_i = put(dict(batch, images=batch["images"] + np.float32(i + 1)))
            _ = np.asarray(b_i["images"][0, 0, 0, 0])
            staged.append(b_i)
        totals = []
        t0 = time.perf_counter()
        for i, b_i in enumerate(staged):
            params, opt_state, metrics = step(
                params, opt_state, b_i, jax.random.PRNGKey(i + 1)
            )
            totals.append(metrics["total"])
        _ = [float(np.asarray(t)) for t in totals]
        return batch_size * iters / (time.perf_counter() - t0)
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)  # JSON stdout line stays clean
        return None


if __name__ == "__main__":
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        main_inference() if phase == "inference" else main_train()
    else:
        main()
