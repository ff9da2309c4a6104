"""Input-pipeline throughput: thread Loader vs ProcessLoader workers.

VERDICT r1 item #9: the single-thread sample builder must not become the
bottleneck once the train step is fast. Measures samples/sec of the full
preprocessing path (synthetic decode-equivalent + mask resize + collate)
at COCO-flagship shapes.

    python tools/bench_pipeline.py [--images 64] [--batch 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4, 8])
    args = ap.parse_args()

    from upsnet_tpu.config import default_config
    from upsnet_tpu.data.pipeline import make_loader
    from upsnet_tpu.data.synthetic import SyntheticDataset

    cfg = default_config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, max_gt_instances=20))
    # flagship scale: 800px-bucketed canvases, real mask-resize work
    ds = SyntheticDataset(cfg, num_images=args.images, image_hw=(780, 1290),
                          training=True)

    for w in args.workers:
        loader = make_loader(ds, args.batch, num_workers=w, epochs=1, seed=0)
        it = iter(loader)
        next(it)  # absorb startup (fork, first fills)
        n = 1
        t0 = time.perf_counter()
        for _ in it:
            n += 1
        dt = time.perf_counter() - t0
        sps = (n - 1) * args.batch / dt if dt > 0 else float("inf")
        print(f"workers={w}: {n} batches, {sps:7.2f} samples/s "
              f"(steady-state, excl. first batch)")


if __name__ == "__main__":
    main()
