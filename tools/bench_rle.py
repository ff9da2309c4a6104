"""RLE codec micro-bench: native (native/rle.cc) vs pure-numpy fallback.

Justifies the C++ codec on the eval path (VERDICT r2 next #7): a COCO-val
style evaluation encodes ~100 full-image masks per image and computes
det x gt IoU matrices from the compressed form, so codec throughput is on
the wall-clock path of evaluate_masks / evaluate_panoptic.

    python tools/bench_rle.py [--hw 832 1344] [--masks 100] [--repeat 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_masks(n: int, h: int, w: int, seed: int = 0) -> list[np.ndarray]:
    """Blobby instance-like masks (a few runs per column, like real dets)."""
    rng = np.random.RandomState(seed)
    masks = []
    for _ in range(n):
        cy, cx = rng.uniform(0.2, 0.8, 2) * (h, w)
        ry, rx = rng.uniform(0.05, 0.25, 2) * (h, w)
        yy = ((np.arange(h) - cy) / ry) ** 2
        xx = ((np.arange(w) - cx) / rx) ** 2
        masks.append((yy[:, None] + xx[None, :] < 1.0).astype(np.uint8))
    return masks


def bench(label: str, fn, items, repeat: int) -> float:
    fn(items[0])  # warmup / JIT-free sanity
    t0 = time.perf_counter()
    for _ in range(repeat):
        for it in items:
            fn(it)
    dt = (time.perf_counter() - t0) / (repeat * len(items))
    print(f"{label}: {dt * 1e6:9.1f} us/mask")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(832, 1344))
    ap.add_argument("--masks", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=5)
    args = ap.parse_args()

    from upsnet_tpu.evaluation import rle as R
    from upsnet_tpu.evaluation import rle_native as N

    h, w = args.hw
    masks = make_masks(args.masks, h, w)
    print(f"masks={args.masks} {h}x{w}  native_available={N.available()}")

    encoded = [R.encode(m) for m in masks]
    pairs = list(zip(encoded, encoded[1:] + encoded[:1]))

    variants = [("native", True)] if N.available() else []
    variants.append(("numpy ", False))
    results = {}
    for label, use_native in variants:
        N.FORCE_DISABLED = not use_native
        try:
            results[label, "encode"] = bench(
                f"encode       [{label}]", R.encode, masks, args.repeat)
            results[label, "decode"] = bench(
                f"decode       [{label}]", R.decode, encoded, args.repeat)
            results[label, "iou"] = bench(
                f"pairwise IoU [{label}]", lambda p: R.iou(*p), pairs,
                args.repeat)
        finally:
            N.FORCE_DISABLED = False

    if len(variants) == 2:
        for op in ("encode", "decode", "iou"):
            sp = results["numpy ", op] / results["native", op]
            print(f"native speedup [{op}]: {sp:5.1f}x")


if __name__ == "__main__":
    main()
