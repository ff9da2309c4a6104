"""Micro-profile of panoptic fusion internals at flagship shapes (b8).

    python tools/bench_fusion.py
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
        a[0] = jax.tree.map(
            lambda v: v + np.asarray(1e-6 * (i + 1), dtype=v.dtype), a[0]
        )
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

    from upsnet_tpu.models.upsnet import panoptic_fuse
    from upsnet_tpu.ops import panoptic as pan_ops
    from upsnet_tpu.ops.mask_paste import paste_masks

    print(f"backend={jax.default_backend()}")
    b, hq, wq = 8, 208, 336
    s, c, n, m = 53, 133, 100, 28
    rng = np.random.RandomState(0)
    seg = jnp.asarray(rng.randn(b, hq, wq, c).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        rng.uniform(0, wq * 3, n),
                        rng.uniform(0, hq * 3, n),
                        rng.uniform(40, 400, n),
                        rng.uniform(40, 300, n),
                    ],
                    axis=1,
                ).astype(np.float32)
                for _ in range(b)
            ]
        )
    )
    boxes = boxes.at[..., 2].set(boxes[..., 0] + boxes[..., 2])
    boxes = boxes.at[..., 3].set(boxes[..., 1] + boxes[..., 3])
    classes = jnp.asarray(rng.randint(1, 81, (b, n)).astype(np.int32))
    masks = jnp.asarray(rng.randn(b, n, m, m).astype(np.float32) * 3)
    scores = jnp.asarray(
        np.sort(rng.uniform(0, 1, (b, n)).astype(np.float32))[:, ::-1]
    )
    valid = jnp.asarray(np.ones((b, n), bool))

    paste_fn = jax.jit(
        jax.vmap(lambda mk, bx: paste_masks(mk, bx * 0.25, (hq, wq)))
    )
    t = timed(paste_fn, masks, boxes)
    print(f"paste_masks (b8 n100):  {t*1e3:7.1f} ms")

    segterm_fn = jax.jit(
        jax.vmap(
            lambda sg, bx, cl: pan_ops.seg_term(
                sg, bx * 0.25, jnp.maximum(cl - 1, 0), s
            )
        )
    )
    t = timed(segterm_fn, seg, boxes, classes)
    print(f"seg_term (b8 n100):     {t*1e3:7.1f} ms")

    removal_fn = jax.jit(
        jax.vmap(lambda pasted, ok: pan_ops.mask_removal(pasted, ok, 0.5))
    )
    pasted = paste_fn(jax.nn.sigmoid(masks), boxes)
    t = timed(removal_fn, pasted, valid)
    print(f"mask_removal (b8 n100): {t*1e3:7.1f} ms")

    argmax_fn = jax.jit(
        jax.vmap(
            lambda sg, bx, cl, mk, ok: pan_ops.panoptic_argmax(
                sg, bx * 0.25, jnp.maximum(cl - 1, 0), mk, ok, s
            )[0]
        )
    )
    t = timed(argmax_fn, seg, boxes, classes, masks, valid)
    print(f"panoptic_argmax:        {t*1e3:7.1f} ms")

    fuse_fn = jax.jit(
        jax.vmap(
            lambda sg, bx, cl, mk, sc, ok: panoptic_fuse(
                sg, bx, cl, mk, sc, ok,
                score_thresh=0.6, overlap_thresh=0.5, num_stuff=s,
            )[0]
        )
    )
    t = timed(fuse_fn, seg, boxes, classes, masks, scores, valid)
    print(f"FULL panoptic_fuse:     {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
