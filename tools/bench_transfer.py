"""Host->device transfer microbench for the TPU relay front-end.

Answers two questions the trainer-loop reconciliation (VERDICT r3 Weak
#4) needs:

  1. What is the effective device_put bandwidth through the relay, as a
     function of transfer size?
  2. Can a host->device copy OVERLAP device compute (separate streams),
     or does the relay serialize them?  If it serializes, the only lever
     on loop throughput is shrinking the wire (data/wire.py); if it
     overlaps, the DevicePrefetcher already hides the copy and the gap
     lives elsewhere.

Reference context: the reference's loader hides its (PCIe, pinned-host)
copies behind CUDA streams (`upsnet/upsnet_end2end_train.py` prefetch,
SURVEY.md §3.1); this measures the TPU-relay equivalent.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # 1. bandwidth vs size
    for mb in (1, 8, 32, 64):
        host = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            x = jax.device_put(host, dev)
            x.block_until_ready()
            ts.append(time.perf_counter() - t0)
        bw = mb / min(ts)
        print(f"device_put {mb:3d} MB: {1e3 * min(ts):8.1f} ms  "
              f"({bw:6.1f} MB/s)")

    # 2. overlap: a ~1-2 s compute, with a 64 MB copy issued mid-flight
    n = 8192
    a = jnp.asarray(np.random.rand(n, n).astype(np.float32))

    @jax.jit
    def burn(x):
        for _ in range(12):
            x = x @ x * (1.0 / n)
        return x

    r = burn(a)
    r.block_until_ready()  # compile
    t0 = time.perf_counter()
    r = burn(a)
    r.block_until_ready()
    t_compute = time.perf_counter() - t0

    host = np.random.rand(16 * 1024 * 1024).astype(np.float32)  # 64 MB
    t0 = time.perf_counter()
    x = jax.device_put(host, dev)
    x.block_until_ready()
    t_copy = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = burn(a)              # async dispatch
    x = jax.device_put(host, dev)
    x.block_until_ready()
    r.block_until_ready()
    t_both = time.perf_counter() - t0

    overlap = (t_compute + t_copy - t_both) / min(t_compute, t_copy)
    print(f"compute alone: {t_compute:.3f}s  copy alone: {t_copy:.3f}s  "
          f"concurrent: {t_both:.3f}s  -> overlap fraction {overlap:.2f}")
    print("verdict:",
          "copies OVERLAP compute (prefetcher hides them)"
          if overlap > 0.5 else
          "copies SERIALIZE with compute (shrink the wire)")


if __name__ == "__main__":
    main()
