"""Input pipeline: bucketed batching with background prefetch.

Reference: torch DataLoader with worker processes + DistributedSampler
(SURVEY.md §3.1). Here: a thread-prefetched generator that

  * shards the index space by (host, num_hosts) — per-host data sharding
    the way jax expects (each host feeds its local devices);
  * groups samples by bucket shape so a batch is one static shape
    (one compiled program per bucket);
  * collates to stacked numpy arrays ready for device_put.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
        drop_last: bool = True,
        epochs: int | None = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epochs = epochs

    def _index_stream(self):
        epoch = 0
        while self.epochs is None or epoch < self.epochs:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                np.random.RandomState(self.seed + epoch).shuffle(idx)
            idx = idx[self.host_id :: self.num_hosts]
            yield from idx
            epoch += 1

    def _batches(self):
        """Group consecutive samples by bucket shape (image shape)."""
        pending: dict[tuple, list] = {}
        rng = np.random.RandomState(self.seed + 17)
        for i in self._index_stream():
            s = self.ds.sample(int(i), rng)
            key = s["images"].shape
            pending.setdefault(key, []).append(s)
            if len(pending[key]) == self.batch_size:
                yield collate(pending.pop(key))
        if not self.drop_last:
            for group in pending.values():
                while group:
                    yield collate(group[: self.batch_size])
                    group = group[self.batch_size :]

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item
