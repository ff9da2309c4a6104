"""Input pipeline: bucketed batching with background prefetch.

Reference: torch DataLoader with worker processes + DistributedSampler
(SURVEY.md §3.1). Two loaders share identical sampling semantics:

  * ``Loader`` — single background *thread* (cheap, in-process; fine when
    the model step dominates).
  * ``ProcessLoader`` — N forked *worker processes* building samples in
    parallel, shipping them to the trainer through POSIX shared memory
    (one segment per sample; the main process collates straight out of
    the segments and unlinks them). This is the analogue of the
    reference's ``num_workers>0`` DataLoader: decode + mask rasterize +
    resize run off the critical path.

Shared semantics:
  * the index space is sharded by (host, num_hosts) — per-host data
    sharding the way jax expects (each host feeds its local devices);
  * samples are grouped by bucket shape so a batch is one static shape
    (one compiled program per bucket);
  * per-sample RNG is derived from (seed, stream position), NOT from a
    shared sequential stream — so the sample at position p is identical
    regardless of worker count (tested: ProcessLoader == Loader).
"""

from __future__ import annotations

import glob as glob_mod
import multiprocessing as mp
import queue
import threading
import uuid
from multiprocessing import shared_memory

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


def _per_sample_rng(seed: int, pos: int) -> np.random.RandomState:
    """Deterministic decorrelated RNG for stream position ``pos``.

    splitmix-style scramble: adjacent positions land far apart in the
    32-bit seed space, and the mapping is independent of worker count.
    """
    z = (seed * 0x9E3779B9 + pos * 0x85EBCA6B + 0xC2B2AE35) & 0xFFFFFFFF
    z ^= z >> 16
    z = (z * 0x45D9F3B) & 0xFFFFFFFF
    z ^= z >> 13
    return np.random.RandomState(z & 0x7FFFFFFF)


class _LoaderBase:
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

    def _bucket_stream(self, samples):
        """Group a (sample, cleanup) stream by bucket shape; collate full
        batches; run each sample's cleanup once it is copied out."""
        pending: dict[tuple, list] = {}
        try:
            for s, cleanup in samples:
                key = s["images"].shape
                pending.setdefault(key, []).append((s, cleanup))
                if len(pending[key]) == self.batch_size:
                    group = pending.pop(key)
                    batch = collate([g[0] for g in group])
                    for _, c in group:  # collate copied; release shm pre-yield
                        c()
                    yield batch
            if not self.drop_last:
                for group in pending.values():
                    while group:
                        head = group[: self.batch_size]
                        batch = collate([g[0] for g in head])
                        for _, c in head:
                            c()
                        group = group[self.batch_size :]
                        yield batch
                pending = {}
        finally:  # early close: release shm held by partial buckets
            for group in pending.values():
                for _, c in group:
                    c()


def _noop():
    pass


class Loader(_LoaderBase):
    """Single prefetch-thread loader (the ``num_workers=0`` path)."""

    def _samples(self):
        for pos, i in enumerate(self._index_stream()):
            yield self.ds.sample(int(i), _per_sample_rng(self.seed + 17, pos)), _noop

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._bucket_stream(self._samples()):
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


# ---------------------------------------------------------------------------
# Multi-process loader: fork workers + shared-memory sample transport.
# ---------------------------------------------------------------------------


def _sample_to_shm(sample: dict, name: str):
    """Copy a sample dict into one fresh shm segment. Returns the spec
    (key, shape, dtype-str, offset) list needed to reconstruct views."""
    spec = []
    total = 0
    for k, v in sample.items():
        v = np.asarray(v)
        off = (total + 63) & ~63  # 64B-align each array
        spec.append((k, v.shape, v.dtype.str, off))
        total = off + v.nbytes
    seg = shared_memory.SharedMemory(create=True, size=max(total, 1), name=name)
    for (k, shape, dt, off), v in zip(spec, sample.values()):
        v = np.asarray(v)
        dst = np.ndarray(shape, dtype=dt, buffer=seg.buf, offset=off)
        dst[...] = v
    seg.close()
    # Ownership transfers to the consumer (it unlinks after collate); drop
    # the creator-side resource_tracker registration so worker exit does not
    # warn about / double-unlink segments the main process already freed.
    try:
        from multiprocessing import resource_tracker

        resource_tracker.unregister(seg._name, "shared_memory")
    except Exception:
        pass
    return spec


def _shm_to_sample(name: str, spec):
    """Attach to a segment and build zero-copy views. Returns (sample,
    cleanup) — cleanup closes AND unlinks (call after collate copies)."""
    seg = shared_memory.SharedMemory(name=name)
    sample = {
        k: np.ndarray(shape, dtype=dt, buffer=seg.buf, offset=off)
        for k, shape, dt, off in spec
    }

    def cleanup(seg=seg):
        try:
            seg.close()
            seg.unlink()
        except FileNotFoundError:  # already unlinked (shutdown race)
            pass

    return sample, cleanup


def _mp_worker(loader, worker_id, num_workers, run_id, out_q):
    """Runs in a forked child: build samples for positions ≡ worker_id
    (mod num_workers), publish each via shm, signal exhaustion with None."""
    try:
        for pos, i in enumerate(loader._index_stream()):
            if pos % num_workers != worker_id:
                continue
            s = loader.ds.sample(int(i), _per_sample_rng(loader.seed + 17, pos))
            name = f"upsnet_{run_id}_{pos}"
            spec = _sample_to_shm(s, name)
            out_q.put((name, spec))
    finally:
        out_q.put(None)


class ProcessLoader(_LoaderBase):
    """Fork-based multi-worker loader (the reference's ``num_workers>0``).

    Position p of the global index stream is built by worker p % W; the
    main process drains the per-worker queues round-robin, so the sample
    order (and therefore bucketing + batch contents) is IDENTICAL to
    ``Loader`` with the same seed. Samples cross the process boundary via
    per-sample shm segments — collate copies straight out of the segment
    and unlinks it; no pickling of image tensors.
    """

    def __init__(self, *args, num_workers: int = 4, stall_timeout: float = 600.0,
                 **kw):
        super().__init__(*args, **kw)
        self.num_workers = max(1, int(num_workers))
        # Forked workers inherit JAX's threads; a child that forked mid-lock
        # can deadlock (CPython warns). Rather than hang the trainer, raise
        # after this many seconds without a sample so the job fails loudly
        # (rerun with train.num_workers=0 to bypass).
        self.stall_timeout = stall_timeout

    def _start_context(self):
        """Prefer forkserver: its workers fork from a clean server process
        spawned before any JAX/TPU threads exist, avoiding the classic
        fork-after-threads deadlock entirely. Requires the loader (dataset
        included) to be picklable; fall back to plain fork — guarded by
        the loud stall timeout — when it is not."""
        import pickle

        if "forkserver" in mp.get_all_start_methods():
            try:
                pickle.dumps(self)
                return mp.get_context("forkserver")
            except Exception:
                pass
        return mp.get_context("fork")

    def _samples_mp(self):
        ctx = self._start_context()
        run_id = uuid.uuid4().hex[:8]
        # depth: keep each worker ~prefetch batches ahead
        depth = max(2, self.prefetch * self.batch_size // self.num_workers + 1)
        queues = [ctx.Queue(maxsize=depth) for _ in range(self.num_workers)]
        procs = [
            ctx.Process(
                target=_mp_worker,
                args=(self, w, self.num_workers, run_id, queues[w]),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        live = [True] * self.num_workers
        try:
            w = 0
            while any(live):
                if live[w]:
                    waited = 0.0
                    while True:
                        try:
                            item = queues[w].get(timeout=5.0)
                            break
                        except queue.Empty:
                            waited += 5.0
                            if not procs[w].is_alive():
                                raise RuntimeError(
                                    f"pipeline worker {w} died (exitcode "
                                    f"{procs[w].exitcode}) without sentinel"
                                )
                            if waited >= self.stall_timeout:
                                raise RuntimeError(
                                    f"pipeline worker {w} produced nothing for "
                                    f"{waited:.0f}s — likely a fork/threading "
                                    "deadlock; set train.num_workers=0"
                                )
                    if item is None:
                        live[w] = False
                    else:
                        yield _shm_to_sample(*item)
                w = (w + 1) % self.num_workers
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            # drain: unlink any segments already published but not consumed
            for q_ in queues:
                while True:
                    try:
                        item = q_.get_nowait()
                    except (queue.Empty, OSError, ValueError):
                        break
                    if item is not None:
                        try:
                            seg = shared_memory.SharedMemory(name=item[0])
                            seg.close()
                            seg.unlink()
                        except FileNotFoundError:
                            pass
            for p in procs:
                p.join(timeout=2)
                if p.is_alive():  # survived SIGTERM (e.g. blocked in a
                    p.kill()      # full-pipe write) — escalate, else it
                    p.join(timeout=5)  # publishes segments after our sweep
            # queue items can be lost mid-pipe at terminate(); the segments
            # are tracker-unregistered (ownership moved to us), so sweep the
            # run's namespace directly (Linux shm lives in /dev/shm) — only
            # after every worker is confirmed dead.
            import os

            if os.path.isdir("/dev/shm"):  # Linux: shm segments are files
                for path in sorted(
                    glob_mod.glob(f"/dev/shm/upsnet_{run_id}_*")
                ):
                    try:
                        os.unlink(path)
                    except OSError:
                        pass
            # other POSIX platforms have no shm filesystem to sweep; lost
            # mid-pipe segments can leak there until reboot (documented
            # Linux-first assumption; the normal consume path unlinks
            # every segment it reads regardless of platform)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        halt = threading.Event()
        err: list[BaseException] = []

        def worker():
            gen = self._bucket_stream(self._samples_mp())
            try:
                for b in gen:
                    while not halt.is_set():
                        try:
                            q.put(b, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if halt.is_set():
                        break
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                gen.close()  # terminates forked workers, unlinks pending shm
                while True:  # blocking-with-halt: the sentinel MUST arrive
                    try:
                        q.put(stop, timeout=0.2)
                        break
                    except queue.Full:
                        if halt.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:  # consumer stopped early: release processes + shm
            halt.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=10)


def make_loader(dataset, batch_size: int, num_workers: int = 0, **kw):
    """Factory: ``num_workers<=0`` -> thread Loader, else ProcessLoader."""
    if num_workers and num_workers > 0:
        return ProcessLoader(dataset, batch_size, num_workers=num_workers, **kw)
    return Loader(dataset, batch_size, **kw)
