"""ProcessLoader (multi-worker, shm transport) vs the thread Loader.

Reference analogue: torch DataLoader num_workers>0 (SURVEY.md §3.1). The
contract under test: worker count must NOT change the sample stream —
position-derived RNG + round-robin queue draining make ProcessLoader
batch-for-batch identical to Loader."""

import glob
import time

import numpy as np

from upsnet_tpu.data.pipeline import Loader, ProcessLoader, make_loader
from upsnet_tpu.data.synthetic import SyntheticDataset

from test_data_layer import small_cfg


def _dataset(n=12):
    cfg = small_cfg()
    return SyntheticDataset(cfg, num_images=n, image_hw=(120, 150))


def test_process_loader_matches_thread_loader():
    ds = _dataset(12)
    kw = dict(batch_size=2, epochs=1, seed=3, shuffle=True)
    ref = list(Loader(ds, **kw))
    got = list(ProcessLoader(ds, num_workers=3, **kw))
    assert len(ref) == len(got) and len(ref) > 0
    for rb, gb in zip(ref, got):
        assert set(rb) == set(gb)
        for k in rb:
            np.testing.assert_array_equal(rb[k], gb[k], err_msg=k)


def test_process_loader_worker_count_invariance():
    ds = _dataset(8)
    kw = dict(batch_size=2, epochs=1, seed=0, shuffle=False)
    a = list(ProcessLoader(ds, num_workers=1, **kw))
    b = list(ProcessLoader(ds, num_workers=4, **kw))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_process_loader_early_close_releases_shm():
    pre = set(glob.glob("/dev/shm/upsnet_*"))  # stale junk from other runs
    ds = _dataset(16)
    loader = ProcessLoader(ds, batch_size=2, epochs=None, seed=1, num_workers=2)
    it = iter(loader)
    next(it)
    next(it)
    it.close()  # trainer `break` path on an infinite stream
    # forked workers terminated + all published segments unlinked
    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = set(glob.glob("/dev/shm/upsnet_*")) - pre
        if not leaked:
            break
        time.sleep(0.2)
    assert not leaked, f"leaked shm segments: {sorted(leaked)}"


def test_make_loader_factory():
    ds = _dataset(4)
    assert isinstance(make_loader(ds, 2, num_workers=0, epochs=1), Loader)
    pl = make_loader(ds, 2, num_workers=2, epochs=1)
    assert isinstance(pl, ProcessLoader)
    batches = list(pl)
    assert batches and batches[0]["images"].shape[0] == 2
