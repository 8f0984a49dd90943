"""Multi-process training data loader.

The reference uses torch DataLoader with 8 workers, pinned memory and
prefetch 4 (ref train.py:179-187).  Torch (CPU) is available in this
image, so the adapter below reuses torch's battle-tested worker pool when
present and falls back to a thread-pool prefetcher otherwise.  Either way
batches come out as numpy, ready for jax.device_put.
"""
from __future__ import annotations

import queue
import threading

import numpy as np


def make_loader(dataset, batch_size=1, num_workers=8, prefetch=4,
                shuffle=True, seed=0):
    try:
        return _torch_loader(dataset, batch_size, num_workers, prefetch,
                             shuffle)
    except ImportError:
        return _thread_loader(dataset, batch_size, num_workers, prefetch,
                              shuffle, seed)


def _torch_loader(dataset, batch_size, num_workers, prefetch, shuffle):
    import torch.utils.data as td

    class _Wrap(td.Dataset):
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            return self.ds[i]

    def collate(samples):
        return tuple(np.stack([np.asarray(x[j]) for x in samples])
                     for j in range(len(samples[0])))

    return td.DataLoader(
        _Wrap(dataset), batch_size=batch_size, shuffle=shuffle,
        num_workers=num_workers, collate_fn=collate,
        prefetch_factor=prefetch if num_workers > 0 else None,
        persistent_workers=num_workers > 0, drop_last=True)


def _thread_loader(dataset, batch_size, num_workers, prefetch, shuffle,
                   seed):
    """Simple threaded prefetcher fallback."""
    rng = np.random.default_rng(seed)

    def gen():
        order = np.arange(len(dataset))
        while True:
            if shuffle:
                rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[s:s + batch_size]
                samples = [dataset[int(i)] for i in idx]
                yield tuple(np.stack([np.asarray(x[j]) for x in samples])
                            for j in range(len(samples[0])))

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    it = gen()

    def worker():
        for item in it:
            q.put(item)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    class _Iter:
        def __iter__(self):
            return self

        def __next__(self):
            return q.get()

    return _Iter()
