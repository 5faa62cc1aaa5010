"""Batched data loader with background prefetch.

Replaces torch's DataLoader + DistributedSampler usage in the reference
(/root/reference/pcdet/datasets/__init__.py:54-84). TPU input pipelines are
host-bound, so samples are assembled by a thread pool (numpy releases the GIL
for the heavy transforms) and whole collated batches are prefetched a few
steps ahead while the device runs.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size, shuffle=False, seed=None, drop_last=False,
                 num_workers=4, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(int(num_workers), 0)
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(None if self.seed is None else self.seed + self._epoch)
            rng.shuffle(order)
        return order

    def _batches(self, order):
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self):
        order = self._index_order()
        if self.num_workers == 0:
            for chunk in self._batches(order):
                yield self.dataset.collate_batch([self.dataset[int(j)] for j in chunk])
            return

        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for chunk in self._batches(order):
                    if stop.is_set():
                        break
                    samples = list(pool.map(lambda j: self.dataset[int(j)], chunk))
                    out_q.put(self.dataset.collate_batch(samples))
            out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
