"""Batch loader with background prefetch and sharded device placement.

Replaces the reference's torch DataLoader workers + pin_memory
(src/core/data_pipeline.py:498-524) with the TPU-native pattern: a host
thread assembles fixed-shape numpy batches, a double-buffered prefetcher
`jax.device_put`s them against the mesh's 'data'-axis sharding so the
next batch is already in HBM when the train step finishes (SURVEY §5.8).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax
import numpy as np


class BatchLoader:
    """Shuffling, fixed-batch-size iterator over a map-style dataset.
    drop_last=True keeps shapes static across steps (jit cache)."""

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 pad_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # pad_last: pad a trailing partial batch to full batch_size by
        # repeating the last item (keeps every batch shape static AND
        # divisible by the mesh 'data' axis). `_num_valid` records the
        # real count so metric code can trim.
        self.pad_last = pad_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        end = n - n % self.batch_size if self.drop_last else n
        load_batch = getattr(self.dataset, "load_batch", None)
        # the native path builds the batch with the DATASET's collate;
        # honor a custom collate by falling back to per-item assembly
        if load_batch is not None and \
                self.collate is not getattr(self.dataset,
                                            "default_collate", None):
            load_batch = None
        for start in range(0, end, self.batch_size):
            chunk = list(idx[start:start + self.batch_size])
            num_valid = len(chunk)
            if num_valid < self.batch_size and self.pad_last:
                chunk = chunk + [chunk[-1]] * (self.batch_size - num_valid)
            # native C++ fast path (decode+augment+normalize in one call);
            # None -> per-item PIL fallback
            batch = load_batch(chunk) if load_batch is not None else None
            if batch is None:
                batch = self.collate([self.dataset[int(i)] for i in chunk])
            batch["_num_valid"] = num_valid
            yield batch


_ARRAY_KEYS_SENTINEL = object()


def device_prefetch(iterator: Iterator[dict], sharding=None,
                    buffer_size: int = 2) -> Iterator[dict]:
    """Double-buffered host->device pipeline. Numpy-array values are
    device_put with `sharding`; non-array values (strings, dicts for
    metrics) ride along on host."""

    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _END = object()

    def put(batch):
        if sharding is None:
            return batch
        device_part = {k: v for k, v in batch.items()
                       if isinstance(v, np.ndarray)}
        host_part = {k: v for k, v in batch.items()
                     if not isinstance(v, np.ndarray)}
        placed = jax.device_put(
            device_part, jax.tree.map(lambda _: sharding, device_part))
        return {**placed, **host_part}

    def worker():
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(_END)
        except BaseException as e:  # propagate to the consumer, never swallow
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
