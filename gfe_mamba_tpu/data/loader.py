"""Batching, prefetching data loader feeding device-resident batches.

The TPU-native replacement for torch DataLoader worker processes
(threed_loader.py:262-268): a thread pool decodes/preprocesses items on
the host while the accelerator computes, and finished batches are
``jax.device_put`` with an optional ``NamedSharding`` so each chip
receives exactly its data-parallel shard (no host->device broadcast of
the full batch).  Double buffering keeps one batch in flight.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _collate(items: list[dict]) -> dict:
    batch = {}
    for key in items[0]:
        values = [item[key] for item in items]
        if isinstance(values[0], (str, bytes)):
            batch[key] = values
        else:
            batch[key] = np.stack([np.asarray(v) for v in values])
    return batch


class DataLoader:
    """Iterable over collated batches with shuffle/drop_last semantics
    and optional device placement.

    Args:
      dataset: indexable with ``__len__`` returning dict items
      batch_size, shuffle, drop_last: torch DataLoader semantics
      num_workers: decode threads (0 = synchronous)
      prefetch: batches to keep in flight (>=1 enables the background
        producer thread)
      sharding: optional jax.sharding.Sharding applied on device_put
      seed: shuffle seed; epoch counter advances it deterministically
      process_shard: optional (process_index, process_count) for
        multi-host runs -- every process builds the SAME global shuffle
        (seed must match across processes) and loads only its disjoint
        contiguous slice of each global batch, so ``batch_size`` here is
        the PER-PROCESS batch.  The resulting local batches are what
        ``parallel.multihost.form_global_array`` assembles into the
        globally-sharded array.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 0,
                 prefetch: int = 2, sharding=None, seed: int = 0,
                 process_shard: "tuple[int, int] | None" = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding
        self.seed = seed
        self.epoch = 0
        if process_shard is not None:
            pid, nproc = process_shard
            if not 0 <= pid < nproc:
                raise ValueError(f"bad process_shard {process_shard}")
            if not drop_last:
                # a ragged tail splits len(chunk)//nproc per process ->
                # different global_shape in form_global_array -> hang
                raise ValueError(
                    "process_shard requires drop_last=True: SPMD needs "
                    "identical per-process batch shapes")
        self.process_shard = process_shard

    def __len__(self) -> int:
        n = len(self.dataset)
        global_bs = self.batch_size * (
            self.process_shard[1] if self.process_shard else 1)
        if self.drop_last:
            return n // global_bs
        return (n + global_bs - 1) // global_bs

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if self.process_shard is not None:
            # identical global order on every process; each takes its
            # contiguous block of the global batch (multi-host runs
            # want drop_last so shapes agree across processes)
            pid, nproc = self.process_shard
            global_bs = self.batch_size * nproc
            for start in range(0, len(order), global_bs):
                chunk = order[start:start + global_bs]
                if len(chunk) < global_bs:
                    return  # drop_last enforced in __init__
                yield chunk[pid * self.batch_size:
                            (pid + 1) * self.batch_size]
            return
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def _load_batch(self, indices, pool: Optional[ThreadPoolExecutor]):
        # dataset-level batch fast path (e.g. the C++ threaded NIfTI
        # decoder, MRIClassifyDataset.load_batch); returns None when
        # unavailable -> per-item decode below
        batch = None
        fast = getattr(self.dataset, "load_batch", None)
        if fast is not None:
            batch = fast(indices)
        if batch is None:
            if pool is not None:
                items = list(pool.map(self.dataset.__getitem__, indices))
            else:
                items = [self.dataset[int(i)] for i in indices]
            batch = _collate(items)
        if self.sharding is not None:
            import jax
            batch = {
                k: jax.device_put(v, self.sharding)
                if isinstance(v, np.ndarray) else v
                for k, v in batch.items()
            }
        return batch

    def __iter__(self) -> Iterator[dict]:
        self.epoch += 1
        pool = (ThreadPoolExecutor(self.num_workers)
                if self.num_workers > 0 else None)
        try:
            if self.prefetch <= 0:
                for indices in self._index_batches():
                    yield self._load_batch(indices, pool)
                return

            out: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            sentinel = object()

            def producer():
                try:
                    for indices in self._index_batches():
                        out.put(self._load_batch(indices, pool))
                except BaseException as exc:  # surface in consumer
                    out.put(exc)
                finally:
                    out.put(sentinel)

            thread = threading.Thread(target=producer, daemon=True)
            thread.start()
            while True:
                item = out.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            thread.join()
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
