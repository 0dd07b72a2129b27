"""Background-prefetching batch generator.

Equivalent of the reference's ``ParallelDataset``
(``dataset/__init__.py:14-114``): a producer thread pre-organizes batches
into a bounded queue while the training step consumes — overlapping
host-side batch organization (tokenization, retrieval, mid-rep prep) with
device compute. One iteration = one epoch; shuffling is seeded and
deterministic per epoch.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class ParallelDataset:
    def __init__(
        self,
        sample_count: int,
        get_data_by_ids: Callable[[List[int]], object],
        batch_size: int,
        shuffle: bool = True,
        buffer_size: int = 8,
        drop_last: bool = True,
        seed: Optional[int] = None,
    ):
        self.sample_count = sample_count
        self.get_data_by_ids = get_data_by_ids
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.buffer_size = buffer_size
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def _epoch_id_batches(self) -> List[List[int]]:
        ids = np.arange(self.sample_count)
        if self.shuffle:
            self.rng.shuffle(ids)
        batches = []
        for i in range(0, len(ids), self.batch_size):
            chunk = ids[i:i + self.batch_size].tolist()
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def __iter__(self) -> Iterator[Tuple[object, int]]:
        """Yields (organized_batch, n_samples) for one epoch, with a
        background producer thread keeping ``buffer_size`` batches ready."""
        id_batches = self._epoch_id_batches()
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.buffer_size)
        SENTINEL = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                for ids in id_batches:
                    item = (self.get_data_by_ids(ids), len(ids))
                    # A bounded put with a stop check: when the consumer
                    # abandons the iterator (max_steps / early-stop exits
                    # mid-epoch), a plain q.put would block forever and
                    # the thread would keep organizing batches (CPU +
                    # memory) alongside whatever the trainer does next.
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced to the consumer
                err.append(e)
            finally:
                while not stop.is_set():  # consumer gone → no one needs it
                    try:
                        q.put(SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # GeneratorExit (abandonment) or normal return both land here.
            stop.set()
