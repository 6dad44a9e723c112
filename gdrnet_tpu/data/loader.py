"""Train/test data loaders: threaded prefetching iterators over the mappers.

Replaces the reference's torch DataLoader stack (build_gdrn_train_loader,
core/gdrn_modeling/data_loader.py:657-765 + my_build_batch_data_loader): a
pool of worker threads runs the numpy/cv2 mapper (cv2 releases the GIL on its
hot ops) and a bounded queue feeds the TPU step; dual-dataset TRAIN2_RATIO
mixing (engine.py:157-165,232-235) is a stream-level mix. Thread-based (not
process) because the TPU host runtime dislikes forks and the mapper is
C-bound in cv2.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from gdrnet_tpu.data.mapper import collate
from gdrnet_tpu.data.samplers import (
    training_sampler,
    repeat_factor_training_sampler,
    inference_sampler,
)


class TrainLoader:
    """Infinite batched iterator: records + mapper -> batch dicts."""

    def __init__(self, records: list[dict], mapper, batch_size: int,
                 sampler_name: str = "TrainingSampler", repeat_thresh: float = 0.0,
                 shard: int = 0, num_shards: int = 1, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 4,
                 records2: list[dict] | None = None, ratio2: float = 0.0):
        self.records = records
        self.records2 = records2 or []
        self.ratio2 = ratio2 if self.records2 else 0.0
        self.mapper = mapper
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        if sampler_name == "RepeatFactorTrainingSampler":
            labels = [r["label"] for r in records]
            self.sampler = repeat_factor_training_sampler(
                labels, repeat_thresh, shard, num_shards, seed)
        else:
            self.sampler = training_sampler(
                len(records), shard, num_shards, seed=seed)
        self.sampler2 = (training_sampler(len(self.records2), shard, num_shards,
                                          seed=seed + 1)
                         if self.records2 else None)
        self._rng = np.random.RandomState(seed + 7 + shard)

    def _sample_stream(self):
        """Yield (record, per-sample seed), mixing TRAIN2 at ratio2."""
        while True:
            if self.sampler2 is not None and self._rng.rand() < self.ratio2:
                rec = self.records2[next(self.sampler2)]
            else:
                rec = self.records[next(self.sampler)]
            yield rec, int(self._rng.randint(0, 2 ** 31 - 1))

    def __iter__(self):
        stream = self._sample_stream()
        lock = threading.Lock()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()

        def put_checking_stop(item) -> bool:
            """Bounded put that re-checks stop — a worker must not block
            forever on a full queue after the consumer stopped pulling
            (abandoned iterator / exception propagated out of the yield)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            while not stop.is_set():
                with lock:
                    try:
                        rec, seed = next(stream)
                    except StopIteration:
                        return
                try:
                    sample = self.mapper(rec, np.random.RandomState(seed))
                except Exception as e:  # noqa: BLE001 — surface via queue
                    put_checking_stop(e)
                    return
                if not put_checking_stop(sample):
                    return

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                batch = []
                while len(batch) < self.batch_size:
                    item = out_q.get()
                    if isinstance(item, Exception):
                        raise item
                    batch.append(item)
                yield collate(batch)
        finally:
            stop.set()


class InferenceLoader:
    """One pass over test images; mapper is called per image with its ROIs."""

    def __init__(self, image_items: list, mapper, shard: int = 0,
                 num_shards: int = 1):
        """image_items: [(rgb_path, K, rois, meta_info)]."""
        self.items = image_items
        self.mapper = mapper
        self.shard = shard
        self.num_shards = num_shards

    def __iter__(self):
        for idx in inference_sampler(len(self.items), self.shard, self.num_shards):
            rgb_path, K, rois, info = self.items[idx]
            batch = self.mapper(rgb_path, K, rois)
            yield batch, rois, info

    def __len__(self):
        n = len(self.items)
        per = -(-n // self.num_shards)
        return min(per, max(0, n - self.shard * per))
