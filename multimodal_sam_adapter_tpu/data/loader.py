"""Data loader: threaded prefetch over the host pipeline.

Replaces the reference's torch DataLoader + DistributedSampler
(apis/train.py:172-273): per-epoch seeded shuffling, per-process sharding
for multi-host DP (each host loads its own 1/num_hosts slice), background
threads that keep the TPU fed, and deterministic eval iteration.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        pipeline: Optional[Callable] = None,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_threads: int = 2,
    ):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous per-shard slice after shuffle == DistributedSampler
        idx = idx[self.shard_index :: self.num_shards]
        if self.drop_last:
            n = (len(idx) // self.batch_size) * self.batch_size
            idx = idx[:n]
        return idx

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        rng_root = np.random.default_rng(
            (self.seed, self.epoch, self.shard_index)
        )
        sample_seeds = rng_root.integers(0, 2**31, size=len(indices))

        def produce(i: int):
            sample = self.dataset[int(indices[i])]
            if self.pipeline is not None:
                rng = np.random.default_rng(int(sample_seeds[i]))
                try:
                    sample = self.pipeline(sample, rng)
                except TypeError:
                    sample = self.pipeline(sample)
            return sample

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        stop = threading.Event()

        def worker(start: int):
            for i in range(start, len(indices), self.num_threads):
                if stop.is_set():
                    return
                q.put((i, produce(i)))

        threads = [
            threading.Thread(target=worker, args=(t,), daemon=True)
            for t in range(self.num_threads)
        ]
        for t in threads:
            t.start()

        buf = {}
        try:
            next_i = 0
            batch = []
            total = len(indices)
            while next_i < total:
                while next_i not in buf:
                    i, s = q.get()
                    buf[i] = s
                batch.append(buf.pop(next_i))
                next_i += 1
                if len(batch) == self.batch_size:
                    yield self._collate(batch)
                    batch = []
            if batch and not self.drop_last:
                yield self._collate(batch)
        finally:
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    @staticmethod
    def _collate(samples):
        imgs = np.stack([s["img"] for s in samples]).astype(np.float32)
        out = {"img": imgs, "meta": [s["meta"] for s in samples]}
        if samples[0].get("gt") is not None:
            out["gt"] = np.stack([s["gt"] for s in samples]).astype(np.int32)
        return out
