"""Datasets over sharded record stores, with weighted multi-corpus sampling.

Reference: /root/reference/after/dataset/dataset.py (SimpleDataset :9,
CombinedDataset :135): train/val split with fixed seed 42, per-dataset
sampling frequency len**0.3, RAM cache option.  torch DataLoader is replaced
by a plain numpy batch iterator (`DataLoader` below) with an optional
background-thread prefetcher — host-side only, the TPU never blocks on IO.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .audio_example import AudioExample
from .store import RecordReader


def train_test_split_ids(n: int, test_size: float = 0.02,
                         seed: int = 42) -> Dict[str, np.ndarray]:
    """Deterministic split matching sklearn's train_test_split(random_state=42)
    semantics closely enough for reproducibility within this framework."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_test = max(1, int(round(n * test_size))) if n > 1 else 0
    return {"validation": np.sort(perm[:n_test]),
            "train": np.sort(perm[n_test:])}


class SimpleDataset:

    def __init__(self, path: str, keys: Sequence[str] = ("waveform", "metadata"),
                 split: Optional[str] = None, validation_size: float = 0.02,
                 max_samples: Optional[int] = None, init_cache: bool = False):
        self.reader = RecordReader(path)
        self.buffer_keys = list(keys)
        all_keys = self.reader.keys()

        if split in ("train", "validation"):
            ids = train_test_split_ids(len(all_keys), validation_size)[split]
            all_keys = [all_keys[i] for i in ids]
        if max_samples is not None and max_samples < len(all_keys):
            rng = np.random.RandomState(0)
            all_keys = list(rng.choice(all_keys, max_samples, replace=False))
        self.keys = all_keys

        if keys == "all" or (len(keys) and keys[0] == "all"):
            probe = AudioExample(self.reader.get(self.keys[0]))
            self.buffer_keys = probe.get_keys()

        self.cache = None
        if init_cache:
            self.cache = [self[i] for i in range(len(self))]

    def __len__(self) -> int:
        return len(self.keys)

    def example_keys(self) -> List[str]:
        return AudioExample(self.reader.get(self.keys[0])).get_keys()

    def add_buffer_keys(self, keys: Sequence[str]) -> None:
        """Select extra record buffers at read time (no store re-scan).
        Only valid before iteration when init_cache was requested."""
        assert self.cache is None, "cache already built with the old keys"
        self.buffer_keys += [k for k in keys if k not in self.buffer_keys]

    def __getitem__(self, i: int) -> Dict[str, Any]:
        if self.cache is not None:
            return self.cache[i]
        ae = AudioExample(self.reader.get(self.keys[i]))
        out = {}
        for k in self.buffer_keys:
            if k == "metadata":
                out[k] = ae.get_metadata()
            elif k in ae:
                out[k] = ae.get(k)
        return out


class CombinedDataset:
    """Multiple stores with per-dataset sampling weights (dataset.py:135-225).

    freqs="estimate" -> weight_i ∝ len_i**0.3 (normalised), giving smaller
    corpora a boosted presence; per-example sampling weights feed the loader.
    """

    def __init__(self, path_dict: Dict[str, str],
                 keys: Sequence[str] = ("z", "metadata"),
                 freqs="estimate", config: str = "train",
                 init_cache: bool = False, num_samples: Optional[int] = None):
        self.names = list(path_dict.keys())
        self.datasets = [
            SimpleDataset(p, keys=keys, split=config, init_cache=init_cache,
                          max_samples=num_samples)
            for p in path_dict.values()
        ]
        lens = np.array([len(d) for d in self.datasets], dtype=np.float64)
        if freqs == "estimate" or freqs is None:
            w = lens ** 0.3
        else:
            w = np.asarray(freqs, dtype=np.float64)
        w = w / w.sum()
        # per-example weight = dataset weight / dataset length
        self.example_weights = np.concatenate(
            [np.full(int(n), wi / max(n, 1))
             for n, wi in zip(lens, w)])
        self.example_weights /= self.example_weights.sum()
        self.offsets = np.concatenate([[0], np.cumsum(lens)]).astype(int)

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, i: int) -> Dict[str, Any]:
        d = int(np.searchsorted(self.offsets, i, side="right") - 1)
        item = self.datasets[d][i - self.offsets[d]]
        item = dict(item)
        item.setdefault("metadata", {})
        if isinstance(item["metadata"], dict):
            item["metadata"]["dataset"] = self.names[d]
        return item

    def example_keys(self) -> List[str]:
        return self.datasets[0].example_keys()

    def add_buffer_keys(self, keys: Sequence[str]) -> None:
        for d in self.datasets:
            d.add_buffer_keys(keys)


class DataLoader:
    """Weighted-sampling batch iterator with background prefetch."""

    def __init__(self, dataset, batch_size: int,
                 collate_fn: Callable[[List[Dict]], Dict],
                 weights: Optional[np.ndarray] = None, seed: int = 0,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.weights = weights
        # seeds per-iterator RandomStates; each iter() gets its own stream so
        # concurrent iterators never race on shared rng state from their
        # background threads
        self._seed_rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    def _draw_indices(self, rng: np.random.RandomState) -> np.ndarray:
        n = len(self.dataset)
        if self.weights is not None:
            return rng.choice(n, self.batch_size, p=self.weights)
        return rng.randint(0, n, self.batch_size)

    def _make_batch(self, rng: np.random.RandomState) -> Dict:
        items = [self.dataset[i] for i in self._draw_indices(rng)]
        return self.collate_fn(items)

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.RandomState(self._seed_rng.randint(0, 2 ** 31 - 1))
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    batch = self._make_batch(rng)
                except Exception as e:  # surface data errors to the consumer
                    q.put(e)
                    return
                # build ONCE, then retry the put: re-building on queue.Full
                # would discard finished batches (wasted IO/collate work)
                # and advance the rng per discard, making the sampled data
                # stream timing-dependent
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=1.0)
                        break
                    except queue_mod.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
