"""Lightweight host-side data loading: threaded prefetch, fixed-shape
numpy batches, per-host sharding.

The TPU-native replacement for torch DataLoader + DistributedSampler: the
device never sees ragged shapes; each jax process reads its own shard
(``jax.process_index()``-keyed), and a background thread keeps a small
prefetch queue of collated batches ready for the next step.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np


def shard_for_process(items: List, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> List:
    """Static per-host shard (DistributedSampler analogue).

    Like DistributedSampler, ranks beyond len(items) wrap around instead
    of receiving an empty shard (torch pads total_size to a multiple of
    num_replicas) — every process gets at least one record, and no
    process silently falls back to the full dataset."""
    if process_index is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    shard = items[process_index::process_count]
    if not shard and items:
        shard = [items[process_index % len(items)]]
    return shard


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # e.g. raw strings
    return out


class DataLoader:
    """Iterate fixed-size batches from a sample iterable with a prefetch
    thread.  ``drop_last`` is always true (static shapes)."""

    def __init__(self, sample_iter_fn: Callable[[], Iterable],
                 batch_size: int, collate_fn=default_collate,
                 prefetch: int = 2, num_epochs: Optional[int] = None):
        self.sample_iter_fn = sample_iter_fn
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.num_epochs = num_epochs

    def _epoch_iter(self) -> Iterator:
        if self.num_epochs is None:
            while True:
                yield from self.sample_iter_fn()
        else:
            for _ in range(self.num_epochs):
                yield from self.sample_iter_fn()

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            batch = []
            try:
                for sample in self._epoch_iter():
                    if sample is None:
                        continue
                    batch.append(sample)
                    if len(batch) == self.batch_size:
                        q.put(self.collate_fn(batch))
                        batch = []
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class CheckpointableDataLoader(DataLoader):
    """Resumable DataLoader: counts yielded batches and fast-forwards the
    (deterministic) sample stream on restore.  The reference only ships
    dataloader-state stubs tied to internal packages
    (show-o2/utils.py:168-181, call sites commented out at
    train_stage_one.py:296-299); this is a working equivalent."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.batches_yielded = 0
        self._pending_skip = 0

    def state_dict(self) -> dict:
        return {"batches_yielded": self.batches_yielded}

    def load_state_dict(self, sd: dict) -> None:
        self._pending_skip = int(sd["batches_yielded"])
        self.batches_yielded = self._pending_skip

    def __iter__(self):
        skip = self._pending_skip
        self._pending_skip = 0
        for batch in super().__iter__():
            if skip > 0:
                skip -= 1
                continue
            self.batches_yielded += 1
            yield batch


def save_loader_state(loader, output_dir: str, step: int,
                      name: str = "loader") -> str:
    """Write loader state next to the step's checkpoint dir."""
    import json
    import os

    path = os.path.join(output_dir, f"checkpoint-{step}",
                        f"{name}_state.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(loader.state_dict(), f)
    return path


def restore_loader_state(loader, output_dir: str, step: int,
                         name: str = "loader") -> bool:
    """Fast-forward ``loader`` from a saved state; returns False if none."""
    import json
    import os

    path = os.path.join(output_dir, f"checkpoint-{step}",
                        f"{name}_state.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        loader.load_state_dict(json.load(f))
    return True


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Overlap host->device transfer with compute: keep `size` batches
    already on device ahead of the consumer (classic jax input pipeline).

    sharding: optional jax.sharding.Sharding applied to every leaf (e.g.
    the batch sharding of the mesh).
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.tree.map(
                lambda x: jax.device_put(x, sharding)
                if hasattr(x, "shape") else x, batch))
        else:
            queue.append(jax.tree.map(
                lambda x: jax.device_put(x) if hasattr(x, "shape") else x,
                batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


class ShuffleBuffer:
    """Reservoir-style shuffle buffer (webdataset .shuffle analogue)."""

    def __init__(self, iterable: Iterable, size: int, seed: int = 0):
        self.iterable = iterable
        self.size = size
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        buf: List = []
        for item in self.iterable:
            if len(buf) < self.size:
                buf.append(item)
                continue
            idx = int(self.rng.integers(0, self.size))
            out, buf[idx] = buf[idx], item
            yield out
        self.rng.shuffle(buf)
        yield from buf
