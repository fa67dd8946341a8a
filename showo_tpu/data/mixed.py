"""Multi-loader combinator (show-o2/datasets/mixed_dataloader.py:33-155).

Modes:
  max_size_cycle            — weighted random pick per step, short loaders
                              wrap around;
  min_size                  — stop when the shortest loader is exhausted;
  concat_max_size_cycle     — one batch from each loader per step,
                              concatenated along batch;
  concat_min_size           — same, stop at shortest;
  sequential_max_size_cycle — round-robin through loaders.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _concat_batches(batches: Sequence[Dict]) -> Dict:
    out: Dict = {}
    for k in batches[0]:
        vals = [b[k] for b in batches]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.concatenate(vals, axis=0)
        else:
            out[k] = [x for v in vals for x in v]
    return out


class MixedDataLoader:
    def __init__(self, loaders: Sequence, mode: str = "concat_max_size_cycle",
                 weights: Optional[Sequence[float]] = None, seed: int = 0,
                 accumulation: int = 1):
        self.loaders = list(loaders)
        self.mode = mode
        self.weights = (np.asarray(weights, np.float64) / np.sum(weights)
                        if weights is not None
                        else np.full(len(loaders), 1 / len(loaders)))
        self.rng = np.random.default_rng(seed)
        self.accumulation = max(1, accumulation)

    def state_dict(self) -> dict:
        """Resumable state: sampling RNG + child loader positions (working
        version of the reference's dataloader-state stubs)."""
        return {"rng_state": self.rng.bit_generator.state,
                "loaders": [ld.state_dict() if hasattr(ld, "state_dict")
                            else None for ld in self.loaders]}

    def load_state_dict(self, sd: dict) -> None:
        self.rng.bit_generator.state = sd["rng_state"]
        for ld, s in zip(self.loaders, sd["loaders"]):
            if s is not None and hasattr(ld, "load_state_dict"):
                ld.load_state_dict(s)

    def __iter__(self):
        iters = [iter(ld) for ld in self.loaders]
        exhausted = [False] * len(iters)

        def pull(i, cycle: bool):
            nonlocal iters
            try:
                return next(iters[i])
            except StopIteration:
                exhausted[i] = True
                if not cycle:
                    return None
                iters[i] = iter(self.loaders[i])
                return next(iters[i])

        if self.mode == "max_size_cycle":
            # reference _max_size_cycle: a FRESH weighted pick per
            # sub-batch, `accumulation` sub-batches collated into ONE
            # yielded batch; wrapped batches are yielded, not dropped
            # (the reference iterator is infinite — termination once every
            # loader has exhausted at least once is this framework's
            # finite-loader extension).
            while True:
                batches = []
                for _ in range(self.accumulation):
                    i = int(self.rng.choice(len(iters), p=self.weights))
                    batches.append(pull(i, cycle=True))
                yield batches[0] if len(batches) == 1 \
                    else _concat_batches(batches)
                if all(exhausted):
                    return
        elif self.mode == "min_size":
            while True:
                batches = []
                for _ in range(self.accumulation):
                    i = int(self.rng.choice(len(iters), p=self.weights))
                    b = pull(i, cycle=False)
                    if b is None:
                        return
                    batches.append(b)
                yield batches[0] if len(batches) == 1 \
                    else _concat_batches(batches)
        elif self.mode in ("concat_max_size_cycle", "concat_min_size"):
            cycle = self.mode == "concat_max_size_cycle"
            while True:
                batches = []
                for i in range(len(iters)):
                    b = pull(i, cycle=cycle)
                    if b is None:
                        return
                    batches.append(b)
                if cycle and all(exhausted):
                    return
                yield _concat_batches(batches)
        elif self.mode == "sequential_max_size_cycle":
            i = 0
            while True:
                batch = pull(i % len(iters), cycle=True)
                yield batch
                if all(exhausted):
                    return
                i += 1
        else:
            raise ValueError(f"unknown mode {self.mode}")
