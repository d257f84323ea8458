"""Shared pipeline utilities: early stopping, param counting, timing."""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import numpy as np


@dataclasses.dataclass
class EarlyStopping:
    """Patience-based early stopping with state_dict round-trip
    (reference training_utils.py:192-268)."""
    patience: int = 5
    min_delta: float = 0.0
    mode: str = "max"
    best: Optional[float] = None
    counter: int = 0
    should_stop: bool = False

    def update(self, value: float) -> bool:
        improved = (self.best is None or
                    (value > self.best + self.min_delta if self.mode == "max"
                     else value < self.best - self.min_delta))
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return improved

    def state_dict(self) -> Dict:
        return {"best": self.best, "counter": self.counter,
                "should_stop": self.should_stop}

    def load_state_dict(self, d: Dict) -> None:
        self.best = d.get("best")
        self.counter = d.get("counter", 0)
        self.should_stop = d.get("should_stop", False)


def count_parameters(params) -> Dict[str, int]:
    """Per-top-level-module param counts (reference ModelPipeline step 6,
    model_pipeline.py:368-427)."""
    counts: Dict[str, int] = {}
    for top, sub in params.items():
        counts[str(top)] = int(sum(np.prod(x.shape)
                                   for x in jax.tree.leaves(sub)))
    return counts


class StepTimer:
    """Wall-clock per-step timing + throughput."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.times = []

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, n_items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append((dt, n_items))
        return dt

    @property
    def items_per_sec(self) -> float:
        tot_t = sum(t for t, _ in self.times)
        tot_n = sum(n for _, n in self.times)
        return tot_n / tot_t if tot_t > 0 else 0.0
