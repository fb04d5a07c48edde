"""Negative sampling.

Capability parity with kuaiformer's `NegativeSampler`
(data_loader.py:212-302): popularity-weighted (or uniform) sampling without
replacement, with an exclusion-list variant for the self-supervised causal
mode (exclude already-seen videos).

Host-side numpy: negative sampling feeds the input pipeline, not the compiled
step — the in-batch softmax path needs no explicit negatives at all, but the
sampler is kept for evaluation candidate sets and explicit-negative training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class NegativeSampler:
    def __init__(
        self,
        popularity: np.ndarray,
        strategy: str = "popularity",
        seed: int = 0,
    ):
        assert strategy in ("popularity", "uniform")
        self.num_items = len(popularity)
        self.strategy = strategy
        p = popularity.astype(np.float64)
        self.probs = p / p.sum()
        self.rng = np.random.default_rng(seed)

    def sample_negatives(
        self, num: int, positive: Optional[int] = None
    ) -> np.ndarray:
        """Sample `num` distinct item ids, excluding the positive."""
        exclude = [] if positive is None else [positive]
        return self.sample_negatives_with_exclusion(num, exclude)

    def sample_negatives_with_exclusion(
        self, num: int, exclude: Sequence[int]
    ) -> np.ndarray:
        """Without-replacement sampling avoiding `exclude`
        (reference data_loader.py:262-302)."""
        p = None
        if self.strategy == "popularity":
            p = self.probs.copy()
            if len(exclude):
                p[np.asarray(exclude, dtype=np.int64)] = 0.0
            p = p / p.sum()
            return self.rng.choice(self.num_items, size=num, replace=False, p=p)
        candidates = np.setdiff1d(
            np.arange(self.num_items), np.asarray(exclude, dtype=np.int64),
            assume_unique=False,
        )
        return self.rng.choice(candidates, size=num, replace=False)
