"""Host-side input pipelines producing fixed-shape numpy batches.

Replaces the reference's `tf.data.Dataset.from_generator(...).batch().prefetch`
pipelines (kuaiformer data_loader.py:67-210, oneTrans data_loader.py:203-233)
with plain numpy batch iterators: static shapes (XLA requirement), drop-
remainder batching, seeded shuffling, and a background prefetch thread to
overlap host batch assembly with device compute.

Sequence convention: histories are **left-padded** (zeros at the front,
validity False) so the most recent items always occupy the tail — which is
exactly where the adaptive-compression schedule keeps raw tokens and where
pyramid tail-queries look.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from recommend_tpu.config import RankingConfig, RetrievalConfig
from recommend_tpu.data.synthetic import SyntheticRankingData, SyntheticRetrievalData

FEATURE_KEYS = ("video_id", "category", "tag", "duration", "timestamp")


def _resolve_shard(
    num_shards: Optional[int], shard_id: Optional[int]
) -> Tuple[int, int]:
    """Default the data shard to this host's jax process (multi-host DP).
    Pass both or neither — a lone num_shards would silently feed every host
    shard 0 and break data parallelism."""
    if num_shards is None and shard_id is None:
        import jax

        num_shards = jax.process_count()
        shard_id = jax.process_index()
    if (num_shards is None) != (shard_id is None):
        raise ValueError("pass BOTH num_shards and shard_id, or neither")
    assert 0 <= shard_id < num_shards, (shard_id, num_shards)
    return num_shards, shard_id


def _shard_slice(order: np.ndarray, num_shards: int, shard_id: int) -> np.ndarray:
    """Disjoint per-shard stride, truncated to a COMMON length — every host
    must yield the same number of batches per epoch or multi-host SPMD
    training deadlocks at the first collective."""
    per = len(order) // num_shards
    return order[shard_id::num_shards][:per]


def build_retrieval_examples(
    data: SyntheticRetrievalData,
    cfg: RetrievalConfig,
    min_history: int = 5,
    max_samples_per_user: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """(user_idx, split_point) pairs — one training sample per prefix
    (reference labeled next-item mode, data_loader.py:99-130)."""
    examples = []
    for u, seq in enumerate(data.user_sequences):
        n = len(seq["video_id"])
        points = list(range(min_history, n))
        if max_samples_per_user is not None and len(points) > max_samples_per_user:
            points = points[-max_samples_per_user:]
        examples.extend((u, t) for t in points)
    return examples


def _pad_history(
    seq: Dict[str, np.ndarray], end: int, max_len: int
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Take seq[:end], keep the most recent max_len, left-pad to max_len."""
    start = max(0, end - max_len)
    n = end - start
    out = {}
    for k in FEATURE_KEYS:
        dtype = np.float32 if k == "duration" else np.int64
        arr = np.zeros(max_len, dtype=dtype)
        arr[max_len - n :] = seq[k][start:end]
        out[k] = arr
    valid = np.zeros(max_len, dtype=bool)
    valid[max_len - n :] = True
    return out, valid


def retrieval_batches(
    data: SyntheticRetrievalData,
    cfg: RetrievalConfig,
    batch_size: int,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    min_history: int = 5,
    use_native: bool = True,
    num_shards: Optional[int] = None,
    shard_id: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batches:
    ``history``: dict of [B, L] feature arrays; ``history_valid``: [B, L] bool;
    ``target``: dict of [B] feature arrays for the positive item;
    ``target_popularity``: [B] sampling probability (for LogQ).

    Batch assembly runs through the native C++ batcher when available
    (native/batcher.cc via ctypes); the numpy path below is the reference
    implementation and automatic fallback.

    Multi-host DP (SURVEY.md §5.8): pass ``num_shards``/``shard_id`` (default:
    jax process count/index when distributed) — every host runs the SAME
    seeded permutation and takes a disjoint stride of it, so the global epoch
    covers each example exactly once with no coordination traffic."""
    examples = build_retrieval_examples(data, cfg, min_history)
    probs = data.sampling_probs()
    rng = np.random.default_rng(seed)
    num_shards, shard_id = _resolve_shard(num_shards, shard_id)

    lib = None
    if use_native:
        from recommend_tpu.data.native import FlatSequences, fill_retrieval_batch, load_native

        lib = load_native()
        if lib is not None:
            flat = FlatSequences(data.user_sequences)
            ex = np.asarray(examples, dtype=np.int64)
            epoch = 0
            while num_epochs is None or epoch < num_epochs:
                order = _shard_slice(rng.permutation(len(examples)), num_shards, shard_id)
                for i in range(0, len(order) - batch_size + 1, batch_size):
                    idx = order[i : i + batch_size]
                    b = fill_retrieval_batch(
                        lib, flat, ex[idx, 0], ex[idx, 1], cfg.max_seq_len, probs
                    )
                    b["history_popularity"] = probs[b["history"]["video_id"]]
                    yield b
                epoch += 1
            return

    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = _shard_slice(rng.permutation(len(examples)), num_shards, shard_id)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            hist = {k: np.zeros((batch_size, cfg.max_seq_len),
                                dtype=np.float32 if k == "duration" else np.int64)
                    for k in FEATURE_KEYS}
            valid = np.zeros((batch_size, cfg.max_seq_len), dtype=bool)
            tgt = {k: np.zeros(batch_size,
                               dtype=np.float32 if k == "duration" else np.int64)
                   for k in FEATURE_KEYS}
            pop = np.zeros(batch_size, dtype=np.float32)
            for b, e in enumerate(idx):
                u, t = examples[e]
                seq = data.user_sequences[u]
                h, v = _pad_history(seq, t, cfg.max_seq_len)
                for k in FEATURE_KEYS:
                    hist[k][b] = h[k]
                valid[b] = v
                for k in FEATURE_KEYS:
                    tgt[k][b] = seq[k][t]
                pop[b] = probs[seq["video_id"][t]]
            yield {
                "history": hist,
                "history_valid": valid,
                "target": tgt,
                "target_popularity": pop,
                "history_popularity": probs[hist["video_id"]],
            }
        epoch += 1


def ranking_batches(
    data: SyntheticRankingData,
    cfg: RankingConfig,
    batch_size: int,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    num_shards: Optional[int] = None,
    shard_id: Optional[int] = None,
) -> Iterator[Dict[str, object]]:
    """Yields batches:
    ``non_seq``: dict feature → [B] int ids;
    ``sequences``: dict seq-feature → [B, L] int ids (left-padded);
    ``seq_valid``: dict seq-feature → [B, L] bool;
    ``labels``: dict task → [B] float.

    ``num_shards``/``shard_id``: per-host disjoint slices of the same seeded
    permutation for multi-host DP (see retrieval_batches)."""
    n = data.num_samples
    rng = np.random.default_rng(seed)
    num_shards, shard_id = _resolve_shard(num_shards, shard_id)
    # per-feature window widths (behavior sequences may be heterogeneous,
    # e.g. click 48 / cart 16 / purchase 8 in the industrial replica);
    # NS-only datasets (Criteo) have no behavior sequences at all
    widths = {sf: a.shape[1] for sf, a in data.sequences.items()}
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = _shard_slice(rng.permutation(n), num_shards, shard_id)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            seq_valid = {
                sf: np.arange(widths[sf])[None, :]
                >= (widths[sf] - data.seq_lengths[sf][idx][:, None])
                for sf in data.sequences
            }
            yield {
                "non_seq": {f: a[idx] for f, a in data.non_seq.items()},
                "sequences": {sf: a[idx] for sf, a in data.sequences.items()},
                "seq_valid": seq_valid,
                "labels": {t: a[idx] for t, a in data.labels.items()},
            }
        epoch += 1


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch — the numpy equivalent of
    `.prefetch(AUTOTUNE)` (reference data_loader.py:184)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
