"""Metric registry: retrieval ranking metrics + streaming classification AUC.

Capability parity with the reference's metric suites (SURVEY.md §5.5):
HR@K / Recall@K, NDCG@K, MRR, MAP (kuaiformer evaluate.py:54-159,
train.py:216-253) and streaming AUC / accuracy / precision / recall
(oneTrans train.py:95-109, evaluate.py:39-56 via Keras metrics).

Everything is pure jnp so metrics can run inside the compiled eval step; the
streaming AUC uses a fixed-threshold histogram accumulator (the same approach
as Keras' AUC) so it composes across batches without host round-trips.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Retrieval metrics. Inputs: scores [B, N] (higher = better), true_idx [B].
# ---------------------------------------------------------------------------

def _rank_of_true(scores: jax.Array, true_idx: jax.Array) -> jax.Array:
    """0-based rank of the true item in each row (ties broken pessimistically)."""
    true_score = jnp.take_along_axis(scores, true_idx[:, None], axis=1)  # [B,1]
    return jnp.sum((scores > true_score), axis=1)


def hit_rate_at_k(scores: jax.Array, true_idx: jax.Array, k: int) -> jax.Array:
    """HR@K == Recall@K for single-positive evaluation."""
    return jnp.mean((_rank_of_true(scores, true_idx) < k).astype(jnp.float32))


def ndcg_at_k(scores: jax.Array, true_idx: jax.Array, k: int) -> jax.Array:
    rank = _rank_of_true(scores, true_idx)
    gain = 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0)
    return jnp.mean(jnp.where(rank < k, gain, 0.0))


def mrr(scores: jax.Array, true_idx: jax.Array) -> jax.Array:
    rank = _rank_of_true(scores, true_idx)
    return jnp.mean(1.0 / (rank.astype(jnp.float32) + 1.0))


def retrieval_metric_suite(
    scores: jax.Array,
    true_idx: jax.Array,
    ks: Tuple[int, ...] = (1, 5, 10, 50, 100),
) -> Dict[str, jax.Array]:
    out = {}
    for k in ks:
        if k <= scores.shape[1]:
            out[f"recall@{k}"] = hit_rate_at_k(scores, true_idx, k)
            out[f"ndcg@{k}"] = ndcg_at_k(scores, true_idx, k)
    out["mrr"] = mrr(scores, true_idx)
    return out


# ---------------------------------------------------------------------------
# Streaming AUC (histogram accumulator over fixed thresholds).
# ---------------------------------------------------------------------------

class AUCState(NamedTuple):
    tp: jax.Array  # [T] true positives at each threshold
    fp: jax.Array
    num_pos: jax.Array  # scalar
    num_neg: jax.Array


def streaming_auc(num_thresholds: int = 512):
    """Returns (init, update, compute) for a batch-composable ROC AUC."""
    thresholds = jnp.linspace(0.0, 1.0, num_thresholds)

    def init() -> AUCState:
        z = jnp.zeros(num_thresholds, dtype=jnp.float32)
        return AUCState(z, z, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

    def update(state: AUCState, probs: jax.Array, labels: jax.Array) -> AUCState:
        probs = probs.astype(jnp.float32).reshape(-1)
        labels = labels.astype(jnp.float32).reshape(-1)
        # pred >= threshold  → predicted positive
        pred_pos = probs[None, :] >= thresholds[:, None]  # [T, B]
        tp = jnp.sum(pred_pos * labels[None, :], axis=1)
        fp = jnp.sum(pred_pos * (1.0 - labels[None, :]), axis=1)
        return AUCState(
            state.tp + tp,
            state.fp + fp,
            state.num_pos + jnp.sum(labels),
            state.num_neg + jnp.sum(1.0 - labels),
        )

    def compute(state: AUCState) -> jax.Array:
        tpr = state.tp / jnp.maximum(state.num_pos, 1.0)
        fpr = state.fp / jnp.maximum(state.num_neg, 1.0)
        # thresholds ascending → fpr/tpr descending; integrate |trapezoid|
        return jnp.sum(
            (fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0
        )

    return init, update, compute


def exact_auc(probs, labels) -> float:
    """Exact tie-corrected ROC AUC (Mann-Whitney U with midranks).

    The paper's lifts are +0.9–1.5% *relative* AUC (translation:206-207);
    the 512-bucket histogram of `streaming_auc` can bias comparisons at that
    scale, so REPORTED final AUCs use this exact host-side computation (the
    histogram remains for in-loop streaming). Vectorized midranks via
    double-argsort + segment means — O(n log n), no Python loop over ties.
    """
    import numpy as np

    p = np.asarray(probs, dtype=np.float64).reshape(-1)
    y = np.asarray(labels, dtype=np.float64).reshape(-1)
    n_pos = int(y.sum())
    n_neg = int(len(y) - n_pos)
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(p, kind="mergesort")
    sp = p[order]
    # tie groups: start flags → group index → midrank = mean of 1-based ranks
    starts = np.concatenate([[True], sp[1:] != sp[:-1]])
    gidx = np.cumsum(starts) - 1
    counts = np.bincount(gidx)
    rank_sums = np.bincount(gidx, weights=np.arange(1, len(sp) + 1))
    midranks = np.empty(len(sp))
    midranks[order] = (rank_sums / counts)[gidx]
    return float(
        (midranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )


def grouped_auc(probs, labels, group_ids, weighted: bool = True) -> float:
    """UAUC / GAUC: exact per-group ROC AUC averaged over groups.

    The OneTrans paper reports UAUC alongside AUC for every model
    (rank/scaling_up/oneTrans/translation/complete_translation.md:199-207,
    Table 2) — per-user AUC, impression-weighted. Groups with no positive or
    no negative are skipped (AUC undefined), matching standard GAUC practice.

    Host-side numpy by design: groups are ragged and this runs once per eval
    pass on already-fetched arrays (the reference computes AUC on host via
    sklearn the same way, kuaiformer evaluate.py:161-205).
    """
    import numpy as np

    probs = np.asarray(probs, dtype=np.float64).reshape(-1)
    labels = np.asarray(labels, dtype=np.float64).reshape(-1)
    group_ids = np.asarray(group_ids).reshape(-1)
    total, weight_sum = 0.0, 0.0
    for g in np.unique(group_ids):
        m = group_ids == g
        auc = exact_auc(probs[m], labels[m])
        if auc != auc:  # NaN: group lacks a positive or a negative
            continue
        w = float(m.sum()) if weighted else 1.0
        total += w * auc
        weight_sum += w
    return total / weight_sum if weight_sum else float("nan")


def binary_classification_suite(
    probs: jax.Array, labels: jax.Array, threshold: float = 0.5
) -> Dict[str, jax.Array]:
    """Single-batch accuracy / precision / recall / F1 / logloss
    (oneTrans evaluate.py:39-56)."""
    probs = probs.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    pred = (probs >= threshold).astype(jnp.float32)
    tp = jnp.sum(pred * labels)
    fp = jnp.sum(pred * (1 - labels))
    fn = jnp.sum((1 - pred) * labels)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-8)
    eps = 1e-7
    p = jnp.clip(probs, eps, 1 - eps)
    logloss = -jnp.mean(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    return {
        "accuracy": jnp.mean((pred == labels).astype(jnp.float32)),
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "logloss": logloss,
    }
