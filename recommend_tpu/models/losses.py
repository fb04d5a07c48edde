"""Loss functions.

- ``in_batch_softmax_loss``: sampled-softmax with LogQ popularity correction and
  label smoothing (kuaiformer KuaiFormerLoss, model.py:554-601). Pure jnp,
  fully vectorized — the reference's per-term construction becomes one
  softmax-cross-entropy over the in-batch score matrix.
- ``multi_task_bce_loss``: per-task binary cross-entropy summed over tasks
  (oneTrans train.py:78-93, 121-128).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def in_batch_softmax_loss(
    interests: jax.Array,  # [B, k, D]
    item_embeddings: jax.Array,  # [B, D] — embedding of each row's positive item
    item_popularity: Optional[jax.Array] = None,  # [B] sampling prob ∝ popularity
    label_smoothing: float = 0.1,
    valid: Optional[jax.Array] = None,  # [B] rows to include
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """In-batch sampled softmax with LogQ correction + label smoothing.

    Row i's positive is item i; the other B-1 batch items are negatives.
    LogQ correction subtracts log(sampling probability) from every logit
    (reference model.py:577-581) so popular items aren't over-penalized as
    negatives. Label smoothing spreads α of the target mass uniformly over
    negatives (reference model.py:584-598).

    Returns (scalar loss, metrics dict with in-batch accuracy).
    """
    b = interests.shape[0]
    # [B, B] score matrix: row=user, col=item; max over the k interests
    scores = jnp.einsum(
        "bkd,nd->bkn",
        interests.astype(jnp.float32),
        item_embeddings.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    logits = jnp.max(scores, axis=1)  # [B, B]
    if item_popularity is not None:
        logq = jnp.log(item_popularity.astype(jnp.float32) + 1e-8)
        logits = logits - logq[None, :]
    a = label_smoothing
    targets = jnp.full((b, b), a / max(b - 1, 1), dtype=jnp.float32)
    targets = jnp.fill_diagonal(targets, 1.0 - a, inplace=False)
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    per_row = -jnp.sum(targets * (logits - logz), axis=-1)  # [B]
    if valid is not None:
        w = valid.astype(jnp.float32)
        loss = jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
        correct = (jnp.argmax(logits, axis=-1) == jnp.arange(b)) & valid
        acc = jnp.sum(correct.astype(jnp.float32)) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        loss = jnp.mean(per_row)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == jnp.arange(b)).astype(jnp.float32))
    return loss, {"loss": loss, "in_batch_accuracy": acc}


def seq2seq_in_batch_loss(
    interests: jax.Array,  # [B, R, k, D] per-position interests (causal)
    item_embeddings: jax.Array,  # [B, R, D] next-item embedding per position
    item_popularity: Optional[jax.Array],  # [B, R]
    valid: jax.Array,  # [B, R] positions with a valid (current, next) pair
    label_smoothing: float = 0.1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Causal seq-to-seq training objective (kuaiformer's self-supervised
    mode, model.py:302-500 + data_loader.py:131-171): at every tail position,
    predict the next item against in-batch negatives drawn from the same
    position across the batch. Vectorized as a vmap of the single-position
    in-batch softmax over the position axis — no [B·L, ...] blowup."""

    def per_position(i, e, p, v):
        return in_batch_softmax_loss(i, e, p, label_smoothing, valid=v)

    pop_axis = None if item_popularity is None else 1
    losses, metrics = jax.vmap(
        per_position, in_axes=(1, 1, pop_axis, 1), out_axes=0
    )(interests, item_embeddings, item_popularity, valid)
    # weight positions by their valid-row count
    w = jnp.sum(valid.astype(jnp.float32), axis=0)  # [R]
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(losses * w) / wsum
    acc = jnp.sum(metrics["in_batch_accuracy"] * w) / wsum
    return loss, {"loss": loss, "in_batch_accuracy": acc}


def multi_task_bce_loss(
    logits: Dict[str, jax.Array],  # per-task [B] pre-sigmoid logits
    labels: Dict[str, jax.Array],  # per-task [B] {0,1} labels
    task_weights: Optional[Dict[str, float]] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of per-task sigmoid BCE (oneTrans train.py:121-128), computed from
    logits for numerical stability (the reference applies sigmoid in the model
    then BCE on probabilities — we keep heads logit-valued and fold the
    sigmoid into the loss)."""
    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    for task, lg in logits.items():
        y = labels[task].astype(jnp.float32)
        lg = lg.astype(jnp.float32)
        bce = jnp.mean(
            jnp.maximum(lg, 0.0) - lg * y + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        )
        w = 1.0 if task_weights is None else task_weights.get(task, 1.0)
        total = total + w * bce
        metrics[f"{task}_loss"] = bce
    metrics["loss"] = total
    return total, metrics
