"""Optimizers and LR schedules.

- Retrieval: AdamW with warmup + cosine decay (kuaiformer train.py:49-65,
  90-98 — the reference assigns the LR manually per step; optax schedules do
  this inside the compiled update).
- Ranking: the paper's dual-optimizer spec (oneTrans config.py:39-52,
  translation:190): dense params → RMSProp(momentum), sparse embedding tables
  → Adagrad, with global-norm gradient clipping. Realized with
  ``optax.multi_transform`` partitioned by parameter path.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from recommend_tpu.config import RankingConfig, RetrievalConfig


def warmup_cosine_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int, final_scale: float = 0.01
) -> optax.Schedule:
    """Linear warmup → cosine decay (kuaiformer LearningRateScheduler,
    train.py:49-65)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * final_scale,
    )


def make_retrieval_optimizer(
    cfg: RetrievalConfig, total_steps: int = 100_000
) -> optax.GradientTransformation:
    sched = warmup_cosine_schedule(cfg.learning_rate, cfg.warmup_steps, total_steps)
    adamw = optax.adamw(
        learning_rate=sched,
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        weight_decay=cfg.weight_decay,
    )
    if not cfg.use_sparse_embedding_updates:
        return adamw
    # big id tables excluded here; maintained by the touched-row sparse path
    from recommend_tpu.ops.embedding import SPARSE_TABLES

    def label_fn(params) -> Any:
        def label(path, _):
            keys = _path_keys_str(path)
            if keys and keys[-1] == "embedding" and any(
                k in SPARSE_TABLES for k in keys
            ):
                return "frozen"
            return "dense"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"dense": adamw, "frozen": optax.set_to_zero()}, label_fn
    )


def _path_keys_str(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def _is_sparse_path(path: tuple) -> bool:
    """Embedding tables are the 'sparse' group: any param under an `nn.Embed`
    (leaf name 'embedding') or inside the feature-embedding subtree."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return any(k == "embedding" for k in keys)


def sparse_lr_schedule(cfg: RankingConfig):
    """Per-step sparse (embedding-table) LR: linear ramp from
    ``sparse_lr_init`` → ``sparse_lr`` over ``sparse_lr_warmup_steps``
    steps, constant after (and constant ``sparse_lr`` when the ramp is
    disabled). Returns the scalar when no ramp is configured so existing
    constant-LR call sites stay schedule-free; otherwise an optax-style
    ``step -> lr`` callable also usable on traced steps inside jit (the
    trainer's touched-row sparse path evaluates it per step)."""
    n = cfg.sparse_lr_warmup_steps
    if n <= 0:
        return cfg.sparse_lr

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.minimum(jnp.asarray(step, jnp.float32) / n, 1.0)
        return cfg.sparse_lr_init + (cfg.sparse_lr - cfg.sparse_lr_init) * frac

    return schedule


def make_ranking_optimizer(
    cfg: RankingConfig, total_steps: int = 0
) -> optax.GradientTransformation:
    """Dual optimizer: sparse/adagrad + dense/rmsprop, global-norm clip.

    The reference clips per-tensor (oneTrans train.py:133-135); we use the
    global-norm clip the paper specifies (clip 90, config.py:52).

    With ``use_sparse_embedding_updates`` the embedding tables are excluded
    here (zero update) and maintained by the touched-row sparse-adagrad path
    in the trainer (recommend_tpu.ops.sparse_embed).

    ``cfg.dense_lr_schedule == "cosine"`` wraps the dense LR in
    warmup→cosine decay over ``total_steps`` (the convergence-study
    schedule); "constant" is reference parity.
    """
    if cfg.dense_lr_schedule == "cosine":
        assert total_steps > 0, "cosine schedule needs trainer total_steps"
        lr = warmup_cosine_schedule(
            cfg.dense_lr, cfg.lr_warmup_steps, total_steps
        )
    else:
        assert cfg.dense_lr_schedule == "constant", cfg.dense_lr_schedule
        lr = cfg.dense_lr
    dense = {
        "rmsprop": optax.rmsprop(lr, momentum=cfg.dense_momentum),
        "adam": optax.adam(lr),
        # decay only matrix-shaped params (the RMSNorm-trunk weights whose
        # unregularized norm growth drives the learn-then-collapse
        # instability); biases and norm scales are excluded — decaying a
        # RMSNorm gain fights its scale-invariance for no regularization
        "adamw": optax.adamw(
            lr, weight_decay=cfg.dense_weight_decay,
            mask=lambda p: jax.tree_util.tree_map(lambda x: x.ndim >= 2, p),
        ),
    }[cfg.dense_optimizer]
    if cfg.use_sparse_embedding_updates:
        sparse = optax.set_to_zero()
    else:
        sparse = {
            "adagrad": optax.adagrad(sparse_lr_schedule(cfg)),
            "sgd": optax.sgd(sparse_lr_schedule(cfg)),
        }[cfg.sparse_optimizer]

    def label_fn(params) -> Any:
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "sparse" if _is_sparse_path(path) else "dense", params
        )

    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_norm),
        optax.multi_transform({"dense": dense, "sparse": sparse}, label_fn),
    )
