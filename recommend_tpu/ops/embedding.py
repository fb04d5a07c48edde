"""Feature embedding layer for the retrieval tower.

Capability parity with kuaiformer's EmbeddingModule (model.py:12-94):
five per-item features — video_id / category / tag (discrete lookups) +
duration / timestamp (bucketized continuous) — concatenated and fused by a
2-layer MLP + norm into one token per history item.

TPU-first notes: lookups are plain gathers on [V, D] tables that XLA lowers to
dynamic-gather; bucketization (reference model.py:74-84) is pure vectorized
arithmetic. The multi-chip row-sharded table path lives in
``recommend_tpu.parallel.embedding_sharding``; this module is the single-shard
functional core it wraps.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.ops.normalization import RMSNorm


def bucketize_duration(duration_s: jax.Array, max_duration_s: float, n_buckets: int) -> jax.Array:
    """value/max * n_buckets, clipped — kuaiformer model.py:74-79."""
    b = (duration_s / max_duration_s * n_buckets).astype(jnp.int32)
    return jnp.clip(b, 0, n_buckets - 1)


def bucketize_timestamp(ts: jax.Array, n_buckets: int) -> jax.Array:
    """ts mod n_buckets — kuaiformer model.py:81-84."""
    return (ts % n_buckets).astype(jnp.int32)


# id-keyed tables eligible for sparse (touched-row) updates
SPARSE_TABLES = ("video_id", "category", "tag")


class FeatureEmbedding(nn.Module):
    """Per-item token builder: 5 embeddings → concat → fusion MLP → RMSNorm."""

    config: RetrievalConfig

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """features: dict with int arrays of shape [..., L]:
        ``video_id``, ``category``, ``tag`` (int ids), ``duration`` (float
        seconds), ``timestamp`` (int seconds). Returns [..., L, D] tokens.

        ``dummies`` (name → zeros of ids.shape + [D]) routes the id-table
        gradients to per-lookup arrays for the sparse-update path
        (recommend_tpu.ops.sparse_embed); bucket tables stay dense.
        """
        cfg = self.config
        d = cfg.embed_dim
        pdt = jnp.dtype(cfg.param_dtype)
        cdt = jnp.dtype(cfg.compute_dtype)

        def table(name, vocab):
            return nn.Embed(
                vocab, d, name=name, param_dtype=pdt, dtype=cdt,
                embedding_init=nn.initializers.normal(stddev=0.02),
            )

        def lookup(name, vocab, ids):
            emb = table(name, vocab)
            if dummies is None or name not in dummies:
                return emb(ids)
            from recommend_tpu.ops.sparse_embed import lookup_with_dummy

            return lookup_with_dummy(emb.embedding, ids, dummies[name]).astype(cdt)

        e_video = lookup("video_id", cfg.video_vocab_size, features["video_id"])
        e_cat = lookup("category", cfg.category_vocab_size, features["category"])
        e_tag = lookup("tag", cfg.tag_vocab_size, features["tag"])
        dur_b = bucketize_duration(features["duration"], cfg.max_duration_s, cfg.duration_buckets)
        e_dur = table("duration", cfg.duration_buckets)(dur_b)
        ts_b = bucketize_timestamp(features["timestamp"], cfg.time_buckets)
        e_ts = table("timestamp", cfg.time_buckets)(ts_b)

        x = jnp.concatenate([e_video, e_cat, e_tag, e_dur, e_ts], axis=-1)
        # fusion MLP (reference model.py:52-56, 92): 2 layers + norm
        x = nn.Dense(2 * d, name="fuse_hidden", param_dtype=pdt, dtype=cdt)(x)
        x = jax.nn.gelu(x)
        x = nn.Dense(d, name="fuse_out", param_dtype=pdt, dtype=cdt)(x)
        return RMSNorm(name="fuse_norm", param_dtype=pdt)(x)

    def item_embeddings(
        self,
        features: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Alias used by retrieval scoring: embed candidate items the same way
        user-history items are embedded (shared item tower)."""
        return self(features, dummies)
