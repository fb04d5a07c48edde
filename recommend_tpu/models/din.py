"""DCNv2+DIN-class ranking baseline — the paper's Table-2 comparator.

The OneTrans paper measures its architecture margin against a production
DCNv2+DIN model: a *sequence-aware* baseline that pools user behavior with
target attention (DIN's local activation unit keyed on the candidate item)
and crosses the pooled history with the non-sequence features through a
DCNv2 cross-network + deep tower
(rank/scaling_up/oneTrans/translation/complete_translation.md:199-207;
OneTrans-L beats it by +1.53% CTR AUC / +2.79% UAUC). The reference repo
contains no DCNv2+DIN code — this module implements the comparator so the
replica quality board measures OneTrans against a baseline that can actually
see the sequence (VERDICT round-3 item 1), not the sequence-blind NS-only
strawman.

Design (kept faithful to the DIN/DCNv2 papers, TPU-idiomatic):
  - target attention per behavior sequence: activation weights from an MLP
    over [key, query, key·query, key−query] (DIN's local activation unit),
    masked softmax over valid positions, weighted-sum pooling → one vector
    per sequence. (Original DIN leaves weights unnormalized; the masked
    softmax is the standard stabilized variant and stays DIN-class.)
  - DCNv2 cross network: x_{l+1} = x0 ⊙ (W_l x_l + b_l) + x_l (full-rank W),
    in parallel with a deep MLP tower; concat → per-task sigmoid heads,
    mirroring RankingModel's head shape.
  - embeddings come from the SAME `UnifiedTokenizer` feature tables (own
    init — a separate model, but the identical feature surface and the
    identical sparse-update/dummy path), so `RankingTrainer` trains it
    unchanged via its `model=` injection point.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RankingConfig
from recommend_tpu.models.tokenizer import UnifiedTokenizer

NEG_INF = -1e9


class DINRankingModel(nn.Module):
    """Sequence-aware DCNv2+DIN baseline with RankingModel's exact interface
    (`__call__(non_seq, sequences, seq_valid, deterministic, dummies)` →
    per-task logits [B]) so trainers/evaluators swap models freely."""

    config: RankingConfig
    num_cross_layers: int = 3
    deep_hidden: tuple = (512, 256)
    attn_hidden: int = 64

    def setup(self):
        cfg = self.config
        pdt = jnp.dtype(cfg.param_dtype)
        cdt = jnp.dtype(cfg.active_compute_dtype)
        self.tokenizer = UnifiedTokenizer(cfg, name="tokenizer")
        # candidate-item query projection: item-group feature embeds → d
        self.query_proj = nn.Dense(
            cfg.embed_dim, name="query_proj", param_dtype=pdt, dtype=cdt
        )
        # DIN local activation unit (shared across the behavior sequences —
        # the per-sequence signal is carried by the pooled vectors' position
        # in the concat)
        self.attn_mlp = [
            nn.Dense(self.attn_hidden, name="attn_hidden",
                     param_dtype=pdt, dtype=cdt),
            nn.Dense(1, name="attn_out", param_dtype=pdt, dtype=cdt),
        ]
        # cross-layer width is config-derivable: NS concat + query + one
        # pooled vector per behavior sequence (absent sequences contribute
        # zero vectors so the width is static)
        x0_dim = (
            len(cfg.non_seq_features) * cfg.feature_embed_dim
            + sum(dim for _, dim in cfg.semantic_features)
            + cfg.embed_dim * (1 + len(cfg.sequence_features))
        )
        self.cross_layers = [
            nn.Dense(x0_dim, name=f"cross_w_{i}", param_dtype=pdt, dtype=cdt)
            for i in range(self.num_cross_layers)
        ]
        self.deep = [
            nn.Dense(h, name=f"deep_{i}", param_dtype=pdt, dtype=cdt)
            for i, h in enumerate(self.deep_hidden)
        ]
        self.dropout = nn.Dropout(cfg.dropout_rate)
        bias0 = cfg.task_logit_bias_init or (0.0,) * len(cfg.tasks)
        self.heads = {
            t: [
                nn.Dense(cfg.task_head_hidden, name=f"head_{t}_hidden",
                         param_dtype=pdt),
                # label-prior bias init — identical treatment to
                # RankingModel so the comparator protocol stays fair
                nn.Dense(1, name=f"head_{t}_out", param_dtype=pdt,
                         bias_init=nn.initializers.constant(b0)),
            ]
            for t, b0 in zip(cfg.tasks, bias0)
        }

    def _cross(self, x0: jax.Array) -> jax.Array:
        """DCNv2 cross network (full-rank W per layer):
        x_{l+1} = x0 ⊙ (W_l x_l + b_l) + x_l."""
        x = x0
        for w in self.cross_layers:
            x = x0 * w(x) + x
        return x

    def _target_attention(
        self,
        keys: jax.Array,      # [B, L, d]
        valid: jax.Array,     # [B, L]
        query: jax.Array,     # [B, d]
    ) -> jax.Array:
        """DIN local activation unit + masked-softmax pooling → [B, d]."""
        q = jnp.broadcast_to(query[:, None, :], keys.shape)
        feats = jnp.concatenate([keys, q, keys * q, keys - q], axis=-1)
        h = jax.nn.silu(self.attn_mlp[0](feats))
        logits = self.attn_mlp[1](h)[..., 0]  # [B, L]
        logits = jnp.where(valid, logits.astype(jnp.float32), NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        # sequences with zero valid positions pool to exactly zero
        any_valid = jnp.any(valid, axis=-1, keepdims=True)
        w = jnp.where(any_valid, w, 0.0)
        return jnp.einsum("bl,bld->bd", w.astype(keys.dtype), keys)

    def __call__(
        self,
        non_seq: Dict[str, jax.Array],
        sequences: Dict[str, jax.Array],
        seq_valid: Dict[str, jax.Array],
        deterministic: bool = True,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        cdt = jnp.dtype(cfg.active_compute_dtype)
        ns = self.tokenizer.ns_concat(non_seq, dummies)  # [B, F·fe]
        # candidate-item query: slice the item-group columns out of the SAME
        # dummy-added concat. A second dummies=None lookup would read the
        # stop-gradient'd tables directly and silently drop the query-path
        # cotangent from the sparse update (the ns-concat dummies capture
        # only the NS usage's gradient) — biasing the baseline's training.
        fe = cfg.feature_embed_dim
        cols = [
            ns[:, i * fe : (i + 1) * fe]
            for i, f in enumerate(cfg.non_seq_features)
            if f in cfg.item_features and f in non_seq
        ]
        query = self.query_proj(jnp.concatenate(cols, axis=-1))  # [B, d]
        pooled = []
        for sf in cfg.sequence_features:
            if sf not in sequences:
                pooled.append(jnp.zeros_like(query))
                continue
            keys = self.tokenizer.seq_item_embeds(sf, sequences[sf], dummies)
            pooled.append(
                self._target_attention(keys, seq_valid[sf], query)
            )
        x0 = jnp.concatenate([ns.astype(cdt), query] + pooled, axis=-1)
        cross = self._cross(x0)
        deep = x0
        for layer in self.deep:
            deep = jax.nn.silu(layer(deep))
            deep = self.dropout(deep, deterministic=deterministic)
        z = jnp.concatenate([cross, deep], axis=-1).astype(jnp.float32)
        out = {}
        for t in cfg.tasks:
            hidden, final = self.heads[t]
            h = jax.nn.gelu(hidden(z))
            out[t] = final(h)[..., 0]
        return out
