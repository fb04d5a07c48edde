"""Multi-interest retrieval tower (KuaiFormer-capability).

Pipeline (kuaiformer model.py:220-552): feature-embed the history →
adaptive compression (256→55 tokens) → append k learnable query tokens →
N pre-norm transformer blocks → RMSNorm → the k query-token outputs are the
user's interest vectors. Scoring = dot(candidates, interests), max over
interests (argmax strategy, model.py:530-552).

TPU-first reformulations:
  - Bidirectional mode is one batched pass (no per-group loops).
  - The causal *seq-to-seq* mode (reference model.py:302-500 materializes a
    [B·(L-1), L+k, d] tensor — an O(L²) memory blowup, SURVEY.md §3.2) is
    instead ONE pass over an interleaved sequence ``[items(T); query-groups
    (T·k)]`` with a block attention mask: item t attends causally to items ≤ t;
    query token (t, j) attends to items ≤ t and its own k-token group. Memory
    is O(T·(1+k)) tokens instead of O(T²).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.ops.attention import NEG_INF
from recommend_tpu.ops.compression import AdaptiveCompression
from recommend_tpu.ops.embedding import FeatureEmbedding
from recommend_tpu.ops.normalization import RMSNorm
from recommend_tpu.ops.transformer import TransformerBlock


def _single_prediction_bias(
    token_valid: jax.Array, num_query: int, causal: bool
) -> jax.Array:
    """Attention bias for the [items(T); queries(k)] sequence, [B,1,L,L]."""
    b, t = token_valid.shape
    l = t + num_query
    valid = jnp.concatenate(
        [token_valid, jnp.ones((b, num_query), dtype=bool)], axis=1
    )  # [B, L]
    bias = jnp.where(valid[:, None, None, :], 0.0, NEG_INF)  # [B,1,1,L]
    bias = jnp.broadcast_to(bias, (b, 1, l, l))
    if causal:
        # items causal among themselves; query tokens see all items + each other
        pos = jnp.arange(l)
        is_query = pos >= t
        allowed = (pos[None, :] <= pos[:, None]) | is_query[None, :] & is_query[:, None]
        allowed = allowed | is_query[:, None]  # queries see every item
        bias = bias + jnp.where(allowed[None, None], 0.0, NEG_INF)
    return bias


def _interleaved_causal_bias(
    token_valid: jax.Array, num_query: int
) -> jax.Array:
    """Bias for the all-positions causal mode.

    Sequence layout: ``[items 0..T-1 ; q(0,0..k-1) ; q(1,0..k-1) ; ...]`` of
    length T·(1+k). Rules: item t ← items ≤ t (causal); query (t, j) ← items
    ≤ t and queries in its own group. Invalid (padded) items are masked as keys
    everywhere. Returns [B, 1, L, L].
    """
    b, t = token_valid.shape
    k = num_query
    l = t + t * k
    pos = jnp.arange(l)
    is_item = pos < t
    # absolute "time" of each slot: items → own index; query group g → g
    q_time = (pos - t) // jnp.maximum(k, 1)
    time = jnp.where(is_item, pos, q_time)
    q_group = jnp.where(is_item, -1 - pos, q_time)  # unique negatives for items
    causal_ok = is_item[None, :] & (time[None, :] <= time[:, None])
    group_ok = (~is_item[:, None]) & (q_group[None, :] == q_group[:, None])
    allowed = causal_ok | group_ok
    bias = jnp.where(allowed[None, None], 0.0, NEG_INF)  # [1,1,L,L]
    key_valid = jnp.concatenate(
        [token_valid, jnp.ones((b, t * k), dtype=bool)], axis=1
    )
    return bias + jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF)


class RetrievalTower(nn.Module):
    config: RetrievalConfig

    def setup(self):
        cfg = self.config
        pdt = jnp.dtype(cfg.param_dtype)
        self.embedder = FeatureEmbedding(cfg, name="embed")
        self.compressor = AdaptiveCompression(cfg, name="compress")
        self.query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_query_tokens, cfg.embed_dim),
            pdt,
        )
        # learnable [MASK] item embedding for the masked-item training mode
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(stddev=0.02),
            (cfg.embed_dim,), pdt,
        )
        block = TransformerBlock
        if cfg.use_remat:
            # (self, x, bias, deterministic) — deterministic must be static
            block = nn.remat(TransformerBlock, static_argnums=(3,))
        self.blocks = [
            block(
                embed_dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                ffn_dim=cfg.ffn_dim,
                dropout_rate=cfg.dropout_rate,
                param_dtype=pdt,
                name=f"block_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = RMSNorm(name="final_norm", param_dtype=pdt)

    def _tokens(self, features, valid, dummies=None):
        x = self.embedder(features, dummies)  # [B, L, D]
        return self.compressor(x, valid)  # [B, T, D], [B, T]

    def __call__(
        self,
        features: Dict[str, jax.Array],
        valid: jax.Array,
        deterministic: bool = True,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Single-prediction mode → [B, k, D] interest vectors
        (kuaiformer `_call_bidirectional_single_sequence`, model.py:274-300;
        causal single-sequence when cfg.use_causal_mask)."""
        cfg = self.config
        tokens, token_valid = self._tokens(features, valid, dummies)
        b, t, d = tokens.shape
        k = cfg.num_query_tokens
        q = jnp.broadcast_to(
            self.query_tokens.astype(tokens.dtype)[None], (b, k, d)
        )
        x = jnp.concatenate([tokens, q], axis=1)
        bias = _single_prediction_bias(token_valid, k, cfg.use_causal_mask)
        for blk in self.blocks:
            x = blk(x, bias, deterministic)
        return self.final_norm(x[:, t:])  # [B, k, D]

    def all_position_interests(
        self,
        features: Dict[str, jax.Array],
        valid: jax.Array,
        deterministic: bool = True,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Causal seq-to-seq mode → [B, T, k, D]: interests after every
        compressed-token prefix, in ONE pass (replaces the reference's
        O(L²)-memory gather construction, model.py:302-500)."""
        cfg = self.config
        tokens, token_valid = self._tokens(features, valid, dummies)
        b, t, d = tokens.shape
        k = cfg.num_query_tokens
        q = jnp.broadcast_to(
            self.query_tokens.astype(tokens.dtype)[None, None], (b, t, k, d)
        ).reshape(b, t * k, d)
        x = jnp.concatenate([tokens, q], axis=1)  # [B, T(1+k), D]
        bias = _interleaved_causal_bias(token_valid, k)
        for blk in self.blocks:
            x = blk(x, bias, deterministic)
        out = self.final_norm(x[:, t:])
        return out.reshape(b, t, k, d)

    def interests_at_position(
        self,
        features: Dict[str, jax.Array],
        valid: jax.Array,
        position: jax.Array,  # [B] compressed-token index (0-based)
        deterministic: bool = True,
    ) -> jax.Array:
        """Causal interests after one chosen prefix position → [B, k, D]
        (kuaiformer `call_with_position`, model.py:502-526).

        ONE causal pass over ``[items(T); queries(k)]`` where the k query
        tokens are masked to attend only items ≤ ``position`` (per example)
        plus each other — O((T+k)²) attention instead of the all-positions
        O((T·(1+k))²) pass. Equivalent by construction to gathering row
        ``position`` of `all_position_interests` (tested), because in the
        interleaved mode a query group's keys are exactly items ≤ its time
        plus its own group."""
        cfg = self.config
        tokens, token_valid = self._tokens(features, valid)
        b, t, d = tokens.shape
        k = cfg.num_query_tokens
        q = jnp.broadcast_to(
            self.query_tokens.astype(tokens.dtype)[None], (b, k, d)
        )
        x = jnp.concatenate([tokens, q], axis=1)
        l = t + k
        pos = jnp.arange(l)
        is_query = pos >= t
        # static part: items causal among themselves, queries see each other
        static_ok = (
            (pos[None, :] <= pos[:, None]) & ~is_query[None, :] & ~is_query[:, None]
        ) | (is_query[None, :] & is_query[:, None])
        # per-example part: query rows see items with index <= position[b]
        q_to_item = (
            is_query[None, :, None]
            & (~is_query)[None, None, :]
            & (pos[None, None, :] <= position[:, None, None].astype(jnp.int32))
        )  # [B, L, L]
        allowed = static_ok[None] | q_to_item
        key_valid = jnp.concatenate(
            [token_valid, jnp.ones((b, k), dtype=bool)], axis=1
        )
        bias = (
            jnp.where(allowed[:, None], 0.0, NEG_INF)
            + jnp.where(key_valid[:, None, None, :], 0.0, NEG_INF)
        )  # [B, 1, L, L]
        for blk in self.blocks:
            x = blk(x, bias, deterministic)
        return self.final_norm(x[:, t:])  # [B, k, D]

    def masked_position_outputs(
        self,
        features: Dict[str, jax.Array],
        valid: jax.Array,
        mask_positions: jax.Array,  # [B, M] raw indices into the tail segment
        deterministic: bool = True,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """BERT4Rec-style masked-item mode (BASELINE.json recall config):
        replace the item tokens at `mask_positions` (absolute raw positions,
        expected within the uncompressed tail segment) with a learnable [MASK]
        embedding, run the bidirectional stack, and return the transformer
        outputs at the corresponding token positions → [B, M, D]. Scoring
        those against item embeddings gives the masked-item logits."""
        cfg = self.config
        x = self.embedder(features, dummies)  # [B, L, D]
        b, l, d = x.shape
        mask_tok = self.mask_token.astype(x.dtype)
        onehot = jax.nn.one_hot(mask_positions, l, dtype=x.dtype)  # [B, M, L]
        is_masked = jnp.clip(jnp.sum(onehot, axis=1), 0, 1)[..., None]  # [B, L, 1]
        x = x * (1 - is_masked) + mask_tok[None, None] * is_masked
        tokens, token_valid = self.compressor(x, valid)
        t = tokens.shape[1]
        k = cfg.num_query_tokens
        q = jnp.broadcast_to(self.query_tokens.astype(tokens.dtype)[None], (b, k, d))
        h = jnp.concatenate([tokens, q], axis=1)
        bias = _single_prediction_bias(token_valid, k, causal=False)
        for blk in self.blocks:
            h = blk(h, bias, deterministic)
        h = self.final_norm(h[:, :t])  # all token outputs
        # raw position p (within the tail segment) ↔ token index t - (L - p)
        token_idx = t - (l - mask_positions)  # [B, M]
        return jnp.take_along_axis(
            h, token_idx[..., None].astype(jnp.int32), axis=1
        )

    def item_embeddings(
        self,
        features: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Candidate-side tower: same feature embedding as history items
        (reference uses raw video_id embeddings, train.py:231; we use the full
        fused item embedding for a symmetric two-tower geometry)."""
        return self.embedder(features, dummies)

    @staticmethod
    def compute_scores(interests: jax.Array, candidates: jax.Array) -> jax.Array:
        """max over interests of dot(candidate, interest) — argmax strategy
        (kuaiformer model.py:530-552).

        interests: [B, k, D]; candidates: [N, D] (shared) or [B, N, D].
        Returns [B, N]."""
        if candidates.ndim == 2:
            s = jnp.einsum(
                "bkd,nd->bkn", interests, candidates, preferred_element_type=jnp.float32
            )
        else:
            s = jnp.einsum(
                "bkd,bnd->bkn", interests, candidates, preferred_element_type=jnp.float32
            )
        return jnp.max(s, axis=1)
