"""Unified tokenizer — one token stream for sequence + non-sequence features.

Capability parity with oneTrans's Tokenizer (model.py:203-277; paper Eq.7,
translation:95-97):
  - NS path ("auto-split tokenizer"): embed every non-sequence feature
    (user/item/context), concatenate, and project with a single
    Dense(num_ns_tokens × d) reshaped to [B, n_ns, d].
  - S path: per-behavior-sequence shared Dense projection of item embeddings
    to d, with a learnable [SEP] token inserted *between* sequences
    (ablation: no-[SEP] costs −0.13% CTR AUC, translation:222).
  - Layout is **[S ; NS]** — S first, NS last. This is the paper's layout
    (translation:117-125); the reference code inverts it (SURVEY.md O4 defect).
    With causal attention this layout makes every S-token representation
    independent of NS tokens — the property that enables the cross-candidate /
    cross-request KV cache — and puts NS tokens exactly where pyramid
    tail-query pruning keeps them.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RankingConfig


class UnifiedTokenizer(nn.Module):
    config: RankingConfig

    def setup(self):
        cfg = self.config
        pdt = jnp.dtype(cfg.param_dtype)
        tdt = jnp.dtype(cfg.embedding_table_dtype)
        cdt = jnp.dtype(cfg.active_compute_dtype)
        self._embeds = {
            f: nn.Embed(
                cfg.vocab_size(f),
                cfg.feature_embed_dim,
                name=f"embed_{f}",
                param_dtype=tdt,
                dtype=cdt,
                embedding_init=nn.initializers.normal(stddev=0.02),
            )
            for f in cfg.non_seq_features
        }
        self.ns_proj = nn.Dense(
            cfg.num_ns_tokens * cfg.embed_dim, name="ns_proj",
            param_dtype=pdt, dtype=cdt,
        )
        # NS-only configs (e.g. Criteo: sequence_features=()) carry no
        # phantom item table — the S-path modules simply don't exist.
        if cfg.sequence_features:
            self.item_embed = nn.Embed(
                cfg.vocab_size("item_id"),
                cfg.seq_item_feature_dim,
                name="embed_seq_item",
                param_dtype=tdt,
                dtype=cdt,
                embedding_init=nn.initializers.normal(stddev=0.02),
            )
            self.seq_proj = nn.Dense(
                cfg.embed_dim, name="seq_proj", param_dtype=pdt, dtype=cdt
            )
            self.sep_token = self.param(
                "sep_token", nn.initializers.normal(stddev=0.02),
                (cfg.embed_dim,), pdt,
            )

    def _lookup(self, emb: nn.Embed, ids: jax.Array, dummy) -> jax.Array:
        """Embedding gather; with a `dummy` zeros array the table is
        stop-gradient'd and gradients flow to the dummy (the sparse-update
        path, recommend_tpu.ops.sparse_embed)."""
        if dummy is None:
            return emb(ids)
        from recommend_tpu.ops.sparse_embed import lookup_with_dummy

        cdt = jnp.dtype(self.config.active_compute_dtype)
        return lookup_with_dummy(emb.embedding, ids, dummy).astype(cdt)

    def ns_concat(
        self,
        non_seq: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
        features: Optional[Tuple[str, ...]] = None,
    ) -> jax.Array:
        """Raw concatenated per-feature embeddings [B, F·fe (+ semantic dims)]
        — the pre-projection NS representation. Shared by the auto-split
        tokenizer (`ns_tokens`) and by non-transformer baselines (the
        DCNv2+DIN comparator of the paper's Table 2 operates on this concat,
        not on the OneTrans token projection). `features` restricts to a
        subset (e.g. the candidate-item group for DIN's attention query)."""
        cfg = self.config
        feats = cfg.non_seq_features if features is None else features
        parts = [
            self._lookup(
                self._embeds[f], non_seq[f],
                None if dummies is None else dummies.get(f"ns_{f}"),
            )
            for f in feats
        ]
        if features is None:
            for name, dim in cfg.semantic_features:
                feat = non_seq[name].astype(parts[0].dtype)
                assert feat.shape[-1] == dim, (name, feat.shape, dim)
                parts.append(feat)
        return jnp.concatenate(parts, axis=-1)

    def seq_item_embeds(
        self,
        sf: str,
        ids: jax.Array,
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Projected item vectors [B, L, d] for ONE behavior sequence —
        shared item table + shared projection, no [SEP] (the per-sequence
        unit DIN-style target attention consumes)."""
        e = self._lookup(
            self.item_embed, ids,
            None if dummies is None else dummies.get(f"seq_{sf}"),
        )
        return self.seq_proj(e)

    def ns_tokens(
        self,
        non_seq: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """[B] int features → [B, n_ns, d] NS tokens (oneTrans model.py:239-254).

        Dense LLM-distilled semantic features (cfg.semantic_features, per
        llm4rec/semantic_distill/readme.md) enter here as extra inputs to the
        auto-split projection — the "semantic side-features as NS tokens"
        integration (SURVEY.md §7 phase 9)."""
        cfg = self.config
        x = self.ns_concat(non_seq, dummies)
        x = self.ns_proj(x)
        return x.reshape(x.shape[0], cfg.num_ns_tokens, cfg.embed_dim)

    def s_tokens(
        self,
        sequences: Dict[str, jax.Array],
        seq_valid: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Per-sequence item ids [B, L_i] → concatenated S tokens with [SEP]
        between sequences (oneTrans model.py:256-277). Returns
        ([B, Ls, d], [B, Ls] validity)."""
        cfg = self.config
        toks, valids = [], []
        names = [f for f in cfg.sequence_features if f in sequences]
        for i, sf in enumerate(names):
            ids = sequences[sf]
            b = ids.shape[0]
            e = self._lookup(
                self.item_embed, ids,
                None if dummies is None else dummies.get(f"seq_{sf}"),
            )  # [B, L, fe]
            t = self.seq_proj(e)  # [B, L, d]  (shared projection)
            toks.append(t)
            valids.append(seq_valid[sf])
            if i < len(names) - 1:
                sep = jnp.broadcast_to(
                    self.sep_token.astype(t.dtype)[None, None], (b, 1, cfg.embed_dim)
                )
                toks.append(sep)
                valids.append(jnp.ones((b, 1), dtype=bool))
        return jnp.concatenate(toks, axis=1), jnp.concatenate(valids, axis=1)

    def __call__(
        self,
        non_seq: Dict[str, jax.Array],
        sequences: Dict[str, jax.Array],
        seq_valid: Dict[str, jax.Array],
        dummies: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Full token stream [S; NS] → ([B, L, d], [B, L] validity)."""
        ns = self.ns_tokens(non_seq, dummies)
        b = ns.shape[0]
        if not any(f in sequences for f in self.config.sequence_features):
            # NS-only datasets (e.g. Criteo: no behavior sequences) — the
            # stream degenerates to the 12 NS tokens; S length 0.
            s = jnp.zeros((b, 0, ns.shape[-1]), ns.dtype)
            s_valid = jnp.zeros((b, 0), bool)
        else:
            s, s_valid = self.s_tokens(sequences, seq_valid, dummies)
        tokens = jnp.concatenate([s, ns], axis=1)
        valid = jnp.concatenate(
            [s_valid, jnp.ones((b, ns.shape[1]), dtype=bool)], axis=1
        )
        return tokens, valid

    def s_length(self, sequences: Dict[str, jax.Array]) -> int:
        names = [f for f in self.config.sequence_features if f in sequences]
        return sum(sequences[sf].shape[1] for sf in names) + max(len(names) - 1, 0)
