"""Adaptive item compression — the retrieval tower's long-sequence scaler.

Capability parity with kuaiformer's AdaptiveCompressionModule
(model.py:96-178; paper: translation:125-157): split the L=256 history into
early (128 items → 2 groups of 64), mid (80 → 5 groups of 16), late
(48 kept raw); compress each early/mid group with a 1-layer *bidirectional*
(unmasked) transformer + mean-pool into a single token → 55 output tokens.

TPU-first: the reference runs a Python loop over the 7 groups
(model.py:169-177 — SURVEY.md hot loop #1). Here every segment's groups fold
into the batch dimension (``[B, n·g, D] → [B·n, g, D]``) so one shared-weight
encoder call per segment handles all groups as one batched einsum — no loop,
fully MXU-shaped. Padding is handled with a validity mask: attention is masked
to valid items and the pool is a masked mean; a compressed token is valid iff
its group contains any valid item.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.ops.attention import padding_mask_bias
from recommend_tpu.ops.transformer import TransformerBlock


class GroupEncoder(nn.Module):
    """Bidirectional 1(+)-layer encoder + masked mean-pool over a group."""

    config: RetrievalConfig

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array) -> jax.Array:
        """x: [N, g, D], valid: [N, g] bool → [N, D] pooled token."""
        cfg = self.config
        bias = padding_mask_bias(valid)  # [N,1,1,g]
        for i in range(cfg.compression_layers):
            x = TransformerBlock(
                embed_dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                ffn_dim=cfg.ffn_dim,
                dropout_rate=0.0,
                param_dtype=jnp.dtype(cfg.param_dtype),
                name=f"layer_{i}",
            )(x, bias=bias)
        w = valid.astype(x.dtype)[..., None]  # [N, g, 1]
        denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        return jnp.sum(x * w, axis=1) / denom


class AdaptiveCompression(nn.Module):
    """256 → 55 tokens (with the default schedule)."""

    config: RetrievalConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, valid: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """x: [B, L, D] item tokens; valid: [B, L] bool.
        Returns (tokens [B, T, D], token_valid [B, T])."""
        cfg = self.config
        b, l, d = x.shape
        assert l == cfg.max_seq_len, (l, cfg.max_seq_len)
        out_tokens, out_valid = [], []
        offset = 0
        for seg_idx, spec in enumerate(cfg.schedule_specs()):
            seg = x[:, offset : offset + spec.length]
            seg_valid = valid[:, offset : offset + spec.length]
            offset += spec.length
            if spec.group_size == 1:
                out_tokens.append(seg)
                out_valid.append(seg_valid)
                continue
            n, g = spec.num_tokens, spec.group_size
            grouped = seg.reshape(b * n, g, d)
            gvalid = seg_valid.reshape(b * n, g)
            pooled = GroupEncoder(cfg, name=f"segment_{seg_idx}")(grouped, gvalid)
            out_tokens.append(pooled.reshape(b, n, d))
            out_valid.append(jnp.any(gvalid, axis=-1).reshape(b, n))
        return jnp.concatenate(out_tokens, axis=1), jnp.concatenate(out_valid, axis=1)
