"""Attention primitives shared by the retrieval tower and ranking stack.

TPU-first design notes:
  - everything is batched einsum → MXU; no per-token Python loops (the
    reference loops per token in MixedMHA, oneTrans model.py:84-88 — SURVEY.md O4).
  - masks are additive float biases built once per call; softmax runs in f32.
  - query-subset attention (tail queries over full K/V) is expressed by simply
    passing fewer query rows — the primitive is shape-polymorphic in Lq vs Lkv,
    which is exactly what pyramid pruning (oneTrans model.py:280-302) and
    KV-cached decoding need.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # large-negative mask value, safe in bf16/f32


def causal_band_mask(
    q_len: int,
    kv_len: int,
    q_offset: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive causal mask for queries occupying the *tail* of the KV sequence.

    Query i (0-based within the query window) corresponds to absolute position
    ``q_offset + i`` (default: ``kv_len - q_len``, i.e. the last q_len
    positions). It may attend to kv positions <= its absolute position. This one
    mask covers: full causal self-attention (q_len == kv_len), pyramid
    tail-query attention (q_len < kv_len), and KV-cached decoding
    (kv_len grows, q_len == new tokens) — the reference's band mask is
    oneTrans model.py:100-114.
    """
    if q_offset is None:
        q_offset = kv_len - q_len
    q_pos = jnp.arange(q_len) + q_offset  # [Lq]
    kv_pos = jnp.arange(kv_len)  # [Lkv]
    allowed = kv_pos[None, :] <= q_pos[:, None]  # [Lq, Lkv]
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)


def padding_mask_bias(kv_valid: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Lkv] boolean validity → [B, 1, 1, Lkv] additive bias."""
    return jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF).astype(dtype)


def dot_product_attention(
    q: jax.Array,  # [B, Lq, H, Dh]
    k: jax.Array,  # [B, Lkv, H, Dh]
    v: jax.Array,  # [B, Lkv, H, Dh]
    bias: Optional[jax.Array] = None,  # broadcastable to [B, H, Lq, Lkv]
) -> jax.Array:
    """Reference (non-Pallas) attention. Softmax in float32; output in q.dtype."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(dh).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


class MultiHeadAttention(nn.Module):
    """Shared-weight MHA with separate query/key-value inputs.

    Used by the retrieval tower (kuaiformer model.py:180-218 equivalent) and by
    the compression encoder. ``x_q`` and ``x_kv`` may have different lengths.
    """

    num_heads: int
    embed_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_q: jax.Array,  # [B, Lq, D]
        x_kv: Optional[jax.Array] = None,  # [B, Lkv, D]
        bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        if x_kv is None:
            x_kv = x_q
        d, h = self.embed_dim, self.num_heads
        dh = d // h
        dense = lambda name: nn.DenseGeneral(
            (h, dh), axis=-1, name=name, param_dtype=self.param_dtype, dtype=x_q.dtype
        )
        q = dense("q_proj")(x_q)
        k = dense("k_proj")(x_kv)
        v = dense("v_proj")(x_kv)
        out = dot_product_attention(q, k, v, bias)
        return nn.DenseGeneral(
            d, axis=(-2, -1), name="o_proj", param_dtype=self.param_dtype, dtype=x_q.dtype
        )(out)
