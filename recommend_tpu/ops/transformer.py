"""Pre-norm transformer block for the retrieval tower.

Capability parity with kuaiformer's TransformerBlock (model.py:180-218) built
paper-correct: true RMSNorm (the reference silently used LayerNorm —
SURVEY.md K4) and a SiLU (swish) FFN. Optionally remat'd via config.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.ops.attention import MultiHeadAttention
from recommend_tpu.ops.normalization import RMSNorm


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward: (silu(x W_g) * x W_u) W_d — the idiomatic
    TPU/transformer FFN; realizes the reference's swish FFN (kuaiformer
    model.py:196-202) with the gated variant used by modern stacks."""

    ffn_dim: int
    embed_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dense = lambda dim, name: nn.Dense(
            dim, name=name, param_dtype=self.param_dtype, dtype=x.dtype
        )
        g = jax.nn.silu(dense(self.ffn_dim, "gate")(x))
        u = dense(self.ffn_dim, "up")(x)
        return dense(self.embed_dim, "down")(g * u)


class TransformerBlock(nn.Module):
    """norm → MHA → residual → norm → SwiGLU FFN → residual."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = MultiHeadAttention(
            num_heads=self.num_heads,
            embed_dim=self.embed_dim,
            param_dtype=self.param_dtype,
            name="attn",
        )(RMSNorm(name="attn_norm", param_dtype=self.param_dtype)(x), bias=bias)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        x = x + h
        h = SwiGLUFFN(
            ffn_dim=self.ffn_dim,
            embed_dim=self.embed_dim,
            param_dtype=self.param_dtype,
            name="ffn",
        )(RMSNorm(name="ffn_norm", param_dtype=self.param_dtype)(x))
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x + h
