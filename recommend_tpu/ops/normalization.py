"""Normalization layers.

The reference's KuaiFormer claims RMSNorm but actually uses LayerNorm
(kuaiformer model.py:188-190 — a fidelity gap vs. the paper, SURVEY.md K4);
OneTrans implements true RMSNorm (oneTrans model.py:11-23). We build the
paper-correct true RMSNorm once and use it in both stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """y = x * rsqrt(mean(x^2) + eps) * scale  (oneTrans model.py:11-23).

    Statistics are computed in float32 regardless of the compute dtype, then
    the result is cast back — the standard bf16-safe TPU pattern.
    """

    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)).astype(dtype)
