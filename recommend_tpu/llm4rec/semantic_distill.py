"""Semantic distillation two-tower student (llm4rec capability).

Capability parity with the reference's design spec
(`llm4rec/semantic_distill/readme.md:3-26`): an LLM labels user behavior into
⟨preference-reason, item-tag⟩ pairs; a lightweight two-tower student distills
those labels so serving never calls the LLM:
  - user tower: encodes user tag/behavior representation → 4 preference heads
    of 32 dims each → concat to a 128-dim user vector;
  - item tower: encodes item text representation (title/intro/summary
    embedding from the teacher) → 4 attribute heads × 32 dims → 128-dim item
    vector;
  - losses: item-tag distillation + user-preference distillation (teacher
    embedding regression) + cosine matching via in-batch sampled softmax.

TPU-first: towers are plain MLP stacks over *precomputed* teacher embeddings
(the LLM runs offline — see intent_cache.py); training is one jit-compiled
step; the 4 preference/attribute heads are a single stacked [4, d, 32] einsum
rather than 4 separate layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from recommend_tpu.models.losses import in_batch_softmax_loss


@dataclass(frozen=True)
class SemanticDistillConfig:
    teacher_dim: int = 768  # LLM embedding width (teacher side)
    hidden_dim: int = 256
    num_heads: int = 4  # preference / attribute axes (category, topic, ...)
    head_dim: int = 32
    # loss weights: matching, user-side distill, item-side distill
    match_weight: float = 1.0
    user_distill_weight: float = 0.5
    item_distill_weight: float = 0.5

    @property
    def out_dim(self) -> int:
        return self.num_heads * self.head_dim  # 128 by default


class _Tower(nn.Module):
    cfg: SemanticDistillConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """teacher embedding [B, Dt] → (vector [B, 128], heads [B, 4, 32])."""
        cfg = self.cfg
        h = nn.Dense(cfg.hidden_dim, name="enc1")(x)
        h = jax.nn.gelu(h)
        h = nn.Dense(cfg.hidden_dim, name="enc2")(h)
        h = jax.nn.gelu(h)
        # stacked heads: one einsum for all preference/attribute axes
        w = self.param(
            "head_stack", nn.initializers.lecun_normal(),
            (cfg.num_heads, cfg.hidden_dim, cfg.head_dim), jnp.float32,
        )
        heads = jnp.einsum("bd,ndk->bnk", h, w)  # [B, 4, 32]
        vec = heads.reshape(h.shape[0], cfg.out_dim)
        vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-6)
        return vec, heads


class SemanticDistillModel(nn.Module):
    """User tower + item tower sharing the config (separate params)."""

    cfg: SemanticDistillConfig

    def setup(self):
        self.user_tower = _Tower(self.cfg, name="user_tower")
        self.item_tower = _Tower(self.cfg, name="item_tower")
        # projection of student 128-dim back to teacher space for distill loss
        self.user_distill_proj = nn.Dense(self.cfg.teacher_dim, name="user_distill_proj")
        self.item_distill_proj = nn.Dense(self.cfg.teacher_dim, name="item_distill_proj")

    def __call__(self, user_teacher: jax.Array, item_teacher: jax.Array):
        u_vec, u_heads = self.user_tower(user_teacher)
        i_vec, i_heads = self.item_tower(item_teacher)
        return {
            "user_vec": u_vec,
            "item_vec": i_vec,
            "user_heads": u_heads,
            "item_heads": i_heads,
            "user_recon": self.user_distill_proj(u_vec),
            "item_recon": self.item_distill_proj(i_vec),
        }

    def user_embedding(self, user_teacher: jax.Array) -> jax.Array:
        return self.user_tower(user_teacher)[0]

    def item_embedding(self, item_teacher: jax.Array) -> jax.Array:
        return self.item_tower(item_teacher)[0]


def semantic_distill_loss(
    cfg: SemanticDistillConfig,
    outputs: Dict[str, jax.Array],
    user_teacher: jax.Array,
    item_teacher: jax.Array,
    temperature: float = 0.05,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """matching (in-batch softmax over cosine scores) + two distillation
    regressions (readme.md: 'losses = item-tag distillation + user-preference
    distillation + cosine matching, all sampled-softmax')."""
    match, m = in_batch_softmax_loss(
        outputs["user_vec"][:, None, :] / temperature,
        outputs["item_vec"],
        label_smoothing=0.0,
    )
    ud = jnp.mean(jnp.square(outputs["user_recon"] - user_teacher))
    idl = jnp.mean(jnp.square(outputs["item_recon"] - item_teacher))
    total = (
        cfg.match_weight * match
        + cfg.user_distill_weight * ud
        + cfg.item_distill_weight * idl
    )
    return total, {
        "loss": total,
        "match_loss": match,
        "match_accuracy": m["in_batch_accuracy"],
        "user_distill_loss": ud,
        "item_distill_loss": idl,
    }
