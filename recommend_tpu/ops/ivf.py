"""On-device IVF (inverted-file) ANN index — the TPU-native analog of the
reference's FAISS ``"IVF1024,Flat"`` (kuaiformer config.py:55; evaluator builds
``IndexIVFFlat`` with an IP quantizer at evaluate.py:26-45).

Exact brute-force top-k (`recommend_tpu.ops.topk`) is the default retrieval
path — it is what the production system runs on GPU (translation:214) and it
batches beautifully on the MXU. IVF exists for the *single-query, low-latency*
serving regime at very large corpora: per query it touches
O(nprobe · capacity · D) instead of O(V · D) of HBM.

Design (all static shapes, fully jittable):
  - **Build**: Lloyd's k-means on device. Assignment uses exact L2
    (``argmax q·c − ‖c‖²/2``) computed in corpus chunks via `lax.map` so the
    [V, n_clusters] score matrix never materializes; centroid update is one
    `segment_sum`. Empty clusters keep their previous centroid.
  - **Bucketing**: items are grouped into ``[n_clusters, capacity]`` id /
    embedding buckets, padded with id −1 (scored as −inf). Capacity defaults
    to the max cluster size (every item indexed exactly once, like FAISS).
  - **Search**: score centroids → top-``nprobe`` buckets → gather → score
    items → `top_k`. One jitted program with static (k, nprobe).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class IVFIndex(NamedTuple):
    """Device-resident inverted-file index over an item-embedding corpus.

    With ``bucket_scales`` set, ``bucket_embs`` holds per-row-scaled int8
    (score = (q · q_row) · scale_row — the same factored dequantization as
    `ops.topk.quantize_corpus`), cutting the probe gather traffic 4×: the
    nprobe bucket gather is the dominant IVF search cost on large corpora.
    """

    centroids: jax.Array  # [n_clusters, D]
    bucket_ids: jax.Array  # [n_clusters, capacity] int32, -1 = padding
    bucket_embs: jax.Array  # [n_clusters, capacity, D] f32 — or int8
    bucket_scales: Optional[jax.Array] = None  # [n_clusters, capacity] f32

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def capacity(self) -> int:
        return self.bucket_ids.shape[1]


def _l2_assign_scores(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """[N, D] × [C, D] → [N, C] scores whose argmax is the L2-nearest
    centroid (argmin ‖x−c‖² == argmax x·c − ‖c‖²/2)."""
    half_sq = 0.5 * jnp.sum(
        centroids.astype(jnp.float32) ** 2, axis=-1
    )  # [C]
    dots = jnp.einsum(
        "nd,cd->nc", x, centroids, preferred_element_type=jnp.float32
    )
    return dots - half_sq[None, :]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _kmeans(
    items: jax.Array, init: jax.Array, iters: int, chunk: int, n_valid: int
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd's k-means → (centroids [C, D], assignments [V] int32).

    `items` must already be padded to a multiple of `chunk`; only the first
    ``n_valid`` rows participate in the centroid updates (padding rows would
    otherwise drag the smallest-norm centroid toward the origin).
    """
    v, d = items.shape
    nc = init.shape[0]
    chunks = items.reshape(v // chunk, chunk, d)
    valid = jnp.arange(v) < n_valid

    def assign(centroids: jax.Array) -> jax.Array:
        def one(block):
            return jnp.argmax(_l2_assign_scores(block, centroids), axis=-1)

        return jax.lax.map(one, chunks).reshape(v).astype(jnp.int32)

    def step(centroids: jax.Array, _):
        # padding rows get segment id == nc → dropped by segment_sum
        a = jnp.where(valid, assign(centroids), nc)
        sums = jax.ops.segment_sum(
            items.astype(jnp.float32), a, num_segments=nc
        )
        counts = jax.ops.segment_sum(
            jnp.ones((v,), jnp.float32), a, num_segments=nc
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters keep their previous centroid
        new = jnp.where((counts > 0)[:, None], new, centroids)
        return new.astype(items.dtype), None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids, assign(centroids)


def kmeans_corpus(
    items: jax.Array | np.ndarray,
    n_clusters: int,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 65536,
) -> Tuple[jax.Array, np.ndarray]:
    """Cluster a [V, D] matrix → (centroids [C, D], assignments [V] int32).
    The shared clustering front-end of the IVF index and the LLM4Rec
    semantic-ID pipeline: clamp n_clusters, pick a random init, pad to the
    chunk size (padding excluded from centroid math), run jitted Lloyd's."""
    items = jnp.asarray(items)
    v, d = items.shape
    n_clusters = min(n_clusters, v)
    chunk = min(chunk, max(128, 1 << (v - 1).bit_length()))
    rng = np.random.default_rng(seed)
    init = items[jnp.asarray(rng.choice(v, size=n_clusters, replace=False))]
    pad_v = ((v + chunk - 1) // chunk) * chunk
    items_p = jnp.pad(items, ((0, pad_v - v), (0, 0)))
    centroids, assign_p = _kmeans(items_p, init, iters, chunk, v)
    return centroids, np.asarray(assign_p[:v], np.int32)


def build_ivf(
    items: jax.Array | np.ndarray,
    n_clusters: int = 1024,
    iters: int = 10,
    seed: int = 0,
    capacity: Optional[int] = None,
    chunk: int = 65536,
    quantize: Optional[str] = None,
) -> IVFIndex:
    """Cluster the corpus and bucket it. `items` is the [V, D] embedding
    matrix; row index == item id (same convention as `ops.topk`)."""
    items = jnp.asarray(items)
    v, d = items.shape
    n_clusters = min(n_clusters, v)
    centroids, assignments = kmeans_corpus(items, n_clusters, iters, seed, chunk)

    counts = np.bincount(assignments, minlength=n_clusters)
    cap = int(counts.max()) if capacity is None else int(capacity)
    cap = max(8, ((cap + 7) // 8) * 8)  # sublane-friendly

    bucket_ids = np.full((n_clusters, cap), -1, dtype=np.int32)
    fill = np.zeros(n_clusters, dtype=np.int64)
    order = np.argsort(assignments, kind="stable")
    for item in order:
        c = assignments[item]
        if fill[c] < cap:  # overflow only when capacity was forced smaller
            bucket_ids[c, fill[c]] = item
            fill[c] += 1

    assert quantize in (None, "int8"), quantize
    ids_dev = jnp.asarray(bucket_ids)
    if quantize == "int8":
        from recommend_tpu.ops.topk import quantize_corpus

        # build the int8 bucket matrix in cluster SLABS: the one-shot f32
        # gather intermediate is [C, cap, D] f32 — 12.8 GB at the 10M-corpus
        # flagship geometry (2048×12208×128), an HBM OOM on a 16 GB chip.
        # Slabs bound the transient to ~1 GB; the int8 result accumulates.
        d = items.shape[1]
        slab = max(1, int(2**28 // max(cap * d, 1)))  # ~1 GB f32 transient
        q_parts, s_parts = [], []
        quant = jax.jit(quantize_corpus)
        for i in range(0, n_clusters, slab):
            ids_slab = ids_dev[i : i + slab]
            e = items[jnp.maximum(ids_slab, 0)]
            c_, cap2, d2 = e.shape
            q, sc = quant(e.reshape(c_ * cap2, d2))
            q_parts.append(q.reshape(c_, cap2, d2))
            s_parts.append(sc.reshape(c_, cap2))
        return IVFIndex(
            centroids=centroids, bucket_ids=ids_dev,
            bucket_embs=jnp.concatenate(q_parts),
            bucket_scales=jnp.concatenate(s_parts),
        )
    embs = items[jnp.maximum(ids_dev, 0)]  # pad rows read item 0, masked later
    return IVFIndex(centroids=centroids, bucket_ids=ids_dev, bucket_embs=embs)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ivf_search(
    index: IVFIndex, queries: jax.Array, k: int, nprobe: int = 32
) -> Tuple[jax.Array, jax.Array]:
    """queries [N, D] → (scores [N, k], item ids [N, k]); ids −1 where fewer
    than k items were reachable. Scores are inner products (same metric as
    `ops.topk.score_items`); probing uses the build-time L2 assignment rule."""
    n, d = queries.shape
    nprobe = min(nprobe, index.n_clusters)
    cscores = _l2_assign_scores(queries, index.centroids)  # [N, C]
    _, probe = jax.lax.top_k(cscores, nprobe)  # [N, P]

    embs = index.bucket_embs[probe]  # [N, P, cap, D]
    ids = index.bucket_ids[probe]  # [N, P, cap]
    if index.bucket_scales is not None:
        s = jnp.einsum(
            "nd,npcd->npc",
            queries.astype(jnp.bfloat16),
            embs.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * index.bucket_scales[probe]
    else:
        s = jnp.einsum(
            "nd,npcd->npc", queries, embs, preferred_element_type=jnp.float32
        )
    s = jnp.where(ids >= 0, s, -jnp.inf)
    flat_s = s.reshape(n, -1)
    flat_i = ids.reshape(n, -1)
    k = min(k, flat_s.shape[1])
    top_s, pos = jax.lax.top_k(flat_s, k)
    top_i = jnp.take_along_axis(flat_i, pos, axis=1)
    return top_s, top_i


def ivf_search_interests(
    index: IVFIndex,
    interests: jax.Array,
    k: int,
    nprobe: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-interest search: per-interest probe + union + max-merge (the
    paper's retrieval strategy, translation:268 — matches
    `serving.retrieval_service`). interests [B, ki, D] → ([B, k], [B, k])."""
    if interests.ndim == 2:
        interests = interests[:, None, :]
    b, ki, d = interests.shape
    s, i = jax.device_get(  # one batched fetch (vs one RTT per array)
        ivf_search(index, interests.reshape(b * ki, d), k, nprobe)
    )
    s = s.reshape(b, ki * k)
    i = i.reshape(b, ki * k)
    out_s = np.full((b, k), -np.inf, dtype=np.float32)
    out_i = np.full((b, k), -1, dtype=np.int64)
    for row in range(b):
        # dedupe by id keeping the max score, then top-k
        ids_r, inv = np.unique(i[row], return_inverse=True)
        best = np.full(len(ids_r), -np.inf, dtype=np.float32)
        np.maximum.at(best, inv, s[row])
        if ids_r[0] == -1:  # drop the padding id
            ids_r, best = ids_r[1:], best[1:]
        take = np.argsort(-best)[:k]
        out_s[row, : len(take)] = best[take]
        out_i[row, : len(take)] = ids_r[take]
    return out_s, out_i
