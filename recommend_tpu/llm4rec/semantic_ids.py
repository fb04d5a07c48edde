"""Semantic-ID pipeline — the intent-generation variant of the reference
(llm4rec/intent_generate/readme.md:27-39): embed every item with an LLM,
cluster the embeddings, replace item-id behavior sequences with cluster-id
("semantic id") sequences, and train next-cluster-id prediction.

TPU-native realization:
  - clustering reuses the jitted Lloyd's k-means from the IVF index
    (`ops/ivf._kmeans`) — one compiled scan, no Python loop over clusters;
  - the "LoRA next-cluster-ID prediction" capability maps onto the existing
    retrieval tower: a semantic-id sequence is an ordinary item sequence with
    vocab == n_clusters, so `remap_retrieval_data` + `RetrievalTrainer` train
    it causally with zero new model code (the reference fine-tunes an LLM for
    this; the framework's parity surface is the data transformation + a
    next-id model over the semantic vocabulary);
  - cold-start items (unseen at cluster-build time) are assigned by nearest
    centroid (`SemanticIdMap.assign`), mirroring the readme's online
    incremental update on cache miss.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.ops.ivf import _l2_assign_scores, kmeans_corpus


@dataclass(frozen=True)
class SemanticIdMap:
    """item id → semantic (cluster) id, plus the centroids for cold items."""

    centroids: jax.Array  # [K, D]
    item_to_sid: np.ndarray  # [V] int32

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    def map_ids(self, ids: np.ndarray) -> np.ndarray:
        """Item-id array (any shape) → semantic-id array. Out-of-vocab ids
        (padding sentinels == V) map to n_clusters (the semantic padding id)."""
        v = self.item_to_sid.shape[0]
        ids = np.asarray(ids)
        safe = np.minimum(ids, v - 1)
        sids = self.item_to_sid[safe]
        return np.where(ids < v, sids, self.n_clusters).astype(np.int32)

    def assign(self, embeddings: jax.Array) -> jax.Array:
        """Nearest-centroid semantic ids for NEW item embeddings [N, D] —
        the cold-start / incremental-update path."""
        scores = _l2_assign_scores(jnp.asarray(embeddings), self.centroids)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def build_semantic_ids(
    item_embeddings: jax.Array | np.ndarray,  # [V, D] LLM embeddings, row == id
    n_clusters: int = 1024,
    iters: int = 10,
    seed: int = 0,
    chunk: int = 65536,
) -> SemanticIdMap:
    """Cluster the item-embedding matrix into semantic ids (jitted k-means,
    shared with the IVF index — ops/ivf.kmeans_corpus)."""
    centroids, assignments = kmeans_corpus(
        item_embeddings, n_clusters, iters, seed, chunk
    )
    return SemanticIdMap(centroids=centroids, item_to_sid=assignments)


def remap_retrieval_data(data, sid_map: SemanticIdMap):
    """SyntheticRetrievalData (or compatible) → the same dataset over the
    semantic-id vocabulary: video_id sequences become cluster-id sequences,
    popularity aggregates per cluster, per-cluster features take the modal
    member's value. Feed the result to the normal retrieval pipeline/trainer
    for next-semantic-id training."""
    k = sid_map.n_clusters
    sid_of = sid_map.item_to_sid
    pop = np.zeros(k, dtype=data.popularity.dtype)
    np.add.at(pop, sid_of, data.popularity)
    # modal (most popular member's) features per cluster
    feats: Dict[str, np.ndarray] = {}
    best = np.full(k, -1, dtype=np.int64)
    order = np.argsort(data.popularity, kind="stable")  # ascending
    best[sid_of[order]] = order  # last write = most popular member
    safe_best = np.maximum(best, 0)
    for name, col in data.video_features.items():
        feats[name] = np.where(best >= 0, col[safe_best], 0).astype(col.dtype)
    seqs: List[Dict[str, np.ndarray]] = []
    for user in data.user_sequences:
        u = dict(user)
        vid = u["video_id"]
        sids = sid_map.map_ids(vid)
        u["video_id"] = sids
        # map_ids sends padding/OOV ids to n_clusters, which is past the end
        # of the [k]-length per-cluster feature columns — gather clipped and
        # zero those positions (they are padding downstream anyway)
        safe_sids = np.minimum(sids, k - 1)
        for name in feats:
            if name in u:
                u[name] = np.where(
                    sids < k, feats[name][safe_sids], 0
                ).astype(feats[name].dtype)
        seqs.append(u)
    return replace(data, video_features=feats, popularity=pop, user_sequences=seqs)
