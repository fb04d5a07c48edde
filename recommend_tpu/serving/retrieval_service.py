"""Retrieval serving: on-device ANN-free top-k + real-time session store.

Capability parity with kuaiformer's serving surface
(examples/inference_example.py):
  - `KuaiFormerInference` (:19-111): load model, embed the full video corpus,
    build an index, pad the user sequence, search top-k, return ranked dicts.
    FAISS is replaced by on-device brute-force scoring
    (`recommend_tpu.ops.topk`), which is also what the production system does
    on GPU (translation:214).
  - `RealTimeRecommender` (:173-199): per-user session store with a sliding
    window, `add_interaction` + `get_recommendations`.

Search strategy: **per-interest top-k, union, re-rank by max score** — the
paper's strategy (translation:268). The reference's inference example instead
mean-pools the 4 interests (:76), which its own evaluator does NOT do
(evaluate.py:79-89) — we implement the paper/evaluator behavior, with
mean-pool available as an option.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.data.pipeline import FEATURE_KEYS
from recommend_tpu.models.retrieval import RetrievalTower
from recommend_tpu.ops.ivf import build_ivf, ivf_search_interests
from recommend_tpu.ops.topk import (
    quantize_corpus,
    sharded_topk_retrieval,
    topk_retrieval,
    topk_retrieval_quantized,
)

_quantize = jax.jit(quantize_corpus)  # one wrapper → trace cache is reused


class RetrievalIndex:
    """Corpus item-embedding matrix + top-k search (the FAISS replacement).

    ``index_type="flat"`` (default) is exact brute-force scoring — the
    production GPU strategy (translation:214), ideal for batched queries.
    ``index_type="ivf"`` mirrors the reference's FAISS ``"IVF1024,Flat"``
    (kuaiformer config.py:55): k-means buckets probed per query — lower
    latency for single-query serving on very large corpora, approximate.

    Flat-index accelerators (compose freely):
    ``quantize="int8"`` stores the corpus per-row-scaled int8 (4× less HBM
    read on the scan); ``approx_recall=0.99`` swaps exact `lax.top_k` for the
    TPU-native `lax.approx_max_k`. Together: 3.5× scan speedup at 0.993
    top-100 recall (measured, 1M×128 corpus on v5e).

    ``search()`` precedence when several accelerators are configured:
    IVF > int8 quantized scan > mesh-sharded scan > approx_max_k > exact.
    In particular a quantized index runs replicated on ONE device even when
    a mesh is passed (warned at construction).
    """

    def __init__(
        self,
        cfg: RetrievalConfig,
        model: RetrievalTower,
        params,
        mesh=None,
        embed_batch: int = 8192,
        index_type: str = "flat",
        ivf_clusters: int = 1024,
        ivf_nprobe: int = 32,
        ivf_iters: int = 10,
        quantize: Optional[str] = None,
        approx_recall: Optional[float] = None,
    ):
        assert index_type in ("flat", "ivf"), index_type
        assert quantize in (None, "int8"), quantize
        if mesh is not None and quantize is not None:
            # search() precedence: quantized scan > sharded scan — int8 runs
            # replicated on one device; there is no sharded quantized scan yet
            import warnings

            warnings.warn(
                "RetrievalIndex: both mesh and quantize set — the int8 "
                "quantized scan takes precedence and runs on one device; "
                "sharded_topk_retrieval is NOT used",
                stacklevel=2,
            )
        self.cfg = cfg
        self.model = model
        self.params = params
        self.mesh = mesh
        self.embed_batch = embed_batch
        self.index_type = index_type
        self.ivf_clusters = ivf_clusters
        self.ivf_nprobe = ivf_nprobe
        self.ivf_iters = ivf_iters
        self.quantize = quantize
        self.approx_recall = approx_recall
        self.item_embeddings: Optional[jax.Array] = None
        self.q_items: Optional[jax.Array] = None
        self.q_scales: Optional[jax.Array] = None
        self.ivf_index = None
        self._last_corpus: Optional[Dict[str, np.ndarray]] = None
        self._embed_fn = jax.jit(
            lambda p, f: model.apply(p, f, method=RetrievalTower.item_embeddings)
        )

    def build(self, corpus_features: Dict[str, np.ndarray]) -> None:
        """Embed every corpus item in batches (reference :28-44)."""
        # keep a mutable copy so update_items can fold deltas in and
        # refresh() re-embeds the LIVE corpus, not a stale snapshot
        self._last_corpus = {k: np.array(v) for k, v in corpus_features.items()}
        v = len(corpus_features["video_id"])
        outs = []
        bs = self.embed_batch
        for i in range(0, v, bs):
            chunk = {
                k: jnp.asarray(corpus_features[k][i : i + bs])
                for k in FEATURE_KEYS
            }
            outs.append(self._embed_fn(self.params, chunk))
        self.item_embeddings = jnp.concatenate(outs, axis=0)
        if (
            self.mesh is not None
            and self.item_embeddings.shape[0] % self.mesh.shape["data"] == 0
        ):
            # place the corpus row-sharded ONCE: the scan (sharded_topk) and
            # the a2a row-fetch (`fetch_items`) both serve from this layout
            from recommend_tpu.parallel.embedding_sharding import shard_table

            self.item_embeddings = shard_table(
                self.mesh, self.item_embeddings, axis="data"
            )
        if self.quantize == "int8":
            self.q_items, self.q_scales = _quantize(self.item_embeddings)
        if self.index_type == "ivf":
            self.ivf_index = build_ivf(
                self.item_embeddings,
                n_clusters=self.ivf_clusters,
                iters=self.ivf_iters,
                quantize=self.quantize,
            )

    def update_items(self, item_features: Dict[str, np.ndarray]) -> None:
        """Incremental index update (minute-level online learning, kuaiformer
        translation:210-214): re-embed ONLY the given items — new uploads or
        items whose features/embeddings changed after a parameter push — and
        scatter their rows into the live corpus matrix (and its int8 copy).
        ``item_features["video_id"]`` selects the rows; ids may exceed the
        current corpus size by appearing exactly at the end (append).

        IVF: updated embeddings of EXISTING ids are written into their
        current buckets in place (cluster assignment is not revisited —
        centroids drift slowly; periodic `build()` rebalances, same as FAISS
        IVF in production). Appending NEW ids to an IVF index requires a
        `build()` and raises."""
        assert self.item_embeddings is not None, "call build() first"
        ids = np.asarray(item_features["video_id"], np.int64)
        # dedup, keep LAST occurrence: duplicate ids in one scatter have a
        # nondeterministic winner; the caller's last write should win
        _, last_idx = np.unique(ids[::-1], return_index=True)
        keep = np.sort(len(ids) - 1 - last_idx)
        if len(keep) != len(ids):
            ids = ids[keep]
            item_features = {
                k: np.asarray(item_features[k])[keep] for k in item_features
            }
        chunk = {k: jnp.asarray(item_features[k]) for k in FEATURE_KEYS}
        rows = self._embed_fn(self.params, chunk)
        v = self.item_embeddings.shape[0]
        if ids.max() >= v:  # append-grow
            if self.ivf_index is not None:
                raise ValueError(
                    "appending new ids to an IVF index requires build(); "
                    "update_items only refreshes existing rows in place"
                )
            # reject gapped appends: a gap would create zero-embedding rows
            # that can outrank real items (score 0 > negative scores)
            new_ids = np.unique(ids[ids >= v])
            if not np.array_equal(new_ids, np.arange(v, int(ids.max()) + 1)):
                missing = sorted(set(range(v, int(ids.max()) + 1)) - set(new_ids.tolist()))
                raise ValueError(
                    f"append must be contiguous from current size {v}; "
                    f"missing ids {missing[:10]}{'...' if len(missing) > 10 else ''}"
                )
            grow = int(ids.max()) + 1 - v
            self.item_embeddings = jnp.concatenate(
                [self.item_embeddings, jnp.zeros((grow, rows.shape[1]), rows.dtype)]
            )
        self.item_embeddings = self.item_embeddings.at[jnp.asarray(ids)].set(rows)
        if self.quantize == "int8":
            self.q_items, self.q_scales = (
                _quantize(self.item_embeddings)
                if ids.size > v // 4 else self._update_quantized(ids, rows)
            )
        if self.ivf_index is not None:
            # write updated rows into their bucket slots (served matrix)
            bids = np.asarray(self.ivf_index.bucket_ids)
            embs = np.array(self.ivf_index.bucket_embs)  # writable copy
            scales = (
                np.array(self.ivf_index.bucket_scales)
                if self.ivf_index.bucket_scales is not None else None
            )
            pos_of = {int(i): None for i in ids}
            hit = np.isin(bids, ids)
            for c, slot in np.argwhere(hit):
                pos_of[int(bids[c, slot])] = (c, slot)
            rows_np = np.asarray(rows, np.float32)
            if scales is not None:
                q_rows, s_rows = _quantize(jnp.asarray(rows_np))
                q_rows, s_rows = np.asarray(q_rows), np.asarray(s_rows)
            for j, i in enumerate(ids):
                cs = pos_of.get(int(i))
                if cs is None:
                    continue
                if scales is not None:
                    embs[cs[0], cs[1]] = q_rows[j]
                    scales[cs[0], cs[1]] = s_rows[j]
                else:
                    embs[cs[0], cs[1]] = rows_np[j]
            self.ivf_index = self.ivf_index._replace(
                bucket_embs=jnp.asarray(embs),
                bucket_scales=(
                    jnp.asarray(scales) if scales is not None else None
                ),
            )
        if self._last_corpus is not None:
            cur = len(self._last_corpus["video_id"])
            need = int(ids.max()) + 1
            for k in FEATURE_KEYS:
                col = self._last_corpus[k]
                if need > cur:
                    pad = np.zeros(need - cur, dtype=col.dtype)
                    col = np.concatenate([col, pad])
                col[ids] = np.asarray(item_features[k])
                self._last_corpus[k] = col

    def _update_quantized(self, ids, rows):
        q_rows, s_rows = _quantize(rows)
        v = self.q_items.shape[0]
        if int(np.max(ids)) >= v:
            grow = int(np.max(ids)) + 1 - v
            self.q_items = jnp.concatenate(
                [self.q_items, jnp.zeros((grow, self.q_items.shape[1]), jnp.int8)]
            )
            self.q_scales = jnp.concatenate(
                [self.q_scales, jnp.zeros((grow,), jnp.float32)]
            )
        idv = jnp.asarray(ids)
        return (
            self.q_items.at[idv].set(q_rows),
            self.q_scales.at[idv].set(s_rows),
        )

    def refresh(self, params) -> None:
        """Full parameter push: swap the item-tower params and re-embed the
        whole corpus (call after a training checkpoint lands). Jitted paths
        take params as arguments, so no recompilation."""
        self.params = params
        if self._last_corpus is not None:
            self.build(self._last_corpus)

    def fetch_items(self, item_ids) -> jax.Array:
        """Embedding rows for the given item ids → [N, D].

        On a sharded index (mesh set, corpus divisible) this is served by the
        **a2a embedding-server wire protocol**
        (`parallel.embedding_sharding.sharded_lookup_a2a` — dedup ids →
        all_to_all requests to the owning shards → local gather → all_to_all
        rows back): the multi-host serving topology the protocol was built
        for (kuaiformer translation:214's dedicated embedding servers).
        Single-device indexes take a plain gather."""
        assert self.item_embeddings is not None, "call build() first"
        ids = jnp.asarray(np.asarray(item_ids, dtype=np.int64))
        if self.mesh is not None and self.item_embeddings.shape[0] % self.mesh.shape["data"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from recommend_tpu.parallel.embedding_sharding import (
                sharded_lookup_a2a,
            )

            n = self.mesh.shape["data"]
            b = len(ids)
            pad = (-b) % n
            # pad with the out-of-range sentinel (resolves to zero rows)
            padded = jnp.concatenate(
                [ids, jnp.full((pad,), self.item_embeddings.shape[0], ids.dtype)]
            )
            padded = jax.device_put(padded, NamedSharding(self.mesh, P("data")))
            rows = sharded_lookup_a2a(
                self.mesh, self.item_embeddings, padded, axis="data"
            )
            return rows[:b]
        return jnp.take(self.item_embeddings, ids, axis=0)

    def similar_items(
        self, item_ids, top_k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Item-to-item retrieval channel ("watched X → also watch Y"): use
        the given items' embedding rows as queries over the corpus. One of
        the cascade's multi-channel recall sources (kuaiformer
        translation:209-214 describes multi-channel retrieval + dedup); the
        query rows come from `fetch_items` (a2a-served when sharded). The
        seed item itself ranks first by construction (score = |v|²) — the
        caller drops position 0 or dedups across channels."""
        rows = self.fetch_items(item_ids)  # [N, D]
        return self.search(rows[:, None, :], top_k)

    def search(
        self, interests: jax.Array, top_k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """interests [B, k, D] → (scores [B, K], item ids [B, K])."""
        assert self.item_embeddings is not None, "call build() first"
        k = top_k or self.cfg.top_k
        k = min(k, self.item_embeddings.shape[0])
        if self.ivf_index is not None:
            return ivf_search_interests(
                self.ivf_index, interests, k, nprobe=self.ivf_nprobe
            )
        if self.q_items is not None:
            s, i = topk_retrieval_quantized(
                interests, self.q_items, self.q_scales, k, self.approx_recall
            )
        elif self.mesh is not None and self.item_embeddings.shape[0] % self.mesh.shape["data"] == 0:
            s, i = sharded_topk_retrieval(
                self.mesh, interests, self.item_embeddings, k
            )
        elif self.approx_recall is not None:
            from recommend_tpu.ops.topk import score_items

            s, i = jax.lax.approx_max_k(
                score_items(interests, self.item_embeddings),
                k,
                recall_target=self.approx_recall,
            )
        else:
            s, i = topk_retrieval(interests, self.item_embeddings, k)
        # one batched device→host fetch: each separate np.asarray pays a
        # full transport round-trip
        return jax.device_get((s, i))


class RealTimeRecommender:
    """Per-user sliding-window session store + recommendation API
    (reference examples/inference_example.py:173-199)."""

    def __init__(
        self,
        cfg: RetrievalConfig,
        model: RetrievalTower,
        params,
        index: RetrievalIndex,
        window: Optional[int] = None,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.index = index
        self.window = window or cfg.max_seq_len
        self.sessions: Dict[object, deque] = {}
        self._latencies: deque = deque(maxlen=1000)
        self._fwd = jax.jit(lambda p, f, v: model.apply(p, f, v))

    def add_interaction(self, user_id, item: Dict[str, float]) -> None:
        """item: dict with video_id/category/tag/duration/timestamp."""
        q = self.sessions.setdefault(user_id, deque(maxlen=self.window))
        q.append({k: item[k] for k in FEATURE_KEYS})

    def _pad_session(self, user_id) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Left-pad the session to max_seq_len (reference :63-70)."""
        l = self.cfg.max_seq_len
        sess = list(self.sessions.get(user_id, ()))[-l:]
        n = len(sess)
        feats = {}
        for k in FEATURE_KEYS:
            dtype = np.float32 if k == "duration" else np.int64
            arr = np.zeros((1, l), dtype=dtype)
            if n:
                arr[0, l - n :] = [it[k] for it in sess]
            feats[k] = jnp.asarray(arr)
        valid = np.zeros((1, l), dtype=bool)
        valid[0, l - n :] = True
        return feats, jnp.asarray(valid)

    def user_interests(self, user_id) -> jax.Array:
        feats, valid = self._pad_session(user_id)
        return self._fwd(self.params, feats, valid)  # [1, k, D]

    def get_recommendations(
        self,
        user_id,
        top_k: int = 10,
        exclude_seen: bool = True,
        mean_pool_interests: bool = False,
    ) -> List[Dict[str, float]]:
        t0 = time.perf_counter()
        interests = self.user_interests(user_id)
        if mean_pool_interests:
            interests = jnp.mean(interests, axis=1, keepdims=True)
        seen = (
            {it["video_id"] for it in self.sessions.get(user_id, ())}
            if exclude_seen
            else set()
        )
        # over-fetch to survive the exclusion filter
        fetch = min(
            top_k + len(seen), self.index.item_embeddings.shape[0]
        )
        scores, ids = self.index.search(interests, fetch)
        out = []
        for s, i in zip(scores[0], ids[0]):
            if int(i) in seen:
                continue
            out.append({"video_id": int(i), "score": float(s)})
            if len(out) >= top_k:
                break
        self._latencies.append(time.perf_counter() - t0)
        return out

    def similar_to(self, video_id: int, top_k: int = 10) -> List[Dict[str, float]]:
        """Item-to-item recall channel: neighbors of one item in embedding
        space (`RetrievalIndex.similar_items`; a2a row-fetch when the index
        is sharded). The seed item is excluded — combine with
        `get_recommendations` for the cascade's multi-channel union."""
        t0 = time.perf_counter()
        scores, ids = self.index.similar_items([int(video_id)], top_k + 1)
        out = [
            {"video_id": int(i), "score": float(s)}
            for s, i in zip(scores[0], ids[0])
            if int(i) != int(video_id)
        ][:top_k]
        self._latencies.append(time.perf_counter() - t0)
        return out

    def stats(self) -> Dict[str, float]:
        lats = np.asarray(self._latencies) * 1000.0
        if len(lats) == 0:
            return {"requests": 0}
        return {
            "requests": int(len(lats)),
            "latency_ms_p50": float(np.percentile(lats, 50)),
            "latency_ms_p95": float(np.percentile(lats, 95)),
            "latency_ms_p99": float(np.percentile(lats, 99)),
            "latency_ms_mean": float(lats.mean()),
        }
