"""Full-corpus retrieval evaluation.

Capability parity with KuaiFormerEvaluator (kuaiformer evaluate.py:18-317):
Recall@{1,5,10,50,100}, NDCG@{10,50,100}, MRR, MAP over the whole corpus —
computed with the on-device top-k scorer instead of FAISS (the reference's
FAISS path also conflates index positions with video ids, evaluate.py:96; the
on-device path is exact by construction). Latency benchmark + JSON dump
included (evaluate.py:207-247, 302-314).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.data.pipeline import FEATURE_KEYS
from recommend_tpu.data.synthetic import SyntheticRetrievalData
from recommend_tpu.models.retrieval import RetrievalTower
from recommend_tpu.serving.retrieval_service import RetrievalIndex


class RetrievalEvaluator:
    def __init__(
        self,
        cfg: RetrievalConfig,
        model: RetrievalTower,
        params,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.index = RetrievalIndex(cfg, model, params, mesh=mesh)
        self._fwd = jax.jit(lambda p, f, v: model.apply(p, f, v))

    def evaluate_retrieval(
        self,
        data: SyntheticRetrievalData,
        batches: Iterable[Dict],
        ks: Tuple[int, ...] = (1, 5, 10, 50, 100),
        max_k: Optional[int] = None,
    ) -> Dict[str, float]:
        """Full-corpus metrics: for each (history → target) pair, retrieve
        top max(ks) from the whole corpus and score the target's rank.

        Batches may carry ``num_real`` (< batch size) to mark padded
        duplicate rows appended by fixed-shape batch builders
        (`replica.leave_one_out_batches`); padded rows are excluded from
        every metric, so any batch size is exact."""
        if self.index.item_embeddings is None:
            self.index.build(data.corpus_features())
        kmax = max_k or max(ks)
        kmax = min(kmax, self.index.item_embeddings.shape[0])
        hits = {k: [] for k in ks if k <= kmax}
        ndcgs = {k: [] for k in ks if k <= kmax}
        rrs: List[float] = []
        for batch in batches:
            feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
            valid = jnp.asarray(batch["history_valid"])
            interests = self._fwd(self.params, feats, valid)
            scores, ids = self.index.search(interests, kmax)  # [B, kmax]
            targets = np.asarray(batch["target"]["video_id"])
            num_real = int(batch.get("num_real", len(targets)))
            ids, targets = ids[:num_real], targets[:num_real]
            for row_ids, t in zip(ids, targets):
                pos = np.nonzero(row_ids == t)[0]
                rank = int(pos[0]) if len(pos) else kmax
                for k in hits:
                    hits[k].append(1.0 if rank < k else 0.0)
                    ndcgs[k].append(1.0 / np.log2(rank + 2) if rank < k else 0.0)
                rrs.append(1.0 / (rank + 1) if rank < kmax else 0.0)
        out = {}
        for k in hits:
            out[f"recall@{k}"] = float(np.mean(hits[k]))
            out[f"ndcg@{k}"] = float(np.mean(ndcgs[k]))
        out["mrr"] = float(np.mean(rrs))
        out["map"] = out["mrr"]  # single relevant item per query ⇒ MAP == MRR
        return out

    def evaluate_classification(
        self,
        data: SyntheticRetrievalData,
        batches: Iterable[Dict],
        num_negatives: int = 100,
        seed: int = 0,
    ) -> Dict[str, float]:
        """Classification AUC / average precision: positive item vs
        popularity-sampled negatives (kuaiformer evaluate.py:161-205).
        Scores pass through a sigmoid (monotone ⇒ identical AUC) into the
        streaming histogram accumulator."""
        from recommend_tpu.training.metrics import streaming_auc

        rng = np.random.default_rng(seed)
        probs = data.sampling_probs()
        corpus = data.corpus_features()
        init, update, compute = streaming_auc()
        auc_state = init()
        ap_num, ap_den = 0.0, 0
        for batch in batches:
            feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
            valid = jnp.asarray(batch["history_valid"])
            interests = self._fwd(self.params, feats, valid)  # [B,k,D]
            b = valid.shape[0]
            pos_emb = self.model.apply(
                self.params, {k: jnp.asarray(v) for k, v in batch["target"].items()},
                method=type(self.model).item_embeddings,
            )  # [B, D]
            neg_ids = rng.choice(len(probs), size=(b, num_negatives), p=probs)
            neg_feats = {
                k: jnp.asarray(corpus[k][neg_ids]) for k in corpus
            }
            neg_emb = self.model.apply(
                self.params, neg_feats, method=type(self.model).item_embeddings
            )  # [B, N, D]
            s_pos = jnp.max(
                jnp.einsum("bkd,bd->bk", interests.astype(jnp.float32),
                           pos_emb.astype(jnp.float32)), axis=1)  # [B]
            s_neg = jnp.max(
                jnp.einsum("bkd,bnd->bkn", interests.astype(jnp.float32),
                           neg_emb.astype(jnp.float32)), axis=1)  # [B, N]
            scores = jnp.concatenate([s_pos[:, None], s_neg], axis=1)
            labels = jnp.concatenate(
                [jnp.ones((b, 1)), jnp.zeros((b, num_negatives))], axis=1
            )
            p = jax.nn.sigmoid(scores / jnp.maximum(jnp.std(scores), 1e-6))
            auc_state = update(auc_state, p.reshape(-1), labels.reshape(-1))
            # average precision for single positive = 1 / rank
            rank = jnp.sum(s_neg > s_pos[:, None], axis=1) + 1
            ap_num += float(jnp.sum(1.0 / rank))
            ap_den += b
        return {
            "auc": float(compute(auc_state)),
            "average_precision": ap_num / max(ap_den, 1),
        }

    def benchmark_latency(
        self,
        batch: Dict,
        n_iters: int = 50,
        warmup: int = 5,
    ) -> Dict[str, float]:
        """p50/p95/p99 end-to-end (forward + search) latency
        (reference evaluate.py:207-247)."""
        feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
        valid = jnp.asarray(batch["history_valid"])
        bsz = valid.shape[0]

        def once():
            interests = self._fwd(self.params, feats, valid)
            s, i = self.index.search(interests, min(self.cfg.top_k, self.index.item_embeddings.shape[0]))
            return s  # numpy already — host-synchronized

        for _ in range(warmup):
            once()
        lats = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            once()
            lats.append((time.perf_counter() - t0) * 1000)
        lats = np.asarray(lats)
        return {
            "batch_size": bsz,
            "latency_ms_p50": float(np.percentile(lats, 50)),
            "latency_ms_p95": float(np.percentile(lats, 95)),
            "latency_ms_p99": float(np.percentile(lats, 99)),
            "latency_ms_mean": float(lats.mean()),
            "throughput_qps": float(bsz * 1000.0 / lats.mean()),
        }

    @staticmethod
    def save_results(results: Dict, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"timestamp": time.time(), **results}, f, indent=2)
