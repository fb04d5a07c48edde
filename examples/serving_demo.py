"""Serving demos — parity with the reference's inference examples
(oneTrans examples/inference_example.py:319-412): performance-vs-batch-size
sweep and a QPS-simulating API service loop, plus the retrieval
RealTimeRecommender session flow (kuaiformer examples/inference_example.py).

Usage:
    python examples/serving_demo.py [--requests 50] [--candidates 100]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=50)
    p.add_argument("--candidates", type=int, default=100)
    p.add_argument("--seq_len", type=int, default=32)
    p.add_argument("--tiny", action="store_true", help="small model for CPU smoke runs")
    args = p.parse_args()

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import ranking_batches, retrieval_batches
    from recommend_tpu.data.synthetic import make_ranking_data, make_retrieval_data
    from recommend_tpu.models.ranking import RankingModel
    from recommend_tpu.models.retrieval import RetrievalTower
    from recommend_tpu.serving.ranking_service import RankingInferenceEngine
    from recommend_tpu.serving.retrieval_service import (
        RealTimeRecommender,
        RetrievalIndex,
    )

    # ---- ranking: batch-size sweep + QPS loop ----
    tiny = dict(
        embed_dim=32, num_layers=2, num_heads=2, ffn_dim=64, num_ns_tokens=4,
        pyramid_ratios=(0.5, 0.25), feature_embed_dim=8, seq_item_feature_dim=8,
        use_mixed_precision=False, task_head_hidden=16,
    ) if args.tiny else {}
    cfg = get_config("ranking_small", dense_lr=1e-3, dense_momentum=0.9,
                     sparse_lr=0.05, **tiny)
    data = make_ranking_data(cfg, num_samples=64, max_seq_per_feature=args.seq_len, seed=0)
    b = next(iter(ranking_batches(data, cfg, batch_size=2, num_epochs=1)))
    model = RankingModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0),
        {k: jnp.asarray(v) for k, v in b["non_seq"].items()},
        {k: jnp.asarray(v) for k, v in b["sequences"].items()},
        {k: jnp.asarray(v) for k, v in b["seq_valid"].items()},
    )
    engine = RankingInferenceEngine(cfg, params, max_seq_len=args.seq_len)

    user_ctx = {f: 1 for f in cfg.user_features + cfg.context_features}
    seqs = {sf: list(range(1, 10)) for sf in cfg.sequence_features}

    print("== batch-size sweep (KV-cached candidate scoring) ==")
    for n_cand in (1, 10, 50, args.candidates):
        cands = [{f: i + 1 for f in cfg.item_features} for i in range(n_cand)]
        engine.score_request(user_ctx, seqs, cands)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(5):
            engine.score_request(user_ctx, seqs, cands)
        dt = (time.perf_counter() - t0) / 5 * 1000
        print(f"  {n_cand:4d} candidates: {dt:7.1f} ms/request "
              f"({n_cand / dt * 1000:8.0f} candidates/s)")

    print("== QPS-simulating service loop (sessionized) ==")
    rng = random.Random(0)
    t0 = time.perf_counter()
    for r in range(args.requests):
        sid = f"user_{rng.randint(0, 9)}"
        engine.update_session(sid, {"click_seq": [rng.randint(1, 500)]})
        cands = [{f: rng.randint(1, 500) for f in cfg.item_features} for _ in range(16)]
        engine.score_session(sid, user_ctx, cands)
    wall = time.perf_counter() - t0
    print(f"  {args.requests} requests in {wall:.2f}s -> {args.requests / wall:.1f} QPS")
    print("  engine stats:", {k: round(v, 2) if isinstance(v, float) else v
                              for k, v in engine.stats().items()})

    # ---- retrieval: real-time recommender ----
    rtiny = dict(embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                 max_seq_len=16, compression_schedule=((8, 4), (8, 1)),
                 compute_dtype="float32") if args.tiny else {}
    rcfg = get_config("retrieval_small", top_k=50, **rtiny)
    rdata = make_retrieval_data(rcfg, num_users=20, num_videos=2000, seed=0)
    rmodel = RetrievalTower(rcfg)
    rb = next(iter(retrieval_batches(rdata, rcfg, batch_size=4, num_epochs=1)))
    rparams = jax.jit(rmodel.init)(
        jax.random.key(0),
        {k: jnp.asarray(v) for k, v in rb["history"].items()},
        jnp.asarray(rb["history_valid"]),
    )
    index = RetrievalIndex(rcfg, rmodel, rparams, embed_batch=1024)
    index.build(rdata.corpus_features())
    rec = RealTimeRecommender(rcfg, rmodel, rparams, index)
    print("== retrieval session flow ==")
    for vid in (3, 17, 42):
        rec.add_interaction("demo-user", {
            "video_id": vid, "category": 1, "tag": 2, "duration": 30.0,
            "timestamp": int(time.time()),
        })
    recs = rec.get_recommendations("demo-user", top_k=5)
    print("  top-5:", recs)
    print("  stats:", rec.stats())


if __name__ == "__main__":
    main()
