"""Minute-level online learning loop, end to end.

The reference's deployment narrative (kuaiformer
translation/complete_translation.md:210-214) describes continuous production
serving: models retrain on fresh logs, parameters push to serving replicas
minute-by-minute, and new items enter the index without downtime. This demo
runs one full cycle of that loop on real hardware:

  1. train the retrieval tower, checkpointing as we go
  2. build the serving index (int8-quantized) and answer a query
  3. new items arrive → `RetrievalIndex.update_items` (incremental, in place)
  4. train further on fresh data → `RetrievalIndex.refresh(new_params)`
     (full parameter push; re-embeds the live corpus incl. the new items)

Run: python examples/online_learning_demo.py [--steps 120]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--videos", type=int, default=5000)
    p.add_argument("--model_dir", default="/tmp/recommend_tpu/online_demo")
    args = p.parse_args()

    import shutil

    # a fresh dir per run: a stale checkpoint would auto-restore past
    # num_steps (silently skipping training) or crash on a shape mismatch
    shutil.rmtree(args.model_dir, ignore_errors=True)

    from recommend_tpu import get_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.serving.retrieval_service import RetrievalIndex
    from recommend_tpu.training.trainer import RetrievalTrainer

    t0 = time.time()

    def log(msg):
        print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)

    cfg = get_config(
        "retrieval_small",
        video_vocab_size=args.videos + 64,  # headroom for new uploads
        batch_size=64,
        warmup_steps=20,
        use_sparse_embedding_updates=True,
        sparse_update_mode="rowwise",
        top_k=20,
    )
    data = make_retrieval_data(
        cfg, num_users=400, num_videos=args.videos, seed=0, structured=True
    )

    # 1. initial training run with checkpoints
    trainer = RetrievalTrainer(
        cfg, total_steps=args.steps * 2, checkpoint_dir=args.model_dir
    )
    state = trainer.train(
        retrieval_batches(data, cfg, batch_size=64, seed=0),
        num_steps=args.steps,
        log_every=max(args.steps // 2, 1),
    )
    log(f"initial training done (step {int(state.step)})")

    # 2. serving index (int8 + approximate top-k) + a query
    index = RetrievalIndex(
        cfg, trainer.model, state.params, quantize="int8", approx_recall=0.99
    )
    index.build(data.corpus_features())
    rng = np.random.default_rng(0)
    interests = jnp.asarray(
        rng.normal(size=(1, cfg.num_query_tokens, cfg.embed_dim)).astype(np.float32)
    )
    _, ids_before = index.search(interests)
    log(f"index built ({args.videos} items); top-5 for probe: {ids_before[0][:5]}")

    # 3. new items arrive — incremental index update, zero downtime
    corpus = data.corpus_features()
    fresh = {k: np.array(v[:8]) for k, v in corpus.items()}
    fresh["video_id"] = np.arange(
        args.videos, args.videos + 8, dtype=corpus["video_id"].dtype
    )
    index.update_items(fresh)
    log(f"8 new items appended in place (corpus now {index.item_embeddings.shape[0]})")

    # 4. continue training on fresh data, then push the new parameters
    state = trainer.train(
        retrieval_batches(data, cfg, batch_size=64, seed=1),
        num_steps=args.steps * 2,
        log_every=args.steps,
    )
    index.refresh(state.params)
    _, ids_after = index.search(interests)
    changed = len(set(ids_before[0].tolist()) ^ set(ids_after[0].tolist()))
    log(
        f"parameter push applied (step {int(state.step)}); results moved by "
        f"{changed} ids — new items remain indexed: "
        f"{index.item_embeddings.shape[0] == args.videos + 8}"
    )
    log("online learning cycle complete")


if __name__ == "__main__":
    main()
