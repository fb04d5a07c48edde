"""End-to-end retrieval training example + quick start.

Capability parity with kuaiformer examples/train_example.py (train_example +
quick_start): config → synthetic data → train → evaluate → full-corpus
retrieval metrics → save. CLI parity with the reference's argparse surface.

Usage:
    python examples/train_retrieval.py --config retrieval_small --steps 500
    python examples/train_retrieval.py --quick-start
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="retrieval_small")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_users", type=int, default=1000)
    p.add_argument("--num_videos", type=int, default=10000)
    p.add_argument("--model_dir", default="/tmp/recommend_tpu/retrieval")
    p.add_argument("--eval_every", type=int, default=200)
    p.add_argument("--quick-start", action="store_true")
    p.add_argument("--causal", action="store_true", help="causal single-sequence mode")
    p.add_argument("--movielens", default=None, metavar="DIR",
                   help="train on MovieLens-1M (directory with ratings.dat/"
                        "movies.dat) instead of synthetic data; evaluation "
                        "uses the BERT4Rec leave-one-out split")
    args = p.parse_args()

    from recommend_tpu.config import get_config, save_config
    from recommend_tpu.data.pipeline import prefetch, retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.evaluation.retrieval_eval import RetrievalEvaluator
    from recommend_tpu.training.trainer import RetrievalTrainer

    if args.quick_start:
        args.steps, args.num_users, args.num_videos = 100, 100, 1000

    cfg = get_config(
        args.config, batch_size=args.batch_size, use_causal_mask=args.causal
    )
    os.makedirs(args.model_dir, exist_ok=True)
    save_config(cfg, os.path.join(args.model_dir, "config.json"))

    if args.movielens:
        from recommend_tpu.data.datasets import leave_one_out_split, load_movielens_1m

        full = load_movielens_1m(args.movielens, cfg)
        data, val_data = leave_one_out_split(full)
        print(f"MovieLens-1M: {len(data.user_sequences)} users, "
              f"{data.num_videos} items")
    else:
        data = make_retrieval_data(cfg, args.num_users, args.num_videos, seed=0)
        val_data = data
    train_iter = prefetch(
        retrieval_batches(data, cfg, args.batch_size, seed=0), size=4
    )
    val_fn = lambda: itertools.islice(
        retrieval_batches(val_data, cfg, args.batch_size, seed=99), 4
    )

    trainer = RetrievalTrainer(
        cfg,
        total_steps=args.steps,
        checkpoint_dir=os.path.join(args.model_dir, "ckpt"),
        log_dir=os.path.join(args.model_dir, "logs"),
    )
    state = trainer.train(
        train_iter, args.steps, val_fn=val_fn,
        eval_every=args.eval_every, log_every=max(args.steps // 10, 1),
    )

    evaluator = RetrievalEvaluator(cfg, trainer.model, state.params)
    metrics = evaluator.evaluate_retrieval(
        data,
        itertools.islice(retrieval_batches(data, cfg, args.batch_size, seed=7), 8),
        ks=(1, 5, 10, 50, 100),
    )
    print("full-corpus retrieval metrics:", json.dumps(metrics, indent=2))
    evaluator.save_results(metrics, os.path.join(args.model_dir, "eval.json"))

    batch = next(iter(retrieval_batches(data, cfg, args.batch_size, num_epochs=1)))
    print("latency:", evaluator.benchmark_latency(batch, n_iters=20))


if __name__ == "__main__":
    main()
