"""Evaluation CLI — parity with the reference's evaluate.py argparse surfaces
(kuaiformer evaluate.py:316-317; oneTrans evaluate.py:414-466):

    python examples/evaluate.py retrieval --checkpoint DIR [--output DIR]
    python examples/evaluate.py ranking --checkpoint DIR \
        [--eval_type offline|ab_test|importance|benchmark|all]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _load_retrieval(ckpt_dir: str):
    from recommend_tpu.config import load_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.training.trainer import RetrievalTrainer

    cfg = load_config(os.path.join(ckpt_dir, "config.json"))
    trainer = RetrievalTrainer(cfg, checkpoint_dir=ckpt_dir)
    data = make_retrieval_data(cfg, num_users=500, num_videos=min(10000, cfg.video_vocab_size), seed=0)
    batch = next(iter(retrieval_batches(data, cfg, cfg.batch_size, num_epochs=1)))
    state = trainer.init_state(jax.random.key(0), batch)
    return cfg, trainer, state, data


def eval_retrieval(args):
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.evaluation.retrieval_eval import RetrievalEvaluator

    cfg, trainer, state, data = _load_retrieval(args.checkpoint)
    ev = RetrievalEvaluator(cfg, trainer.model, state.params)
    out = {}
    out["retrieval"] = ev.evaluate_retrieval(
        data, itertools.islice(retrieval_batches(data, cfg, cfg.batch_size, seed=7), args.batches)
    )
    out["classification"] = ev.evaluate_classification(
        data, itertools.islice(retrieval_batches(data, cfg, cfg.batch_size, seed=8), args.batches)
    )
    batch = next(iter(retrieval_batches(data, cfg, cfg.batch_size, num_epochs=1)))
    out["latency"] = ev.benchmark_latency(batch, n_iters=20)
    print(json.dumps(out, indent=2, default=float))
    if args.output:
        ev.save_results(out, os.path.join(args.output, "retrieval_eval.json"))


def eval_ranking(args):
    from recommend_tpu.config import load_config
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.evaluation.ranking_eval import RankingEvaluator
    from recommend_tpu.serving.ranking_service import RankingInferenceEngine

    engine = RankingInferenceEngine.from_checkpoint(args.checkpoint)
    cfg = engine.cfg
    ev = RankingEvaluator(cfg, engine.model, engine.params)
    data = make_ranking_data(cfg, num_samples=args.batches * cfg.batch_size * 2,
                             max_seq_per_feature=64, seed=0)
    out = {}
    if args.eval_type in ("offline", "all"):
        out["offline"] = ev.evaluate(
            itertools.islice(ranking_batches(data, cfg, cfg.batch_size, seed=7), args.batches)
        )
    if args.eval_type in ("ab_test", "all"):
        out["ab_test"] = ev.ab_test(
            itertools.islice(ranking_batches(data, cfg, cfg.batch_size, seed=8), args.batches),
            itertools.islice(ranking_batches(data, cfg, cfg.batch_size, seed=9), args.batches),
        )
    if args.eval_type in ("importance", "all"):
        batches = list(itertools.islice(
            ranking_batches(data, cfg, cfg.batch_size, seed=10), min(args.batches, 2)
        ))
        out["feature_importance"] = ev.feature_importance(batches)
    print(json.dumps(out, indent=2, default=float))
    if args.output:
        ev.save_report(out, os.path.join(args.output, "ranking_eval.json"))
        charts = ev.save_charts(out.get("offline", {}) | {"feature_importance": out.get("feature_importance")},
                                os.path.join(args.output, "charts"))
        print("charts:", charts)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("retrieval")
    pr.add_argument("--checkpoint", required=True)
    pr.add_argument("--output", default=None)
    pr.add_argument("--batches", type=int, default=4)
    pk = sub.add_parser("ranking")
    pk.add_argument("--checkpoint", required=True)
    pk.add_argument("--output", default=None)
    pk.add_argument("--batches", type=int, default=4)
    pk.add_argument("--eval_type", default="all",
                    choices=["offline", "ab_test", "importance", "all"])
    args = p.parse_args()
    if args.cmd == "retrieval":
        eval_retrieval(args)
    else:
        eval_ranking(args)


if __name__ == "__main__":
    main()
