"""End-to-end ranking training example.

Capability parity with oneTrans train.py's CLI (`--config --epochs
--batch_size --model_dir`, train.py:378-420) and examples/train_example.py's
pipeline demo: config → data → train (dual optimizer, early stopping) →
offline eval → KV-cached inference demo.

Usage:
    python examples/train_ranking.py --config ranking_small --steps 500
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ranking_small")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_samples", type=int, default=20000)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--model_dir", default="/tmp/recommend_tpu/ranking")
    p.add_argument("--eval_every", type=int, default=200)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--flash", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--taobao", default=None, metavar="CSV",
                   help="train on Taobao UserBehavior.csv instead of "
                        "synthetic data (pv->click/cart+fav->cart/buy->"
                        "purchase sequences, CTR=pv, CVR=later-buy)")
    p.add_argument("--criteo", default=None, metavar="TSV",
                   help="train on the Criteo Kaggle train.txt (NS-only CTR; "
                        "--config is ignored, criteo_ranking_config is used)")
    p.add_argument("--push-dir", default=None, metavar="DIR",
                   help="demonstrate the minute-level online-update loop: "
                        "track touched embedding rows during training and "
                        "write an incremental parameter push "
                        "(serving.param_push) a serving replica applies "
                        "with engine.apply_push — MB-scale vs the full "
                        "checkpoint")
    p.add_argument("--tame-optimizer", action="store_true",
                   help="small-scale-friendly lrs instead of the paper's")
    args = p.parse_args()

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import prefetch, ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.evaluation.ranking_eval import RankingEvaluator
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    overrides = dict(
        batch_size=args.batch_size,
        use_flash_attention=args.flash,
        use_remat=args.remat,
    )
    if args.tame_optimizer:
        overrides.update(dense_lr=1e-3, dense_momentum=0.9, sparse_lr=0.05)
    if args.criteo:
        from recommend_tpu.data.datasets import criteo_ranking_config

        cfg = criteo_ranking_config(**overrides)
    else:
        cfg = get_config(args.config, **overrides)

    if args.criteo:
        from recommend_tpu.data.datasets import load_criteo_kaggle

        data = load_criteo_kaggle(args.criteo, max_samples=args.num_samples)
        print(f"Criteo: {data.num_samples} samples (NS-only)")
    elif args.taobao:
        from recommend_tpu.data.datasets import load_taobao_userbehavior

        data = load_taobao_userbehavior(args.taobao, cfg,
                                        max_seq_per_feature=args.seq_len)
        print(f"Taobao UserBehavior: {data.num_samples} samples")
    else:
        data = make_ranking_data(cfg, args.num_samples, args.seq_len, seed=0)
    train_iter = prefetch(ranking_batches(data, cfg, args.batch_size, seed=0), 4)
    val_fn = lambda: itertools.islice(
        ranking_batches(data, cfg, args.batch_size, seed=99), 4
    )

    trainer = RankingTrainer(
        cfg,
        checkpoint_dir=os.path.join(args.model_dir, "ckpt"),
        log_dir=os.path.join(args.model_dir, "logs"),
    )
    tracker = None
    if args.push_dir:
        from recommend_tpu.serving.param_push import PushTracker

        tracker = PushTracker(cfg)
        train_iter = tracker.wrap(train_iter)
    state = trainer.train(
        train_iter, args.steps, val_fn=val_fn, eval_every=args.eval_every,
        log_every=max(args.steps // 10, 1), early_stop_patience=args.patience,
    )
    if tracker is not None:
        from recommend_tpu.serving.param_push import build_push, save_push

        os.makedirs(args.push_dir, exist_ok=True)
        push = build_push(
            state.params, tracker.snapshot(), step=int(state.step)
        )
        path = os.path.join(args.push_dir, f"push_{int(state.step):08d}.npz")
        nbytes = save_push(push, path)
        print(f"incremental param push: {path} ({nbytes / 2**20:.2f} MB; "
              f"apply with RankingInferenceEngine.apply_push)")

    evaluator = RankingEvaluator(cfg, trainer.model, state.params)
    metrics = evaluator.evaluate(
        itertools.islice(ranking_batches(data, cfg, args.batch_size, seed=7), 8)
    )
    print("offline eval:", json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                       for k, v in metrics.items()}, indent=2))
    evaluator.save_report(metrics, os.path.join(args.model_dir, "eval.json"))

    # KV-cached serving demo (cross-candidate cache)
    from recommend_tpu.serving.ranking_service import RankingInferenceEngine

    engine = RankingInferenceEngine(cfg, state.params, max_seq_len=args.seq_len)
    user_ctx = {f: 1 for f in cfg.user_features + cfg.context_features}
    candidates = [
        {f: i + 1 for f in cfg.item_features} for i in range(10)
    ]
    seqs = {sf: [1, 2, 3] for sf in cfg.sequence_features}
    scored = engine.score_request(user_ctx, seqs, candidates)
    print("KV-cached scores for 10 candidates:", scored[:3], "...")
    print("engine stats:", engine.stats())


if __name__ == "__main__":
    main()
