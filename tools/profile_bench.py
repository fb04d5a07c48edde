"""Capture a jax.profiler trace of the bench-config training step.

Companion to tools/analyze_profile.py (VERDICT round-2 item 2: decompose
the step-time long tail). Runs the exact bench.py ranking config — or the
OneTrans-L-like geometry with --geometry L — for a steady-state trace
window and writes the xplane proto for analysis.

Usage (real TPU):
    PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon \
        python tools/profile_bench.py --out /tmp/prof_bench --steps 10
    python tools/analyze_profile.py /tmp/prof_bench --steps 10
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/prof_bench")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--geometry", choices=("S", "L"), default="S")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq", type=int, default=116,
                    help="max behavior-sequence length per feature")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--no-trace", action="store_true",
                    help="steady-state timing only (no profiler overhead)")
    args = ap.parse_args()

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    geom = dict(
        embed_dim=256, num_layers=6, num_heads=2, ffn_dim=1024,
        pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03),
    ) if args.geometry == "S" else dict(
        embed_dim=384, num_layers=8, num_heads=3, ffn_dim=1536,
        pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03, 0.02, 0.01),
    )
    cfg = get_config(
        "ranking_base", **geom,
        num_ns_tokens=12,
        batch_size=args.batch, use_mixed_precision=True, use_remat=False,
        dropout_rate=0.0, feature_embed_dim=128, seq_item_feature_dim=128,
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
        use_flash_attention=not args.no_flash,
        dense_lr=1e-3, dense_momentum=0.9, sparse_lr=0.05,
    )
    data = make_ranking_data(cfg, num_samples=4096,
                             max_seq_per_feature=args.seq, seed=0)
    it = ranking_batches(data, cfg, batch_size=cfg.batch_size, seed=0)
    trainer = RankingTrainer(cfg)
    first = next(it)
    state = trainer.init_state(jax.random.key(0), first)
    rng = jax.random.key(0)
    print("compiling...", flush=True)
    state, m = trainer._train_step(state, trainer._put_batch(first), rng)
    float(m["loss"])  # on axon only a host fetch is a true barrier

    batches = [trainer._put_batch(next(it)) for _ in range(8)]
    # warm steady state
    for i in range(10):
        state, m = trainer._train_step(state, batches[i % 8], rng)
    float(m["loss"])

    t0 = time.perf_counter()
    if args.no_trace:
        for i in range(args.steps):
            state, m = trainer._train_step(state, batches[i % 8], rng)
        float(m["loss"])
        dt = time.perf_counter() - t0
        from recommend_tpu.evaluation.benchmark import ranking_model_flops

        names = [f for f in cfg.sequence_features if f in first["sequences"]]
        s_len = sum(first["sequences"][f].shape[1] for f in names) \
            + max(len(names) - 1, 0)
        flops = ranking_model_flops(cfg, s_len, training=True) * cfg.batch_size
        mfu = flops / (dt / args.steps) / 197e12
        print(f"{args.steps} steps in {dt:.2f}s: "
              f"{dt / args.steps * 1e3:.2f} ms/step, "
              f"{args.steps * cfg.batch_size / dt:.0f} ex/s, "
              f"train MFU {mfu:.1%} (analytic fwd×3, v5e 197 TF/s bf16)",
              flush=True)
        return
    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        with jax.profiler.StepTraceAnnotation("train", step_num=i):
            state, m = trainer._train_step(state, batches[i % 8], rng)
    float(m["loss"])
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {dt:.2f}s "
          f"({dt / args.steps * 1e3:.1f} ms/step host-observed, "
          f"{args.steps * cfg.batch_size / dt:.0f} ex/s) → {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
