"""DP scaling benchmark — examples/s/chip at 1..N devices + efficiency.

The BASELINE.json scaling metric (examples/s/chip at 1/8/16 chips, ≥85%
efficiency host→2 hosts). On a multi-chip TPU slice this measures the real
numbers; on the 8-device virtual CPU mesh it validates the mechanics.

Usage:
    python examples/scaling_bench.py [--model ranking|retrieval] [--steps 30]
    JAX_PLATFORMS=cpu python examples/scaling_bench.py --virtual 8 --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(trainer_cls, cfg, data_iter_fn, mesh, steps: int, global_batch: int):
    import jax

    trainer = trainer_cls(cfg, mesh=mesh) if trainer_cls.__name__ == "RankingTrainer" else trainer_cls(
        cfg, total_steps=steps + 10, mesh=mesh
    )
    it = data_iter_fn()
    first = next(it)
    state = trainer.init_state(jax.random.key(0), first)
    state, m = trainer._train_step(state, trainer._put_batch(first), jax.random.key(0))
    float(m["loss"])  # sync
    batches = [trainer._put_batch(next(it)) for _ in range(min(steps, 10))]
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer._train_step(state, batches[i % len(batches)], jax.random.key(0))
    float(m["loss"])  # sync
    dt = time.perf_counter() - t0
    return steps * global_batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ranking", choices=["ranking", "retrieval"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--per_chip_batch", type=int, default=128)
    p.add_argument("--virtual", type=int, default=0,
                   help="force N virtual CPU devices (mechanics test)")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.virtual:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)
    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    pow2 = {1 << i for i in range(5)}  # 1,2,4,8,16
    sizes = sorted(({1, 2, n_dev} | pow2) & set(range(1, n_dev + 1)))

    results = {}
    for n in sizes:
        mesh = make_mesh(data=n, model=1, devices=jax.devices()[:n])
        global_batch = args.per_chip_batch * n
        if args.model == "ranking":
            from recommend_tpu.data.pipeline import ranking_batches
            from recommend_tpu.data.synthetic import make_ranking_data
            from recommend_tpu.training.ranking_trainer import RankingTrainer

            tiny = dict(
                embed_dim=64, num_layers=2, num_heads=2, ffn_dim=128,
                num_ns_tokens=4, pyramid_ratios=(0.5, 0.25),
                feature_embed_dim=16, seq_item_feature_dim=16,
                use_mixed_precision=False,
            ) if args.tiny else dict(
                embed_dim=256, num_layers=6, num_heads=4, ffn_dim=1024,
                num_ns_tokens=12, pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03),
                feature_embed_dim=128, seq_item_feature_dim=128,
                use_sparse_embedding_updates=True,
            )
            cfg = get_config(
                "ranking_base", batch_size=global_batch, dropout_rate=0.0,
                dense_lr=1e-3, dense_momentum=0.9, sparse_lr=0.05, **tiny,
            )
            data = make_ranking_data(cfg, max(2048, global_batch * 4),
                                     16 if args.tiny else 116, seed=0)
            ex_s = measure(
                RankingTrainer, cfg,
                lambda: ranking_batches(data, cfg, global_batch, seed=0),
                mesh, args.steps, global_batch,
            )
        else:
            from recommend_tpu.data.pipeline import retrieval_batches
            from recommend_tpu.data.synthetic import make_retrieval_data
            from recommend_tpu.training.trainer import RetrievalTrainer

            tiny = dict(
                embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                max_seq_len=16, compression_schedule=((8, 4), (8, 1)),
                video_vocab_size=1000, compute_dtype="float32",
            ) if args.tiny else dict(use_sparse_embedding_updates=True)
            cfg = get_config("retrieval_small" if args.tiny else "retrieval_base",
                             batch_size=global_batch, dropout_rate=0.0, **tiny)
            data = make_retrieval_data(cfg, 500 if args.tiny else 5000,
                                       1000 if args.tiny else 100000, seed=0)
            ex_s = measure(
                RetrievalTrainer, cfg,
                lambda: retrieval_batches(data, cfg, global_batch, seed=0),
                mesh, args.steps, global_batch,
            )
        per_chip = ex_s / n
        results[n] = {"examples_per_s": round(ex_s, 1),
                      "examples_per_s_per_chip": round(per_chip, 1)}
        base = results[sizes[0]]["examples_per_s_per_chip"]
        results[n]["scaling_efficiency"] = round(per_chip / base, 3)
        print(f"{n} chip(s): {ex_s:10.0f} ex/s total, {per_chip:10.0f} /chip, "
              f"efficiency {results[n]['scaling_efficiency']:.1%}", flush=True)
    print(json.dumps({"model": args.model, "results": results}))


if __name__ == "__main__":
    main()
