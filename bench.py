"""Benchmark harness — prints ONE JSON line for the driver.

Measures steady-state training throughput (examples/s/chip) of an
OneTrans-S-like ranking config on the available device, and compares against
the reference's published per-GPU training throughput:
unoptimized OneTrans-S = 407 ms / step at per-GPU batch 2048 on H100
(rank/scaling_up/oneTrans/translation/complete_translation.md:250, 190)
→ 5032 examples/s/GPU. ``vs_baseline`` = ours / 5032.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_EXAMPLES_PER_S = 2048 / 0.407  # reference unoptimized OneTrans-S, H100


def main():
    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    # OneTrans-S-like: 6 layers, d=256, 12 NS tokens, ~350 S tokens.
    # feature dims are lane-aligned (128) — 64-wide tables provoke XLA layout
    # transposes that copy the [1M, d] tables every step (profiled); sparse
    # embedding updates keep optimizer cost O(touched rows). num_heads=2 makes
    # Dh=128 = one full MXU lane width (measured sweep at batch 512:
    # heads 1/2/4/8 → 13218/12213/9180/7024 ex/s); 2 heads keeps multi-head
    # attention semantics at the TPU-natural head width.
    cfg = get_config(
        "ranking_base",
        embed_dim=256,
        num_layers=6,
        num_heads=2,
        ffn_dim=1024,
        num_ns_tokens=12,
        pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03),
        batch_size=512,
        use_mixed_precision=True,
        use_remat=False,
        dropout_rate=0.0,
        feature_embed_dim=128,
        seq_item_feature_dim=128,
        use_sparse_embedding_updates=True,
        sparse_update_mode="rowwise",
        # sparse_scatter_budget deliberately OFF here: at V=1M the 178k-row
        # scatter is ~3.8 ms and BOTH compaction variants lose (on-device:
        # 12,209 ex/s — its index-building scatter costs more than it saves;
        # host-precomputed indices: 12,329 ex/s — the grad gather breaks the
        # grad-production→scatter fusion). Compaction wins at V=10M where the
        # scatter+accum round-trip is larger: flagship retrieval 30.4 →
        # 27.7 ms/step with budget 16,384 (the retrieval_flagship preset
        # default; reproduce with examples/flagship_bench.py — numbers in
        # docs/PERF.md "Retrieval flagship").
        # Pallas flash band-attention kernel: +6% at these sizes after the
        # whole-tile small-kv path (38.5 vs 40.8 ms/step A/B — the
        # 13,180 ex/s headline run in BASELINE.md/PERF.md)
        use_flash_attention=True,
        dense_lr=1e-3,
        dense_momentum=0.9,
        sparse_lr=0.05,
    )
    data = make_ranking_data(cfg, num_samples=4096, max_seq_per_feature=116, seed=0)
    it = ranking_batches(data, cfg, batch_size=cfg.batch_size, seed=0)
    trainer = RankingTrainer(cfg)
    first = next(it)
    state = trainer.init_state(jax.random.key(0), first)

    # warmup / compile. NOTE: on the axon remote transport
    # jax.block_until_ready does NOT synchronize — only a host fetch does.
    # Run enough steps per fetch to amortize the ~28 ms tunnel round-trip.
    rng = jax.random.key(0)
    state, m = trainer._train_step(state, trainer._put_batch(first), rng)
    float(m["loss"])  # forces completion

    steps = 100
    batches = [trainer._put_batch(next(it)) for _ in range(10)]
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer._train_step(state, batches[i % 10], rng)
    final_loss = float(m["loss"])  # host fetch == true barrier
    dt = time.perf_counter() - t0
    ex_per_s = steps * cfg.batch_size / dt

    print(json.dumps({
        "metric": "rank_train_examples_per_s_per_chip",
        "value": round(ex_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / BASELINE_EXAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
