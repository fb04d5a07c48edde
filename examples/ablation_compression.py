"""Adaptive-compression ablation — the retrieval tower's headline claim.

Reference (kuaiformer translation:126-155, 286-292, Table 3): compressing a
256-item history to 55 tokens costs ~+10% compute vs a 64-item sequence and
matches (slightly beats) the raw 256 sequence in accuracy, while the raw 256
sequence costs ~6×. This script verifies the claim directionally on
structured synthetic data: trains the tower with (a) compression on and
(b) raw (uncompressed) sequences, then compares held-out metrics + step time.

Usage:
    python examples/ablation_compression.py [--steps 2000] [--seq 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def run(cfg, train, heldout, data, steps, label):
    from recommend_tpu.data.pipeline import prefetch, retrieval_batches
    from recommend_tpu.evaluation.retrieval_eval import RetrievalEvaluator
    from recommend_tpu.training.trainer import RetrievalTrainer

    tr = RetrievalTrainer(cfg, total_steps=steps)
    it = prefetch(retrieval_batches(train, cfg, cfg.batch_size, seed=0), 4)
    first = next(it)
    state = tr.init_state(jax.random.key(0), first)
    state, m = tr._train_step(state, tr._put_batch(first), jax.random.key(0))
    float(m["loss"])  # compile barrier
    t0 = time.perf_counter()
    n_timed = min(50, steps)
    for _ in range(n_timed):
        state, m = tr._train_step(state, tr._put_batch(next(it)), jax.random.key(0))
    float(m["loss"])
    ms_step = (time.perf_counter() - t0) / n_timed * 1000
    # continue training
    for i in range(steps - n_timed - 1):
        state, m = tr._train_step(state, tr._put_batch(next(it)), jax.random.key(0))
    ev = RetrievalEvaluator(cfg, tr.model, state.params)
    metrics = ev.evaluate_retrieval(
        data,
        itertools.islice(retrieval_batches(heldout, cfg, cfg.batch_size, seed=77), 4),
        ks=(10, 50),
    )
    out = {"label": label, "tokens": cfg.num_compressed_tokens,
           "ms_per_step": round(ms_step, 2), **{k: round(v, 4) for k, v in metrics.items()}}
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seq", type=int, default=64)
    p.add_argument("--num_users", type=int, default=4000)
    args = p.parse_args()

    from recommend_tpu.config import get_config
    from recommend_tpu.data.synthetic import make_retrieval_data

    L = args.seq
    common = dict(
        max_seq_len=L, num_layers=4, warmup_steps=200, batch_size=256,
        video_vocab_size=10000, use_sparse_embedding_updates=True,
        dropout_rate=0.1,
    )
    # compressed: L → L/4 tokens (grouped) + raw tail
    cfg_comp = get_config(
        "retrieval_base",
        compression_schedule=((L // 2, L // 8), (L // 4, L // 8), (L // 4, 1)),
        **common,
    )
    # raw: every item is a token
    cfg_raw = get_config(
        "retrieval_base", compression_schedule=((L, 1),), **common
    )
    data = make_retrieval_data(cfg_comp, num_users=args.num_users,
                               num_videos=10000, seed=0, structured=True)
    train = dataclasses.replace(data, user_sequences=data.user_sequences[: int(args.num_users * 0.9)])
    heldout = dataclasses.replace(data, user_sequences=data.user_sequences[int(args.num_users * 0.9):])

    comp = run(cfg_comp, train, heldout, data, args.steps, "compressed")
    raw = run(cfg_raw, train, heldout, data, args.steps, "raw")
    speedup = raw["ms_per_step"] / comp["ms_per_step"]
    print(json.dumps({
        "compression_token_reduction": f"{raw['tokens']}→{comp['tokens']}",
        "step_time_speedup": round(speedup, 2),
        "recall@50_delta": round(comp["recall@50"] - raw["recall@50"], 4),
    }))


if __name__ == "__main__":
    main()
