"""Flagship retrieval step-time benchmark — the V=10M scoreboard row.

Measures the `retrieval_flagship` preset's steady-state train step (10M-video
vocab, 256-seq → 55 tokens, 6L d=128, batch 256) and A/B's the
`sparse_scatter_budget` host-precomputed compaction (docs/PERF.md "Retrieval
flagship"): at V=10M the scatter+accum round-trip scales with the
update-array length, so compacting ~59k gradient rows to the 16,384 real
rows is a step-time win that does NOT exist at V=1M (measured; see
bench.py's comment) — this script is the reproducible measurement behind
both numbers.

Usage (real TPU):
  PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon \
      python examples/flagship_bench.py [--steps 60] [--output out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cfg, steps: int) -> dict:
    import jax

    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.training.trainer import RetrievalTrainer

    data = make_retrieval_data(
        cfg, num_users=2000, num_videos=cfg.video_vocab_size, seed=0
    )
    it = retrieval_batches(data, cfg, cfg.batch_size, seed=0)
    trainer = RetrievalTrainer(cfg, total_steps=steps + 20)
    first = next(it)
    state = trainer.init_state(jax.random.key(0), first)
    rng = jax.random.key(0)
    state, m = trainer._train_step(state, trainer._put_batch(first), rng)
    float(m["loss"])  # compile + sync
    batches = [trainer._put_batch(next(it)) for _ in range(10)]
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = trainer._train_step(state, batches[i % 10], rng)
    final_loss = float(m["loss"])  # host fetch = true barrier (axon)
    dt = time.perf_counter() - t0
    out = {
        "ms_per_step": round(dt / steps * 1000, 2),
        "examples_per_s": round(steps * cfg.batch_size / dt, 1),
        "loss": round(final_loss, 4),
    }
    if "sparse_dropped_rows" in m:
        out["sparse_dropped_rows"] = int(m["sparse_dropped_rows"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax

    from recommend_tpu.config import get_config

    report = {"device": str(jax.devices()[0])}
    for tag, overrides in (
        ("flagship_budget_16384", {}),  # preset default: budget ON
        ("flagship_budget_off", {"sparse_scatter_budget": 0}),
    ):
        cfg = get_config("retrieval_flagship", **overrides)
        print(f"[{time.strftime('%H:%M:%S')}] measuring {tag} "
              f"(V={cfg.video_vocab_size}, batch {cfg.batch_size})", flush=True)
        report[tag] = measure(cfg, args.steps)
        print(json.dumps({tag: report[tag]}), flush=True)

    a = report["flagship_budget_16384"]["ms_per_step"]
    b = report["flagship_budget_off"]["ms_per_step"]
    report["budget_speedup"] = round(b / a, 3)
    print(json.dumps(report, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
