"""Performance benchmarking utilities: latency percentiles and MFU.

Parity with the reference's manual wall-clock benchmarks (kuaiformer
evaluate.py:207-247; oneTrans evaluate.py:171-229) plus the paper-style MFU
accounting (Table 4, translation:234-242). Honest on remote transports: every
measured call ends in a host fetch (block_until_ready does not synchronize on
the axon tunnel — see bench.py).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

# bf16 peak per chip, by generation (TFLOP/s)
PEAK_TFLOPS = {"v5e": 197.0, "v5p": 459.0, "v4": 275.0, "v6e": 918.0}


def _sync(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf) if hasattr(leaf, "shape") else float(leaf)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Current device (HBM) memory stats in MB. Mirrors the reference's GPU
    memory reporting (oneTrans evaluate.py:197-204 via
    tf.config.experimental.get_memory_info).

    Uses the allocator's `memory_stats()` when the backend exposes it; remote
    transports (axon tunnel) return None there, so the fallback sums live JAX
    device arrays on the target device — framework-tracked bytes only (no
    allocator overhead/fragmentation), labeled via ``memory_source``."""
    d = device if device is not None else jax.local_devices()[0]
    mb = 1024.0 * 1024.0
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats:
        out = {"memory_source": "allocator"}
        for key, name in (
            ("bytes_in_use", "memory_in_use_mb"),
            ("peak_bytes_in_use", "memory_peak_mb"),
            ("bytes_limit", "memory_limit_mb"),
        ):
            if key in stats:
                out[name] = float(stats[key]) / mb
        return out
    try:
        live = jax.live_arrays()
    except Exception:
        return {}
    total = 0
    for a in live:
        try:
            if d in a.devices():
                total += a.nbytes // len(a.devices())
        except Exception:
            continue
    return {"memory_source": "live_arrays", "memory_in_use_mb": total / mb}


def latency_benchmark(
    fn: Callable[[], object],
    n_iters: int = 50,
    warmup: int = 5,
    batch_size: int = 1,
) -> Dict[str, float]:
    for _ in range(warmup):
        _sync(fn())
    # snapshot AFTER warmup so memory_delta_mb reflects the steady-state
    # working set of the timed iterations, not compile/first-touch allocation
    mem_before = device_memory_stats()
    lats = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        _sync(fn())
        lats.append((time.perf_counter() - t0) * 1000)
    lats = np.asarray(lats)
    out = {
        "latency_ms_p50": float(np.percentile(lats, 50)),
        "latency_ms_p95": float(np.percentile(lats, 95)),
        "latency_ms_p99": float(np.percentile(lats, 99)),
        "latency_ms_mean": float(lats.mean()),
        "throughput_per_s": float(batch_size * 1000.0 / lats.mean()),
    }
    mem_after = device_memory_stats()
    if mem_after:
        out.update(mem_after)
        if "memory_in_use_mb" in mem_before:
            out["memory_delta_mb"] = (
                mem_after["memory_in_use_mb"] - mem_before["memory_in_use_mb"]
            )
    return out


def ranking_model_flops(cfg, s_len: int, training: bool = False) -> float:
    """Analytic FLOPs per sample for the ranking forward (MACs × 2);
    backward ≈ 2× forward."""
    from recommend_tpu.models.ranking import pyramid_keep_lengths

    d, f, n = cfg.embed_dim, cfg.ffn_dim, cfg.num_ns_tokens
    total = s_len + n
    keeps = pyramid_keep_lengths(cfg, total)
    macs = 0.0
    # tokenizer
    macs += s_len * cfg.seq_item_feature_dim * d
    macs += len(cfg.non_seq_features) * cfg.feature_embed_dim * n * d
    cur = total
    for keep in keeps:
        keep_s = keep - n
        s_cur = cur - n
        macs += cur * d * d * 2  # K, V
        macs += keep * d * d  # Q (shared + dedicated same cost)
        macs += keep * cur * d * 2  # QK^T + PV
        macs += keep * d * d  # O
        macs += keep * d * f * 2  # FFN
        cur = keep
    macs += len(cfg.tasks) * (d * cfg.task_head_hidden + cfg.task_head_hidden)
    flops = 2.0 * macs
    return flops * 3.0 if training else flops


def mfu(
    achieved_examples_per_s: float,
    flops_per_example: float,
    generation: str = "v5e",
    n_chips: int = 1,
) -> float:
    """Model FLOPs Utilization (paper Table 4 reports 30.8 for OneTrans-L)."""
    peak = PEAK_TFLOPS[generation] * 1e12 * n_chips
    return 100.0 * achieved_examples_per_s * flops_per_example / peak
