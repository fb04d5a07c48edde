"""Dataclass configuration system with presets, JSON round-trip, and CLI overrides.

Capability parity with the reference's plain-Python config classes:
  - KuaiFormerConfig: recall/bert_like/kuaiformer/practice/config.py:9-59
  - OneTransConfig (+ small/large presets, factory): rank/scaling_up/oneTrans/practice/config.py:9-117

Unlike the reference, system flags (`use_remat`, `use_kv_cache`, `use_flash_attention`,
`param_dtype`/`compute_dtype`) actually gate behavior (the reference declares
`use_flash_attention` etc. at oneTrans config.py:66-69 but never implements them —
SURVEY.md O2).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    d["__config_class__"] = type(cfg).__name__
    return d


def _fromdict(cls, d: Dict[str, Any]):
    d = dict(d)
    d.pop("__config_class__", None)
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names}
    # tuple-ify list-typed fields that were serialized as JSON arrays
    for f in dataclasses.fields(cls):
        if f.name in known and isinstance(known[f.name], list):
            known[f.name] = tuple(
                tuple(v) if isinstance(v, list) else v for v in known[f.name]
            )
    return cls(**known)


@dataclass(frozen=True)
class CompressionGroupSpec:
    """One segment of the adaptive item-compression schedule.

    ``length`` items are split into groups of ``group_size``; each group is
    compressed to one token unless ``group_size == 1`` (kept raw).
    Mirrors the reference's early/mid/late split (kuaiformer model.py:131-137).
    """

    length: int
    group_size: int

    @property
    def num_tokens(self) -> int:
        assert self.length % self.group_size == 0
        return self.length // self.group_size


@dataclass(frozen=True)
class RetrievalConfig:
    """KuaiFormer-capability retrieval tower config (kuaiformer config.py:9-59)."""

    # architecture (config.py:13-25)
    embed_dim: int = 128
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 512
    max_seq_len: int = 256
    num_query_tokens: int = 4
    dropout_rate: float = 0.1
    use_causal_mask: bool = False  # bidirectional single-prediction by default

    # adaptive compression schedule: 256 = 128(→2×64) + 80(→5×16) + 48 raw
    # (kuaiformer model.py:96-178; translation:125-157). 55 output tokens.
    compression_schedule: Tuple[Tuple[int, int], ...] = ((128, 64), (80, 16), (48, 1))
    compression_layers: int = 1  # depth of per-group bidirectional encoder

    # feature vocabularies (config.py:34-42)
    video_vocab_size: int = 10_000_000
    category_vocab_size: int = 10_000
    tag_vocab_size: int = 50_000
    duration_buckets: int = 1000
    max_duration_s: float = 300.0
    time_buckets: int = 1000

    # training (config.py:27-32)
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    warmup_steps: int = 10_000
    label_smoothing: float = 0.1
    batch_size: int = 256
    use_logq_correction: bool = True

    # inference (config.py:53-55)
    top_k: int = 1000

    # system flags — these actually gate behavior
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    use_remat: bool = False
    use_flash_attention: bool = False  # Pallas path; jnp reference path otherwise
    # touched-row-only updates for the big id tables (video/category/tag) —
    # mandatory at the 10M-video production vocab where dense AdamW traffic
    # on the table dwarfs the model (SURVEY.md §5.8 embedding-server analog).
    # Dense AdamW remains for everything else (incl. the small bucket tables).
    use_sparse_embedding_updates: bool = False
    sparse_embedding_lr: float = 0.05
    # "exact" (dedup + per-coordinate adagrad, optax-parity) or "rowwise"
    # (no-sort scatter, one accumulator scalar per row — production default)
    sparse_update_mode: str = "exact"
    # >0: compact history-grad rows to this static budget before the sparse
    # scatter (XLA scatter cost scales with update-array LENGTH, not writes
    # — ops/sparse_embed.compact_valid_rows). Set ≥ the dataset's max
    # per-batch real-row count; overflow rows are dropped and reported as
    # the sparse_dropped_rows metric.
    sparse_scatter_budget: int = 0

    def schedule_specs(self) -> List[CompressionGroupSpec]:
        return [CompressionGroupSpec(l, g) for l, g in self.compression_schedule]

    @property
    def num_compressed_tokens(self) -> int:
        return sum(s.num_tokens for s in self.schedule_specs())

    def __post_init__(self):
        assert sum(l for l, _ in self.compression_schedule) == self.max_seq_len, (
            "compression schedule must cover max_seq_len exactly"
        )
        assert self.sparse_update_mode in ("exact", "rowwise"), (
            self.sparse_update_mode
        )
        assert self.embed_dim % self.num_heads == 0

    to_dict = _asdict

    @classmethod
    def from_dict(cls, d):
        return _fromdict(cls, d)


@dataclass(frozen=True)
class RankingConfig:
    """OneTrans-capability ranking stack config (oneTrans config.py:9-117)."""

    # architecture (config.py:14-23)
    embed_dim: int = 384
    num_layers: int = 8
    num_heads: int = 4
    ffn_dim: int = 1536
    max_seq_len: int = 2048
    num_ns_tokens: int = 12
    dropout_rate: float = 0.1

    # pyramid token-pruning keep ratios, one per layer (config.py:30-33;
    # paper §3.4 translation:134-141 — tail queries over full K/V)
    pyramid_ratios: Tuple[float, ...] = (0.5, 0.3, 0.2, 0.1, 0.05, 0.03, 0.02, 0.01)

    # feature groups (config.py:54-64)
    user_features: Tuple[str, ...] = ("user_id", "age_bucket", "gender", "city")
    item_features: Tuple[str, ...] = ("item_id", "category", "brand", "price_bucket")
    context_features: Tuple[str, ...] = ("hour", "weekday", "device")
    sequence_features: Tuple[str, ...] = ("click_seq", "cart_seq", "purchase_seq")
    feature_vocab_sizes: Tuple[Tuple[str, int], ...] = (
        ("user_id", 1_000_000),
        ("age_bucket", 16),
        ("gender", 4),
        ("city", 1024),
        ("item_id", 1_000_000),
        ("category", 10_000),
        ("brand", 100_000),
        ("price_bucket", 64),
        ("hour", 24),
        ("weekday", 7),
        ("device", 8),
    )
    feature_embed_dim: int = 64  # raw per-feature embedding before tokenizer
    seq_item_feature_dim: int = 64  # per-item input feature width for S-tokens

    # tasks (config.py:36-37)
    tasks: Tuple[str, ...] = ("ctr", "cvr")
    task_head_hidden: int = 128
    # per-task output-bias init (same order as `tasks`), e.g. the label-prior
    # logit log(p/(1-p)). With the default zero bias the whole network spends
    # its first epoch dragging every logit to the (rare-positive) prior —
    # large correlated gradients through the trunk and embedding tables that
    # measurably flip the training trajectory into a stall basin at low base
    # rates (round-5 replica-v2 probes). Standard CTR-model practice.
    task_logit_bias_init: Optional[Tuple[float, ...]] = None

    # LLM4Rec semantic side-features (llm4rec/semantic_distill/readme.md):
    # precomputed dense embeddings (distilled offline from an LLM) fed into
    # the NS tokenizer alongside categorical features. (name, dim) pairs.
    semantic_features: Tuple[Tuple[str, int], ...] = ()

    # dual optimizer (config.py:39-52; paper §4.1.4 translation:190)
    dense_optimizer: str = "rmsprop"  # rmsprop | adam | adamw
    # decoupled weight decay for dense_optimizer="adamw" (size it against
    # dense_lr: effective per-step decay is lr·wd). Motivated by the
    # round-4 instability study — dense param norm growth accelerates 3×
    # into the L geometry's learn-then-collapse window while logits
    # compress (instrumented via RankingTrainer(debug_metrics=True)) — but
    # NOT yet a demonstrated fix: full-scale trajectories are bistable and
    # a wd-perturbed run landed in the stall basin (BASELINE.md L row).
    dense_weight_decay: float = 1e-4
    dense_lr: float = 0.005
    # "constant" (reference parity) or "cosine" (warmup→cosine decay over the
    # trainer's total_steps — the convergence-study schedule; requires the
    # trainer to be constructed with total_steps)
    dense_lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    dense_momentum: float = 0.99999
    sparse_optimizer: str = "adagrad"
    sparse_lr: float = 0.1
    # sparse-LR ramp: linear from sparse_lr_init → sparse_lr over
    # sparse_lr_warmup_steps steps (0 disables; init > final gives a
    # warm-down). Motivation (round-4/5 stability study): adagrad's FIRST
    # touched-row steps fire against random-dense-net gradients and burn
    # their g² into the accumulators, locking item-embedding geometry —
    # the mechanism behind the (seed, config) convergence-basin lottery.
    # Ramping the sparse LR while the dense net finds its geometry is the
    # measured fix (quality_r05 seed sweep).
    sparse_lr_init: float = 0.0
    sparse_lr_warmup_steps: int = 0
    gradient_clip_norm: float = 90.0
    batch_size: int = 256

    # system flags (config.py:66-69) — implemented, not decorative.
    # use_kv_cache gates the serving engine's S-trunk KV cache
    # (RankingInferenceEngine.score_request / score_session): on ⇒ S-side
    # encoded once per request + NS-only per candidate; off ⇒ full forward
    # per candidate batch (measured 12× slower at 100 candidates/request).
    # Default True matches the reference (oneTrans config.py:67).
    use_mixed_precision: bool = True
    use_kv_cache: bool = True
    use_flash_attention: bool = False
    use_remat: bool = False
    # touched-row-only embedding updates (the "sparse embedding server"
    # capability, SURVEY.md §5.8) — O(N·D) instead of O(V·D) per step
    use_sparse_embedding_updates: bool = False
    # "exact": dedup + per-coordinate adagrad, bit-matches optax.adagrad.
    # "rowwise": no-sort scatter-add + one accumulator scalar per row (the
    # production TPU-embedding optimizer) — much faster; [V] opt state.
    sparse_update_mode: str = "exact"
    # >0: compact sequence-grad rows to this static budget before the sparse
    # scatter (see RetrievalConfig.sparse_scatter_budget)
    sparse_scatter_budget: int = 0
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # storage dtype of the big id-embedding tables (gathers/scatters are
    # HBM-bound; bf16 halves their traffic). f32 default = exact optimizer
    # semantics; bf16 rounds each sparse update to 8 mantissa bits.
    embedding_table_dtype: str = "float32"

    def __post_init__(self):
        assert len(self.pyramid_ratios) == self.num_layers, (
            "one pyramid keep-ratio per layer"
        )
        assert self.embed_dim % self.num_heads == 0
        assert self.sparse_update_mode in ("exact", "rowwise"), (
            self.sparse_update_mode
        )

    def vocab_size(self, feature: str) -> int:
        return dict(self.feature_vocab_sizes)[feature]

    @property
    def active_compute_dtype(self) -> str:
        """compute_dtype when mixed precision is on, else float32 — the
        `use_mixed_precision` flag gates behavior (unlike the reference's
        decorative flag, oneTrans config.py:66)."""
        return self.compute_dtype if self.use_mixed_precision else "float32"

    @property
    def non_seq_features(self) -> Tuple[str, ...]:
        return self.user_features + self.item_features + self.context_features

    to_dict = _asdict

    @classmethod
    def from_dict(cls, d):
        return _fromdict(cls, d)


# ---------------------------------------------------------------------------
# Presets (reference: oneTrans config.py:85-117 named registry;
# kuaiformer has implicit small config in examples/train_example.py quick_start)
# ---------------------------------------------------------------------------

def retrieval_base() -> RetrievalConfig:
    return RetrievalConfig()


def retrieval_flagship() -> RetrievalConfig:
    """The production-scale KuaiFormer config the perf scoreboard tracks:
    10M-video vocab (the paper's production corpus scale, translation:214),
    256-item sequences compressed to 55 tokens, touched-row sparse updates.
    `sparse_scatter_budget` is ON here — at V=10M the XLA scatter+accum
    round-trip scales with the update-array LENGTH, and compacting the
    ~59k-row gradient array to the 16,384 real rows is a measured step-time
    win (examples/flagship_bench.py reproduces it; docs/PERF.md records it).
    The budget covers the synthetic/industrial length distribution (mean ~30
    of 256 positions real); overflow rows are dropped and surfaced via the
    `sparse_dropped_rows` metric."""
    return RetrievalConfig(
        use_sparse_embedding_updates=True,
        sparse_update_mode="rowwise",
        sparse_scatter_budget=16_384,
        use_flash_attention=False,  # 55-token streams: XLA path measured faster
    )


def retrieval_small() -> RetrievalConfig:
    return RetrievalConfig(
        embed_dim=64,
        num_layers=2,
        num_heads=4,
        ffn_dim=128,
        max_seq_len=64,
        compression_schedule=((32, 16), (16, 8), (16, 1)),
        video_vocab_size=10_000,
        category_vocab_size=100,
        tag_vocab_size=500,
        warmup_steps=100,
        batch_size=64,
        top_k=100,
    )


def ranking_base() -> RankingConfig:
    return RankingConfig()


def ranking_small() -> RankingConfig:
    # mirrors OneTransSmallConfig (oneTrans config.py:85-95)
    return RankingConfig(
        embed_dim=128,
        num_layers=4,
        num_heads=4,
        ffn_dim=512,
        max_seq_len=256,
        num_ns_tokens=8,
        pyramid_ratios=(0.5, 0.25, 0.12, 0.05),
        feature_vocab_sizes=(
            ("user_id", 100_000),
            ("age_bucket", 16),
            ("gender", 4),
            ("city", 1024),
            ("item_id", 100_000),
            ("category", 1000),
            ("brand", 10_000),
            ("price_bucket", 64),
            ("hour", 24),
            ("weekday", 7),
            ("device", 8),
        ),
    )


def ranking_large() -> RankingConfig:
    # mirrors OneTransLargeConfig (oneTrans config.py:97-104): deeper/wider
    return RankingConfig(
        embed_dim=512,
        num_layers=12,
        num_heads=8,
        ffn_dim=2048,
        pyramid_ratios=(
            0.6, 0.45, 0.3, 0.2, 0.12, 0.08, 0.05, 0.03, 0.02, 0.015, 0.01, 0.01,
        ),
    )


_PRESETS = {
    "retrieval_base": retrieval_base,
    "retrieval_flagship": retrieval_flagship,
    "retrieval_small": retrieval_small,
    "ranking_base": ranking_base,
    "ranking_small": ranking_small,
    "ranking_large": ranking_large,
}


def get_config(name: str, **overrides):
    """Named preset registry with attribute overrides.

    Parity with ``get_model_config('small'|'default'|'large')``
    (oneTrans config.py:106-117), extended to both model families.
    """
    if name not in _PRESETS:
        raise KeyError(f"unknown config preset {name!r}; have {sorted(_PRESETS)}")
    cfg = _PRESETS[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def save_config(cfg, path: str) -> None:
    with open(path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=2)


def load_config(path: str):
    with open(path) as f:
        d = json.load(f)
    cls = {"RetrievalConfig": RetrievalConfig, "RankingConfig": RankingConfig}[
        d["__config_class__"]
    ]
    return cls.from_dict(d)
