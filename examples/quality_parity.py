"""Quality-parity run on the statistical-replica dataset configs.

THE reproducible script behind BASELINE.md's quality rows (VERDICT round-2
item 1): no dataset file is reachable in this environment (zero egress), so
quality is measured on full-scale statistical replicas of the BASELINE.json
dataset configs (`recommend_tpu.data.replica`):

  - ML-1M replica (retrieval): 6,040 users / 3,706 items / ≈1M events,
    BERT4Rec leave-one-out protocol, full-corpus Recall@K / NDCG@K / MRR
    vs a popularity baseline. Reference anchors: the kuaiformer README's
    synthetic-data table (recall/bert_like/kuaiformer/practice/
    README.md:135-144 — whose numbers come from an unrunnable script
    evaluated on training data) and the paper's production HR@K
    (translation/complete_translation.md:239-246).
  - OneTrans industrial replica (ranking): density-matched version of the
    paper's setting (29.1B impressions / 27.9M users / 10.2M items,
    translation:168-175); OneTrans-S-like model vs the paper's actual
    Table-2 comparator class — a sequence-aware DCNv2+DIN baseline
    (models/din.py; translation:199-207) — plus a sequence-BLIND NS-only
    anchor, CTR/CVR AUC + UAUC on a train-on-past / eval-on-future split,
    per-epoch convergence curves, and the generator's oracle anchors
    (latent-Bayes and observable fixed-form logits).

Usage (real TPU):
  PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon \
      python examples/quality_parity.py --track both --output quality.json
  --scale small  runs a fast smoke version (CI-sized).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import Optional
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# ---------------------------------------------------------------------------
# ML-1M replica track
# ---------------------------------------------------------------------------

def run_ml1m(scale: str, seed: int = 0) -> dict:
    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.data.datasets import leave_one_out_split
    from recommend_tpu.data.pipeline import prefetch, retrieval_batches
    from recommend_tpu.data.replica import leave_one_out_batches, make_ml1m_replica
    from recommend_tpu.evaluation.retrieval_eval import RetrievalEvaluator
    from recommend_tpu.training.trainer import RetrievalTrainer

    full_scale = scale == "full"
    num_users = 6040 if full_scale else 300
    steps = 8000 if full_scale else 120
    batch = 256 if full_scale else 64
    arch = {} if full_scale else dict(
        embed_dim=64, num_layers=2, num_heads=2, ffn_dim=128,
        max_seq_len=64, compression_schedule=((32, 16), (32, 1)),
    )
    cfg = get_config(
        "retrieval_base",
        video_vocab_size=4000,
        category_vocab_size=20,
        tag_vocab_size=512,
        batch_size=batch,
        warmup_steps=min(1000, steps // 4),
        dropout_rate=0.1,
        top_k=100,
        **arch,
    )
    _log(f"ml1m-replica: generating ({num_users} users)")
    data = make_ml1m_replica(cfg, num_users=num_users, seed=seed)
    n_events = sum(len(s["video_id"]) for s in data.user_sequences)
    train, test = leave_one_out_split(data)
    _log(f"ml1m-replica: {n_events} events, training {steps} steps")

    trainer = RetrievalTrainer(cfg, total_steps=steps)
    t0 = time.time()
    state = trainer.train(
        prefetch(retrieval_batches(train, cfg, batch, seed=seed), size=4),
        num_steps=steps,
        log_every=max(steps // 10, 1),
    )
    train_s = time.time() - t0

    evaluator = RetrievalEvaluator(cfg, trainer.model, state.params)
    # leave-one-out: ONE sample per user, target = held-out last event.
    # leave_one_out_batches marks padded duplicate rows via `num_real` and
    # evaluate_retrieval excludes them, so any batch size is exact
    metrics = evaluator.evaluate_retrieval(
        test, leave_one_out_batches(test, cfg, batch),
        ks=(1, 5, 10, 50, 100),
    )
    # popularity baseline under the same protocol
    ks = (1, 5, 10, 50, 100)
    order = np.argsort(-data.popularity)
    pop_rank = np.empty(len(order), dtype=np.int64)
    pop_rank[order] = np.arange(len(order))
    targets = np.array(
        [s["video_id"][-1] for s in test.user_sequences if len(s["video_id"]) >= 2]
    )
    pop_baseline = {
        f"recall@{k}": float((pop_rank[targets] < k).mean()) for k in ks
    }
    return {
        "config": "KuaiFormer-base 6L d=128 seq256→55 on ML-1M replica "
                  f"({num_users} users, {n_events} events, leave-one-out)",
        "scale": scale,
        "train_steps": steps,
        "train_seconds": round(train_s, 1),
        "metrics": metrics,
        "popularity_baseline": pop_baseline,
        "reference_anchors": {
            "readme_synthetic_recall@10": 0.352,
            "readme_synthetic_recall@50": 0.681,
            "readme_synthetic_ndcg@10": 0.285,
            "anchor_note": "README numbers (kuaiformer practice/README.md:139-141)"
                           " come from an unrunnable script evaluated on training"
                           " data; paper production HR@K (translation:239-246) are"
                           " against a 10M+-item corpus. Replica numbers use an"
                           " honest held-out protocol on a 3.7k-item corpus —"
                           " directly comparable only to the popularity baseline"
                           " and across our own rounds.",
        },
    }


# ---------------------------------------------------------------------------
# OneTrans industrial replica track
# ---------------------------------------------------------------------------

# Replica v2 weights — calibrated at the board's full scale (5,000u/2,000i/
# 5M impressions, seed 0): CTR base rate 0.163, observable ceiling 0.7957
# (v1 measures 0.7919 at the same scale — both in the paper's 0.796-0.808
# CTR-AUC band), latent Bayes 0.8354, CVR ceilings (0.893, 0.855). Signal
# mass shifts from the DIN-form match term (w_match 5.5 → 2.0) onto the
# order/cross axes a positionless per-sequence pool cannot fully extract.
REPLICA_V2 = dict(
    signal_weights=(3.5, 2.0, -0.8, 0.5, -3.3),
    signal_weights_v2=(2.2, 2.8),
)


def run_onetrans(
    scale: str,
    seed: int = 0,
    epochs: int = 3,
    geometry: str = "S",
    baselines: tuple = ("ns_only", "din"),
    mesh_devices: int = 0,
    dense_lr: float = 1e-3,
    clip_norm: float = 90.0,
    sparse_lr: float = 0.02,
    sparse_lr_init: float = 0.0,
    sparse_warmup_epochs: float = 0.0,
    weight_decay: float = 0.0,
    replica_version: str = "v1",
    val_frac: float = 0.05,
    v2_overrides: Optional[dict] = None,
    bias_init: bool = False,
    din_epochs: int = 0,
) -> dict:
    """``mesh_devices`` > 0 trains under a data-parallel mesh of that many
    devices (virtual CPU devices in CI — the multi-chip quality proof;
    tests/test_parallel.py::test_quality_small_dp_mesh_matches_single_device
    asserts mesh == single-device metrics end-to-end).

    Round-5 protocol additions:
      - ``val_frac`` > 0 carves a time-ordered held-out VALIDATION split
        (train < val < test) used for per-epoch curves and non-oracle
        best-checkpoint selection, applied identically to every model
        (the reference's own early stopping, oneTrans train.py:264-267);
        reported ``selected`` metrics come from the best-val checkpoint
        evaluated on the untouched test split.
      - ``sparse_lr_init``/``sparse_warmup_epochs``: the sparse-LR ramp
        (config.sparse_lr_warmup_steps) — the seed-robustness recipe.
      - ``weight_decay`` > 0 switches the dense optimizer to adamw with
        masked decoupled decay (matrix params only).
      - ``replica_version`` = "v2": the generator plants long-range-order
        and cross-behavior-interaction signal (data.replica docstring) —
        the axes the paper's Table 3 attributes to the transformer."""
    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import prefetch, ranking_batches
    from recommend_tpu.data.replica import make_onetrans_replica
    from recommend_tpu.evaluation.ranking_eval import RankingEvaluator
    from recommend_tpu.models.din import DINRankingModel
    from recommend_tpu.training.metrics import exact_auc
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    full_scale = scale == "full"
    # DENSITY-matched scaling (the honest axis): the paper's dataset has
    # ≈1,043 impressions/user and ≈2,853/item (29.1B / 27.9M / 10.2M,
    # translation:168-175). Shrinking only the impression count (round-2's
    # plan) starves items to ~10 impressions each and nothing can learn the
    # latent structure (measured: AUC stuck at 0.54). We preserve density
    # (≈1,000/user, ≈2,500/item) at reduced cardinality; embedding-table
    # CARDINALITY is exercised separately by the perf benches (V=1M/10M).
    num_users = 5_000 if full_scale else 150
    num_items = 2_000 if full_scale else 400
    num_impressions = 5_000_000 if full_scale else 50_000
    stream_kw = dict(stream_len_loc=4.8, stream_len_scale=0.8) if full_scale else {}
    batch = 512 if full_scale else 128

    # bf16 matmuls are TPU-native; the CPU backend (small-scale smoke runs)
    # lacks the BF16×BF16 dot kernel
    on_tpu = jax.default_backend() not in ("cpu",)
    # S = OneTrans-S-like (6L d=256); L = the paper's OneTrans-L geometry
    # (8L d=384 FFN 1536, translation:207 — heads=3 so Dh=128 matches the
    # lane-aligned flash kernels; the paper's 4 heads give Dh=96)
    geo = {
        "S": dict(embed_dim=256, num_layers=6, num_heads=2, ffn_dim=1024,
                  pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03)),
        "L": dict(embed_dim=384, num_layers=8, num_heads=3, ffn_dim=1536,
                  pyramid_ratios=(0.5, 0.3, 0.2, 0.1, 0.05, 0.03, 0.02, 0.01)),
    }[geometry]
    base = dict(
        **geo,
        num_ns_tokens=12,
        batch_size=batch, use_mixed_precision=on_tpu, dropout_rate=0.0,
        feature_embed_dim=128, seq_item_feature_dim=128,
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
        use_flash_attention=on_tpu,
        feature_vocab_sizes=(
            ("user_id", num_users + 1), ("age_bucket", 16), ("gender", 4),
            ("city", 32), ("item_id", num_items + 1), ("category", 200),
            ("brand", 500), ("price_bucket", 16), ("hour", 24),
            ("weekday", 7), ("device", 8),
        ),
        # the paper's production rmsprop(momentum .99999) diverges below
        # ~100M samples (measured round 1) — adam at CONSTANT lr.
        # Round-4 measured finding: full-scale training here is trajectory-
        # sensitive — constant 1e-3 learned in 3/3 runs (0.627→0.697 by
        # epoch 3, reproducing round 3), while cosine-decay variants (with
        # warmup, without warmup, and with clip 1.0) failed in 3/3 runs
        # (flat at chance, or epoch-1 learning that collapses), despite
        # per-step LR differing <0.1% in the early epochs. The cosine
        # schedule remains available (dense_lr_schedule="cosine") but the
        # quality board uses the reproducibly-stable constant recipe.
        # The L geometry (8L d=384) additionally needs --lr 5e-4 (grad-norm
        # spikes to 206 at 1e-3).
        dense_optimizer="adamw" if weight_decay > 0 else "adam",
        dense_weight_decay=weight_decay,
        dense_lr=dense_lr, dense_momentum=0.9,
        gradient_clip_norm=clip_norm,
        # sparse_lr 0.02 (not the paper's 0.1 or round-3's 0.05): the
        # round-4 basin probe — adagrad's first steps at 0.05 lock in bad
        # item-embedding geometry on some seeds (seed-1 stalled at chance
        # for 10 epochs at 0.05; at 0.02 the SAME seed converges faster and
        # higher than seed-0-at-0.05 ever did: 0.716@ep1 vs 0.627)
        sparse_lr=sparse_lr,
        sparse_lr_init=sparse_lr_init,
    )
    cfg = get_config("ranking_base", **base)
    _log(f"onetrans-replica: generating ({num_users}u/{num_items}i/"
         f"{num_impressions} impressions, {replica_version})")
    dbg = {}
    t0 = time.time()
    gen_kw = dict(REPLICA_V2) if replica_version == "v2" else {}
    if gen_kw and v2_overrides:
        aff, match, price, hour, alpha = gen_kw["signal_weights"]
        order, cross = gen_kw["signal_weights_v2"]
        match = v2_overrides.get("match", match)
        alpha = v2_overrides.get("alpha", alpha)
        order = v2_overrides.get("order", order)
        cross = v2_overrides.get("cross", cross)
        gen_kw["signal_weights"] = (aff, match, price, hour, alpha)
        gen_kw["signal_weights_v2"] = (order, cross)
        _log(f"v2 weight overrides: {gen_kw}")
    datasets = make_onetrans_replica(
        cfg, num_users=num_users, num_items=num_items,
        num_impressions=num_impressions, seed=seed, debug_out=dbg,
        val_frac=val_frac, **gen_kw, **stream_kw,
    )
    if val_frac > 0:
        tr_data, val_data, ev_data = datasets
    else:
        tr_data, ev_data = datasets
        val_data = ev_data  # legacy curve source; no checkpoint selection
    gen_s = time.time() - t0
    ev_mask = dbg["is_eval"]
    bayes = exact_auc(dbg["bayes_logit"][ev_mask], dbg["y_ctr"][ev_mask])
    observable = exact_auc(dbg["observable_logit"][ev_mask], dbg["y_ctr"][ev_mask])
    bayes_cvr = exact_auc(dbg["bayes_cvr_score"][ev_mask], dbg["y_cvr"][ev_mask])
    observable_cvr = exact_auc(
        dbg["observable_cvr_score"][ev_mask], dbg["y_cvr"][ev_mask]
    )
    steps_per_epoch = tr_data.num_samples // batch
    _log(f"onetrans-replica: train={tr_data.num_samples} val="
         f"{val_data.num_samples if val_frac > 0 else 0} eval="
         f"{ev_data.num_samples} latent_bayes={bayes:.4f} "
         f"observable_ceiling={observable:.4f} "
         f"cvr_ceilings=({bayes_cvr:.4f},{observable_cvr:.4f}) "
         f"gen={gen_s:.0f}s; {steps_per_epoch} steps/epoch × batch {batch}")
    sparse_warmup_steps = int(round(sparse_warmup_epochs * steps_per_epoch))
    if sparse_warmup_steps:
        # into `base` too, so the ns_only anchor config below inherits it
        base["sparse_lr_warmup_steps"] = sparse_warmup_steps
        cfg = get_config("ranking_base", **base)
    if bias_init:
        # label-prior head-bias init (round-5 stabilizer): start every
        # model's task logits at the TRAIN split's base-rate logit. With a
        # zero bias the first epoch's gradients are dominated by dragging
        # all logits to the rare-positive prior — measured to flip
        # low-base-rate runs (replica v2, base 0.163) into a stall basin on
        # every seed probed. Applied identically to OneTrans and DIN.
        rates = [float(tr_data.labels[t].mean()) for t in cfg.tasks]
        priors = tuple(
            float(np.log(max(r, 1e-6) / max(1.0 - r, 1e-6))) for r in rates
        )
        base["task_logit_bias_init"] = priors
        cfg = get_config("ranking_base", **base)
        _log(f"label-prior head bias init: {dict(zip(cfg.tasks, priors))}")

    # capped val subset for the per-epoch convergence curve + checkpoint
    # selection (streaming AUC; final numbers use the full TEST split +
    # exact AUC at both the final and the selected checkpoint)
    curve_batches = min(100, val_data.num_samples // batch)

    def train_and_eval(cfg, tag, n_epochs, model=None):
        import dataclasses as _dc

        steps = n_epochs * steps_per_epoch
        # NO dense-LR warmup either (measured: a 1000-step warmup drops
        # epoch-1 CTR AUC 0.627→0.522 — while the dense net idles at near-
        # zero LR the sparse tables train at full adagrad LR against
        # random-net gradients, burning grad² into their accumulators);
        # see the constant-LR note on `base` above.
        cfg = _dc.replace(cfg, lr_warmup_steps=0)
        mesh = None
        if mesh_devices:
            from recommend_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(data=mesh_devices)
        t0 = time.time()
        trainer = RankingTrainer(cfg, model=model, total_steps=steps, mesh=mesh)

        def val_fn():
            return itertools.islice(
                ranking_batches(val_data, cfg, batch, seed=1, num_epochs=1),
                curve_batches,
            )

        state = trainer.train(
            prefetch(ranking_batches(tr_data, cfg, batch, seed=seed), size=4),
            num_steps=steps,
            val_fn=val_fn,
            eval_every=steps_per_epoch,
            log_every=max(steps // 10, 1),
            track_best_params=val_frac > 0,
        )
        train_s = time.time() - t0
        n_eval_batches = ev_data.num_samples // batch

        def full_test_eval(params):
            ev = RankingEvaluator(cfg, trainer.model, params)
            return ev.evaluate(
                itertools.islice(
                    ranking_batches(ev_data, cfg, batch, seed=1, num_epochs=1),
                    n_eval_batches,
                )
            )

        m = full_test_eval(state.params)
        _log(f"{tag} (final): " + json.dumps(
            {k: round(v, 5) for k, v in m.items()
             if "auc" in k or "uauc" in k or k == "num_samples"}))
        m["train_seconds"] = round(train_s, 1)
        m["train_epochs"] = n_epochs
        m["examples_per_s"] = round(steps * batch / train_s, 1)
        if trainer.best_params is not None:
            # non-oracle checkpoint selection: the best-validation epoch's
            # params (selection on the held-out val split), evaluated on
            # the untouched test split — identical rule for every model
            sel_epoch = trainer.best_val_step // steps_per_epoch
            if trainer.best_val_step == steps:
                sel = dict(m)  # final epoch selected — reuse the eval
                sel = {k: v for k, v in sel.items()
                       if k not in ("train_seconds", "train_epochs",
                                    "examples_per_s", "convergence_curve")}
            else:
                sel = full_test_eval(trainer.best_params)
            m["selected"] = sel
            m["selected_epoch"] = sel_epoch
            _log(f"{tag} (selected @ep{sel_epoch}): " + json.dumps(
                {k: round(v, 5) for k, v in sel.items()
                 if "auc" in k or "uauc" in k}))
        # per-epoch convergence curve (VERDICT round-3 item 1: the
        # diminishing-returns evidence; streaming AUC on the capped subset)
        m["convergence_curve"] = [
            {"epoch": j + 1,
             **{k: round(h[k], 5) for k in ("ctr_auc", "cvr_auc") if k in h}}
            for j, h in enumerate(trainer.history["val"])
        ]
        return m

    tag = f"OneTrans-{geometry}"

    def _partial_dump(payload):
        # crash/timeout hardening: a finished 16-epoch model run survives
        # even if a later baseline is cut off — the queue's timeout budget
        # covers the sum, not each model
        path = os.environ.get("QUALITY_PARTIAL_OUT")
        if path:
            with open(path, "w") as f:
                json.dump(payload, f, indent=2, default=float)

    full = train_and_eval(cfg, f"{tag} (full, sequences)", epochs)
    _partial_dump({"onetrans": full, "seed": seed})
    results = {}
    if "din" in baselines:
        # the paper's actual Table-2 comparator class: DCNv2 cross network +
        # DIN target attention over the behavior sequences — sequence-AWARE
        # (translation:199-207); models/din.py. ``din_epochs`` caps its
        # budget: DIN's best-val checkpoint lands at epoch ≤3 in every
        # observed run (round 4 + round 5), so extra epochs only move its
        # FINAL (post-peak-decline) number; the SELECTION rule — best-val
        # checkpoint on the identical split — is the same for every model.
        results["din"] = train_and_eval(
            cfg, "DCNv2+DIN baseline (sequence-aware)",
            min(epochs, din_epochs) if din_epochs else epochs,
            model=DINRankingModel(cfg),
        )
        _partial_dump({"onetrans": full, "din": results["din"], "seed": seed})
    if "ns_only" in baselines:
        # sequence-BLIND lower anchor (shows where the generator put the
        # signal; NOT the DCNv2+DIN comparator — that is `din` above)
        cfg_ns = get_config("ranking_base", **dict(base, sequence_features=()))
        results["ns_only"] = train_and_eval(
            cfg_ns, "NS-only anchor (sequence-blind)", min(epochs, 3)
        )
    ns = results.get("din") or results.get("ns_only") or {}

    def lift_block(a, b):
        out = {}
        for k in ("ctr_auc", "ctr_uauc", "cvr_auc", "cvr_uauc"):
            if k in a and k in b and b[k] == b[k] and b[k] != 0:
                out[k] = round((a[k] - b[k]) / abs(b[k]) * 100, 3)
        return out

    # headline lifts come from the SELECTED (best-val) checkpoints when the
    # protocol ran with a validation split — the honest comparison; the
    # fixed-final-epoch lifts stay reported alongside. ALL four task
    # metrics are included (CTR and CVR — no selective reporting).
    lifts = lift_block(full, ns)
    lifts_selected = (
        lift_block(full["selected"], ns["selected"])
        if "selected" in full and "selected" in ns else None
    )
    return {
        "config": f"OneTrans-{geometry} "
                  f"({geo['num_layers']}L d={geo['embed_dim']}, 12 NS, "
                  "pyramid, flash, sparse)"
                  " on the industrial replica, train-on-past/eval-on-future",
        "scale": scale,
        "geometry": geometry,
        "replica_version": replica_version,
        "recipe": {
            "seed": seed, "dense_lr": dense_lr, "clip": clip_norm,
            "sparse_lr": sparse_lr, "sparse_lr_init": sparse_lr_init,
            "sparse_warmup_epochs": sparse_warmup_epochs,
            "weight_decay": weight_decay, "val_frac": val_frac,
        },
        "dataset": {
            "num_users": num_users, "num_items": num_items,
            "train_impressions": tr_data.num_samples,
            "val_impressions": val_data.num_samples if val_frac > 0 else 0,
            "eval_impressions": ev_data.num_samples,
            "latent_bayes_ctr_auc": round(float(bayes), 5),
            "observable_ceiling_ctr_auc": round(float(observable), 5),
            "latent_bayes_cvr_auc": round(float(bayes_cvr), 5),
            "observable_ceiling_cvr_auc": round(float(observable_cvr), 5),
            "scale_note": "density-matched replica of the paper's setting"
                          " (29.1B/27.9M/10.2M, translation:168-175):"
                          " impressions/user and impressions/item preserved"
                          " at ~5800× lower cardinality; replica statistics,"
                          " not real logs. The observable ceiling (oracle"
                          " that sees history latents) is calibrated to the"
                          " paper's CTR-AUC band; the meaningful comparisons"
                          " are distance-to-ceiling and full-vs-NS-only"
                          " lift. Embedding-table cardinality is exercised"
                          " by the perf benches (V=1M/10M), not here.",
        },
        "onetrans": full,
        "din_baseline": results.get("din"),
        "ns_only_baseline": results.get("ns_only"),
        "lift_vs_baseline_pct": lifts,
        "lift_vs_baseline_pct_selected": lifts_selected,
        "lift_baseline": ("din" if "din" in results else "ns_only"),
        "reference_anchors": {
            "baseline_ctr_auc": 0.79623, "baseline_ctr_uauc": 0.71927,
            "baseline_cvr_auc": 0.90361, "baseline_cvr_uauc": 0.71955,
            "onetrans_L_lift_pct": {"ctr_auc": 1.53, "ctr_uauc": 2.79,
                                    "cvr_auc": 1.14, "cvr_uauc": 3.23},
            "source": "translation/complete_translation.md:199-207 (Table 2)",
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", choices=("ml1m", "onetrans", "both"),
                    default="both")
    ap.add_argument("--scale", choices=("small", "full"), default="full")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=3,
                    help="onetrans-replica training epochs")
    ap.add_argument("--geometry", choices=("S", "L"), default="S",
                    help="OneTrans model geometry (L = paper's 8L d=384)")
    ap.add_argument("--baselines", default="ns_only,din",
                    help="comma list from {ns_only,din}; empty for none")
    ap.add_argument("--mesh", type=int, default=0,
                    help="train the onetrans track under a data-parallel "
                         "mesh of N devices (virtual CPU mesh in CI)")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="dense (adam) peak LR for the onetrans track")
    ap.add_argument("--clip", type=float, default=90.0,
                    help="global-norm gradient clip (paper default 90; the "
                         "L geometry's learn-then-collapse instability "
                         "motivates a tighter clip)")
    ap.add_argument("--sparse-lr", type=float, default=0.02,
                    help="touched-row adagrad LR for the embedding tables "
                         "(0.05 is bistable across seeds — see run_onetrans)")
    ap.add_argument("--sparse-lr-init", type=float, default=0.0,
                    help="sparse-LR ramp start (with --sparse-warmup-epochs)")
    ap.add_argument("--sparse-warmup-epochs", type=float, default=0.0,
                    help="ramp sparse LR from --sparse-lr-init to "
                         "--sparse-lr over this many epochs (0 = constant)")
    ap.add_argument("--wd", type=float, default=0.0,
                    help=">0 switches the dense optimizer to adamw with "
                         "masked decoupled weight decay (matrix params only)")
    ap.add_argument("--replica", choices=("v1", "v2"), default="v1",
                    help="v2 plants long-range-order + cross-behavior "
                         "signal (data.replica docstring)")
    ap.add_argument("--v2-w-match", type=float, default=None,
                    help="override REPLICA_V2's match weight (calibration)")
    ap.add_argument("--v2-order", type=float, default=None,
                    help="override REPLICA_V2's order weight")
    ap.add_argument("--v2-cross", type=float, default=None,
                    help="override REPLICA_V2's cross-behavior weight")
    ap.add_argument("--v2-alpha", type=float, default=None,
                    help="override REPLICA_V2's intercept (base rate)")
    ap.add_argument("--din-epochs", type=int, default=0,
                    help="epoch cap for the DIN comparator (0 = same as "
                         "--epochs); its best-val peak is epoch <=3 in every"
                         " observed run")
    ap.add_argument("--bias-init", action="store_true",
                    help="label-prior head-bias init. Round-5 probes: did "
                         "NOT rescue the replica-v2 stall, and runs with it "
                         "collapsed at epoch 2 on BOTH replicas (v1+wd, "
                         "v2-tuned) — off by default pending the J-probe "
                         "isolation")
    ap.add_argument("--val-frac", type=float, default=0.05,
                    help="held-out validation slice (time-ordered, before "
                         "the test tail) for curves + non-oracle "
                         "checkpoint selection; 0 = legacy protocol")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import jax

    report = {"device": str(jax.devices()[0]), "seed": args.seed}
    if args.track in ("ml1m", "both"):
        report["ml1m_replica"] = run_ml1m(args.scale, args.seed)
    if args.track in ("onetrans", "both"):
        report["onetrans_replica"] = run_onetrans(
            args.scale, args.seed, args.epochs, args.geometry,
            tuple(b for b in args.baselines.split(",") if b),
            mesh_devices=args.mesh,
            dense_lr=args.lr,
            clip_norm=args.clip,
            sparse_lr=args.sparse_lr,
            sparse_lr_init=args.sparse_lr_init,
            sparse_warmup_epochs=args.sparse_warmup_epochs,
            weight_decay=args.wd,
            replica_version=args.replica,
            val_frac=args.val_frac,
            v2_overrides={
                k: v for k, v in (
                    ("match", args.v2_w_match), ("order", args.v2_order),
                    ("cross", args.v2_cross), ("alpha", args.v2_alpha),
                ) if v is not None
            } or None,
            bias_init=args.bias_init,
            din_epochs=args.din_epochs,
        )
    print(json.dumps(report, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, default=float)
        _log(f"wrote {args.output}")


if __name__ == "__main__":
    main()
