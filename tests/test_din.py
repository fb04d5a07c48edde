"""DCNv2+DIN baseline tests (models/din.py — the paper's Table-2 comparator,
rank/scaling_up/oneTrans/translation/complete_translation.md:199-207).

The baseline must (a) expose RankingModel's exact interface so the trainer /
evaluator swap models freely, (b) train through the sparse-embedding dummy
path, and (c) actually use the sequence (target attention responds to
history content)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import ranking_batches
from recommend_tpu.data.replica import make_onetrans_replica
from recommend_tpu.models.din import DINRankingModel
from recommend_tpu.training.ranking_trainer import RankingTrainer


def din_cfg(**kw):
    base = dict(
        embed_dim=32, num_layers=2, num_heads=2, ffn_dim=64, num_ns_tokens=4,
        pyramid_ratios=(0.5, 0.25),
        feature_vocab_sizes=(
            ("user_id", 300), ("age_bucket", 16), ("gender", 4), ("city", 32),
            ("item_id", 500), ("category", 200), ("brand", 500),
            ("price_bucket", 16), ("hour", 24), ("weekday", 7), ("device", 8),
        ),
        feature_embed_dim=8, seq_item_feature_dim=8,
        use_mixed_precision=False, dropout_rate=0.0,
        dense_optimizer="adam", dense_lr=2e-3, dense_momentum=0.9,
        sparse_lr=0.05,
    )
    base.update(kw)
    return get_config("ranking_small", **base)


@pytest.fixture(scope="module")
def din_setup():
    cfg = din_cfg()
    tr, ev = make_onetrans_replica(
        cfg, num_users=150, num_items=400, num_impressions=20_000, seed=0
    )
    return cfg, tr, ev


def _first_batch(data, cfg, bs=32):
    return next(iter(ranking_batches(data, cfg, bs, seed=0, num_epochs=1)))


def test_din_interface_and_shapes(din_setup):
    cfg, tr, _ = din_setup
    b = _first_batch(tr, cfg)
    model = DINRankingModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), b["non_seq"], b["sequences"], b["seq_valid"]
    )
    out = jax.jit(model.apply)(params, b["non_seq"], b["sequences"], b["seq_valid"])
    assert set(out) == set(cfg.tasks)
    for t in cfg.tasks:
        assert out[t].shape == (32,)
        assert np.all(np.isfinite(np.asarray(out[t])))
    # feature tables mount under `tokenizer` (the trainer's sparse split)
    tok = params["params"]["tokenizer"]
    assert "embed_seq_item" in tok and "embed_user_id" in tok


def test_din_attention_uses_sequence(din_setup):
    """Target attention must respond to history content: permuting the
    click-seq ids across the batch changes the logits."""
    cfg, tr, _ = din_setup
    b = _first_batch(tr, cfg)
    model = DINRankingModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), b["non_seq"], b["sequences"], b["seq_valid"]
    )
    base = np.asarray(
        jax.jit(model.apply)(params, b["non_seq"], b["sequences"], b["seq_valid"])["ctr"]
    )
    rng = np.random.default_rng(0)
    perm = rng.permutation(32)
    seqs = dict(b["sequences"])
    sv = dict(b["seq_valid"])
    seqs["click_seq"] = np.asarray(seqs["click_seq"])[perm]
    sv["click_seq"] = np.asarray(sv["click_seq"])[perm]
    permuted = np.asarray(
        jax.jit(model.apply)(params, b["non_seq"], seqs, sv)["ctr"]
    )
    assert np.max(np.abs(base - permuted)) > 1e-4


def test_din_empty_sequence_pools_to_zero(din_setup):
    """All-invalid sequences contribute exactly-zero pooled vectors (no NaN
    from the masked softmax)."""
    cfg, tr, _ = din_setup
    b = _first_batch(tr, cfg)
    sv = {k: np.zeros_like(np.asarray(v)) for k, v in b["seq_valid"].items()}
    model = DINRankingModel(cfg)
    params = jax.jit(model.init)(jax.random.key(0), b["non_seq"], b["sequences"], sv)
    out = jax.jit(model.apply)(params, b["non_seq"], b["sequences"], sv)
    for t in cfg.tasks:
        assert np.all(np.isfinite(np.asarray(out[t])))


@pytest.mark.parametrize("sparse", [False, True])
def test_din_trains_and_learns(din_setup, sparse):
    cfg, tr, ev = din_setup
    cfg = dataclasses.replace(
        cfg,
        use_sparse_embedding_updates=sparse,
        sparse_update_mode="rowwise",
        batch_size=64,
    )
    trainer = RankingTrainer(cfg, model=DINRankingModel(cfg))
    state = trainer.train(
        ranking_batches(tr, cfg, 64, seed=0), num_steps=150, log_every=1000
    )
    if sparse:
        # the shared item table must have moved (gradient flows via dummies)
        t0 = trainer.model  # noqa: F841
        table = np.asarray(
            state.params["params"]["tokenizer"]["embed_seq_item"]["embedding"]
        )
        init_params = trainer.init_state(jax.random.key(0), _first_batch(tr, cfg, 64)).params
        # freshly-initialized table differs from the trained one
        assert not np.allclose(
            table,
            np.asarray(init_params["params"]["tokenizer"]["embed_seq_item"]["embedding"]),
        )
    m = trainer.evaluate(state, ranking_batches(ev, cfg, 64, seed=1, num_epochs=1))
    assert m["ctr_auc"] > 0.54, m


def test_cosine_dense_lr_schedule():
    from recommend_tpu.training.optimizer import make_ranking_optimizer

    cfg = din_cfg(dense_lr_schedule="cosine", lr_warmup_steps=10)
    with pytest.raises(AssertionError):
        make_ranking_optimizer(cfg)  # cosine needs total_steps
    opt = make_ranking_optimizer(cfg, total_steps=100)
    params = {"dense": jnp.ones(3)}
    st = opt.init(params)
    g = {"dense": jnp.ones(3)}
    # warmup step 0 → near-zero update; mid-schedule → larger
    u0, st = opt.update(g, st, params)
    u1, st = opt.update(g, st, params)
    assert float(jnp.abs(u0["dense"]).max()) < float(jnp.abs(u1["dense"]).max())


def test_din_query_gradient_reaches_sparse_dummies(din_setup):
    """The candidate-item query must read the dummy-added embeddings: the
    item-feature tables' TOTAL gradient under the dense path must equal the
    scattered dummy gradients of the sparse path. A dummies=None query
    lookup reads the stop-gradient'd tables and silently drops the
    query-path term from the sparse update, biasing the baseline's
    training (advisor round-4 medium finding)."""
    from recommend_tpu.models.losses import multi_task_bce_loss

    cfg, tr, _ = din_setup
    b = _first_batch(tr, cfg, bs=16)
    model = DINRankingModel(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), b["non_seq"], b["sequences"], b["seq_valid"]
    )

    def dense_loss(p):
        logits = model.apply(p, b["non_seq"], b["sequences"], b["seq_valid"])
        return multi_task_bce_loss(logits, b["labels"])[0]

    g_tok = jax.grad(dense_loss)(params)["params"]["tokenizer"]

    dummies = {
        f"ns_{f}": jnp.zeros(
            np.asarray(b["non_seq"][f]).shape + (cfg.feature_embed_dim,),
            jnp.float32,
        )
        for f in cfg.non_seq_features
    }
    dummies.update({
        f"seq_{sf}": jnp.zeros(
            np.asarray(b["sequences"][sf]).shape + (cfg.seq_item_feature_dim,),
            jnp.float32,
        )
        for sf in cfg.sequence_features
    })

    def sparse_loss(d):
        logits = model.apply(
            params, b["non_seq"], b["sequences"], b["seq_valid"], dummies=d
        )
        return multi_task_bce_loss(logits, b["labels"])[0]

    g_dummy = jax.grad(sparse_loss)(dummies)
    # every NS table: scatter the per-lookup dummy grads into table shape
    # and compare with the dense-table cotangent (item_id is the one the
    # query path feeds — the regression axis)
    for f in cfg.non_seq_features:
        table_g = np.asarray(g_tok[f"embed_{f}"]["embedding"])
        scat = np.zeros_like(table_g)
        np.add.at(scat, np.asarray(b["non_seq"][f]),
                  np.asarray(g_dummy[f"ns_{f}"]))
        np.testing.assert_allclose(scat, table_g, atol=2e-5, err_msg=f)
    # shared sequence item table
    table_g = np.asarray(g_tok["embed_seq_item"]["embedding"])
    scat = np.zeros_like(table_g)
    for sf in cfg.sequence_features:
        np.add.at(
            scat, np.asarray(b["sequences"][sf]).reshape(-1),
            np.asarray(g_dummy[f"seq_{sf}"]).reshape(-1, cfg.seq_item_feature_dim),
        )
    np.testing.assert_allclose(scat, table_g, atol=2e-5)
