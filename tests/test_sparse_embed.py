import pytest
"""Sparse embedding updates must exactly match dense adagrad."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommend_tpu.ops.sparse_embed import (
    dedup_sum,
    lookup_with_dummy,
    make_dummy,
    sparse_update_table,
)


def test_dedup_sum():
    ids = jnp.asarray([3, 1, 3, 7, 1, 1])
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    uids, summed = dedup_sum(ids, g, vocab=10)
    got = {}
    for u, row in zip(np.asarray(uids), np.asarray(summed)):
        if u < 10:
            got[int(u)] = row
    np.testing.assert_allclose(got[1], g[1] + g[4] + g[5])
    np.testing.assert_allclose(got[3], g[0] + g[2])
    np.testing.assert_allclose(got[7], g[3])
    assert set(got) == {1, 3, 7}
    # padding slots marked with vocab
    assert int(jnp.sum(uids == 10)) == 3


def test_sparse_matches_dense_adagrad():
    """One step of {dense grads + optax.adagrad} vs {dummy grads + sparse
    update} on a toy lookup loss — identical tables afterward."""
    rng = np.random.default_rng(0)
    v, d, n = 50, 8, 12
    lr = 0.1
    table0 = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n))
    target = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    # dense path
    def dense_loss(table):
        return jnp.sum(jnp.square(jnp.take(table, ids, axis=0) - target))

    opt = optax.adagrad(lr)
    state = opt.init(table0)
    g = jax.grad(dense_loss)(table0)
    upd, _ = opt.update(g, state, table0)
    dense_table = optax.apply_updates(table0, upd)

    # sparse path
    def sparse_loss(dummy):
        return jnp.sum(
            jnp.square(lookup_with_dummy(table0, ids, dummy) - target)
        )

    dummy = make_dummy(ids.shape, d, jnp.float32)
    dg = jax.grad(sparse_loss)(dummy)
    accum0 = jnp.full((v, d), 0.1, jnp.float32)
    sparse_table, accum1 = sparse_update_table(table0, accum0, ids, dg, lr)

    np.testing.assert_allclose(
        np.asarray(dense_table), np.asarray(sparse_table), rtol=1e-5, atol=1e-6
    )
    # untouched rows unchanged
    untouched = np.setdiff1d(np.arange(v), np.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(sparse_table)[untouched], np.asarray(table0)[untouched]
    )
    # accumulator only grew on touched rows
    np.testing.assert_allclose(np.asarray(accum1)[untouched], 0.1)


def test_two_steps_accumulate():
    """Accumulator must persist across steps (adagrad semantics)."""
    v, d = 10, 4
    table = jnp.ones((v, d))
    accum = jnp.full((v, d), 0.1)
    ids = jnp.asarray([2, 2, 5])
    g = jnp.ones((3, d))
    t1, a1 = sparse_update_table(table, accum, ids, g, lr=1.0)
    t2, a2 = sparse_update_table(t1, a1, ids, g, lr=1.0)
    # row 2 total grad per step = 2 → accum after 2 steps = 0.1 + 8
    np.testing.assert_allclose(np.asarray(a2)[2], 8.1, rtol=1e-6)
    # second-step delta smaller than first (growing accumulator)
    d1 = np.asarray(table - t1)[2, 0]
    d2 = np.asarray(t1 - t2)[2, 0]
    assert 0 < d2 < d1


@pytest.mark.slow
def test_ranking_trainer_sparse_matches_dense():
    """Full ranking train step: sparse-update path == dense-adagrad path."""
    import jax

    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.training.ranking_trainer import RankingTrainer
    from tests.test_ranking_model import tiny_ranking_cfg

    cfg_d = tiny_ranking_cfg(batch_size=8)
    cfg_s = tiny_ranking_cfg(batch_size=8, use_sparse_embedding_updates=True)
    data = make_ranking_data(cfg_d, num_samples=32, max_seq_per_feature=6, seed=0)
    batch = next(iter(ranking_batches(data, cfg_d, batch_size=8, num_epochs=1)))

    td = RankingTrainer(cfg_d)
    ts = RankingTrainer(cfg_s)
    sd = td.init_state(jax.random.key(0), batch)
    ss = ts.init_state(jax.random.key(0), batch)
    # identical initial params
    for a, b in zip(jax.tree_util.tree_leaves(sd.params),
                    jax.tree_util.tree_leaves(ss.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for i in range(3):
        sd, md = td._train_step(sd, td._put_batch(batch), jax.random.key(1))
        ss, ms = ts._train_step(ss, ts._put_batch(batch), jax.random.key(1))
    np.testing.assert_allclose(float(md["loss"]), float(ms["loss"]), rtol=1e-5)
    # all params (incl. embedding tables) match after 3 steps
    flat_d = jax.tree_util.tree_leaves_with_path(sd.params)
    flat_s = jax.tree_util.tree_leaves_with_path(ss.params)
    for (pa, a), (pb, b) in zip(flat_d, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=str(pa),
        )


@pytest.mark.slow
def test_retrieval_trainer_sparse_runs_and_learns():
    """Retrieval trainer with sparse id-table updates: trains, loss drops,
    only touched video rows change."""
    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.training.trainer import RetrievalTrainer

    cfg = get_config(
        "retrieval_small",
        embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64, max_seq_len=16,
        compression_schedule=((8, 4), (8, 1)), video_vocab_size=500,
        warmup_steps=5, batch_size=16, dropout_rate=0.0,
        compute_dtype="float32", use_sparse_embedding_updates=True,
        sparse_embedding_lr=0.05,
    )
    data = make_retrieval_data(cfg, num_users=40, num_videos=300, seed=0)
    it = retrieval_batches(data, cfg, batch_size=16, seed=0)
    trainer = RetrievalTrainer(cfg, total_steps=40)
    batch0 = next(it)
    state0 = trainer.init_state(jax.random.key(0), batch0)
    table0 = np.asarray(state0.params["params"]["embed"]["video_id"]["embedding"])
    state1, m = trainer._train_step(
        state0, trainer._put_batch(batch0), jax.random.key(0)
    )
    table1 = np.asarray(state1.params["params"]["embed"]["video_id"]["embedding"])
    touched = set(np.asarray(batch0["history"]["video_id"]).reshape(-1).tolist())
    touched |= set(np.asarray(batch0["target"]["video_id"]).tolist())
    changed = set(np.nonzero(np.abs(table1 - table0).max(axis=1) > 0)[0].tolist())
    # only touched rows changed (padding id 0 is in touched via left-pad zeros)
    assert changed <= touched, changed - touched
    assert len(changed) > 0
    # and training makes progress
    trainer2 = RetrievalTrainer(cfg, total_steps=40)
    it2 = retrieval_batches(data, cfg, batch_size=16, seed=1)
    trainer2.train(it2, num_steps=40, log_every=10)
    losses = [h["loss"] for h in trainer2.history["train"]]
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_retrieval_seq2seq_sparse_runs():
    import dataclasses

    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.training.trainer import RetrievalTrainer

    cfg = get_config(
        "retrieval_small",
        embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64, max_seq_len=16,
        compression_schedule=((8, 4), (8, 1)), video_vocab_size=500,
        warmup_steps=5, batch_size=8, dropout_rate=0.0,
        compute_dtype="float32", use_causal_mask=True,
        use_sparse_embedding_updates=True,
    )
    data = make_retrieval_data(cfg, num_users=20, num_videos=200, seed=0)
    it = retrieval_batches(data, cfg, batch_size=8, seed=0)
    trainer = RetrievalTrainer(cfg, total_steps=5, mode="seq2seq")
    state = trainer.init_state(jax.random.key(0), next(it))
    state, m = trainer._train_step(state, trainer._put_batch(next(it)), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_rowwise_fast_update_semantics():
    """sparse_rowwise_update_table: unique ids match hand-computed rowwise
    adagrad; duplicate ids accumulate additively via the scatter-add."""
    import jax.numpy as jnp

    from recommend_tpu.ops.sparse_embed import sparse_rowwise_update_table

    V, D, lr = 8, 4, 0.5
    table = jnp.ones((V, D), jnp.float32)
    accum = jnp.full((V,), 0.1, jnp.float32)

    # unique ids
    ids = jnp.array([1, 3])
    g = jnp.stack([jnp.full((D,), 2.0), jnp.full((D,), -1.0)])
    new_t, new_a = jax.jit(sparse_rowwise_update_table)(table, accum, ids, g, lr)
    # accum_row = 0.1 + mean(g^2)
    np.testing.assert_allclose(new_a[1], 0.1 + 4.0, rtol=1e-6)
    np.testing.assert_allclose(new_a[3], 0.1 + 1.0, rtol=1e-6)
    np.testing.assert_allclose(new_a[0], 0.1, rtol=1e-6)
    # delta = lr * g / sqrt(accum_new + eps)
    np.testing.assert_allclose(
        new_t[1], 1.0 - lr * 2.0 / np.sqrt(4.1 + 1e-7), rtol=1e-5
    )
    np.testing.assert_allclose(new_t[0], 1.0, rtol=1e-6)  # untouched

    # duplicates: both contribute to accum; both deltas applied with the
    # shared post-update accumulator
    ids2 = jnp.array([5, 5])
    g2 = jnp.stack([jnp.full((D,), 1.0), jnp.full((D,), 3.0)])
    t2, a2 = jax.jit(sparse_rowwise_update_table)(table, accum, ids2, g2, lr)
    acc_after = 0.1 + 1.0 + 9.0
    np.testing.assert_allclose(a2[5], acc_after, rtol=1e-6)
    expect = 1.0 - lr * (1.0 + 3.0) / np.sqrt(acc_after + 1e-7)
    np.testing.assert_allclose(t2[5], expect, rtol=1e-5)

    # out-of-range ids (padding convention) are dropped
    ids3 = jnp.array([V, 2])
    g3 = jnp.stack([jnp.full((D,), 9.0), jnp.zeros((D,))])
    t3, a3 = jax.jit(sparse_rowwise_update_table)(table, accum, ids3, g3, lr)
    np.testing.assert_allclose(a3[: V], np.asarray(accum), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t3), np.asarray(table), rtol=1e-6)


@pytest.mark.slow
def test_ranking_trainer_rowwise_mode_trains():
    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    cfg = get_config(
        "ranking_small",
        embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
        num_ns_tokens=2, pyramid_ratios=(0.5,),
        feature_vocab_sizes=(
            ("user_id", 100), ("age_bucket", 8), ("gender", 4), ("city", 16),
            ("item_id", 200), ("category", 10), ("brand", 20), ("price_bucket", 8),
            ("hour", 24), ("weekday", 7), ("device", 4),
        ),
        feature_embed_dim=8, seq_item_feature_dim=8, batch_size=8,
        dropout_rate=0.0, use_mixed_precision=False,
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
        dense_lr=1e-2, dense_momentum=0.9, sparse_lr=0.1,
    )
    data = make_ranking_data(cfg, num_samples=64, max_seq_per_feature=6, seed=0)
    it = ranking_batches(data, cfg, batch_size=8, seed=0)
    trainer = RankingTrainer(cfg)
    first = next(it)
    state = trainer.init_state(jax.random.key(0), first)
    # rowwise accums are [V], not [V, D]
    accums = state.opt_state[1]
    assert accums["embed_seq_item"].ndim == 1
    losses = []
    b = trainer._put_batch(first)
    for i in range(30):
        state, m = trainer._train_step(state, b, jax.random.key(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # tables actually learn


@pytest.mark.slow
def test_retrieval_trainer_rowwise_mode():
    """RetrievalConfig.sparse_update_mode='rowwise' (the flagship production
    default): [V] accumulators, trains, loss falls, checkpoint roundtrip."""
    import jax

    from recommend_tpu.config import get_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.ops.embedding import SPARSE_TABLES
    from recommend_tpu.training.trainer import RetrievalTrainer

    cfg = get_config(
        "retrieval_small", batch_size=16, warmup_steps=2,
        compute_dtype="float32",
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
    )
    data = make_retrieval_data(cfg, num_users=40, num_videos=300, seed=0)
    tr = RetrievalTrainer(cfg, total_steps=20)
    it = retrieval_batches(data, cfg, batch_size=16, seed=0)
    first = next(it)
    state = tr.init_state(jax.random.key(0), first)
    _, accums = state.opt_state
    for name in SPARSE_TABLES:
        assert accums[name].ndim == 1  # one scalar per row
    losses = []
    batch = first
    for _ in range(15):
        state, m = tr._train_step(state, tr._put_batch(batch), jax.random.key(1))
        losses.append(float(m["loss"]))
        batch = next(it)
    assert losses[-1] < losses[0]


def test_invalid_sparse_update_mode_rejected():
    import pytest

    from recommend_tpu.config import get_config

    with pytest.raises(AssertionError):
        get_config("retrieval_small", sparse_update_mode="row-wise")
    with pytest.raises(AssertionError):
        get_config("ranking_small", sparse_update_mode="ROWWISE")


def test_compact_valid_rows_matches_direct():
    """Compacted scatter == uncompacted scatter when budget covers all real
    rows; overflow drops the tail and reports the count."""
    import numpy as np

    from recommend_tpu.ops.sparse_embed import (
        compact_valid_rows,
        sparse_rowwise_update_table,
    )

    rng = np.random.default_rng(0)
    v, d, n = 64, 8, 40
    ids = jnp.asarray(rng.integers(0, v, n))
    g = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    valid = jnp.asarray(rng.random(n) < 0.5)
    g_masked = g * valid[:, None]  # padded rows carry zero grads in practice
    ids_sent = jnp.where(valid, ids, v)

    table0 = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    acc0 = jnp.full((v,), 0.1, jnp.float32)
    t_ref, a_ref = sparse_rowwise_update_table(table0, acc0, ids_sent, g_masked, 0.1)

    ids_c, g_c, dropped = compact_valid_rows(ids, g_masked, valid, 32, v)
    assert int(dropped) == 0
    assert ids_c.shape == (32,) and g_c.shape == (32, d)
    t_c, a_c = sparse_rowwise_update_table(table0, acc0, ids_c, g_c, 0.1)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_ref), atol=1e-6)

    # overflow: budget smaller than real count → first-budget kept, rest
    # dropped + reported
    n_real = int(valid.sum())
    small = max(n_real - 3, 1)
    ids_o, g_o, dropped_o = compact_valid_rows(ids, g_masked, valid, small, v)
    assert int(dropped_o) == n_real - small
    assert int(jnp.sum(ids_o < v)) == small


def test_trainer_budget_matches_unbudgeted():
    """Ranking trainer step with a covering sparse_scatter_budget must equal
    the unbudgeted step (same loss, same tables)."""
    import dataclasses

    import numpy as np

    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.training.ranking_trainer import RankingTrainer
    from tests.test_ranking_model import tiny_ranking_cfg

    cfg = tiny_ranking_cfg(
        batch_size=8,
        use_sparse_embedding_updates=True,
        sparse_update_mode="rowwise",
    )
    data = make_ranking_data(cfg, num_samples=32, max_seq_per_feature=8, seed=0)
    batch = next(iter(ranking_batches(data, cfg, batch_size=8, num_epochs=1)))

    t1 = RankingTrainer(cfg)
    s1 = t1.init_state(jax.random.key(0), batch)
    s1, m1 = t1._train_step(s1, t1._put_batch(batch), jax.random.key(0))

    cfg_b = dataclasses.replace(cfg, sparse_scatter_budget=128)
    t2 = RankingTrainer(cfg_b)
    s2 = t2.init_state(jax.random.key(0), batch)
    s2, m2 = t2._train_step(s2, t2._put_batch(batch), jax.random.key(0))
    assert int(m2["sparse_dropped_rows"]) == 0
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["params"]["tokenizer"]["embed_seq_item"]["embedding"]),
        np.asarray(s2.params["params"]["tokenizer"]["embed_seq_item"]["embedding"]),
        atol=1e-6,
    )
