"""Open-dataset loaders: MovieLens-1M and Taobao UserBehavior fixtures."""

import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.datasets import (
    leave_one_out_split,
    load_movielens_1m,
    load_taobao_userbehavior,
)


@pytest.fixture
def ml1m_dir(tmp_path):
    """Tiny MovieLens-1M-format fixture: 3 users, 5 movies."""
    (tmp_path / "movies.dat").write_text(
        "1::Toy Story (1995)::Animation|Children's|Comedy\n"
        "2::Jumanji (1995)::Adventure|Children's|Fantasy\n"
        "3::Heat (1995)::Action|Crime|Thriller\n"
        "4::Casino (1995)::Drama\n"
        "5::Se7en (1995)::Crime|Thriller\n",
        encoding="latin-1",
    )
    rows = []
    # user 1: 5 events (kept), user 2: 4 events (kept with min=4),
    # user 3: 2 events (dropped at min_interactions=4)
    for u, movies in ((1, [1, 2, 3, 4, 5]), (2, [1, 3, 1, 2]), (3, [4, 5])):
        for t, m in enumerate(movies):
            rows.append(f"{u}::{m}::{(m % 5) + 1}::{978300000 + u * 1000 + t * 60}")
    (tmp_path / "ratings.dat").write_text("\n".join(rows) + "\n")
    return str(tmp_path)


def test_movielens_loader_shapes_and_remap(ml1m_dir):
    cfg = get_config("retrieval_small")
    data = load_movielens_1m(ml1m_dir, cfg, min_interactions=4)
    assert len(data.user_sequences) == 2  # user 3 dropped
    assert data.num_videos == 5
    # movie 1 appears 3 times → most popular → id 0
    assert data.popularity[0] == 3  # movie 1: u1 once + u2 twice
    # popularity is corpus-global (includes dropped short users — LogQ wants
    # the true sampling distribution): 5 + 4 + 2 events
    assert data.popularity.sum() == 11
    for seq in data.user_sequences:
        assert sorted(seq.keys()) == ["category", "duration", "tag", "timestamp", "video_id"]
        assert np.all(np.diff(seq["timestamp"]) > 0)  # time-ordered
        n = len(seq["video_id"])
        for k, v in seq.items():
            assert len(v) == n
    # categories within vocab, duration is the rating*60 proxy
    u1 = data.user_sequences[0]
    assert u1["duration"].min() >= 60.0 and u1["duration"].max() <= 300.0
    assert u1["category"].max() < cfg.category_vocab_size


def test_movielens_missing_file_raises(tmp_path):
    cfg = get_config("retrieval_small")
    with pytest.raises(FileNotFoundError):
        load_movielens_1m(str(tmp_path), cfg)


def test_leave_one_out_split(ml1m_dir):
    cfg = get_config("retrieval_small")
    data = load_movielens_1m(ml1m_dir, cfg, min_interactions=4)
    train, test = leave_one_out_split(data)
    for tr, te in zip(train.user_sequences, data.user_sequences):
        assert len(tr["video_id"]) == len(te["video_id"]) - 1
        assert np.all(tr["video_id"] == te["video_id"][:-1])
    assert len(test.user_sequences) == len(data.user_sequences)


@pytest.mark.slow
def test_movielens_feeds_retrieval_pipeline(ml1m_dir):
    """Loader output drives retrieval_batches + a jitted forward unchanged."""
    import jax

    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.models.retrieval import RetrievalTower

    cfg = get_config(
        "retrieval_small", max_seq_len=8, compression_schedule=((4, 2), (4, 1)),
        video_vocab_size=16, category_vocab_size=32, tag_vocab_size=64,
    )
    data = load_movielens_1m(ml1m_dir, cfg, min_interactions=4)
    batch = next(retrieval_batches(data, cfg, batch_size=2, min_history=1,
                                   use_native=False))
    assert batch["history"]["video_id"].shape == (2, 8)
    model = RetrievalTower(cfg)
    import jax.numpy as jnp
    feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
    valid = jnp.asarray(batch["history_valid"])
    params = model.init(jax.random.key(0), feats, valid)
    out = jax.jit(model.apply)(params, feats, valid)
    assert out.shape == (2, cfg.num_query_tokens, cfg.embed_dim)


@pytest.fixture
def taobao_csv(tmp_path):
    """UserBehavior.csv fixture: 2 users, pv/cart/buy chains."""
    rows = [
        # user 7: pv 100 → cart 100 → buy 100, then pv 200 (never bought)
        "7,100,11,pv,1511660000",
        "7,100,11,cart,1511660100",
        "7,100,11,buy,1511660200",
        "7,200,12,pv,1511660300",
        # user 8: pv 200, pv 300, fav 300
        "8,200,12,pv,1511661000",
        "8,300,13,pv,1511661100",
        "8,300,13,fav,1511661200",
    ]
    p = tmp_path / "UserBehavior.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_taobao_loader_labels_and_sequences(taobao_csv):
    cfg = get_config("ranking_small")
    data = load_taobao_userbehavior(
        taobao_csv, cfg, max_seq_per_feature=4, negatives_per_positive=1, seed=0
    )
    n = data.num_samples
    assert n >= 4  # ≥2 positives + their negatives
    ctr = data.labels["ctr"]
    cvr = data.labels["cvr"]
    assert set(np.unique(ctr)) <= {0.0, 1.0}
    assert np.all(cvr <= ctr)  # cvr ⊂ ctr
    assert ctr.sum() >= 2 and (ctr == 0).sum() >= 2
    # user 7's second pv (item 200, after buying 100): purchase_seq non-empty
    pos_rows = np.nonzero(ctr == 1.0)[0]
    assert any(data.seq_lengths["purchase_seq"][i] > 0 for i in pos_rows)
    for sf in cfg.sequence_features:
        assert data.sequences[sf].shape == (n, 4)
        # left-padding: positions before (max - len) are zero
        lens = data.seq_lengths[sf]
        for i in range(n):
            assert np.all(data.sequences[sf][i, : 4 - lens[i]] == 0)
    for f in cfg.non_seq_features:
        assert data.non_seq[f].shape == (n,)
        assert data.non_seq[f].max() < cfg.vocab_size(f)


@pytest.mark.slow
def test_taobao_feeds_ranking_trainer(taobao_csv):
    """Loader output drives ranking_batches + one CPU train step unchanged."""
    import jax

    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    cfg = get_config(
        "ranking_small", batch_size=4, dropout_rate=0.0,
        use_mixed_precision=False,  # CPU test backend has no bf16 dots
        dense_optimizer="adam", dense_lr=1e-3, dense_momentum=0.9,
    )
    data = load_taobao_userbehavior(taobao_csv, cfg, max_seq_per_feature=4)
    it = ranking_batches(data, cfg, batch_size=4, seed=0)
    trainer = RankingTrainer(cfg)
    batch = next(it)
    state = trainer.init_state(jax.random.key(0), batch)
    state, metrics = trainer._train_step(state, trainer._put_batch(batch), jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_criteo_loader_and_ns_only_training(tmp_path):
    """Criteo TSV → NS-only samples (no behavior sequences): loader parses
    missing fields, bucketizes/hashes into the config's vocabs, and the
    unified tokenizer's degenerate S-length-0 stream trains end-to-end."""
    import jax

    from recommend_tpu.data.datasets import (
        criteo_ranking_config,
        load_criteo_kaggle,
    )
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    rng = np.random.default_rng(0)
    rows = []
    for i in range(96):
        label = int(rng.random() < 0.3)
        ints = [
            "" if rng.random() < 0.2 else str(int(rng.integers(-2, 5000)))
            for _ in range(13)
        ]
        cats = [
            "" if rng.random() < 0.2 else f"{int(rng.integers(0, 2**32)):08x}"
            for _ in range(26)
        ]
        rows.append("\t".join([str(label)] + ints + cats))
    p = tmp_path / "criteo_sample.txt"
    p.write_text("\n".join(rows) + "\n")

    cfg = criteo_ranking_config(
        cat_vocab=512, num_buckets=16,
        embed_dim=64, num_layers=2, num_heads=1, ffn_dim=128,
        num_ns_tokens=4, pyramid_ratios=(1.0, 1.0), batch_size=32,
        use_mixed_precision=False,
        dense_optimizer="adam", dense_lr=1e-3,
    )
    data = load_criteo_kaggle(str(p), cat_vocab=512, num_buckets=16)
    assert data.num_samples == 96
    assert data.sequences == {}
    for k in range(1, 14):
        col = data.non_seq[f"i{k}"]
        assert col.min() >= 0 and col.max() < 16
    for k in range(1, 27):
        col = data.non_seq[f"c{k}"]
        assert col.min() >= 0 and col.max() < 512

    tr = RankingTrainer(cfg)
    it = ranking_batches(data, cfg, batch_size=32, seed=0)
    first = next(it)
    state = tr.init_state(jax.random.key(0), first)
    losses = []
    batch = first
    for _ in range(10):
        state, m = tr._train_step(state, tr._put_batch(batch), jax.random.key(1))
        losses.append(float(m["loss"]))
        batch = next(it)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_ns_only_model_with_sparse_updates():
    """The NS-only path must also work with touched-row sparse updates."""
    import jax

    from recommend_tpu.data.datasets import criteo_ranking_config
    from recommend_tpu.data.synthetic import SyntheticRankingData
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.training.ranking_trainer import RankingTrainer

    rng = np.random.default_rng(1)
    n = 64
    cfg = criteo_ranking_config(
        cat_vocab=256, num_buckets=16,
        embed_dim=64, num_layers=2, num_heads=1, ffn_dim=128,
        num_ns_tokens=4, pyramid_ratios=(1.0, 1.0), batch_size=32,
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
        use_mixed_precision=False,
        dense_optimizer="adam", dense_lr=1e-3, sparse_lr=0.05,
    )
    non_seq = {f: rng.integers(0, cfg.vocab_size(f), n).astype(np.int32)
               for f in cfg.non_seq_features}
    labels = {"ctr": (rng.random(n) < 0.4).astype(np.float32)}
    data = SyntheticRankingData(non_seq, {}, {}, labels)
    tr = RankingTrainer(cfg)
    it = ranking_batches(data, cfg, batch_size=32, seed=0)
    first = next(it)
    state = tr.init_state(jax.random.key(0), first)
    state, m = tr._train_step(state, tr._put_batch(first), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_pipeline_process_sharding_partitions_epoch():
    """num_shards/shard_id must give disjoint per-host slices whose union is
    the full epoch (multi-host DP input convention, SURVEY §5.8)."""
    from recommend_tpu import get_config
    from recommend_tpu.data.pipeline import ranking_batches, retrieval_batches
    from recommend_tpu.data.synthetic import make_ranking_data, make_retrieval_data

    rcfg = get_config("ranking_small", batch_size=8)
    rdata = make_ranking_data(rcfg, num_samples=64, max_seq_per_feature=8, seed=0)
    seen = []
    for shard in range(4):
        for b in ranking_batches(rdata, rcfg, 8, seed=7, num_epochs=1,
                                 num_shards=4, shard_id=shard):
            seen.append(np.stack([b["non_seq"][f] for f in rcfg.non_seq_features]))
    rows = np.concatenate([s.T for s in seen])
    assert len(rows) == 64  # 4 shards x 16 samples, no batch remainder lost
    assert len(np.unique(rows, axis=0)) == len(rows)  # disjoint

    cfg = get_config(
        "retrieval_small", max_seq_len=16, compression_schedule=((8, 4), (8, 1))
    )
    data = make_retrieval_data(cfg, num_users=30, num_videos=200, seed=0)
    full = sum(1 for _ in retrieval_batches(data, cfg, 8, seed=3, num_epochs=1,
                                            num_shards=1, shard_id=0))
    per_shard = [
        sum(1 for _ in retrieval_batches(data, cfg, 8, seed=3, num_epochs=1,
                                         num_shards=2, shard_id=s))
        for s in range(2)
    ]
    assert sum(per_shard) in (full, full - 1, full - 2)  # drop-remainder slack


def test_pipeline_shards_have_equal_batch_counts():
    """Uneven N: every shard must yield the SAME number of batches per epoch
    (differing counts deadlock multi-host SPMD at the first collective), and
    a lone num_shards without shard_id must be rejected."""
    import pytest

    from recommend_tpu import get_config
    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data

    cfg = get_config("ranking_small", batch_size=8)
    # 67 samples over 4 shards: stride slices would give 17/17/17/16
    data = make_ranking_data(cfg, num_samples=67, max_seq_per_feature=8, seed=0)
    counts = [
        sum(1 for _ in ranking_batches(data, cfg, 8, seed=1, num_epochs=1,
                                       num_shards=4, shard_id=s))
        for s in range(4)
    ]
    assert len(set(counts)) == 1, counts
    with pytest.raises(ValueError):
        next(ranking_batches(data, cfg, 8, num_shards=4))
