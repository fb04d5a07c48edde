"""Statistical-replica generator tests (VERDICT round-2 item 1).

The replicas must (a) reproduce the published marginals they claim,
(b) carry learnable signal with a sequence-dependent component, and
(c) be deterministic under seed.
"""

import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import ranking_batches
from recommend_tpu.data.replica import (
    leave_one_out_batches,
    make_ml1m_replica,
    make_onetrans_replica,
)
from recommend_tpu.training.metrics import exact_auc


def small_ranking_cfg(**kw):
    base = dict(
        embed_dim=32, num_layers=2, num_heads=2, ffn_dim=64, num_ns_tokens=4,
        pyramid_ratios=(0.5, 0.25),
        feature_vocab_sizes=(
            ("user_id", 2000), ("age_bucket", 16), ("gender", 4), ("city", 32),
            ("item_id", 6000), ("category", 200), ("brand", 500),
            ("price_bucket", 16), ("hour", 24), ("weekday", 7), ("device", 8),
        ),
        feature_embed_dim=8, seq_item_feature_dim=8,
        use_mixed_precision=False, dropout_rate=0.0,
    )
    base.update(kw)
    return get_config("ranking_small", **base)


@pytest.fixture(scope="module")
def ml1m_small():
    cfg = get_config("retrieval_small", video_vocab_size=4000)
    return cfg, make_ml1m_replica(cfg, num_users=400, num_items=3706, seed=0)


def test_ml1m_marginals(ml1m_small):
    cfg, d = ml1m_small
    lens = np.array([len(s["video_id"]) for s in d.user_sequences])
    assert len(lens) == 400
    assert lens.min() >= 20 and lens.max() <= 2314  # dataset bounds
    assert 120 < lens.mean() < 210  # ML-1M mean ≈ 165.6
    # heavy-tailed popularity, popularity-ranked ids (id 0 most watched)
    pop = d.popularity
    assert pop[0] == pop.max()
    assert (np.diff(pop) <= 0).all()
    top1pct = int(np.ceil(0.01 * len(pop)))
    assert pop[:top1pct].sum() / pop.sum() > 0.05  # concentration
    # 18-genre vocabulary, 0 reserved for unknown
    cats = d.video_features["category"]
    assert cats.min() >= 1 and cats.max() <= 18


def test_ml1m_deterministic(ml1m_small):
    cfg, d = ml1m_small
    d2 = make_ml1m_replica(cfg, num_users=400, num_items=3706, seed=0)
    np.testing.assert_array_equal(
        d.user_sequences[7]["video_id"], d2.user_sequences[7]["video_id"]
    )
    np.testing.assert_array_equal(d.popularity, d2.popularity)


def test_ml1m_genre_structure(ml1m_small):
    """The genre Markov chain must leave a learnable footprint: consecutive
    events share a genre far more often than the genre marginal predicts."""
    cfg, d = ml1m_small
    same = total = 0
    for s in d.user_sequences[:200]:
        c = d.video_features["category"][s["video_id"]]
        same += int((c[1:] == c[:-1]).sum())
        total += len(c) - 1
    p_same = same / total
    # marginal collision probability of the genre distribution
    cats = d.video_features["category"][
        np.concatenate([s["video_id"] for s in d.user_sequences[:200]])
    ]
    _, counts = np.unique(cats, return_counts=True)
    p_marginal = ((counts / counts.sum()) ** 2).sum()
    assert p_same > p_marginal + 0.2, (p_same, p_marginal)


def test_leave_one_out_batches(ml1m_small):
    cfg, d = ml1m_small
    b = next(leave_one_out_batches(d, cfg, batch_size=32))
    assert b["history"]["video_id"].shape == (32, cfg.max_seq_len)
    assert b["history_valid"].shape == (32, cfg.max_seq_len)
    assert b["target"]["video_id"].shape == (32,)
    # target is the user's LAST event; history ends at the second-to-last
    seq = d.user_sequences[0]["video_id"]
    assert b["target"]["video_id"][0] == seq[-1]
    hist_row = b["history"]["video_id"][0][b["history_valid"][0]]
    np.testing.assert_array_equal(hist_row, seq[:-1][-cfg.max_seq_len :])


def test_leave_one_out_num_real_makes_eval_batchsize_exact(ml1m_small):
    """`num_real` marks padded duplicate rows and evaluate_retrieval excludes
    them — identical metrics at ANY batch size (VERDICT round-3 weak item 5:
    the old behavior biased metrics ~1.7% unless batch divided the users)."""
    import jax

    from recommend_tpu.data.datasets import leave_one_out_split
    from recommend_tpu.evaluation.retrieval_eval import RetrievalEvaluator
    from recommend_tpu.models.retrieval import RetrievalTower

    cfg, d = ml1m_small
    _, test = leave_one_out_split(d)
    users = [s for s in test.user_sequences if len(s["video_id"]) >= 2]
    # pick a batch size that does NOT divide the user count
    bs = 32
    while len(users) % bs == 0:
        bs += 1
    model = RetrievalTower(cfg)
    b0 = next(leave_one_out_batches(test, cfg, bs))
    params = jax.jit(model.init)(
        jax.random.key(0), b0["history"], b0["history_valid"]
    )
    ev = RetrievalEvaluator(cfg, model, params)
    m_odd = ev.evaluate_retrieval(test, leave_one_out_batches(test, cfg, bs),
                                  ks=(5, 10))
    # one full-size batch covers every user exactly once — reference answer
    ev2 = RetrievalEvaluator(cfg, model, params)
    m_one = ev2.evaluate_retrieval(
        test, leave_one_out_batches(test, cfg, len(users)), ks=(5, 10)
    )
    for k in m_one:
        assert abs(m_odd[k] - m_one[k]) < 1e-9, (k, m_odd[k], m_one[k])


@pytest.fixture(scope="module")
def onetrans_small():
    cfg = small_ranking_cfg()
    dbg = {}
    tr, ev = make_onetrans_replica(
        cfg, num_users=400, num_items=4000, num_impressions=16000,
        seed=0, debug_out=dbg,
    )
    return cfg, tr, ev, dbg


def test_onetrans_marginals(onetrans_small):
    cfg, tr, ev, dbg = onetrans_small
    total = tr.num_samples + ev.num_samples
    assert total >= 16000
    assert abs(ev.num_samples / total - 0.1) < 0.05  # eval_frac
    ctr = np.concatenate([tr.labels["ctr"], ev.labels["ctr"]])
    cvr = np.concatenate([tr.labels["cvr"], ev.labels["cvr"]])
    # pins the documented ≈18% CTR label base rate (replica.py module
    # docstring; VERDICT round-3 weak item 4 — the old "≈10%" doc figure and
    # the report's `ctr_positive_rate` metric, which is the PREDICTED rate at
    # the 0.5 threshold, were both being misread as the label rate)
    assert 0.12 < ctr.mean() < 0.24
    assert 0.25 < cvr.sum() / ctr.sum() < 0.48  # documented CVR|click ≈ 36%
    assert (cvr <= ctr).all()  # cvr ⊂ ctr
    # behavior hierarchies: click ⊇ cart ⊇ purchase in expectation
    assert tr.seq_lengths["click_seq"].mean() > tr.seq_lengths["cart_seq"].mean()
    assert tr.seq_lengths["cart_seq"].mean() > tr.seq_lengths["purchase_seq"].mean()
    # 0 is the padding id everywhere
    for sf, arr in tr.sequences.items():
        w = arr.shape[1]
        pad = np.arange(w)[None, :] < (w - tr.seq_lengths[sf][:, None])
        assert (arr[pad] == 0).all()
        assert (arr[~pad] > 0).all()


def test_onetrans_bayes_ceiling(onetrans_small):
    """The noise-free structural logit must sit near the reference's
    industrial CTR AUC band (≈0.80-0.83, translation:199-207) — that is the
    calibration the generator claims."""
    cfg, tr, ev, dbg = onetrans_small
    auc = exact_auc(dbg["bayes_logit"], dbg["y_ctr"])
    assert 0.78 < auc < 0.88, auc


def test_onetrans_deterministic():
    cfg = small_ranking_cfg()
    a = make_onetrans_replica(cfg, num_users=50, num_items=500,
                              num_impressions=1000, seed=3)[0]
    b = make_onetrans_replica(cfg, num_users=50, num_items=500,
                              num_impressions=1000, seed=3)[0]
    np.testing.assert_array_equal(a.non_seq["item_id"], b.non_seq["item_id"])
    np.testing.assert_array_equal(a.labels["ctr"], b.labels["ctr"])
    np.testing.assert_array_equal(a.sequences["click_seq"], b.sequences["click_seq"])


def test_onetrans_history_precedes_impression(onetrans_small):
    """No leakage: every history window holds only events from before the
    impression (the candidate item can therefore appear in history only if
    it was clicked earlier — never the impression itself)."""
    cfg, tr, ev, dbg = onetrans_small
    # eval rows come AFTER train rows per user (future split)
    u = tr.non_seq["user_id"][0]
    tr_lens = tr.seq_lengths["click_seq"][tr.non_seq["user_id"] == u]
    ev_lens = ev.seq_lengths["click_seq"][ev.non_seq["user_id"] == u]
    if len(ev_lens) and len(tr_lens):
        assert ev_lens.min() >= tr_lens.min()


def test_ranking_batches_heterogeneous_widths(onetrans_small):
    """Regression: seq_valid must use each feature's own window width
    (click 48 / cart 16 / purchase 8), not the first feature's."""
    cfg, tr, ev, dbg = onetrans_small
    batch = next(iter(ranking_batches(tr, cfg, batch_size=4, num_epochs=1)))
    assert batch["sequences"]["click_seq"].shape[1] == 48
    assert batch["sequences"]["cart_seq"].shape[1] == 16
    assert batch["sequences"]["purchase_seq"].shape[1] == 8
    for sf in batch["sequences"]:
        assert batch["seq_valid"][sf].shape == batch["sequences"][sf].shape
        # left-pad: valid iff position >= width - len
        assert (batch["seq_valid"][sf].sum(1) <= batch["sequences"][sf].shape[1]).all()


def test_ranking_model_runs_on_replica_batch(onetrans_small):
    """The heterogeneous-width batch must flow through the full model."""
    import jax
    import jax.numpy as jnp
    from recommend_tpu.models.ranking import RankingModel

    cfg, tr, ev, dbg = onetrans_small
    batch = next(iter(ranking_batches(tr, cfg, batch_size=4, num_epochs=1)))
    model = RankingModel(cfg)
    args = (
        {k: jnp.asarray(v) for k, v in batch["non_seq"].items()},
        {k: jnp.asarray(v) for k, v in batch["sequences"].items()},
        {k: jnp.asarray(v) for k, v in batch["seq_valid"].items()},
    )
    params = jax.jit(model.init)(jax.random.key(0), *args)
    out = jax.jit(model.apply)(params, *args)
    for t in cfg.tasks:
        assert out[t].shape == (4,)
        assert bool(jnp.isfinite(out[t]).all())


def test_onetrans_replica_v2_and_val_split():
    """Replica v2 (order + cross-behavior terms) and the round-5 protocol
    surface: 3-way time-ordered split, CVR oracle scores, v1 bit-compat
    (zero v2 weights add exact-0 terms and draw no extra rng samples)."""
    import numpy as np

    from recommend_tpu.config import get_config
    from recommend_tpu.data.replica import make_onetrans_replica
    from recommend_tpu.training.metrics import exact_auc

    cfg = get_config(
        "ranking_small",
        feature_vocab_sizes=(
            ("user_id", 300), ("age_bucket", 16), ("gender", 4), ("city", 32),
            ("item_id", 500), ("category", 200), ("brand", 500),
            ("price_bucket", 16), ("hour", 24), ("weekday", 7), ("device", 8),
        ),
    )
    kw = dict(num_users=120, num_items=300, num_impressions=30_000, seed=3)
    dbg1 = {}
    tr1, ev1 = make_onetrans_replica(cfg, debug_out=dbg1, **kw)
    dbg2 = {}
    tr2, va2, ev2 = make_onetrans_replica(
        cfg, debug_out=dbg2, val_frac=0.05,
        signal_weights_v2=(2.2, 2.8),
        signal_weights=(3.5, 2.0, -0.8, 0.5, -3.3), **kw
    )
    # 3-way split partitions the impressions; val sits between train and test
    total = tr2.num_samples + va2.num_samples + ev2.num_samples
    assert total == tr1.num_samples + ev1.num_samples
    assert va2.num_samples > 0
    assert not np.any(dbg2["is_val"] & dbg2["is_eval"])
    # CVR oracles exist and rank CVR labels above chance, and at/above the
    # model-reachable bound implied by the CTR oracle structure
    m = dbg2["is_eval"]
    assert exact_auc(dbg2["bayes_cvr_score"][m], dbg2["y_cvr"][m]) > 0.75
    assert exact_auc(dbg2["observable_cvr_score"][m], dbg2["y_cvr"][m]) > 0.7
    # v2 planted MORE observable signal than v1's weights alone would leave:
    # the order/cross terms appear in the observable oracle
    obs2 = exact_auc(dbg2["observable_logit"][m], dbg2["y_ctr"][m])
    assert obs2 > 0.7
    # v1 path unchanged: same labels with default weights regardless of the
    # new code paths (order/cross terms add exact zeros, no rng draws)
    dbg1b = {}
    tr1b, _ = make_onetrans_replica(cfg, debug_out=dbg1b, **kw)
    np.testing.assert_array_equal(tr1.labels["ctr"], tr1b.labels["ctr"])
    np.testing.assert_array_equal(dbg1["bayes_logit"], dbg1b["bayes_logit"])
