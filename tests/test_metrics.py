import pytest
import jax.numpy as jnp
import numpy as np

from recommend_tpu.training.metrics import (
    binary_classification_suite,
    grouped_auc,
    hit_rate_at_k,
    mrr,
    ndcg_at_k,
    retrieval_metric_suite,
    streaming_auc,
)


def test_hit_rate():
    scores = jnp.asarray([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]])
    true_idx = jnp.asarray([0, 2])  # row0 rank 0; row1 rank 2
    assert float(hit_rate_at_k(scores, true_idx, 1)) == 0.5
    assert float(hit_rate_at_k(scores, true_idx, 3)) == 1.0


def test_ndcg_and_mrr_hand_case():
    scores = jnp.asarray([[0.9, 0.1, 0.5]])
    # true item at rank 1 (0-based): ndcg = 1/log2(3), mrr = 1/2
    np.testing.assert_allclose(
        float(ndcg_at_k(scores, jnp.asarray([2]), 3)), 1 / np.log2(3), rtol=1e-6
    )
    np.testing.assert_allclose(float(mrr(scores, jnp.asarray([2]))), 0.5, rtol=1e-6)


def test_streaming_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    probs = rng.random(2000).astype(np.float32)
    labels = (rng.random(2000) < probs) * 1.0  # informative predictions
    init, update, compute = streaming_auc(num_thresholds=2048)
    state = init()
    for i in range(0, 2000, 500):  # stream in 4 batches
        state = update(state, jnp.asarray(probs[i : i + 500]), jnp.asarray(labels[i : i + 500]))
    ours = float(compute(state))
    ref = roc_auc_score(labels, probs)
    assert abs(ours - ref) < 0.005, (ours, ref)


def test_binary_suite():
    probs = jnp.asarray([0.9, 0.1, 0.8, 0.4])
    labels = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    m = binary_classification_suite(probs, labels)
    assert float(m["accuracy"]) == 0.5
    assert float(m["precision"]) == 0.5  # 1 TP of 2 predicted pos
    assert float(m["recall"]) == 0.5


def test_grouped_auc_hand_case():
    # user 0 (3 samples): probs [.9, .1, .5], labels [1, 0, 0] → AUC 1.0
    # user 1 (4 samples): probs [.2, .8, .6, .4], labels [1, 0, 1, 0]
    #   pos {.2, .6}, neg {.8, .4}: pairs (.2>.8? 0) (.2>.4? 0) (.6>.8? 0)
    #   (.6>.4? 1) → AUC 1/4
    probs = [0.9, 0.1, 0.5, 0.2, 0.8, 0.6, 0.4]
    labels = [1, 0, 0, 1, 0, 1, 0]
    users = [0, 0, 0, 1, 1, 1, 1]
    weighted = grouped_auc(probs, labels, users, weighted=True)
    np.testing.assert_allclose(weighted, (3 * 1.0 + 4 * 0.25) / 7, rtol=1e-12)
    unweighted = grouped_auc(probs, labels, users, weighted=False)
    np.testing.assert_allclose(unweighted, (1.0 + 0.25) / 2, rtol=1e-12)


def test_grouped_auc_ties_and_degenerate_groups():
    # user 0 all-positive (skipped), user 1 all-tied probs → AUC 0.5
    probs = [0.7, 0.7, 0.5, 0.5, 0.5]
    labels = [1, 1, 1, 0, 1]
    users = [0, 0, 1, 1, 1]
    np.testing.assert_allclose(grouped_auc(probs, labels, users), 0.5, rtol=1e-12)
    # no valid group → NaN
    assert np.isnan(grouped_auc([0.1, 0.9], [1, 1], [0, 0]))


def test_grouped_auc_matches_sklearn_per_group():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    probs = rng.random(600)
    labels = (rng.random(600) < probs).astype(float)
    users = rng.integers(0, 20, size=600)
    expect_num, expect_den = 0.0, 0.0
    for u in np.unique(users):
        m = users == u
        if labels[m].min() == labels[m].max():
            continue
        expect_num += m.sum() * roc_auc_score(labels[m], probs[m])
        expect_den += m.sum()
    np.testing.assert_allclose(
        grouped_auc(probs, labels, users), expect_num / expect_den, rtol=1e-10
    )


def test_suite_keys():
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32))
    m = retrieval_metric_suite(scores, jnp.zeros(8, dtype=jnp.int32), ks=(1, 5, 10, 50))
    assert set(m) == {"recall@1", "ndcg@1", "recall@5", "ndcg@5",
                      "recall@10", "ndcg@10", "recall@50", "ndcg@50", "mrr"}


def test_exact_auc_matches_sklearn():
    from recommend_tpu.training.metrics import exact_auc

    pytest.importorskip("sklearn")
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(3)
    for n in (10, 257, 1000):
        y = rng.integers(0, 2, n)
        if y.sum() in (0, n):
            y[0] = 1 - y[0]
        # heavy ties: quantized probabilities
        p = np.round(rng.random(n), 2)
        assert abs(exact_auc(p, y) - roc_auc_score(y, p)) < 1e-12


def test_exact_auc_degenerate():
    from recommend_tpu.training.metrics import exact_auc

    assert exact_auc([0.5, 0.7], [1, 1]) != exact_auc([0.5, 0.7], [1, 1])  # NaN
