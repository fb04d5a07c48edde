import jax.numpy as jnp
import numpy as np

from recommend_tpu.training.metrics import (
    binary_classification_suite,
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


def test_suite_keys():
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32))
    m = retrieval_metric_suite(scores, jnp.zeros(8, dtype=jnp.int32), ks=(1, 5, 10, 50))
    assert set(m) == {"recall@1", "ndcg@1", "recall@5", "ndcg@5",
                      "recall@10", "ndcg@10", "recall@50", "ndcg@50", "mrr"}
