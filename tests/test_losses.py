import jax.numpy as jnp
import numpy as np

from recommend_tpu.models.losses import in_batch_softmax_loss, multi_task_bce_loss


def _hand_in_batch_loss(interests, items, pop, alpha):
    """Independent numpy computation of the LogQ label-smoothed loss."""
    b = interests.shape[0]
    scores = np.einsum("bkd,nd->bkn", interests, items).max(axis=1)  # [B,B]
    if pop is not None:
        scores = scores - np.log(pop + 1e-8)[None, :]
    logz = np.log(np.exp(scores).sum(-1, keepdims=True))
    logp = scores - logz
    targets = np.full((b, b), alpha / (b - 1))
    np.fill_diagonal(targets, 1 - alpha)
    return float(-(targets * logp).sum(-1).mean())


def test_in_batch_loss_matches_hand_computation():
    rng = np.random.default_rng(0)
    b, k, d = 4, 2, 8
    interests = rng.normal(size=(b, k, d)).astype(np.float32)
    items = rng.normal(size=(b, d)).astype(np.float32)
    pop = rng.uniform(0.01, 0.2, b).astype(np.float32)
    for alpha in (0.0, 0.1):
        loss, metrics = in_batch_softmax_loss(
            jnp.asarray(interests), jnp.asarray(items), jnp.asarray(pop),
            label_smoothing=alpha,
        )
        expected = _hand_in_batch_loss(interests, items, pop, alpha)
        np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_logq_correction_changes_loss():
    rng = np.random.default_rng(1)
    interests = jnp.asarray(rng.normal(size=(4, 2, 8)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    pop = jnp.asarray(np.array([0.5, 0.01, 0.2, 0.05], dtype=np.float32))
    l1, _ = in_batch_softmax_loss(interests, items, pop)
    l2, _ = in_batch_softmax_loss(interests, items, None)
    assert abs(float(l1) - float(l2)) > 1e-4


def test_multi_task_bce_matches_hand_case():
    # p = sigmoid(0) = 0.5 → BCE = ln 2 for any label
    logits = {"ctr": jnp.zeros(4), "cvr": jnp.zeros(4)}
    labels = {"ctr": jnp.asarray([1.0, 0, 1, 0]), "cvr": jnp.asarray([0.0, 0, 1, 1])}
    total, metrics = multi_task_bce_loss(logits, labels)
    np.testing.assert_allclose(float(total), 2 * np.log(2), rtol=1e-6)
    np.testing.assert_allclose(float(metrics["ctr_loss"]), np.log(2), rtol=1e-6)


def test_perfect_predictions_low_loss():
    big = 20.0
    logits = {"ctr": jnp.asarray([big, -big, big, -big])}
    labels = {"ctr": jnp.asarray([1.0, 0.0, 1.0, 0.0])}
    total, _ = multi_task_bce_loss(logits, labels)
    assert float(total) < 1e-6
