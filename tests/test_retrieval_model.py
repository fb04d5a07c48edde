import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import retrieval_batches
from recommend_tpu.data.synthetic import make_retrieval_data
from recommend_tpu.models.retrieval import RetrievalTower


@pytest.fixture(scope="module")
def small_setup():
    cfg = get_config("retrieval_small", compute_dtype="float32")
    data = make_retrieval_data(cfg, num_users=20, num_videos=200, seed=0)
    batch = next(iter(retrieval_batches(data, cfg, batch_size=4, num_epochs=1)))
    model = RetrievalTower(cfg)
    feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
    valid = jnp.asarray(batch["history_valid"])
    params = model.init(jax.random.key(0), feats, valid)
    return cfg, model, params, feats, valid, batch


def test_forward_shapes(small_setup):
    cfg, model, params, feats, valid, _ = small_setup
    interests = model.apply(params, feats, valid)
    assert interests.shape == (4, cfg.num_query_tokens, cfg.embed_dim)
    assert np.isfinite(np.asarray(interests)).all()


def test_all_position_interests_shape(small_setup):
    cfg, model, params, feats, valid, _ = small_setup
    out = model.apply(
        params, feats, valid, method=RetrievalTower.all_position_interests
    )
    T = cfg.num_compressed_tokens
    assert out.shape == (4, T, cfg.num_query_tokens, cfg.embed_dim)


def test_all_position_interests_are_causal(small_setup):
    """Interests at position t must not change when future items change."""
    cfg, model, params, feats, valid, _ = small_setup
    out1 = model.apply(
        params, feats, valid, method=RetrievalTower.all_position_interests
    )
    # perturb the last raw item (affects only the final compressed position)
    feats2 = dict(feats)
    feats2["video_id"] = feats["video_id"].at[:, -1].set(7)
    feats2["category"] = feats["category"].at[:, -1].set(3)
    out2 = model.apply(
        params, feats2, valid, method=RetrievalTower.all_position_interests
    )
    d = np.abs(np.asarray(out1) - np.asarray(out2)).max(axis=(0, 2, 3))
    # all positions before the last compressed token are unchanged
    np.testing.assert_allclose(d[:-1], 0.0, atol=1e-5)
    assert d[-1] > 1e-6  # and the final position does see the change


def test_compute_scores(small_setup):
    cfg, model, params, feats, valid, _ = small_setup
    interests = model.apply(params, feats, valid)
    cands = jnp.asarray(np.random.default_rng(0).normal(size=(10, cfg.embed_dim)).astype(np.float32))
    scores = RetrievalTower.compute_scores(interests, cands)
    assert scores.shape == (4, 10)
    # max-over-interests: score >= each individual interest's dot product
    s_all = np.einsum("bkd,nd->bkn", np.asarray(interests), np.asarray(cands))
    np.testing.assert_allclose(np.asarray(scores), s_all.max(axis=1), rtol=1e-4, atol=1e-4)


def test_item_embeddings(small_setup):
    cfg, model, params, _, _, batch = small_setup
    tgt = {k: jnp.asarray(v) for k, v in batch["target"].items()}
    emb = model.apply(params, tgt, method=RetrievalTower.item_embeddings)
    assert emb.shape == (4, cfg.embed_dim)


def test_interests_at_position_slices_all_positions(small_setup):
    """Single-position causal variant (kuaiformer call_with_position,
    model.py:502-526): must equal the seq-to-seq mode sliced at that
    position."""
    cfg, model, params, feats, valid, _ = small_setup
    outs = model.apply(
        params, feats, valid, method=RetrievalTower.all_position_interests
    )
    t = outs.shape[1]
    pos = jnp.asarray([0, 1, t - 1, t // 2])
    single = model.apply(
        params, feats, valid, pos,
        method=RetrievalTower.interests_at_position,
    )
    assert single.shape == (4, cfg.num_query_tokens, cfg.embed_dim)
    expected = np.stack([np.asarray(outs)[b, int(p)] for b, p in enumerate(pos)])
    # the single-position pass attends over (T+k)² instead of (T(1+k))²:
    # identical math, different reduction shapes → f32 ordering noise ~1e-6
    np.testing.assert_allclose(np.asarray(single), expected, atol=1e-5)
