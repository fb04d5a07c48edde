import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import ranking_batches
from recommend_tpu.data.synthetic import make_ranking_data
from recommend_tpu.models.ranking import RankingModel, pyramid_keep_lengths


def tiny_ranking_cfg(**kw):
    base = dict(
        embed_dim=32,
        num_layers=3,
        num_heads=2,
        ffn_dim=64,
        num_ns_tokens=4,
        pyramid_ratios=(0.5, 0.25, 0.1),
        feature_vocab_sizes=(
            ("user_id", 100), ("age_bucket", 16), ("gender", 4), ("city", 32),
            ("item_id", 200), ("category", 20), ("brand", 50), ("price_bucket", 16),
            ("hour", 24), ("weekday", 7), ("device", 8),
        ),
        feature_embed_dim=8,
        seq_item_feature_dim=8,
        use_mixed_precision=False,
        dropout_rate=0.0,
        task_head_hidden=16,
        # the paper's production optimizer settings (momentum .99999, lr .005)
        # diverge at toy scale — use tame values for tests
        dense_lr=1e-3,
        dense_momentum=0.9,
        sparse_lr=0.05,
    )
    base.update(kw)
    return get_config("ranking_small", **base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ranking_cfg()
    data = make_ranking_data(cfg, num_samples=16, max_seq_per_feature=10, seed=0)
    batch = next(iter(ranking_batches(data, cfg, batch_size=2, num_epochs=1)))
    model = RankingModel(cfg)
    args = (
        {k: jnp.asarray(v) for k, v in batch["non_seq"].items()},
        {k: jnp.asarray(v) for k, v in batch["sequences"].items()},
        {k: jnp.asarray(v) for k, v in batch["seq_valid"].items()},
    )
    params = model.init(jax.random.key(0), *args)
    return cfg, model, params, args, batch


def test_pyramid_keep_lengths():
    cfg = tiny_ranking_cfg(num_layers=4, pyramid_ratios=(0.5, 0.25, 0.1, 0.01), num_ns_tokens=4)
    keeps = pyramid_keep_lengths(cfg, 100)
    assert keeps == [50, 25, 10, 4]  # floor at num_ns_tokens
    assert all(a >= b for a, b in zip(keeps, keeps[1:]))


def test_forward_shapes(setup):
    cfg, model, params, args, batch = setup
    out = model.apply(params, *args)
    assert set(out) == set(cfg.tasks)
    for t in cfg.tasks:
        assert out[t].shape == (2,)
        assert np.isfinite(np.asarray(out[t])).all()


def test_kv_cache_path_matches_full_path(setup):
    """The S/NS decomposition must reproduce the full forward exactly —
    this validates that S-tokens never depend on NS-tokens (the property
    the cross-candidate KV cache relies on, translation:144-151)."""
    cfg, model, params, args, batch = setup
    non_seq, sequences, seq_valid = args
    full = model.apply(params, *args)
    cache = model.apply(params, sequences, seq_valid, method=RankingModel.encode_s)
    cached = model.apply(params, cache, non_seq, method=RankingModel.score_with_cache)
    for t in cfg.tasks:
        np.testing.assert_allclose(
            np.asarray(full[t]), np.asarray(cached[t]), atol=1e-4, rtol=1e-4
        )


def test_ns_independence_of_s_trunk(setup):
    """Changing candidate (non-seq) features must not change the S cache."""
    cfg, model, params, args, _ = setup
    non_seq, sequences, seq_valid = args
    c1 = model.apply(params, sequences, seq_valid, method=RankingModel.encode_s)
    ns2 = {k: (v + 1) % 4 for k, v in non_seq.items()}
    c2 = model.apply(params, sequences, seq_valid, method=RankingModel.encode_s)
    for a, b in zip(c1, c2):
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_padding_invariance(setup):
    """Outputs must not depend on the content of padded sequence positions."""
    cfg, model, params, args, batch = setup
    non_seq, sequences, seq_valid = args
    out1 = model.apply(params, *args)
    seq2 = {
        k: jnp.where(seq_valid[k], v, 77)  # rewrite padded ids
        for k, v in sequences.items()
    }
    out2 = model.apply(params, non_seq, seq2, seq_valid)
    for t in cfg.tasks:
        np.testing.assert_allclose(
            np.asarray(out1[t]), np.asarray(out2[t]), atol=1e-4
        )


@pytest.mark.slow
def test_remat_variant_matches(setup):
    cfg, model, params, args, _ = setup
    cfg2 = tiny_ranking_cfg(use_remat=True)
    model2 = RankingModel(cfg2)
    out1 = model.apply(params, *args)
    out2 = model2.apply(params, *args)
    for t in cfg.tasks:
        np.testing.assert_allclose(
            np.asarray(out1[t]), np.asarray(out2[t]), atol=1e-5
        )


@pytest.mark.slow
def test_gradients_flow(setup):
    cfg, model, params, args, batch = setup
    labels = {t: jnp.asarray(v) for t, v in batch["labels"].items()}

    def loss_fn(p):
        out = model.apply(p, *args)
        from recommend_tpu.models.losses import multi_task_bce_loss

        total, _ = multi_task_bce_loss(out, labels)
        return total

    g = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(jnp.square(x))) for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0.0
    # dedicated NS stacks must receive gradient
    ns_g = g["params"]["block_0"]["q_ns"]
    assert float(jnp.abs(ns_g).sum()) > 0.0


def test_get_model_info(setup):
    cfg, model, params, args, _ = setup
    info = model.apply(params, params, method=RankingModel.get_model_info)
    assert info["total_params"] == info["embedding_params"] + info["dense_params"]
    assert info["embedding_params"] > 0
    assert info["forward_gflops_per_sample"] > 0


def test_task_logit_bias_init_lands_in_heads():
    """cfg.task_logit_bias_init seeds each task's output bias (label-prior
    init, round 5); default None keeps zero bias for both model families."""
    import numpy as np

    from recommend_tpu.models.din import DINRankingModel

    cfg = tiny_ranking_cfg(task_logit_bias_init=(-1.64, -2.77))
    data = make_ranking_data(cfg, num_samples=8, max_seq_per_feature=4, seed=0)
    batch = next(iter(ranking_batches(data, cfg, batch_size=4, num_epochs=1)))
    args = (
        {k: jnp.asarray(v) for k, v in batch["non_seq"].items()},
        {k: jnp.asarray(v) for k, v in batch["sequences"].items()},
        {k: jnp.asarray(v) for k, v in batch["seq_valid"].items()},
    )
    for model_cls in (RankingModel, DINRankingModel):
        params = jax.jit(model_cls(cfg).init)(jax.random.key(0), *args)
        p = params["params"]
        np.testing.assert_allclose(p["head_ctr_out"]["bias"], [-1.64])
        np.testing.assert_allclose(p["head_cvr_out"]["bias"], [-2.77])
    cfg0 = tiny_ranking_cfg()
    params = jax.jit(RankingModel(cfg0).init)(jax.random.key(0), *args)
    np.testing.assert_allclose(
        params["params"]["head_ctr_out"]["bias"], [0.0]
    )
