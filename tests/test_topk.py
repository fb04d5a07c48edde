import jax.numpy as jnp
import numpy as np

from recommend_tpu.ops.topk import score_items, sharded_topk_retrieval, topk_retrieval
from recommend_tpu.parallel.mesh import make_mesh


def test_score_items_max_over_interests():
    q = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])  # [1, 2, 2]
    items = jnp.asarray([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    s = score_items(q, items)
    np.testing.assert_allclose(np.asarray(s), [[2.0, 3.0, 1.0]])


def test_topk_retrieval():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(3, 2, 8)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(100, 8)).astype(np.float32))
    s, i = topk_retrieval(q, items, 7)
    full = np.asarray(score_items(q, items))
    expected = np.sort(full, axis=1)[:, ::-1][:, :7]
    np.testing.assert_allclose(np.asarray(s), expected, rtol=1e-5)


def test_sharded_matches_single(devices):
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 3, 16)).astype(np.float32))
    items = rng.normal(size=(800, 16)).astype(np.float32)
    s1, i1 = topk_retrieval(q, jnp.asarray(items), 25)
    s2, i2 = sharded_topk_retrieval(mesh, q, jnp.asarray(items), 25)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_quantize_corpus_roundtrip():
    from recommend_tpu.ops.topk import quantize_corpus

    rng = np.random.default_rng(0)
    items = rng.normal(size=(64, 16)).astype(np.float32) * rng.uniform(
        0.1, 10, (64, 1)
    )
    q, s = quantize_corpus(jnp.asarray(items))
    assert q.dtype == jnp.int8 and s.shape == (64,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    err = np.abs(deq - items).max(axis=1) / np.abs(items).max(axis=1)
    assert err.max() <= 1 / 127 + 1e-6  # per-row symmetric int8 bound


def test_topk_retrieval_quantized_matches_exact():
    """int8-quantized exact top-k must nearly reproduce the f32 ranking; the
    approx_max_k variant must hit its recall target."""
    from recommend_tpu.ops.topk import quantize_corpus, topk_retrieval_quantized

    rng = np.random.default_rng(1)
    V, D, B = 5000, 32, 4
    items = rng.normal(size=(V, D)).astype(np.float32)
    interests = jnp.asarray(rng.normal(size=(B, 3, D)).astype(np.float32))
    sc_ref, id_ref = topk_retrieval(interests, jnp.asarray(items), 50)
    q, s = quantize_corpus(jnp.asarray(items))
    sc_q, id_q = topk_retrieval_quantized(interests, q, s, 50)
    overlap = np.mean(
        [
            len(set(np.asarray(id_ref[b]).tolist()) & set(np.asarray(id_q[b]).tolist())) / 50
            for b in range(B)
        ]
    )
    assert overlap >= 0.9, overlap
    sc_a, id_a = topk_retrieval_quantized(interests, q, s, 50, 0.95)
    rec = np.mean(
        [
            len(set(np.asarray(id_ref[b]).tolist()) & set(np.asarray(id_a[b]).tolist())) / 50
            for b in range(B)
        ]
    )
    assert rec >= 0.85, rec


def test_retrieval_index_quantized_path():
    """RetrievalIndex(quantize="int8", approx_recall=...) serves nearly the
    same ids as the exact flat index."""
    import jax

    from recommend_tpu import get_config
    from recommend_tpu.data.pipeline import retrieval_batches
    from recommend_tpu.data.synthetic import make_retrieval_data
    from recommend_tpu.models.retrieval import RetrievalTower
    from recommend_tpu.serving.retrieval_service import RetrievalIndex

    cfg = get_config(
        "retrieval_small",
        embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64, max_seq_len=16,
        compression_schedule=((8, 4), (8, 1)), video_vocab_size=500,
        batch_size=8, dropout_rate=0.0, compute_dtype="float32", top_k=20,
    )
    data = make_retrieval_data(cfg, num_users=10, num_videos=500, seed=0)
    model = RetrievalTower(cfg)
    batch = next(iter(retrieval_batches(data, cfg, batch_size=4, num_epochs=1)))
    params = jax.jit(model.init)(
        jax.random.key(0),
        {k: jnp.asarray(v) for k, v in batch["history"].items()},
        jnp.asarray(batch["history_valid"]),
    )
    exact = RetrievalIndex(cfg, model, params)
    quant = RetrievalIndex(cfg, model, params, quantize="int8", approx_recall=0.95)
    exact.build(data.corpus_features())
    quant.build(data.corpus_features())
    rng = np.random.default_rng(2)
    interests = jnp.asarray(
        rng.normal(size=(2, cfg.num_query_tokens, cfg.embed_dim)).astype(np.float32)
    )
    _, ide = exact.search(interests, top_k=20)
    _, idq = quant.search(interests, top_k=20)
    overlap = np.mean(
        [len(set(ide[b].tolist()) & set(idq[b].tolist())) / 20 for b in range(2)]
    )
    assert overlap >= 0.8, overlap
