"""IVF ANN index (ops/ivf.py) — parity with FAISS "IVF1024,Flat"
(kuaiformer config.py:55, evaluate.py:26-45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommend_tpu.ops.ivf import (
    IVFIndex,
    build_ivf,
    ivf_search,
    ivf_search_interests,
)
from recommend_tpu.ops.topk import topk_retrieval


def _corpus(v=2000, d=32, clusters=16, seed=0):
    """Clustered synthetic corpus so k-means has real structure."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(clusters, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, clusters, size=v)
    x = centers[assign] + rng.normal(size=(v, d)).astype(np.float32)
    return x.astype(np.float32)


def test_build_indexes_every_item_exactly_once():
    items = _corpus()
    idx = build_ivf(items, n_clusters=16, iters=5)
    ids = np.asarray(idx.bucket_ids).ravel()
    real = ids[ids >= 0]
    assert len(real) == len(items)
    assert len(np.unique(real)) == len(items)
    assert idx.bucket_embs.shape == (*idx.bucket_ids.shape, items.shape[1])
    # bucketed embeddings match the corpus rows
    np.testing.assert_allclose(
        np.asarray(idx.bucket_embs).reshape(-1, items.shape[1])[ids >= 0],
        items[real],
    )


def test_search_full_probe_matches_exact():
    """nprobe == n_clusters must reproduce exact brute-force top-k."""
    items = _corpus()
    idx = build_ivf(items, n_clusters=16, iters=5)
    q = jnp.asarray(_corpus(8, 32, seed=3)[:8])
    s_ivf, i_ivf = ivf_search(idx, q, k=10, nprobe=16)
    s_ref, i_ref = topk_retrieval(q[:, None, :], jnp.asarray(items), 10)
    np.testing.assert_allclose(
        np.sort(np.asarray(s_ivf), axis=1),
        np.sort(np.asarray(s_ref), axis=1),
        rtol=1e-5,
    )
    # ids agree as sets per row (ties may reorder)
    for a, b in zip(np.asarray(i_ivf), np.asarray(i_ref)):
        assert set(a.tolist()) == set(b.tolist())


def test_search_partial_probe_recall():
    """A handful of probes on clustered data should reach high recall@10."""
    items = _corpus(v=4000, d=32, clusters=32, seed=1)
    idx = build_ivf(items, n_clusters=32, iters=8)
    q = jnp.asarray(items[::397][:10] + 0.01)  # near-corpus queries
    _, i_ivf = ivf_search(idx, q, k=10, nprobe=8)
    _, i_ref = topk_retrieval(q[:, None, :], jnp.asarray(items), 10)
    hits = sum(
        len(set(a.tolist()) & set(b.tolist()))
        for a, b in zip(np.asarray(i_ivf), np.asarray(i_ref))
    )
    assert hits / (10 * 10) >= 0.9, hits


def test_forced_small_capacity_pads_with_minus_one():
    items = _corpus(v=500, d=16, clusters=8)
    idx = build_ivf(items, n_clusters=8, iters=4, capacity=16)
    assert idx.capacity == 16
    s, i = ivf_search(idx, jnp.asarray(items[:4]), k=5, nprobe=2)
    assert np.all(np.asarray(i) >= -1)
    # padding never outranks a real item
    s = np.asarray(s)
    i = np.asarray(i)
    for r in range(4):
        real = i[r] >= 0
        if real.any() and (~real).any():
            assert s[r][real].min() >= s[r][~real].max()


def test_multi_interest_union_max_merge():
    items = _corpus(v=1000, d=16, clusters=8, seed=2)
    idx = build_ivf(items, n_clusters=8, iters=4)
    interests = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 4, 16)).astype(np.float32)
    )
    s, i = ivf_search_interests(idx, interests, k=20, nprobe=8)
    assert s.shape == (3, 20) and i.shape == (3, 20)
    for row in range(3):
        ids = i[row][i[row] >= 0]
        assert len(np.unique(ids)) == len(ids)  # deduped
        assert np.all(np.diff(s[row]) <= 1e-6)  # sorted desc
    # full probe → equals exact per-interest max-merge
    s_ref, i_ref = topk_retrieval(interests, jnp.asarray(items), 20)
    np.testing.assert_allclose(
        np.sort(s, axis=1), np.sort(np.asarray(s_ref), axis=1), rtol=1e-5
    )


def test_kmeans_handles_duplicate_points():
    """Degenerate corpus (many identical rows → empty clusters) must build."""
    items = np.ones((64, 8), dtype=np.float32)
    items[:4] = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    idx = build_ivf(items, n_clusters=8, iters=4)
    ids = np.asarray(idx.bucket_ids).ravel()
    assert len(np.unique(ids[ids >= 0])) == 64
    s, i = ivf_search(idx, jnp.asarray(items[:2]), k=4, nprobe=8)
    assert np.all(np.asarray(i) >= 0)


def test_kmeans_padding_rows_do_not_drag_centroids():
    """Padding rows (zeros) must not participate in centroid updates — with
    small chunks most of the padded matrix is zeros and an unmasked Lloyd's
    would drag one centroid to the origin."""
    from recommend_tpu.ops.ivf import kmeans_corpus

    rng = np.random.default_rng(0)
    K, D = 4, 16
    centers = rng.normal(size=(K, D)) * 10 + 20  # all far from the origin
    true = rng.integers(0, K, 130)
    emb = (centers[true] + rng.normal(size=(130, D)) * 0.05).astype(np.float32)
    # chunk=128 → pads to 256: 126 zero rows (~half the matrix)
    cents, assign = kmeans_corpus(emb, n_clusters=K, iters=10, seed=2, chunk=128)
    norms = np.linalg.norm(np.asarray(cents), axis=1)
    true_norms = np.linalg.norm(centers, axis=1)
    assert norms.min() > 0.5 * true_norms.min(), norms
    assert len(assign) == 130


def test_ivf_int8_matches_f32():
    """int8 bucket embeddings: same probe set, near-identical ranking."""
    from recommend_tpu.ops.ivf import build_ivf, ivf_search

    rng = np.random.default_rng(3)
    V, D = 3000, 32
    items = rng.normal(size=(V, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(6, D)).astype(np.float32))
    f32 = build_ivf(items, n_clusters=32, iters=6, seed=0)
    i8 = build_ivf(items, n_clusters=32, iters=6, seed=0, quantize="int8")
    assert i8.bucket_embs.dtype == jnp.int8
    assert i8.bucket_scales.shape == i8.bucket_ids.shape
    _, ref = ivf_search(f32, q, 50, nprobe=8)
    _, got = ivf_search(i8, q, 50, nprobe=8)
    overlap = np.mean([
        len(set(np.asarray(ref[b]).tolist()) & set(np.asarray(got[b]).tolist())) / 50
        for b in range(6)
    ])
    assert overlap >= 0.9, overlap
