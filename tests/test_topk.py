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
