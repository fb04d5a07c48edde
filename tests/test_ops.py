import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.ops.attention import (
    MultiHeadAttention,
    causal_band_mask,
    dot_product_attention,
    padding_mask_bias,
)
from recommend_tpu.ops.normalization import RMSNorm
from recommend_tpu.ops.transformer import TransformerBlock


def test_rmsnorm_matches_numpy():
    x = np.random.default_rng(0).normal(size=(2, 5, 8)).astype(np.float32)
    m = RMSNorm()
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)


def test_causal_band_mask_full():
    m = causal_band_mask(4, 4)
    allowed = np.asarray(m) == 0.0
    expected = np.tril(np.ones((4, 4), dtype=bool))
    np.testing.assert_array_equal(allowed, expected)


def test_causal_band_mask_tail_queries():
    # 2 tail queries over 5 kv positions: query 0 ↔ abs pos 3, query 1 ↔ 4
    m = causal_band_mask(2, 5)
    allowed = np.asarray(m) == 0.0
    expected = np.array(
        [[1, 1, 1, 1, 0], [1, 1, 1, 1, 1]], dtype=bool
    )
    np.testing.assert_array_equal(allowed, expected)


def test_attention_padding_is_ignored():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 16)).astype(np.float32)
    valid = np.array([[True, True, True, True, False, False]])
    m = MultiHeadAttention(num_heads=2, embed_dim=16)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    bias = padding_mask_bias(jnp.asarray(valid))
    y1 = m.apply(params, jnp.asarray(x), bias=bias)
    x2 = x.copy()
    x2[:, 4:] = 123.0  # perturb padded keys only
    y2 = m.apply(params, jnp.asarray(x2), bias=bias)
    # valid-position outputs must be unaffected by padded-key content
    np.testing.assert_allclose(
        np.asarray(y1)[:, :4], np.asarray(y2)[:, :4], atol=1e-5
    )


def test_dot_product_attention_identity():
    # single kv position → output == v at that position
    q = jnp.ones((1, 3, 2, 4))
    k = jnp.ones((1, 1, 2, 4))
    v = jnp.arange(8.0).reshape(1, 1, 2, 4)
    out = dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(v), (1, 3, 2, 4)), rtol=1e-6
    )


def test_transformer_block_shapes():
    x = jnp.zeros((2, 10, 32))
    blk = TransformerBlock(embed_dim=32, num_heads=4, ffn_dim=64)
    params = blk.init(jax.random.key(0), x)
    y = blk.apply(params, x)
    assert y.shape == (2, 10, 32)
