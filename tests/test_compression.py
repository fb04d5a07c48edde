import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.config import get_config
from recommend_tpu.ops.compression import AdaptiveCompression


def test_token_count_matches_schedule():
    # default schedule: 256 → 2 + 5 + 48 = 55 tokens (kuaiformer parity)
    cfg = get_config(
        "retrieval_small",
        max_seq_len=256,
        compression_schedule=((128, 64), (80, 16), (48, 1)),
    )
    m = AdaptiveCompression(cfg)
    x = jnp.zeros((2, 256, cfg.embed_dim))
    valid = jnp.ones((2, 256), dtype=bool)
    params = m.init(jax.random.key(0), x, valid)
    tokens, tok_valid = m.apply(params, x, valid)
    assert tokens.shape == (2, 55, cfg.embed_dim)
    assert tok_valid.shape == (2, 55)
    assert bool(jnp.all(tok_valid))


def test_padded_groups_marked_invalid():
    cfg = get_config("retrieval_small")  # schedule (32,16),(16,8),(16,1) → 2+2+16
    L = cfg.max_seq_len
    m = AdaptiveCompression(cfg)
    x = jnp.ones((1, L, cfg.embed_dim))
    valid = np.zeros((1, L), dtype=bool)
    valid[0, -10:] = True  # only last 10 items valid (left-padded history)
    params = m.init(jax.random.key(0), x, jnp.asarray(valid))
    tokens, tok_valid = m.apply(params, x, jnp.asarray(valid))
    tv = np.asarray(tok_valid[0])
    # first segment (2 groups of 16, items 0..31): all padded → invalid
    assert not tv[:2].any()
    # raw tail tokens: last 10 valid, the preceding 6 invalid
    assert tv[-10:].all() and not tv[4:-10].any()


def test_compression_invariant_to_padding_content():
    cfg = get_config("retrieval_small")
    L = cfg.max_seq_len
    m = AdaptiveCompression(cfg)
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(1, L, cfg.embed_dim)).astype(np.float32)
    valid = np.zeros((1, L), dtype=bool)
    valid[0, L // 2 :] = True
    params = m.init(jax.random.key(0), jnp.asarray(x1), jnp.asarray(valid))
    t1, _ = m.apply(params, jnp.asarray(x1), jnp.asarray(valid))
    x2 = x1.copy()
    x2[0, : L // 2] = 55.0  # change padded content only
    t2, _ = m.apply(params, jnp.asarray(x2), jnp.asarray(valid))
    valid_tokens = np.asarray(t1) - np.asarray(t2)
    # tokens composed of valid items must not change
    tv = np.asarray(m.apply(params, jnp.asarray(x1), jnp.asarray(valid))[1][0])
    np.testing.assert_allclose(valid_tokens[0][tv], 0.0, atol=1e-5)
