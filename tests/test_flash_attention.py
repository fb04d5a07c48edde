"""Differential tests: Pallas flash band attention vs the jnp reference path.

Runs in interpreter mode on CPU (pltpu.force_tpu_interpret_mode); the same
kernel is exercised compiled on real TPU by bench/verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from recommend_tpu.ops.attention import (
    causal_band_mask,
    dot_product_attention,
    padding_mask_bias,
)
from recommend_tpu.ops.pallas.flash_attention import flash_attention_bhld


def _ref(q, k, v, kv_valid, q_offset, causal):
    bias = padding_mask_bias(kv_valid)
    if causal:
        bias = bias + causal_band_mask(q.shape[1], k.shape[1], q_offset)[None, None]
    return dot_product_attention(q, k, v, bias)


def _rand(b, lq, lkv, h, dh, seed=0, pad_tail=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, lq, h, dh)).astype(np.float32)
    k = rng.normal(size=(b, lkv, h, dh)).astype(np.float32)
    v = rng.normal(size=(b, lkv, h, dh)).astype(np.float32)
    valid = np.ones((b, lkv), dtype=bool)
    if pad_tail:
        valid[:, :pad_tail] = False  # left-padded keys
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid)


CASES = [
    # (b, lq, lkv, h, dh, pad, causal)  — incl. non-multiple-of-block lengths
    (2, 128, 128, 2, 64, 0, True),
    (2, 181, 362, 2, 64, 17, True),   # pyramid layer-0 shape
    (1, 64, 64, 1, 64, 5, False),
    (2, 12, 140, 2, 64, 30, True),    # NS-window-like tail queries
    (1, 256, 512, 4, 32, 0, True),
    # Dh % 128 == 0 → model-layout multi-head kernel (no transposes)
    (2, 181, 362, 2, 128, 17, True),  # the bench geometry
    (2, 100, 231, 1, 128, 9, True),
    (1, 70, 70, 2, 128, 0, False),
    (1, 90, 181, 3, 128, 11, True),   # h=3 — the OneTrans-L head count
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_reference(case):
    b, lq, lkv, h, dh, pad, causal = case
    q, k, v, valid = _rand(b, lq, lkv, h, dh, seed=hash(case) % 2**31, pad_tail=pad)
    ref = _ref(q, k, v, valid, lkv - lq, causal)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bhld(q, k, v, valid, lkv - lq, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_gradients_match_reference():
    b, lq, lkv, h, dh = 1, 96, 160, 2, 32
    q, k, v, valid = _rand(b, lq, lkv, h, dh, seed=7, pad_tail=10)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_ref(q, k, v, valid, lkv - lq, True)))

    def loss_flash(q, k, v):
        return jnp.sum(
            jnp.square(flash_attention_bhld(q, k, v, valid, lkv - lq, True))
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_fl, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_gradients_match_reference_mh_kernel():
    """Same as above but at Dh=128 — the model-layout multi-head kernel."""
    b, lq, lkv, h, dh = 2, 53, 117, 2, 128
    q, k, v, valid = _rand(b, lq, lkv, h, dh, seed=11, pad_tail=13)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_ref(q, k, v, valid, lkv - lq, True)))

    def loss_flash(q, k, v):
        return jnp.sum(
            jnp.square(flash_attention_bhld(q, k, v, valid, lkv - lq, True))
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g_ref, g_fl, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_fully_padded_row_is_finite():
    """A batch row whose keys are ALL padded must not produce NaN (matches the
    jnp path's uniform-softmax degradation)."""
    b, lq, lkv, h, dh = 2, 16, 32, 1, 32
    q, k, v, valid = _rand(b, lq, lkv, h, dh, seed=3)
    valid = valid.at[0].set(False)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bhld(q, k, v, valid, lkv - lq, False)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_ranking_model_flash_path_matches_jnp():
    """Full ranking forward with use_flash_attention on vs off (interpret)."""
    import jax

    from recommend_tpu.data.pipeline import ranking_batches
    from recommend_tpu.data.synthetic import make_ranking_data
    from recommend_tpu.models.ranking import RankingModel
    from tests.test_ranking_model import tiny_ranking_cfg

    cfg = tiny_ranking_cfg(embed_dim=64, num_heads=2)  # Dh=32
    cfg_flash = tiny_ranking_cfg(embed_dim=64, num_heads=2, use_flash_attention=True)
    data = make_ranking_data(cfg, num_samples=8, max_seq_per_feature=48, seed=0)
    batch = next(iter(ranking_batches(data, cfg, batch_size=2, num_epochs=1)))
    args = (
        {k: jnp.asarray(v) for k, v in batch["non_seq"].items()},
        {k: jnp.asarray(v) for k, v in batch["sequences"].items()},
        {k: jnp.asarray(v) for k, v in batch["seq_valid"].items()},
    )
    m1, m2 = RankingModel(cfg), RankingModel(cfg_flash)
    params = m1.init(jax.random.key(0), *args)
    out1 = m1.apply(params, *args)
    with pltpu.force_tpu_interpret_mode():
        out2 = m2.apply(params, *args)
    for t in cfg.tasks:
        np.testing.assert_allclose(
            np.asarray(out1[t]), np.asarray(out2[t]), atol=1e-4, rtol=1e-4
        )


def test_segmented_kv_matches_concat_reference():
    """fused segmented-KV kernel ≡ reference attention over concatenated
    [S; NS] keys — forward and gradients (Dh=128, model layout)."""
    from recommend_tpu.ops.pallas.flash_attention import flash_attention_bhld_segkv

    b, lq, ls, n, h, dh = 2, 60, 101, 12, 2, 128
    lkv = ls + n
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, lq, h, dh)).astype(np.float32))
    k_s = jnp.asarray(rng.normal(size=(b, ls, h, dh)).astype(np.float32))
    v_s = jnp.asarray(rng.normal(size=(b, ls, h, dh)).astype(np.float32))
    k_ns = jnp.asarray(rng.normal(size=(b, n, h, dh)).astype(np.float32))
    v_ns = jnp.asarray(rng.normal(size=(b, n, h, dh)).astype(np.float32))
    s_valid = np.ones((b, ls), dtype=bool)
    s_valid[:, :7] = False
    s_valid = jnp.asarray(s_valid)
    kv_valid = jnp.concatenate([s_valid, jnp.ones((b, n), bool)], axis=1)

    def ref_loss(q, k_s, v_s, k_ns, v_ns):
        k = jnp.concatenate([k_s, k_ns], axis=1)
        v = jnp.concatenate([v_s, v_ns], axis=1)
        return jnp.sum(jnp.square(_ref(q, k, v, kv_valid, lkv - lq, True)))

    def seg_loss(q, k_s, v_s, k_ns, v_ns):
        return jnp.sum(jnp.square(flash_attention_bhld_segkv(
            q, k_s, v_s, k_ns, v_ns, s_valid, lkv - lq, True
        )))

    args = (q, k_s, v_s, k_ns, v_ns)
    ref_out = _ref(q, jnp.concatenate([k_s, k_ns], 1),
                   jnp.concatenate([v_s, v_ns], 1), kv_valid, lkv - lq, True)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(*args)
    with pltpu.force_tpu_interpret_mode():
        seg_out = flash_attention_bhld_segkv(
            q, k_s, v_s, k_ns, v_ns, s_valid, lkv - lq, True
        )
        g_seg = jax.grad(seg_loss, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(np.asarray(seg_out), np.asarray(ref_out),
                               atol=2e-5, rtol=2e-5)
    for a, b_, name in zip(g_ref, g_seg, ("dq", "dk_s", "dv_s", "dk_ns", "dv_ns")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_fused_group_vmem_budget_fallback():
    """`_fused_group_for` returns 0 when even one grid row's backward
    temporaries bust the ~13 MB VMEM budget — dispatchers must then take the
    blocked flash path, not the whole-tile kernel (advisor round-3 item 2)."""
    from recommend_tpu.ops.pallas.flash_attention import _fused_group_for

    # bench-scale geometries still group
    assert _fused_group_for(2, 192, 384) >= 1
    assert _fused_group_for(3, 368, 652) >= 1
    # near-FUSED_MAX_KV with large Lq: one row alone needs
    # 1024·1152·32 B ≈ 36 MB > budget → 0 (fall back)
    assert _fused_group_for(1, 1024, 1024) == 0
    # the model-layout dispatcher must route that geometry to the blocked
    # kernel without Mosaic compilation (interpret mode exercises dispatch)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    from recommend_tpu.ops.pallas.flash_attention import flash_attention_bhld

    b, lq, lkv, h, dh = 1, 1024, 1024, 1, 128
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, lq, h, dh), jnp.float32) * 0.1
    k = jax.random.normal(jax.random.key(1), (b, lkv, h, dh), jnp.float32) * 0.1
    v = jax.random.normal(jax.random.key(2), (b, lkv, h, dh), jnp.float32) * 0.1
    valid = jnp.ones((b, lkv), bool)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bhld(q, k, v, valid, q_offset=0, causal=True)
    assert out.shape == (b, lq, h, dh)
    assert bool(jnp.all(jnp.isfinite(out)))
