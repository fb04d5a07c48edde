import itertools

import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import retrieval_batches
from recommend_tpu.data.synthetic import make_retrieval_data
from recommend_tpu.training.trainer import RetrievalTrainer


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_config(
        "retrieval_small",
        embed_dim=32,
        num_layers=1,
        num_heads=2,
        ffn_dim=64,
        max_seq_len=16,
        compression_schedule=((8, 4), (8, 1)),
        video_vocab_size=500,
        warmup_steps=5,
        batch_size=16,
        dropout_rate=0.0,
        compute_dtype="float32",
    )


@pytest.mark.slow
def test_training_reduces_loss(tiny_cfg, tmp_path):
    data = make_retrieval_data(tiny_cfg, num_users=50, num_videos=200, seed=0)
    it = retrieval_batches(data, tiny_cfg, batch_size=16, seed=0)
    trainer = RetrievalTrainer(
        tiny_cfg, total_steps=60, checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    state = trainer.train(it, num_steps=60, log_every=10)
    losses = [h["loss"] for h in trainer.history["train"]]
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 60


def test_profiler_trace_written(tiny_cfg, tmp_path):
    import os

    data = make_retrieval_data(tiny_cfg, num_users=30, num_videos=100, seed=2)
    it = retrieval_batches(data, tiny_cfg, batch_size=16, seed=0)
    trainer = RetrievalTrainer(tiny_cfg, total_steps=8)
    prof_dir = str(tmp_path / "profile")
    trainer.train(it, num_steps=8, log_every=100, profile_dir=prof_dir,
                  profile_start=2, profile_num_steps=3)
    # jax.profiler writes plugins/profile/<run>/ with trace artifacts
    found = []
    for root, _dirs, files in os.walk(prof_dir):
        found += [os.path.join(root, f) for f in files]
    assert any("trace" in f or f.endswith((".pb", ".json.gz", ".xplane.pb"))
               for f in found), found


@pytest.mark.slow
def test_checkpoint_restore_resumes(tiny_cfg, tmp_path):
    data = make_retrieval_data(tiny_cfg, num_users=30, num_videos=100, seed=1)
    ckpt_dir = str(tmp_path / "ckpt2")
    it = retrieval_batches(data, tiny_cfg, batch_size=16, seed=0)
    t1 = RetrievalTrainer(tiny_cfg, total_steps=20, checkpoint_dir=ckpt_dir)
    t1.train(it, num_steps=10, log_every=5)
    t1.ckpt.wait()
    # a fresh trainer restores at step 10 and continues
    t2 = RetrievalTrainer(tiny_cfg, total_steps=20, checkpoint_dir=ckpt_dir)
    it2 = retrieval_batches(data, tiny_cfg, batch_size=16, seed=1)
    state = t2.init_state(__import__("jax").random.key(0), next(it2))
    assert int(state.step) == 10


def test_evaluate_returns_metrics(tiny_cfg):
    data = make_retrieval_data(tiny_cfg, num_users=30, num_videos=100, seed=2)
    trainer = RetrievalTrainer(tiny_cfg, total_steps=10)
    it = retrieval_batches(data, tiny_cfg, batch_size=16, seed=0)
    import jax

    state = trainer.init_state(jax.random.key(0), next(it))
    val = itertools.islice(retrieval_batches(data, tiny_cfg, batch_size=16, seed=3), 2)
    metrics = trainer.evaluate(state, val)
    assert "recall@1" in metrics and "mrr" in metrics
    assert 0.0 <= metrics["mrr"] <= 1.0


@pytest.mark.slow
def test_seq2seq_training_mode(tiny_cfg):
    """Causal all-positions self-supervised mode trains and reduces loss."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, use_causal_mask=True)
    data = make_retrieval_data(cfg, num_users=50, num_videos=200, seed=3)
    it = retrieval_batches(data, cfg, batch_size=16, seed=0)
    trainer = RetrievalTrainer(cfg, total_steps=40, mode="seq2seq")
    trainer.train(it, num_steps=40, log_every=10)
    losses = [h["loss"] for h in trainer.history["train"]]
    assert losses[-1] < losses[0], losses


def test_seq2seq_loss_matches_hand_computation():
    """One position of the vmapped seq2seq loss == the single-position loss."""
    import jax.numpy as jnp
    from recommend_tpu.models.losses import (
        in_batch_softmax_loss,
        seq2seq_in_batch_loss,
    )

    rng = np.random.default_rng(0)
    b, r, k, d = 4, 3, 2, 8
    interests = jnp.asarray(rng.normal(size=(b, r, k, d)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(b, r, d)).astype(np.float32))
    pop = jnp.asarray(rng.uniform(0.01, 0.2, (b, r)).astype(np.float32))
    valid = jnp.ones((b, r), dtype=bool)
    total, _ = seq2seq_in_batch_loss(interests, items, pop, valid, 0.1)
    per_pos = [
        float(in_batch_softmax_loss(
            interests[:, j], items[:, j], pop[:, j], 0.1
        )[0])
        for j in range(r)
    ]
    np.testing.assert_allclose(float(total), np.mean(per_pos), rtol=1e-5)


@pytest.mark.slow
def test_masked_item_training_mode(tiny_cfg):
    """BERT4Rec-style masked-item objective trains and reduces loss."""
    data = make_retrieval_data(tiny_cfg, num_users=50, num_videos=200, seed=5)
    it = retrieval_batches(data, tiny_cfg, batch_size=16, seed=0)
    trainer = RetrievalTrainer(tiny_cfg, total_steps=40, mode="masked")
    trainer.train(it, num_steps=40, log_every=10)
    losses = [h["loss"] for h in trainer.history["train"]]
    assert losses[-1] < losses[0], losses


def test_masked_outputs_see_context_not_target():
    """The output at a masked position must depend on the surrounding context
    but NOT on the masked item itself (it was replaced by [MASK])."""
    import jax
    import jax.numpy as jnp
    from recommend_tpu.config import get_config
    from recommend_tpu.models.retrieval import RetrievalTower

    cfg = get_config(
        "retrieval_small", embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
        max_seq_len=16, compression_schedule=((8, 4), (8, 1)),
        video_vocab_size=500, dropout_rate=0.0, compute_dtype="float32",
    )
    data = make_retrieval_data(cfg, num_users=10, num_videos=100, seed=0)
    batch = next(iter(retrieval_batches(data, cfg, batch_size=2, num_epochs=1)))
    model = RetrievalTower(cfg)
    feats = {k: jnp.asarray(v) for k, v in batch["history"].items()}
    valid = jnp.asarray(batch["history_valid"])
    params = model.init(jax.random.key(0), feats, valid)
    pos = jnp.asarray([[14], [14]])  # a raw tail position
    out1 = model.apply(params, feats, valid, pos,
                       method=RetrievalTower.masked_position_outputs)
    # change the masked item's id → output unchanged (it was masked out)
    feats2 = dict(feats, video_id=feats["video_id"].at[:, 14].set(99))
    out2 = model.apply(params, feats2, valid, pos,
                       method=RetrievalTower.masked_position_outputs)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # change a context item → output changes
    feats3 = dict(feats, video_id=feats["video_id"].at[:, 13].set(99))
    out3 = model.apply(params, feats3, valid, pos,
                       method=RetrievalTower.masked_position_outputs)
    assert float(jnp.max(jnp.abs(out1 - out3))) > 1e-6
