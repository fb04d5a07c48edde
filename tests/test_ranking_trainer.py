import itertools

import jax
import numpy as np
import pytest

from recommend_tpu.config import get_config
from recommend_tpu.data.pipeline import ranking_batches
from recommend_tpu.data.synthetic import make_ranking_data
from recommend_tpu.training.optimizer import make_ranking_optimizer
from recommend_tpu.training.ranking_trainer import RankingTrainer
from tests.test_ranking_model import tiny_ranking_cfg


@pytest.mark.slow
def test_training_reduces_loss(tmp_path):
    cfg = tiny_ranking_cfg(batch_size=16)
    data = make_ranking_data(cfg, num_samples=200, max_seq_per_feature=10, seed=0)
    it = ranking_batches(data, cfg, batch_size=16, seed=0)
    trainer = RankingTrainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.train(it, num_steps=100, log_every=10)
    losses = [h["loss"] for h in trainer.history["train"]]
    # compare head vs tail means (per-step loss is noisy on tiny batches)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


@pytest.mark.slow
def test_eval_reports_auc():
    cfg = tiny_ranking_cfg(batch_size=16)
    data = make_ranking_data(cfg, num_samples=100, max_seq_per_feature=10, seed=1)
    trainer = RankingTrainer(cfg)
    it = ranking_batches(data, cfg, batch_size=16, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    val = itertools.islice(ranking_batches(data, cfg, batch_size=16, seed=2), 3)
    m = trainer.evaluate(state, val)
    for t in cfg.tasks:
        assert f"{t}_auc" in m
        assert 0.0 <= m[f"{t}_auc"] <= 1.0


def test_dual_optimizer_partitions_params():
    """Embedding tables get adagrad; dense params get rmsprop (oneTrans
    config.py:39-52)."""
    cfg = tiny_ranking_cfg()
    opt = make_ranking_optimizer(cfg)
    data = make_ranking_data(cfg, num_samples=32, max_seq_per_feature=10, seed=0)
    it = ranking_batches(data, cfg, batch_size=8, seed=0)
    trainer = RankingTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), next(it))
    from recommend_tpu.training.optimizer import _is_sparse_path

    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: _is_sparse_path(p), state.params
    )
    flat = jax.tree_util.tree_leaves_with_path(labels)
    sparse = [k for k, v in flat if v]
    dense = [k for k, v in flat if not v]
    assert len(sparse) > 0 and len(dense) > 0
    # all embed tables are sparse-labeled
    assert all(
        any(getattr(p, "key", "") == "embedding" for p in path) for path in sparse
    )
