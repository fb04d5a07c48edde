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


def test_sparse_lr_ramp_schedule_values():
    """sparse_lr_schedule: linear sparse_lr_init → sparse_lr over
    sparse_lr_warmup_steps, constant after (config.sparse_lr_warmup_steps)."""
    from recommend_tpu.training.optimizer import sparse_lr_schedule

    cfg = tiny_ranking_cfg(sparse_lr=0.02, sparse_lr_init=0.002,
                           sparse_lr_warmup_steps=10)
    sched = sparse_lr_schedule(cfg)
    assert callable(sched)
    assert np.isclose(float(sched(0)), 0.002)
    assert np.isclose(float(sched(5)), 0.011)
    assert np.isclose(float(sched(10)), 0.02)
    assert np.isclose(float(sched(100)), 0.02)
    # disabled ramp stays a plain scalar (constant-LR call sites unchanged)
    assert sparse_lr_schedule(tiny_ranking_cfg(sparse_lr=0.05)) == 0.05


def test_sparse_lr_ramp_gates_first_table_update():
    """With sparse_lr_init=0 the step-0 touched-row update must leave every
    embedding table bit-identical while the dense params move — the ramp
    actually reaches the sparse path inside the jitted step."""
    cfg = tiny_ranking_cfg(
        use_sparse_embedding_updates=True, sparse_update_mode="rowwise",
        sparse_lr=0.05, sparse_lr_init=0.0, sparse_lr_warmup_steps=100,
    )
    data = make_ranking_data(cfg, num_samples=32, max_seq_per_feature=10, seed=0)
    it = ranking_batches(data, cfg, batch_size=8, seed=0)
    trainer = RankingTrainer(cfg)
    batch = next(it)
    state = trainer.init_state(jax.random.key(0), batch)
    tok0 = jax.tree_util.tree_map(
        np.asarray, state.params["params"]["tokenizer"]
    )
    state2, _ = trainer._train_step(state, trainer._put_batch(batch),
                                    jax.random.key(0))
    tok1 = state2.params["params"]["tokenizer"]
    for name, sub in tok0.items():
        if isinstance(sub, dict) and "embedding" in sub:
            np.testing.assert_array_equal(
                sub["embedding"], np.asarray(tok1[name]["embedding"]),
                err_msg=f"table {name} moved at sparse lr 0",
            )
    # dense params did move
    assert not np.allclose(
        np.asarray(tok0["ns_proj"]["kernel"]),
        np.asarray(tok1["ns_proj"]["kernel"]),
    )


@pytest.mark.slow
def test_track_best_params_selection():
    """track_best_params keeps an independent copy of the best-validation
    params (the non-oracle checkpoint-selection rule, oneTrans
    train.py:264-267) that survives later donated steps."""
    cfg = tiny_ranking_cfg(batch_size=16)
    data = make_ranking_data(cfg, num_samples=200, max_seq_per_feature=10, seed=0)
    it = ranking_batches(data, cfg, batch_size=16, seed=0)
    trainer = RankingTrainer(cfg)

    def val_fn():
        return itertools.islice(
            ranking_batches(data, cfg, batch_size=16, seed=2), 2
        )

    state = trainer.train(it, num_steps=12, val_fn=val_fn, eval_every=4,
                          log_every=100, track_best_params=True)
    assert trainer.best_params is not None
    assert trainer.best_val_step in (4, 8, 12)
    primary = f"{cfg.tasks[0]}_auc"
    assert primary in trainer.best_val_metrics
    best = max(h[primary] for h in trainer.history["val"])
    assert trainer.best_val_metrics[primary] == best
    # the snapshot is usable (re-evaluate) and independent of `state`
    m = trainer.evaluate(state._replace(params=trainer.best_params), val_fn())
    assert np.isclose(m[primary], best, atol=0.05)
