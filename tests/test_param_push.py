"""Incremental parameter push (serving.param_push): the MB-scale transport
behind the reference's minute-level online update (translation:210-214)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recommend_tpu.data.pipeline import ranking_batches
from recommend_tpu.data.synthetic import make_ranking_data
from recommend_tpu.serving.param_push import (
    PushTracker,
    apply_push,
    build_push,
    load_push,
    push_nbytes,
    save_push,
    table_keys,
)
from recommend_tpu.training.ranking_trainer import RankingTrainer
from tests.test_ranking_model import tiny_ranking_cfg


def _sparse_cfg(**kw):
    return tiny_ranking_cfg(
        use_sparse_embedding_updates=True,
        sparse_update_mode="rowwise",
        batch_size=4,
        **kw,
    )


@pytest.fixture(scope="module")
def trained():
    """Base params + params after 6 observed steps + the tracker's delta."""
    cfg = _sparse_cfg()
    data = make_ranking_data(cfg, num_samples=24, max_seq_per_feature=8, seed=0)
    trainer = RankingTrainer(cfg)
    batches = list(
        itertools.islice(ranking_batches(data, cfg, batch_size=4, seed=0), 6)
    )
    # the BASE checkpoint a serving replica would hold: train() re-derives
    # the identical init (same seed, same first batch, deterministic init)
    base = trainer.init_state(jax.random.key(0), batches[0]).params
    base = jax.tree_util.tree_map(np.asarray, base)
    tracker = PushTracker(cfg)
    state = trainer.train(tracker.wrap(iter(batches)), num_steps=6, log_every=10)
    return cfg, trainer, base, state.params, tracker


def test_tracker_marks_exactly_the_batch_ids():
    cfg = _sparse_cfg()
    data = make_ranking_data(cfg, num_samples=8, max_seq_per_feature=6, seed=1)
    batch = next(iter(ranking_batches(data, cfg, batch_size=4, seed=0)))
    tracker = PushTracker(cfg)
    tracker.observe(batch)
    snap = tracker.snapshot()
    assert set(snap) == set(table_keys(cfg))
    for f in cfg.non_seq_features:
        want = np.unique(np.asarray(batch["non_seq"][f]).ravel())
        np.testing.assert_array_equal(snap[f"embed_{f}"], want)
    want_items = np.unique(
        np.concatenate(
            [
                np.asarray(batch["sequences"][sf])[np.asarray(batch["seq_valid"][sf])]
                for sf in cfg.sequence_features
            ]
        )
    )
    np.testing.assert_array_equal(snap["embed_seq_item"], want_items)
    # reset started a fresh window
    assert all(v.size == 0 for v in tracker.snapshot().values())


def test_push_reconstructs_trainer_params_exactly(trained):
    """A replica holding the BASE checkpoint + the delta equals the trainer's
    current params bit-for-bit: the dense tree is a full snapshot and every
    sparse-updated row's id was observed (touched-row adagrad moves nothing
    else)."""
    cfg, trainer, base, final, tracker = trained
    push = build_push(final, tracker.snapshot(reset=False), step=6)
    rebuilt = apply_push(jax.tree_util.tree_map(jnp.array, base), push)
    flat_r = jax.tree_util.tree_leaves_with_path(rebuilt)
    flat_f = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(final)
    )
    assert len(flat_r) == len(flat_f)
    for path, leaf in flat_r:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_f[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path),
        )


def test_push_is_delta_sized_not_checkpoint_sized(trained):
    cfg, trainer, base, final, tracker = trained
    push = build_push(final, tracker.snapshot(reset=False), step=6)
    full = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, final)
        )
    )
    # 6 tiny batches touch a fraction of the 100/200-row vocabs; the push
    # must be visibly smaller than the checkpoint (at flagship scale the
    # table term is ~1000× smaller — this pins the mechanism)
    assert push_nbytes(push) < full
    touched = sum(d["ids"].size for d in push["tables"].values())
    total_rows = sum(cfg.vocab_size(f) for f in cfg.non_seq_features)
    assert 0 < touched < total_rows


def test_push_npz_round_trip(tmp_path, trained):
    cfg, trainer, base, final, tracker = trained
    push = build_push(final, tracker.snapshot(reset=False), step=6)
    path = str(tmp_path / "push.npz")
    nbytes = save_push(push, path)
    assert nbytes > 0
    loaded = load_push(path, dense_like=base)
    assert loaded["step"] == 6
    rebuilt = apply_push(jax.tree_util.tree_map(jnp.array, base), loaded)
    want = apply_push(jax.tree_util.tree_map(jnp.array, base), push)
    for a, b in zip(
        jax.tree_util.tree_leaves(rebuilt), jax.tree_util.tree_leaves(want)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_rows_halve_bytes_within_tolerance(trained):
    cfg, trainer, base, final, tracker = trained
    snap = tracker.snapshot(reset=False)
    exact = build_push(final, snap, step=6)
    compact = build_push(final, snap, step=6, rows_dtype=jnp.bfloat16)
    for k in exact["tables"]:
        assert compact["tables"][k]["rows"].nbytes * 2 == exact["tables"][k][
            "rows"
        ].nbytes
        np.testing.assert_allclose(
            np.asarray(compact["tables"][k]["rows"], np.float32),
            exact["tables"][k]["rows"],
            rtol=8e-3,
            atol=1e-6,
        )


def test_engine_apply_push_serves_new_params(trained):
    from recommend_tpu.serving.ranking_service import RankingInferenceEngine

    cfg, trainer, base, final, tracker = trained
    push = build_push(final, tracker.snapshot(reset=False), step=6)
    # max_seq_len matches the training shapes: serving-path params (q_s on
    # pruned-away layers) only exist for the keep profile the model was
    # initialized under
    eng = RankingInferenceEngine(
        cfg, jax.tree_util.tree_map(jnp.array, base), max_seq_len=8
    )
    fresh = RankingInferenceEngine(cfg, final, max_seq_len=8)
    user = {f: 1 for f in cfg.user_features + cfg.context_features}
    cands = [{f: 2 for f in cfg.item_features}]
    seqs = {cfg.sequence_features[0]: [1, 2, 3]}
    eng.update_session("s", seqs)
    eng.apply_push(push)  # hot reload: sessions re-encoded under new params
    got = eng.score_session("s", user, cands)
    fresh.update_session("s", seqs)
    want = fresh.score_session("s", user, cands)
    for t in cfg.tasks:
        np.testing.assert_allclose(got[0][t], want[0][t], atol=1e-6)
