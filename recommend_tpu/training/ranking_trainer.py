"""Ranking trainer — capability parity with OneTransTrainer
(oneTrans train.py:19-420): multi-task BCE loop, dual optimizer
(sparse-adagrad / dense-rmsprop with momentum, config.py:39-52), global-norm
gradient clipping, streaming per-task AUC/accuracy for train & validation,
best-model tracking with early stopping, and checkpointing with config +
history snapshots.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommend_tpu.config import RankingConfig
from recommend_tpu.models.losses import multi_task_bce_loss
from recommend_tpu.models.ranking import RankingModel
from recommend_tpu.training.checkpoint import CheckpointManager
from recommend_tpu.training.metrics import streaming_auc
from recommend_tpu.training.optimizer import make_ranking_optimizer
from recommend_tpu.utils.logging import MetricLogger


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _device_batch(batch: Dict) -> Dict:
    return jax.tree_util.tree_map(jnp.asarray, batch)


class RankingTrainer:
    def __init__(
        self,
        cfg: RankingConfig,
        checkpoint_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
        mesh=None,
        model=None,
        total_steps: int = 0,
        debug_metrics: bool = False,
    ):
        """``model``: any module with RankingModel's apply signature — e.g.
        the DCNv2+DIN baseline (models/din.py). It must mount its feature
        tables under a `tokenizer` submodule for the sparse-update split.
        ``total_steps`` feeds the cosine dense-LR schedule when
        cfg.dense_lr_schedule == "cosine". ``debug_metrics`` adds training
        health scalars to each step's metrics (max |task logit|, item-table
        RMS, dense-param norm) — the instrumentation behind the
        learn-then-collapse stability study; off by default (the table RMS
        costs a full table read per step)."""
        self.debug_metrics = debug_metrics
        self.cfg = cfg
        self.mesh = mesh
        self.model = RankingModel(cfg) if model is None else model
        self.optimizer = make_ranking_optimizer(cfg, total_steps)
        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        self.logger = MetricLogger(log_dir)
        self.history: Dict[str, list] = {"train": [], "val": []}
        self._auc = streaming_auc()
        sparse = cfg.use_sparse_embedding_updates

        def seq_names_of(batch):
            """THE sequence-feature row layout: every consumer of the
            concatenated per-sequence grad rows (make_dummies,
            apply_sparse_updates, _put_batch's host-side compaction indices)
            derives it from this one predicate, so the global src indices can
            never scatter against a diverging layout."""
            return [sf for sf in cfg.sequence_features if sf in batch["sequences"]]

        self._seq_names_of = seq_names_of

        def make_dummies(batch):
            """Zeros that receive per-lookup embedding gradients (the
            sparse-update path, recommend_tpu.ops.sparse_embed)."""
            d = {}
            for f in cfg.non_seq_features:
                d[f"ns_{f}"] = jnp.zeros(
                    batch["non_seq"][f].shape + (cfg.feature_embed_dim,),
                    jnp.float32,
                )
            for sf in seq_names_of(batch):
                d[f"seq_{sf}"] = jnp.zeros(
                    batch["sequences"][sf].shape + (cfg.seq_item_feature_dim,),
                    jnp.float32,
                )
            return d

        # id-embedding tables maintained by the touched-row sparse path; they
        # are split OUT of the differentiated/optimized tree so the step never
        # materializes full-size zero cotangents for them nor streams them
        # through clip/rmsprop/apply_updates (profiled at >20 GB/step of HBM
        # traffic on [1M, 128] tables — the dominant step cost).
        self._table_keys = tuple(
            [f"embed_{f}" for f in cfg.non_seq_features] + ["embed_seq_item"]
        )

        def split_tables(params):
            inner = dict(params["params"])
            tok = dict(inner["tokenizer"])
            tables = {
                k: tok.pop(k)["embedding"] for k in self._table_keys if k in tok
            }
            inner["tokenizer"] = tok
            return {**params, "params": inner}, tables

        def merge_tables(dense_params, tables):
            inner = dict(dense_params["params"])
            tok = dict(inner["tokenizer"])
            for k, t in tables.items():
                tok[k] = {"embedding": t}
            inner["tokenizer"] = tok
            return {**dense_params, "params": inner}

        self._split_tables = split_tables
        self._merge_tables = merge_tables

        def loss_fn(params, dummies, batch, dropout_rng):
            logits = self.model.apply(
                params,
                batch["non_seq"],
                batch["sequences"],
                batch["seq_valid"],
                deterministic=False,
                dummies=dummies,
                rngs={"dropout": dropout_rng},
            )
            loss, metrics = multi_task_bce_loss(logits, batch["labels"])
            return loss, (metrics, logits)

        def sparse_loss_fn(dense_params, tables, dummies, batch, dropout_rng):
            return loss_fn(
                merge_tables(dense_params, tables), dummies, batch, dropout_rng
            )

        from recommend_tpu.training.optimizer import sparse_lr_schedule

        sched = sparse_lr_schedule(cfg)
        sparse_lr_at = sched if callable(sched) else (lambda step: sched)

        def apply_sparse_updates(tables, accums, dummy_grads, batch, lr):
            """Touched-row adagrad on every embedding table; returns updated
            (tables, accums). ``lr`` may be a traced per-step scalar (the
            sparse-LR ramp, config.sparse_lr_warmup_steps)."""
            from recommend_tpu.ops.sparse_embed import (
                sparse_rowwise_update_table,
                sparse_update_table,
            )

            update = (
                sparse_rowwise_update_table
                if cfg.sparse_update_mode == "rowwise" else sparse_update_table
            )
            new_tables = dict(tables)
            new_accums = dict(accums)
            dropped = jnp.zeros((), jnp.int32)
            # shared item table: concat ids/grads across behavior sequences
            # (row layout = seq_names_of, shared with _put_batch's indices)
            seq_names = seq_names_of(batch)
            if seq_names:
                # padded positions carry exactly-zero gradients (they are
                # masked as attention keys and feed nothing); remap their ids
                # to the out-of-range sentinel so the scatter drops the
                # WRITES, and — the actual win — physically compact the real
                # rows to cfg.sparse_scatter_budget when set (XLA scatter
                # cost scales with update-array length, docs/PERF.md)
                item_vocab = cfg.vocab_size("item_id")
                ids = jnp.concatenate(
                    [
                        jnp.where(
                            batch["seq_valid"][sf],
                            batch["sequences"][sf],
                            item_vocab,
                        ).reshape(-1)
                        for sf in seq_names
                    ]
                )
                g = jnp.concatenate(
                    [dummy_grads[f"seq_{sf}"].reshape(-1, cfg.seq_item_feature_dim)
                     for sf in seq_names]
                )
                src = batch.get("sparse_scatter_src")
                if src is not None:
                    # host-precomputed compaction (see _put_batch): the
                    # device only gathers the real rows — no on-device
                    # index-building scatter
                    n = ids.shape[0]
                    ok = src < n
                    safe = jnp.minimum(src, n - 1)
                    ids = jnp.where(ok, jnp.take(ids, safe), item_vocab)
                    g = jnp.take(g, safe, axis=0) * ok[:, None].astype(g.dtype)
                    dropped = batch["sparse_overflow"]
                elif 0 < cfg.sparse_scatter_budget < ids.shape[0]:
                    from recommend_tpu.ops.sparse_embed import compact_valid_rows

                    valid = jnp.concatenate(
                        [batch["seq_valid"][sf].reshape(-1) for sf in seq_names]
                    )
                    ids, g, dropped = compact_valid_rows(
                        ids, g, valid, cfg.sparse_scatter_budget, item_vocab
                    )
                table, accum = update(
                    tables["embed_seq_item"],
                    accums["embed_seq_item"], ids, g, lr,
                )
                new_tables["embed_seq_item"] = table
                new_accums["embed_seq_item"] = accum
            for f in cfg.non_seq_features:
                key = f"embed_{f}"
                table, accum = update(
                    tables[key], accums[key],
                    batch["non_seq"][f], dummy_grads[f"ns_{f}"], lr,
                )
                new_tables[key] = table
                new_accums[key] = accum
            return new_tables, new_accums, dropped

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            if sparse:
                optax_state, accums = state.opt_state
                dense_params, tables = split_tables(state.params)
                dummies = make_dummies(batch)
                (gdense, gdummies), (metrics, logits) = jax.grad(
                    sparse_loss_fn, argnums=(0, 2), has_aux=True
                )(dense_params, tables, dummies, batch, dropout_rng)
                if self.debug_metrics:
                    for t, l in logits.items():
                        metrics[f"{t}_logit_max"] = jnp.max(jnp.abs(l))
                    if "embed_seq_item" in tables:
                        metrics["item_table_rms"] = jnp.sqrt(
                            jnp.mean(jnp.square(tables["embed_seq_item"]))
                        )
                    metrics["dense_param_norm"] = optax.global_norm(dense_params)
                updates, optax_state = self.optimizer.update(
                    gdense, optax_state, dense_params
                )
                dense_params = optax.apply_updates(dense_params, updates)
                tables, accums, dropped = apply_sparse_updates(
                    tables, accums, gdummies, batch, sparse_lr_at(state.step)
                )
                params = merge_tables(dense_params, tables)
                metrics["grad_norm"] = optax.global_norm(gdense)
                if cfg.sparse_scatter_budget > 0:
                    metrics["sparse_dropped_rows"] = dropped
                return (
                    TrainState(params, (optax_state, accums), state.step + 1),
                    metrics,
                )
            grads, (metrics, _) = jax.grad(loss_fn, has_aux=True)(
                state.params, None, batch, dropout_rng
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), metrics

        @jax.jit
        def eval_step(params, batch, auc_states):
            logits = self.model.apply(
                params, batch["non_seq"], batch["sequences"], batch["seq_valid"]
            )
            loss, metrics = multi_task_bce_loss(logits, batch["labels"])
            init, update, _ = self._auc
            new_states = {
                t: update(auc_states[t], jax.nn.sigmoid(logits[t]), batch["labels"][t])
                for t in logits
            }
            return metrics, new_states

        self._train_step = train_step
        self._eval_step = eval_step

    def _put_batch(self, batch: Dict) -> Dict:
        if self.mesh is not None:
            from recommend_tpu.parallel.sharding import shard_batch

            # host-side compaction indices are global, which conflicts with
            # shard_batch's leading-dim sharding — the mesh path uses the
            # on-device compaction fallback instead
            return shard_batch(self.mesh, batch)
        cfg = self.cfg
        if (
            cfg.use_sparse_embedding_updates
            and cfg.sparse_scatter_budget > 0
            and batch.get("sequences")
        ):
            # precompute the sparse-scatter compaction on HOST (validity is
            # known before the step; numpy flatnonzero over ~178k bools is
            # ~0.5 ms and overlaps the async device step) — the device then
            # only gathers the real grad rows (docs/PERF.md)
            seq_names = self._seq_names_of(batch)
            valid = np.concatenate(
                [np.asarray(batch["seq_valid"][sf]).reshape(-1)
                 for sf in seq_names]
            )
            src = np.flatnonzero(valid).astype(np.int32)
            budget = cfg.sparse_scatter_budget
            overflow = max(len(src) - budget, 0)
            out = np.full(budget, len(valid), np.int32)
            out[: min(len(src), budget)] = src[:budget]
            batch = dict(batch)
            batch["sparse_scatter_src"] = out
            batch["sparse_overflow"] = np.int32(overflow)
        return _device_batch(batch)

    def init_state(self, rng: jax.Array, sample_batch: Dict) -> TrainState:
        batch = self._put_batch(sample_batch)
        if self.mesh is not None:
            from recommend_tpu.parallel.sharding import param_shardings

            shapes = jax.eval_shape(
                self.model.init, rng,
                batch["non_seq"], batch["sequences"], batch["seq_valid"],
            )
            pshard = param_shardings(self.mesh, shapes)
            params = jax.jit(self.model.init, out_shardings=pshard)(
                rng, batch["non_seq"], batch["sequences"], batch["seq_valid"]
            )
            opt_params = (
                self._split_tables(params)[0]
                if self.cfg.use_sparse_embedding_updates else params
            )
            opt_state = jax.jit(self.optimizer.init)(opt_params)
        else:
            params = jax.jit(self.model.init)(
                rng, batch["non_seq"], batch["sequences"], batch["seq_valid"]
            )
            opt_params = (
                self._split_tables(params)[0]
                if self.cfg.use_sparse_embedding_updates else params
            )
            opt_state = self.optimizer.init(opt_params)
        if self.cfg.use_sparse_embedding_updates:
            tok = params["params"]["tokenizer"]
            # optax.adagrad's default initial accumulator (0.1) for parity;
            # rowwise mode keeps ONE scalar per row ([V], not [V, D])
            if self.cfg.sparse_update_mode == "rowwise":
                accums = {
                    name: jnp.full(sub["embedding"].shape[:1], 0.1, jnp.float32)
                    for name, sub in tok.items()
                    if isinstance(sub, dict) and "embedding" in sub
                }
            else:
                accums = {
                    name: jnp.full_like(sub["embedding"], 0.1, dtype=jnp.float32)
                    for name, sub in tok.items()
                    if isinstance(sub, dict) and "embedding" in sub
                }
            if self.mesh is not None:
                from recommend_tpu.parallel.sharding import shard_accums

                # accumulators live row-aligned with their (possibly
                # row-sharded) tables — no cross-chip moves in the update
                accums = shard_accums(self.mesh, accums)
            opt_state = (opt_state, accums)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        if self.ckpt is not None:
            try:
                restored = self.ckpt.restore(params, opt_state)
            except Exception as e:  # noqa: BLE001 — orbax raises various types
                raise RuntimeError(
                    "checkpoint restore failed — the directory holds a state "
                    "layout incompatible with this config (different "
                    "sparse_update_mode, vocab sizes, or optimizer layout). "
                    "Point at a fresh checkpoint_dir or retrain."
                ) from e
            if restored is not None:
                step, params, opt_state = restored
                state = TrainState(params, opt_state, jnp.asarray(step, jnp.int32))
        return state

    def evaluate(self, state: TrainState, val_batches: Iterator[Dict]) -> Dict[str, float]:
        init, _, compute = self._auc
        auc_states = {t: init() for t in self.cfg.tasks}
        accum: Dict[str, list] = {}
        for batch in val_batches:
            metrics, auc_states = self._eval_step(
                state.params, self._put_batch(batch), auc_states
            )
            for k, v in metrics.items():
                accum.setdefault(k, []).append(float(v))
        out = {k: float(np.mean(v)) for k, v in accum.items()}
        for t in self.cfg.tasks:
            out[f"{t}_auc"] = float(compute(auc_states[t]))
        return out

    def train(
        self,
        train_iter: Iterator[Dict],
        num_steps: int,
        val_fn=None,
        eval_every: int = 1000,
        log_every: int = 100,
        early_stop_patience: Optional[int] = None,
        seed: int = 0,
        profile_dir: Optional[str] = None,
        profile_start: int = 10,
        profile_num_steps: int = 5,
        track_best_params: bool = False,
    ) -> TrainState:
        """`profile_dir`: when set, a jax.profiler device trace of steps
        [profile_start, profile_start+profile_num_steps) is written there
        (TensorBoard Profile tab) — SURVEY.md §5.1.

        ``track_best_params``: keep a device-side copy of the params at the
        best validation point (primary-task AUC — the reference's own model
        selection, oneTrans train.py:264-267) in ``self.best_params`` /
        ``self.best_val_step`` / ``self.best_val_metrics``. This is the
        honest non-oracle checkpoint-selection rule the quality board
        applies identically to every model (VERDICT round-4 item 3); costs
        one extra params-sized device buffer."""
        from recommend_tpu.utils.profiling import StepProfiler

        rng = jax.random.key(seed)
        first = next(train_iter)
        state = self.init_state(rng, first)
        start_step = int(state.step)
        prof = StepProfiler(profile_dir, start_step + profile_start, profile_num_steps)
        best_val = -float("inf")
        self.best_params = None
        self.best_val_step = None
        self.best_val_metrics = None
        bad_evals = 0
        t0 = time.time()
        batch = first
        for i in range(start_step, num_steps):
            with prof.step(i):
                state, metrics = self._train_step(state, self._put_batch(batch), rng)
            if (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                m["steps_per_s"] = log_every / max(dt, 1e-9)
                m["examples_per_s"] = m["steps_per_s"] * self.cfg.batch_size
                self.logger.log("train", i + 1, m)
                self.history["train"].append({"step": i + 1, **m})
                t0 = time.time()
            if val_fn is not None and (i + 1) % eval_every == 0:
                vm = self.evaluate(state, val_fn())
                self.logger.log("val", i + 1, vm)
                self.history["val"].append({"step": i + 1, **vm})
                # early stopping on primary-task AUC (oneTrans train.py:264-267)
                primary = vm.get(f"{self.cfg.tasks[0]}_auc", -vm.get("loss", 0.0))
                if primary > best_val:
                    best_val = primary
                    bad_evals = 0
                    if track_best_params:
                        # real copies: the train step donates its state, so
                        # aliasing state.params here would hand the best
                        # snapshot's buffers to the next step's donation
                        self.best_params = jax.tree_util.tree_map(
                            jnp.copy, state.params
                        )
                        self.best_val_step = i + 1
                        self.best_val_metrics = dict(vm)
                    if self.ckpt is not None:
                        self.ckpt.save(
                            i + 1, state.params, state.opt_state,
                            config_dict=self.cfg.to_dict(), history=self.history,
                        )
                else:
                    bad_evals += 1
                    if early_stop_patience and bad_evals >= early_stop_patience:
                        break
                t0 = time.time()
            if i + 1 < num_steps:
                batch = next(train_iter)
        prof.close()
        if self.ckpt is not None:
            self.ckpt.save(
                int(state.step), state.params, state.opt_state,
                config_dict=self.cfg.to_dict(), history=self.history,
            )
            self.ckpt.wait()
        return state
