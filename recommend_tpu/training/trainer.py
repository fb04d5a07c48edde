"""Training loops.

RetrievalTrainer — capability parity with KuaiFormerTrainer (kuaiformer
train.py:67-332): jitted train step (the `@tf.function` GradientTape loop
becomes one compiled XLA program), warmup+cosine LR inside the optimizer,
per-interval validation (HR@K over in-batch candidates, train.py:216-253),
keep-5 checkpointing with auto-restore, and metric history.

TPU-first: the step function is pure `(state, batch) → (state, metrics)` and
jit-compiled with donated state; all metrics stay on device until logged.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommend_tpu.config import RetrievalConfig
from recommend_tpu.models.losses import in_batch_softmax_loss
from recommend_tpu.models.retrieval import RetrievalTower
from recommend_tpu.training.checkpoint import CheckpointManager
from recommend_tpu.training.metrics import retrieval_metric_suite
from recommend_tpu.training.optimizer import make_retrieval_optimizer
from recommend_tpu.utils.logging import MetricLogger


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _device_batch(batch: Dict) -> Dict:
    return jax.tree_util.tree_map(jnp.asarray, batch)


class RetrievalTrainer:
    def __init__(
        self,
        cfg: RetrievalConfig,
        total_steps: int = 100_000,
        checkpoint_dir: Optional[str] = None,
        log_dir: Optional[str] = None,
        mesh=None,
        mode: str = "single",
    ):
        """`mesh`: optional jax.sharding.Mesh('data','model'). When given, the
        batch is sharded over `data` (DP — gradient psum compiles onto ICI),
        large embedding tables row-shard over `model`, and the in-batch
        softmax keeps *global-batch* semantics automatically because the whole
        step is one GSPMD program (solving the LogQ-at-DP-scale hazard,
        SURVEY.md §7 hard parts).

        `mode`: 'single' — one prediction per sequence (kuaiformer
        bidirectional/causal single mode); 'seq2seq' — causal all-positions
        self-supervised training: every raw tail position predicts its next
        item in one interleaved pass (replacing the reference's O(L²) gather
        construction, model.py:302-500); 'masked' — BERT4Rec-style masked-item
        objective (BASELINE.json recall config): random tail items replaced by
        a learnable [MASK], predicted bidirectionally against in-batch
        negatives."""
        assert mode in ("single", "seq2seq", "masked")
        self.cfg = cfg
        self.mesh = mesh
        self.mode = mode
        self.model = RetrievalTower(cfg)
        self.optimizer = make_retrieval_optimizer(cfg, total_steps)
        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        self.logger = MetricLogger(log_dir)
        self.history: Dict[str, list] = {"train": [], "val": []}

        # raw (uncompressed) tail length — the seq2seq supervised positions
        last_seg = cfg.schedule_specs()[-1]
        tail_r = last_seg.num_tokens if last_seg.group_size == 1 else 0
        sparse = cfg.use_sparse_embedding_updates

        from recommend_tpu.ops.embedding import SPARSE_TABLES

        def make_dummies(batch):
            if not sparse:
                return None
            d = cfg.embed_dim
            hist = {
                k: jnp.zeros(batch["history"][k].shape + (d,), jnp.float32)
                for k in SPARSE_TABLES
            }
            b = batch["target"]["video_id"].shape[0]
            if self.mode == "seq2seq":
                tgt_shape = (b, tail_r, d)
            elif self.mode == "masked":
                tgt_shape = (b, num_mask, d)
            else:
                tgt_shape = (b, d)
            tgt = {k: jnp.zeros(tgt_shape, jnp.float32) for k in SPARSE_TABLES}
            return {"hist": hist, "tgt": tgt}

        def _seq2seq_next_feats(batch):
            r, l = tail_r, cfg.max_seq_len
            return {
                k: jnp.concatenate(
                    [batch["history"][k][:, l - r + 1 :], batch["target"][k][:, None]],
                    axis=1,
                )
                for k in batch["history"]
            }

        def single_loss(params, dummies, batch, dropout_rng):
            interests = self.model.apply(
                params,
                batch["history"],
                batch["history_valid"],
                deterministic=False,
                dummies=None if dummies is None else dummies["hist"],
                rngs={"dropout": dropout_rng},
            )
            item_emb = self.model.apply(
                params, batch["target"],
                None if dummies is None else dummies["tgt"],
                method=RetrievalTower.item_embeddings,
            )
            pop = batch["target_popularity"] if cfg.use_logq_correction else None
            loss, metrics = in_batch_softmax_loss(
                interests, item_emb, pop, label_smoothing=cfg.label_smoothing
            )
            return loss, metrics

        def seq2seq_loss(params, dummies, batch, dropout_rng):
            from recommend_tpu.models.losses import seq2seq_in_batch_loss

            r, l = tail_r, cfg.max_seq_len
            t = cfg.num_compressed_tokens
            all_int = self.model.apply(
                params,
                batch["history"],
                batch["history_valid"],
                deterministic=False,
                dummies=None if dummies is None else dummies["hist"],
                rngs={"dropout": dropout_rng},
                method=RetrievalTower.all_position_interests,
            )  # [B, T, k, D]
            tail_int = all_int[:, t - r :]
            # next-item features per tail position: shift history by one; the
            # final position's next item is the held-out target
            feats_next = _seq2seq_next_feats(batch)
            target_emb = self.model.apply(
                params, feats_next,
                None if dummies is None else dummies["tgt"],
                method=RetrievalTower.item_embeddings,
            )  # [B, R, D]
            valid_cur = batch["history_valid"][:, l - r :]
            valid_next = jnp.concatenate(
                [
                    batch["history_valid"][:, l - r + 1 :],
                    jnp.ones((valid_cur.shape[0], 1), dtype=bool),
                ],
                axis=1,
            )
            pos_valid = valid_cur & valid_next
            pop = None
            if cfg.use_logq_correction:
                pop = jnp.concatenate(
                    [
                        batch["history_popularity"][:, l - r + 1 :],
                        batch["target_popularity"][:, None],
                    ],
                    axis=1,
                )
            return seq2seq_in_batch_loss(
                tail_int, target_emb, pop, pos_valid,
                label_smoothing=cfg.label_smoothing,
            )

        num_mask = max(1, min(8, tail_r - 1))
        self._tail_r, self._num_mask = tail_r, num_mask

        def _mask_positions(dropout_rng, b):
            """[B, M] absolute raw positions within the uncompressed tail.
            Derived deterministically from the step rng so the sparse-update
            path can reproduce them."""
            r, l = tail_r, cfg.max_seq_len
            u = jax.random.randint(
                jax.random.fold_in(dropout_rng, 7), (b, num_mask), 0, r
            )
            return l - r + u

        def masked_loss(params, dummies, batch, dropout_rng):
            from recommend_tpu.models.losses import seq2seq_in_batch_loss

            b = batch["history_valid"].shape[0]
            pos = _mask_positions(dropout_rng, b)
            outputs = self.model.apply(
                params,
                batch["history"],
                batch["history_valid"],
                pos,
                deterministic=False,
                dummies=None if dummies is None else dummies["hist"],
                rngs={"dropout": dropout_rng},
                method=RetrievalTower.masked_position_outputs,
            )  # [B, M, D]
            tgt_feats = {
                k: jnp.take_along_axis(batch["history"][k], pos, axis=1)
                for k in batch["history"]
            }
            tgt_emb = self.model.apply(
                params, tgt_feats,
                None if dummies is None else dummies["tgt"],
                method=RetrievalTower.item_embeddings,
            )  # [B, M, D]
            pos_valid = jnp.take_along_axis(batch["history_valid"], pos, axis=1)
            pop = None
            if cfg.use_logq_correction:
                pop = jnp.take_along_axis(batch["history_popularity"], pos, axis=1)
            return seq2seq_in_batch_loss(
                outputs[:, :, None, :], tgt_emb, pop, pos_valid,
                label_smoothing=cfg.label_smoothing,
            )

        if mode == "seq2seq":
            assert tail_r > 1, "seq2seq mode needs a raw (group_size=1) tail segment"
            loss_fn = seq2seq_loss
        elif mode == "masked":
            assert tail_r > 1, "masked mode needs a raw (group_size=1) tail segment"
            loss_fn = masked_loss
        else:
            loss_fn = single_loss

        # id-embedding tables are split OUT of the differentiated/optimized
        # tree (same treatment as the ranking trainer): otherwise jax.grad
        # materializes full-size zero cotangents for them and apply_updates
        # streams the whole table through an add-zero pass — profiled at
        # ~32 ms/step of pure [10M,128] table copies on the flagship config.
        def split_tables(params):
            inner = dict(params["params"])
            emb = dict(inner["embed"])
            tables = {
                k: emb.pop(k)["embedding"] for k in SPARSE_TABLES if k in emb
            }
            inner["embed"] = emb
            return {**params, "params": inner}, tables

        def merge_tables(dense_params, tables):
            inner = dict(dense_params["params"])
            emb = dict(inner.get("embed", {}))
            for k, t in tables.items():
                emb[k] = {"embedding": t}
            inner["embed"] = emb
            return {**dense_params, "params": inner}

        self._split_tables = split_tables
        self._merge_tables = merge_tables

        def apply_sparse_updates(tables, accums, dummy_grads, batch, dropout_rng):
            from recommend_tpu.ops.sparse_embed import (
                sparse_rowwise_update_table,
                sparse_update_table,
            )

            update = (
                sparse_rowwise_update_table
                if cfg.sparse_update_mode == "rowwise" else sparse_update_table
            )

            if self.mode == "seq2seq":
                tgt_feats = _seq2seq_next_feats(batch)
            elif self.mode == "masked":
                pos = _mask_positions(
                    dropout_rng, batch["history_valid"].shape[0]
                )
                tgt_feats = {
                    k: jnp.take_along_axis(batch["history"][k], pos, axis=1)
                    for k in batch["history"]
                }
            else:
                tgt_feats = batch["target"]
            new_tables = dict(tables)
            new_accums = dict(accums)
            # padded history positions carry exactly-zero gradients; remap
            # their ids to the out-of-range sentinel so the scatter DROPS
            # them. At the reference's 10-50 real items in a 256 window this
            # removes >80% of the scatter rows (the top step cost after the
            # table split, docs/PERF.md). Same for seq2seq targets (shifted
            # validity); single/masked targets are always real items.
            hist_valid = batch["history_valid"]
            if self.mode == "seq2seq":
                tgt_valid = jnp.concatenate(
                    [
                        hist_valid[:, cfg.max_seq_len - tail_r + 1 :],
                        jnp.ones((hist_valid.shape[0], 1), dtype=bool),
                    ],
                    axis=1,
                )
            else:
                tgt_valid = None  # all valid
            vocab_of = {
                "video_id": cfg.video_vocab_size,
                "category": cfg.category_vocab_size,
                "tag": cfg.tag_vocab_size,
            }
            dropped = jnp.zeros((), jnp.int32)
            for name in SPARSE_TABLES:
                sentinel = vocab_of[name]
                hist_ids = jnp.where(
                    hist_valid, batch["history"][name], sentinel
                )
                tgt_ids = tgt_feats[name]
                if tgt_valid is not None:
                    tgt_ids = jnp.where(tgt_valid, tgt_ids, sentinel)
                ids = jnp.concatenate(
                    [hist_ids.reshape(-1), tgt_ids.reshape(-1)]
                )
                g = jnp.concatenate(
                    [
                        dummy_grads["hist"][name].reshape(-1, cfg.embed_dim),
                        dummy_grads["tgt"][name].reshape(-1, cfg.embed_dim),
                    ]
                )
                src = batch.get("sparse_scatter_src")
                if src is not None:
                    # host-precomputed compaction (see _put_batch)
                    n = ids.shape[0]
                    ok = src < n
                    safe = jnp.minimum(src, n - 1)
                    ids = jnp.where(ok, jnp.take(ids, safe), sentinel)
                    g = jnp.take(g, safe, axis=0) * ok[:, None].astype(g.dtype)
                    dropped = jnp.maximum(
                        dropped, batch["sparse_overflow"].astype(jnp.int32)
                    )
                elif 0 < cfg.sparse_scatter_budget < ids.shape[0]:
                    # physically compact real rows to the static budget —
                    # the scatter's cost scales with update-array length,
                    # not effective writes (ops/sparse_embed.compact_valid_rows)
                    from recommend_tpu.ops.sparse_embed import compact_valid_rows

                    valid = jnp.concatenate(
                        [
                            hist_valid.reshape(-1),
                            (
                                tgt_valid.reshape(-1)
                                if tgt_valid is not None
                                else jnp.ones(
                                    (tgt_ids.reshape(-1).shape[0],), bool
                                )
                            ),
                        ]
                    )
                    ids, g, dr = compact_valid_rows(
                        ids, g, valid, cfg.sparse_scatter_budget, sentinel
                    )
                    dropped = jnp.maximum(dropped, dr)
                table, accum = update(
                    tables[name], accums[name], ids, g,
                    cfg.sparse_embedding_lr,
                )
                new_tables[name] = table
                new_accums[name] = accum
            return new_tables, new_accums, dropped

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng) -> tuple:
            dropout_rng = jax.random.fold_in(rng, state.step)
            if sparse:
                optax_state, accums = state.opt_state
                dense_params, tables = split_tables(state.params)

                def sparse_loss(dense_params, dummies):
                    return loss_fn(
                        merge_tables(dense_params, tables), dummies, batch,
                        dropout_rng,
                    )

                dummies = make_dummies(batch)
                (grads, dgrads), metrics = jax.grad(
                    sparse_loss, argnums=(0, 1), has_aux=True
                )(dense_params, dummies)
                updates, optax_state = self.optimizer.update(
                    grads, optax_state, dense_params
                )
                dense_params = optax.apply_updates(dense_params, updates)
                tables, accums, dropped = apply_sparse_updates(
                    tables, accums, dgrads, batch, dropout_rng
                )
                params = merge_tables(dense_params, tables)
                metrics["grad_norm"] = optax.global_norm(grads)
                if cfg.sparse_scatter_budget > 0:
                    metrics["sparse_dropped_rows"] = dropped
                return (
                    TrainState(params, (optax_state, accums), state.step + 1),
                    metrics,
                )
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, None, batch, dropout_rng
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            metrics["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, state.step + 1), metrics

        @jax.jit
        def eval_step(params, batch):
            interests = self.model.apply(
                params, batch["history"], batch["history_valid"]
            )
            item_emb = self.model.apply(
                params, batch["target"], method=RetrievalTower.item_embeddings
            )
            # in-batch candidates: row i's true item is column i
            scores = RetrievalTower.compute_scores(interests, item_emb)
            b = scores.shape[0]
            ks = tuple(k for k in (1, 5, 10, 50, 100) if k <= b)
            return retrieval_metric_suite(scores, jnp.arange(b), ks=ks)

        self._train_step = train_step
        self._eval_step = eval_step

    def _put_batch(self, batch: Dict) -> Dict:
        if self.mesh is not None:
            from recommend_tpu.parallel.sharding import shard_batch

            # host compaction indices are global — mesh path uses the
            # on-device compaction fallback
            return shard_batch(self.mesh, batch)
        cfg = self.cfg
        if cfg.use_sparse_embedding_updates and cfg.sparse_scatter_budget > 0:
            # precompute sparse-scatter compaction on HOST: validity is known
            # from the batch before the step (docs/PERF.md). Layout mirrors
            # apply_sparse_updates: [history rows ; target rows].
            hv = np.asarray(batch["history_valid"])
            b, l = hv.shape
            r = self._tail_r
            if self.mode == "seq2seq":
                tv = np.concatenate(
                    [hv[:, l - r + 1 :], np.ones((b, 1), bool)], axis=1
                )
            elif self.mode == "masked":
                tv = np.ones((b, self._num_mask), bool)
            else:
                tv = np.ones((b, 1), bool)
            valid = np.concatenate([hv.reshape(-1), tv.reshape(-1)])
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
        # jit the init: op-by-op dispatch of a full model init is pathologically
        # slow on remote-device transports (observed 177 s → <10 s)
        if self.mesh is not None:
            from recommend_tpu.parallel.sharding import param_shardings

            shapes = jax.eval_shape(
                self.model.init, rng, batch["history"], batch["history_valid"]
            )
            pshard = param_shardings(self.mesh, shapes)
            params = jax.jit(self.model.init, out_shardings=pshard)(
                rng, batch["history"], batch["history_valid"]
            )
        else:
            params = jax.jit(self.model.init)(
                rng, batch["history"], batch["history_valid"]
            )
        opt_params = (
            self._split_tables(params)[0]
            if self.cfg.use_sparse_embedding_updates else params
        )
        # optimizer buffers inherit the param shardings via GSPMD propagation
        opt_state = jax.jit(self.optimizer.init)(opt_params)
        if self.cfg.use_sparse_embedding_updates:
            from recommend_tpu.ops.embedding import SPARSE_TABLES

            emb = params["params"]["embed"]
            if self.cfg.sparse_update_mode == "rowwise":
                accums = {
                    name: jnp.full(
                        emb[name]["embedding"].shape[:1], 0.1, jnp.float32
                    )
                    for name in SPARSE_TABLES
                }
            else:
                accums = {
                    name: jnp.full_like(
                        emb[name]["embedding"], 0.1, dtype=jnp.float32
                    )
                    for name in SPARSE_TABLES
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
                    "layout incompatible with this config (e.g. written "
                    "before the sparse-table split, with a different "
                    "sparse_update_mode, or different vocab sizes). Point at "
                    "a fresh checkpoint_dir or retrain."
                ) from e
            if restored is not None:
                step, params, opt_state = restored
                state = TrainState(params, opt_state, jnp.asarray(step, jnp.int32))
        return state

    def evaluate(self, state: TrainState, val_batches: Iterator[Dict]) -> Dict[str, float]:
        accum: Dict[str, list] = {}
        for batch in val_batches:
            m = self._eval_step(state.params, self._put_batch(batch))
            for k, v in m.items():
                accum.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in accum.items()}

    def train(
        self,
        train_iter: Iterator[Dict],
        num_steps: int,
        val_fn=None,
        eval_every: int = 1000,
        log_every: int = 100,
        seed: int = 0,
        profile_dir: Optional[str] = None,
        profile_start: int = 10,
        profile_num_steps: int = 5,
    ) -> TrainState:
        """`profile_dir`: when set, a jax.profiler device trace of steps
        [profile_start, profile_start+profile_num_steps) is written there
        (TensorBoard Profile tab) — SURVEY.md §5.1."""
        from recommend_tpu.utils.profiling import StepProfiler

        rng = jax.random.key(seed)
        first = next(train_iter)
        state = self.init_state(rng, first)
        start_step = int(state.step)
        prof = StepProfiler(profile_dir, start_step + profile_start, profile_num_steps)
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
                t0 = time.time()
            if self.ckpt is not None and (i + 1) % eval_every == 0:
                self.ckpt.save(
                    i + 1, state.params, state.opt_state,
                    config_dict=self.cfg.to_dict(), history=self.history,
                )
            if i + 1 < num_steps:
                batch = next(train_iter)
        prof.close()
        if self.ckpt is not None:
            self.ckpt.save(
                num_steps, state.params, state.opt_state,
                config_dict=self.cfg.to_dict(), history=self.history,
            )
            self.ckpt.wait()
        return state
