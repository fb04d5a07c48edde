"""Ranking inference engine — capability parity with OneTransInferenceEngine
(oneTrans examples/inference_example.py:21-219): checkpoint loading,
truncate/left-pad preprocessing, single & batch inference, EMA latency and
success/failure stats — plus the piece the reference only claims: the
**cross-candidate KV cache** (translation:144-151). `score_request` encodes
the user's behavior sequences ONCE (S-side K/V per layer), then scores C
candidates through the NS-only path — O(1) S-side compute per request instead
of O(C).

XLA static shapes: candidate counts are bucketed to powers of two (padded,
masked) so each bucket compiles once — the TPU answer to dynamic candidate
set sizes.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommend_tpu.config import RankingConfig
from recommend_tpu.models.ranking import RankingModel


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class RankingInferenceEngine:
    def __init__(
        self,
        cfg: RankingConfig,
        params,
        max_seq_len: int = 64,
        slack: int = 16,
    ):
        """``slack``: extension-buffer capacity of the cross-request session
        cache — appends accumulate O(Δ)-cost until `slack` items, then the
        session re-anchors with one full S encode (refresh)."""
        self.cfg = cfg
        self.model = RankingModel(cfg)
        self.params = params
        self.max_seq_len = max_seq_len
        self.slack = slack
        self.stats_state = {
            "total": 0, "success": 0, "failure": 0, "ema_latency_ms": None,
        }
        self._latencies: deque = deque(maxlen=1000)
        m = self.model
        self._fwd = jax.jit(
            lambda p, ns, seqs, sv: m.apply(p, ns, seqs, sv)
        )
        self._encode_s = jax.jit(
            lambda p, seqs, sv: m.apply(p, seqs, sv, method=RankingModel.encode_s)
        )
        self._score_cached = jax.jit(
            lambda p, cache, ns: m.apply(
                p, cache, ns, method=RankingModel.score_with_cache
            )
        )
        self._embed_items = jax.jit(
            lambda p, ids: m.apply(
                p, self.cfg.sequence_features[0], ids,
                method=RankingModel.embed_sequence_items,
            ),
        )
        self._extend = jax.jit(
            lambda p, cache, ek, ev, cnt, x, v: m.apply(
                p, cache, ek, ev, cnt, x, v,
                method=RankingModel.extend_s_cache,
            )
        )
        # single-fetch probability paths: sigmoid on device, tasks stacked
        # into ONE [T, B] array so a request costs one host↔device fetch
        # instead of one per task (each fetch pays a full transport RTT)
        tasks = tuple(self.cfg.tasks)
        stack = lambda logits: jnp.stack(
            [jax.nn.sigmoid(logits[t]) for t in tasks]
        )
        self._probs_fwd = jax.jit(
            lambda p, ns, seqs, sv: stack(m.apply(p, ns, seqs, sv))
        )
        self._probs_cached = jax.jit(
            lambda p, cache, ns: stack(
                m.apply(p, cache, ns, method=RankingModel.score_with_cache)
            )
        )
        self._probs_cached_ext = jax.jit(
            lambda p, cache, ek, ev, cnt, ns: stack(
                m.apply(
                    p, cache, ek, ev, cnt, ns,
                    method=RankingModel.score_with_cache_ext,
                )
            )
        )
        self._sessions: Dict[Any, Dict] = {}

    # -- loading (reference :38-60) ---------------------------------------
    @staticmethod
    def _restore_params(cfg, model, checkpoint_dir: str, max_seq_len: int):
        from recommend_tpu.training.checkpoint import CheckpointManager
        from recommend_tpu.training.optimizer import make_ranking_optimizer
        from recommend_tpu.data.pipeline import ranking_batches
        from recommend_tpu.data.synthetic import make_ranking_data

        data = make_ranking_data(cfg, num_samples=8, max_seq_per_feature=max_seq_len)
        batch = next(iter(ranking_batches(data, cfg, batch_size=2, num_epochs=1)))
        template = jax.jit(model.init)(
            jax.random.key(0),
            {k: jnp.asarray(v) for k, v in batch["non_seq"].items()},
            {k: jnp.asarray(v) for k, v in batch["sequences"].items()},
            {k: jnp.asarray(v) for k, v in batch["seq_valid"].items()},
        )
        opt = make_ranking_optimizer(cfg)
        restored = CheckpointManager(checkpoint_dir).restore(
            template, opt.init(template)
        )
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
        return restored[1]

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, max_seq_len: int = 64):
        from recommend_tpu.config import RankingConfig as RC

        with open(os.path.join(checkpoint_dir, "config.json")) as f:
            cfg = RC.from_dict(json.load(f))
        engine = cls(cfg, params=None, max_seq_len=max_seq_len)
        engine.params = cls._restore_params(
            cfg, engine.model, checkpoint_dir, max_seq_len
        )
        return engine

    def reload(
        self,
        params=None,
        checkpoint_dir: Optional[str] = None,
        refresh_sessions: bool = True,
    ) -> None:
        """Hot parameter push (the minute-level online update of the
        reference's deployment narrative, kuaiformer translation:210-214):
        swap in new params with NO recompilation (params are traced arguments
        of every jitted path) and zero downtime. Live sessions survive —
        their raw id history is kept and, with ``refresh_sessions``, their
        per-layer K/V caches are re-encoded under the new params so the
        cross-request cache serves the new model, not stale K/V."""
        assert (params is None) != (checkpoint_dir is None), (
            "pass exactly one of params / checkpoint_dir"
        )
        if checkpoint_dir is not None:
            params = self._restore_params(
                self.cfg, self.model, checkpoint_dir, self.max_seq_len
            )
        self.params = params
        if refresh_sessions:
            for sid in self._sessions:
                self.refresh_session(sid)

    # -- preprocessing (reference :62-92) ----------------------------------
    def preprocess_sequences(
        self, sequences: Dict[str, Sequence[int]]
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Truncate (keep most recent) and left-pad each behavior sequence."""
        l = self.max_seq_len
        seqs, valid = {}, {}
        for sf in self.cfg.sequence_features:
            ids = list(sequences.get(sf, ()))[-l:]
            n = len(ids)
            arr = np.zeros((1, l), dtype=np.int64)
            v = np.zeros((1, l), dtype=bool)
            if n:
                arr[0, l - n :] = ids
                v[0, l - n :] = True
            seqs[sf] = jnp.asarray(arr)
            valid[sf] = jnp.asarray(v)
        return seqs, valid

    def _non_seq_arrays(
        self, rows: List[Dict[str, int]]
    ) -> Dict[str, jnp.ndarray]:
        return {
            f: jnp.asarray(np.array([r.get(f, 0) for r in rows], dtype=np.int64))
            for f in self.cfg.non_seq_features
        }

    # -- inference (reference :94-184) -------------------------------------
    def single_inference(
        self,
        features: Dict[str, int],
        sequences: Dict[str, Sequence[int]],
    ) -> Dict[str, float]:
        """features: merged user/item/context dict → per-task probabilities."""
        t0 = time.perf_counter()
        try:
            seqs, sv = self.preprocess_sequences(sequences)
            ns = self._non_seq_arrays([features])
            probs = np.asarray(self._probs_fwd(self.params, ns, seqs, sv))
            out = {t: float(probs[i][0]) for i, t in enumerate(self.cfg.tasks)}
            self._record(t0, ok=True)
            return out
        except Exception:
            self._record(t0, ok=False)
            raise

    def batch_inference(
        self,
        rows: List[Tuple[Dict[str, int], Dict[str, Sequence[int]]]],
    ) -> List[Dict[str, float]]:
        """Independent (features, sequences) rows, padded to one bucket."""
        t0 = time.perf_counter()
        n = len(rows)
        b = _bucket(n)
        rows = rows + [rows[-1]] * (b - n)
        ns = self._non_seq_arrays([r[0] for r in rows])
        seq_parts = [self.preprocess_sequences(r[1]) for r in rows]
        seqs = {
            sf: jnp.concatenate([p[0][sf] for p in seq_parts], axis=0)
            for sf in self.cfg.sequence_features
        }
        sv = {
            sf: jnp.concatenate([p[1][sf] for p in seq_parts], axis=0)
            for sf in self.cfg.sequence_features
        }
        probs = np.asarray(self._probs_fwd(self.params, ns, seqs, sv))
        self._record(t0, ok=True)
        return [{t: float(probs[j][i]) for j, t in enumerate(self.cfg.tasks)}
                for i in range(n)]

    def score_request(
        self,
        user_context: Dict[str, int],
        sequences: Dict[str, Sequence[int]],
        candidates: List[Dict[str, int]],
    ) -> List[Dict[str, float]]:
        """KV-cached request scoring: S-side once, NS-side per candidate.

        `user_context`: user+context feature values shared across candidates;
        `candidates`: per-candidate item feature dicts.

        ``cfg.use_kv_cache`` gates the path (the flag is real, unlike the
        reference's decorative oneTrans config.py:66-69): off ⇒ the S trunk
        re-runs per candidate batch through the full forward (the measured
        12× slower baseline, BASELINE.md serving row)."""
        t0 = time.perf_counter()
        seqs, sv = self.preprocess_sequences(sequences)
        n = len(candidates)
        b = _bucket(n)
        cand = candidates + [candidates[-1]] * (b - n)
        rows = [dict(user_context, **c) for c in cand]
        ns = self._non_seq_arrays(rows)
        if self.cfg.use_kv_cache:
            cache = self._encode_s(self.params, seqs, sv)
            probs = np.asarray(self._probs_cached(self.params, cache, ns))
        else:
            tiled = {sf: jnp.broadcast_to(v, (b,) + v.shape[1:])
                     for sf, v in seqs.items()}
            tiled_v = {sf: jnp.broadcast_to(v, (b,) + v.shape[1:])
                       for sf, v in sv.items()}
            probs = np.asarray(self._probs_fwd(self.params, ns, tiled, tiled_v))
        self._record(t0, ok=True)
        return [{t: float(probs[j][i]) for j, t in enumerate(self.cfg.tasks)}
                for i in range(n)]

    # -- cross-request session cache: true O(ΔL) per-layer K/V Δ-append -----
    #
    # Session state (the paper's cross-request cache, translation:144-151;
    # Table 5 row :252 credits it −29.6% p99 / −52.9% memory):
    #   - per-sequence-feature id sliding windows (host; refresh + fallback)
    #   - "cache": per-layer (k_s, v_s, valid) from `encode_s` at the last
    #     REFRESH point — bit-identical to what `score_request` would build
    #   - "ext_k/ext_v/count": per-layer extension buffers [n_layers, 1,
    #     SLACK, H, Dh]; each update appends ONLY the Δ new items' K/V via
    #     `extend_s_cache` — one O(Δ·window) trunk step, never re-encoding
    #     the history (static shapes: Δ padded to a power-of-two bucket).
    #
    # Exactness: at every refresh point `score_session` ≡ `score_request`
    # bit-for-bit (same compiled encode_s). Between refreshes, appended
    # entries are exact under frozen pyramid windows (see
    # RankingModel.extend_s_cache); the engine re-anchors automatically at
    # the half-full watermark (`slack`//2 filled slots) or when the sliding
    # id window trims — dispatched AFTER the request's fetch on the
    # `score_session` path so the re-encode never lands in the latency tail.
    # Appends are chronological (arrival order) regardless of which behavior
    # sequence they belong to — the segmented [S1;SEP;S2;...] layout is
    # restored at refresh. Token vectors are per-item and position-
    # independent (no positional encoding), so append order only matters
    # through the causal mask.

    def _empty_ext(self):
        cfg = self.cfg
        h = cfg.num_heads
        dh = cfg.embed_dim // h
        dt = jnp.dtype(cfg.active_compute_dtype)
        z = jnp.zeros((cfg.num_layers, 1, self.slack, h, dh), dt)
        return z, z

    def refresh_session(self, session_id) -> None:
        """Re-encode the session's S trunk from its id windows (the periodic
        re-anchor; also the hot-reload path). Restores exact `score_request`
        semantics for the current history."""
        sess = self._sessions[session_id]
        seqs, sv = self.preprocess_sequences(sess["ids"])
        sess["cache"] = self._encode_s(self.params, seqs, sv)
        sess["ext_k"], sess["ext_v"] = self._empty_ext()
        sess["count"] = 0

    def update_session(
        self,
        session_id,
        new_items: Dict[str, Sequence[int]],
        _defer_refresh: bool = False,
    ) -> bool:
        """Append new behavior items to a session. Only the Δ new items are
        embedded and pushed through one per-layer K/V append step — O(ΔL)
        per update (translation:144-151).

        A full re-anchor (`refresh_session`) fires when (a) there is no
        usable cache or the extension buffer cannot hold the Δ — mandatory,
        done here; or (b) the sliding-window trim evicted items the frozen
        cache still holds, or the extension passed its half-full watermark —
        *advisable*. With ``_defer_refresh`` (the `score_session` path) case
        (b) is returned to the caller instead of executed, so the re-encode
        is dispatched AFTER the request's probability fetch and its device
        time overlaps inter-request idle instead of landing in the p99 tail
        (paper Table 5 :252 credits the cross-request cache −29.6% p99).
        Returns True iff a case-(b) refresh was deferred."""
        sess = self._sessions.get(session_id)
        fresh = sess is None
        if fresh:
            sess = self._sessions[session_id] = {
                "ids": {sf: [] for sf in self.cfg.sequence_features},
                "cache": None,
                "ext_k": None,
                "ext_v": None,
                "count": 0,
            }
        # validate + convert BEFORE mutating: a bad request (unknown feature,
        # non-int id) must leave the session unchanged
        unknown = [sf for sf in new_items if sf not in sess["ids"]]
        if unknown:
            raise KeyError(f"unknown sequence feature(s) {unknown!r}")
        converted = {sf: [int(i) for i in ids] for sf, ids in new_items.items()}
        delta: List[int] = []
        trimmed = False
        for sf, ids in converted.items():
            if not ids:
                continue
            sess["ids"][sf].extend(ids)
            # sliding window: keep the most recent max_seq_len per sequence
            if len(sess["ids"][sf]) > self.max_seq_len:
                sess["ids"][sf] = sess["ids"][sf][-self.max_seq_len :]
                trimmed = True
            delta.extend(ids)
        # guard on the PADDED bucket size: the extension write is a
        # dynamic_update_slice of _bucket(len(delta)) rows, and XLA clamps
        # out-of-range starts (which would silently corrupt earlier slots)
        if (
            fresh
            or sess["cache"] is None
            or sess["count"] + (_bucket(len(delta)) if delta else 0) > self.slack
        ):
            self.refresh_session(session_id)
            return False
        if delta:
            self._append_delta(sess, delta)
        # trim ⇒ the frozen cache holds evicted items (score_session would
        # attend over more history than the id window until re-anchored);
        # watermark ⇒ keep headroom so the mandatory case never fires on the
        # scoring path
        want_refresh = trimmed or sess["count"] >= max(1, self.slack // 2)
        if want_refresh and not _defer_refresh:
            self.refresh_session(session_id)
            return False
        return want_refresh

    def _append_delta(self, sess, ids: List[int]) -> None:
        n = len(ids)
        db = _bucket(n)
        padded = np.zeros((1, db), dtype=np.int64)
        padded[0, :n] = ids
        toks = self._embed_items(self.params, jnp.asarray(padded))  # [1,db,d]
        valid = np.zeros((1, db), dtype=bool)
        valid[0, :n] = True
        ek, ev, _cnt = self._extend(
            self.params,
            sess["cache"],
            sess["ext_k"],
            sess["ext_v"],
            jnp.asarray(sess["count"], jnp.int32),
            toks,
            jnp.asarray(valid),
        )
        sess["ext_k"], sess["ext_v"] = ek, ev
        sess["count"] += n

    def score_session(
        self,
        session_id,
        user_context: Dict[str, int],
        candidates: List[Dict[str, int]],
        new_items: Optional[Dict[str, Sequence[int]]] = None,
    ) -> List[Dict[str, float]]:
        """Score candidates against the session's cached per-layer S K/V —
        O(C) NS-only work, zero S re-encoding. Pass ``new_items`` to fold the
        append into the same request (still ONE host↔device fetch: the
        append step and the scoring dispatch pipeline asynchronously).

        With ``cfg.use_kv_cache`` off, falls back to the full forward over
        the session's id windows (the measured-slower baseline)."""
        t0 = time.perf_counter()
        deferred_refresh = False
        if new_items:
            deferred_refresh = self.update_session(
                session_id, new_items, _defer_refresh=True
            )
        if self._sessions.get(session_id) is None:
            self.update_session(session_id, {})
        sess = self._sessions[session_id]
        n = len(candidates)
        b = _bucket(n)
        cand = candidates + [candidates[-1]] * (b - n)
        rows = [dict(user_context, **c) for c in cand]
        ns = self._non_seq_arrays(rows)
        if not self.cfg.use_kv_cache:
            seqs, sv = self.preprocess_sequences(sess["ids"])
            tiled = {sf: jnp.broadcast_to(v, (b,) + v.shape[1:])
                     for sf, v in seqs.items()}
            tiled_v = {sf: jnp.broadcast_to(v, (b,) + v.shape[1:])
                       for sf, v in sv.items()}
            probs = np.asarray(self._probs_fwd(self.params, ns, tiled, tiled_v))
        else:
            probs = np.asarray(
                self._probs_cached_ext(
                    self.params,
                    sess["cache"],
                    sess["ext_k"],
                    sess["ext_v"],
                    jnp.asarray(sess["count"], jnp.int32),
                    ns,
                )
            )
        self._record(t0, ok=True)
        if deferred_refresh:
            # off the request path: probs are already fetched, so the
            # re-encode's device time overlaps inter-request idle (dispatch
            # is async — no host blocking here either)
            self.refresh_session(session_id)
        return [{t: float(probs[j][i]) for j, t in enumerate(self.cfg.tasks)}
                for i in range(n)]

    def session_memory_mb(self) -> float:
        """Device bytes held by all session KV caches (the Table-5 'memory'
        axis of the cross-request cache)."""
        total = 0
        for sess in self._sessions.values():
            for leaf in jax.tree_util.tree_leaves(
                (sess.get("cache"), sess.get("ext_k"), sess.get("ext_v"))
            ):
                total += getattr(leaf, "nbytes", 0)
        return total / (1024.0 * 1024.0)

    # -- stats (reference :186-219) ----------------------------------------
    def _record(self, t0: float, ok: bool) -> None:
        dt_ms = (time.perf_counter() - t0) * 1000.0
        s = self.stats_state
        s["total"] += 1
        s["success" if ok else "failure"] += 1
        ema = s["ema_latency_ms"]
        s["ema_latency_ms"] = dt_ms if ema is None else 0.9 * ema + 0.1 * dt_ms
        self._latencies.append(dt_ms)

    def stats(self) -> Dict[str, float]:
        s = dict(self.stats_state)
        lats = np.asarray(self._latencies)
        if len(lats):
            s.update(
                latency_ms_p50=float(np.percentile(lats, 50)),
                latency_ms_p95=float(np.percentile(lats, 95)),
                latency_ms_p99=float(np.percentile(lats, 99)),
                success_rate=s["success"] / max(s["total"], 1),
                est_qps=1000.0 / max(float(np.mean(lats)), 1e-9),
            )
        return s
