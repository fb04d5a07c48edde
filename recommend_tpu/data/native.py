"""ctypes bindings for the native (C++) input pipeline.

Builds `native/librecbatch.so` on demand (g++, no external deps) and exposes:
  - `fill_retrieval_batch`: left-padded history batch assembly
  - `AliasSampler`: O(1) popularity-weighted negative sampling (Walker alias
    method) with a distinct-excluding variant
  - `fill_ranking_sequences`: ranking behavior-sequence padding

Falls back silently to the pure-Python pipeline when no compiler is
available: `load_native()` returns None and callers keep the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _np_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def load_native(build: bool = True):
    """Load (building if necessary) the native library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "librecbatch.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "batcher.cc"))
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not build or not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                 "-std=c++17", "-o", so, src],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        _LIB = ctypes.CDLL(so)
    except OSError:
        return None
    return _LIB


class FlatSequences:
    """Per-user sequences flattened to contiguous arrays + offsets."""

    def __init__(self, user_sequences):
        lens = np.array([len(s["video_id"]) for s in user_sequences], dtype=np.int64)
        self.offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=self.offsets[1:])
        total = int(self.offsets[-1])
        self.vids = np.empty(total, dtype=np.int64)
        self.cats = np.empty(total, dtype=np.int64)
        self.tags = np.empty(total, dtype=np.int64)
        self.durs = np.empty(total, dtype=np.float32)
        self.tss = np.empty(total, dtype=np.int64)
        for u, s in enumerate(user_sequences):
            a, b = self.offsets[u], self.offsets[u + 1]
            self.vids[a:b] = s["video_id"]
            self.cats[a:b] = s["category"]
            self.tags[a:b] = s["tag"]
            self.durs[a:b] = s["duration"]
            self.tss[a:b] = s["timestamp"]


def fill_retrieval_batch(
    lib,
    flat: FlatSequences,
    ex_user: np.ndarray,
    ex_split: np.ndarray,
    max_len: int,
    popularity_probs: np.ndarray,
) -> Dict[str, object]:
    b = len(ex_user)
    out = {
        "video_id": np.empty((b, max_len), np.int64),
        "category": np.empty((b, max_len), np.int64),
        "tag": np.empty((b, max_len), np.int64),
        "duration": np.empty((b, max_len), np.float32),
        "timestamp": np.empty((b, max_len), np.int64),
    }
    valid = np.empty((b, max_len), np.uint8)
    tgt = {
        "video_id": np.empty(b, np.int64),
        "category": np.empty(b, np.int64),
        "tag": np.empty(b, np.int64),
        "duration": np.empty(b, np.float32),
        "timestamp": np.empty(b, np.int64),
    }
    pop = np.empty(b, np.float32)
    probs = np.ascontiguousarray(popularity_probs, dtype=np.float32)
    i64, f32, u8 = ctypes.c_int64, ctypes.c_float, ctypes.c_uint8
    lib.fill_retrieval_batch(
        _np_ptr(flat.vids, i64), _np_ptr(flat.cats, i64), _np_ptr(flat.tags, i64),
        _np_ptr(flat.durs, f32), _np_ptr(flat.tss, i64),
        _np_ptr(flat.offsets, i64),
        _np_ptr(np.ascontiguousarray(ex_user, np.int64), i64),
        _np_ptr(np.ascontiguousarray(ex_split, np.int64), i64),
        ctypes.c_int64(b), ctypes.c_int64(max_len),
        _np_ptr(probs, f32),
        _np_ptr(out["video_id"], i64), _np_ptr(out["category"], i64),
        _np_ptr(out["tag"], i64), _np_ptr(out["duration"], f32),
        _np_ptr(out["timestamp"], i64), _np_ptr(valid, u8),
        _np_ptr(tgt["video_id"], i64), _np_ptr(tgt["category"], i64),
        _np_ptr(tgt["tag"], i64), _np_ptr(tgt["duration"], f32),
        _np_ptr(tgt["timestamp"], i64), _np_ptr(pop, f32),
    )
    return {
        "history": out,
        "history_valid": valid.astype(bool),
        "target": tgt,
        "target_popularity": pop,
    }


class AliasSampler:
    """O(1) popularity-weighted sampler (native alias method)."""

    def __init__(self, lib, probs: np.ndarray, seed: int = 0):
        self.lib = lib
        self.n = len(probs)
        self.prob = np.empty(self.n, np.float64)
        self.alias = np.empty(self.n, np.int64)
        self._seed = seed
        p = np.ascontiguousarray(probs, dtype=np.float64)
        lib.build_alias_table(
            _np_ptr(p, ctypes.c_double), ctypes.c_int64(self.n),
            _np_ptr(self.prob, ctypes.c_double), _np_ptr(self.alias, ctypes.c_int64),
        )

    def _next_seed(self) -> int:
        self._seed = (self._seed * 6364136223846793005 + 1442695040888963407) % 2**63
        return self._seed

    def sample(self, num: int) -> np.ndarray:
        out = np.empty(num, np.int64)
        self.lib.sample_alias(
            _np_ptr(self.prob, ctypes.c_double), _np_ptr(self.alias, ctypes.c_int64),
            ctypes.c_int64(self.n), ctypes.c_int64(num),
            ctypes.c_uint64(self._next_seed()), _np_ptr(out, ctypes.c_int64),
        )
        return out

    def sample_distinct_excluding(self, num: int, exclude: Sequence[int]) -> np.ndarray:
        out = np.empty(num, np.int64)
        ex = np.ascontiguousarray(np.asarray(exclude, dtype=np.int64))
        self.lib.sample_alias_distinct_excluding(
            _np_ptr(self.prob, ctypes.c_double), _np_ptr(self.alias, ctypes.c_int64),
            ctypes.c_int64(self.n), ctypes.c_int64(num),
            _np_ptr(ex, ctypes.c_int64), ctypes.c_int64(len(ex)),
            ctypes.c_uint64(self._next_seed()), _np_ptr(out, ctypes.c_int64),
        )
        return out
