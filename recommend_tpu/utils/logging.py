"""Structured metric logging.

Parity with the reference's TensorBoard `tf.summary` writers + JSON artifacts
(SURVEY.md §5.5): every metric goes to (a) stdout, (b) an append-only JSONL
file per run when a log dir is given, and (c) TensorBoard event files via
flax's summary writer when available. Metric names match the reference
(`loss`, `recall@K`, `ndcg@K`, `auc`, ...) so BASELINE.md numbers compare
directly.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        quiet: bool = False,
        tensorboard: bool = True,
    ):
        self.log_dir = log_dir
        self.quiet = quiet
        self._files = {}
        self._tb_writers = {}
        self._tb = tensorboard
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

    def _tb_writer(self, stream: str):
        """TensorBoard scalar writer per stream (reference train/val subdir
        layout, kuaiformer train.py:26-47). Optional: silently disabled if no
        writer backend is importable."""
        if not self._tb or self.log_dir is None:
            return None
        if stream not in self._tb_writers:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb_writers[stream] = SummaryWriter(
                    os.path.join(self.log_dir, stream)
                )
            except Exception:
                self._tb = False
                return None
        return self._tb_writers[stream]

    def _file(self, stream: str):
        if self.log_dir is None:
            return None
        if stream not in self._files:
            self._files[stream] = open(
                os.path.join(self.log_dir, f"{stream}.jsonl"), "a"
            )
        return self._files[stream]

    def log(self, stream: str, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        f = self._file(stream)
        if f is not None:
            f.write(json.dumps(rec) + "\n")
            f.flush()
        tb = self._tb_writer(stream)
        if tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(k, v, step)
        if not self.quiet:
            shown = ", ".join(
                f"{k}={v:.4g}" for k, v in metrics.items() if isinstance(v, float)
            )
            print(f"[{stream}] step {step}: {shown}")

    def close(self):
        for f in self._files.values():
            f.close()
        for w in self._tb_writers.values():
            w.close()
