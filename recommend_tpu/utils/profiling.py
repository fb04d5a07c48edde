"""jax.profiler integration for the train loops (SURVEY.md §5.1).

The reference has no profiler — only manual wall-clock benchmarks wrapped
around the model call (kuaiformer evaluate.py:207-247, oneTrans
evaluate.py:171-229). The TPU-native subsystem instead captures a real device
trace: a `StepProfiler` opens a `jax.profiler` trace window over a chosen span
of training steps and annotates each step (`StepTraceAnnotation`) so the
TensorBoard profile view groups ops per step. Zero overhead when disabled.

Usage (wired into both trainers via ``train(profile_dir=...)``)::

    prof = StepProfiler("/tmp/run/profile", start_step=10, num_steps=5)
    for i in range(num_steps):
        with prof.step(i):
            state, metrics = train_step(state, batch, rng)
    prof.close()

View with: ``tensorboard --logdir /tmp/run/profile`` (Profile tab).
"""

from __future__ import annotations

import contextlib
from typing import Optional


class StepProfiler:
    """Traces steps [start_step, start_step + num_steps) into ``log_dir``.

    Inactive (and allocation-free per step) when ``log_dir`` is None. The
    window is placed a few steps in by default so compilation and warmup
    don't pollute the trace.
    """

    def __init__(
        self,
        log_dir: Optional[str],
        start_step: int = 10,
        num_steps: int = 5,
    ):
        self.log_dir = log_dir
        self.start = start_step
        self.stop_at = start_step + num_steps
        self._tracing = False

    def step(self, i: int):
        """Context manager for step ``i`` (0-based loop index)."""
        if self.log_dir is None:
            return contextlib.nullcontext()
        import jax

        if not self._tracing and i == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._tracing = True
        elif self._tracing and i >= self.stop_at:
            jax.profiler.stop_trace()
            self._tracing = False
        if self._tracing:
            return jax.profiler.StepTraceAnnotation("train", step_num=i)
        return contextlib.nullcontext()

    def close(self) -> None:
        """Stop the trace if the loop ended inside the window."""
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
