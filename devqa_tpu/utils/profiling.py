"""Profiling: per-phase timers + jax.profiler trace capture.

The reference hand-times edits with ``time()`` around ``edit_one_piece``
(evaluation/vllm_editor_eval.py:53-55,116-118) and has no profiler
integration (SURVEY.md §5). Here:

- :class:`PhaseTimer` — named phase accumulation with device sync,
  reported as a dict (feeds the bench and the eval harness's edit_time);
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_s": self.totals[name] / max(self.counts[name], 1)}
            for name in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab
    or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
