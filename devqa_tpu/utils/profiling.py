"""Profiling: per-phase timers + jax.profiler trace capture.

The reference hand-times edits with ``time()`` around ``edit_one_piece``
(evaluation/vllm_editor_eval.py:53-55,116-118) and has no profiler
integration (SURVEY.md §5). Here:

- :class:`PhaseTimer` — named phase accumulation with device sync (a
  standalone diagnostic; the bench and the harness's edit_time do their
  own scalar-fetch timing);
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
        self._live = None  # last device output registered this phase

    def touch(self, x) -> None:
        """Register a device array produced inside the current phase; the
        phase exit fetches one element of it to bound the async dispatch
        (block_until_ready/effects_barrier do NOT synchronize through the
        axon remote tunnel — a fetched scalar does)."""
        self._live = x

    def _sync(self):
        if not self.sync:
            return
        jax.effects_barrier()
        if self._live is not None:
            import jax.numpy as jnp

            float(jnp.asarray(self._live).reshape(-1)[0])
            self._live = None

    @contextlib.contextmanager
    def phase(self, name: str):
        self._sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sync()
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
