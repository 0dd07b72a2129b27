"""Streaming statistics — the slice of ``easyeditor/util/runningstats.py``
(1,883 LoC vendored from ROME) that the editing algorithms actually use:
``SecondMoment`` feeds ROME/MEMIT's covariance estimation
(``rome/layer_stats.py``, ``memit_main.get_cov``); ``Mean``/``Variance``
back Welford-style normalizers.

Accumulation is device-side (one matmul per batch on the MXU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SecondMoment:
    """Streaming E[x xᵀ] over feature vectors."""

    def __init__(self, dim: int):
        self.dim = dim
        self.mom2 = jnp.zeros((dim, dim), jnp.float32)
        self.count = 0
        self._acc = jax.jit(
            lambda m, x: m + jnp.einsum("nd,ne->de", x, x,
                                        preferred_element_type=jnp.float32))

    def add(self, x) -> None:
        """x: [N, dim] feature rows."""
        x = jnp.asarray(x, jnp.float32)
        self.mom2 = self._acc(self.mom2, x)
        self.count += int(x.shape[0])

    def moment(self) -> jnp.ndarray:
        return self.mom2 / max(self.count, 1)

    def state_dict(self):
        return {"mom2": np.asarray(self.mom2), "count": self.count}

    @classmethod
    def from_state(cls, state):
        sm = cls(state["mom2"].shape[0])
        sm.mom2 = jnp.asarray(state["mom2"])
        sm.count = int(state["count"])
        return sm


class Mean:
    def __init__(self, dim: int):
        self.sum = jnp.zeros((dim,), jnp.float32)
        self.count = 0

    def add(self, x):
        x = jnp.asarray(x, jnp.float32)
        self.sum = self.sum + x.sum(0)
        self.count += int(x.shape[0])

    def mean(self):
        return self.sum / max(self.count, 1)


class Variance:
    """Welford mean/variance over feature rows.

    State stays HOST-side numpy: ``add`` is pure numpy arithmetic, no
    per-call host↔device transfers (the jnp↔np ping-pong pattern this
    runtime punishes). Call sites hand in numpy rows; ``mean``/
    ``variance`` return numpy (convertible on demand)."""

    def __init__(self, dim: int):
        self.mean_ = np.zeros((dim,), np.float32)
        self.m2 = np.zeros((dim,), np.float32)
        self.count = 0.0

    def add(self, x):
        x = np.asarray(x, np.float32)
        nb = x.shape[0]
        if nb == 0:
            return
        bm = x.mean(0)
        bs = ((x - bm) ** 2).sum(0)
        delta = bm - self.mean_
        tot = self.count + nb
        self.mean_ = self.mean_ + delta * nb / max(tot, 1.0)
        self.m2 = self.m2 + bs + delta ** 2 * self.count * nb / max(tot, 1.0)
        self.count = tot

    def mean(self):
        return self.mean_

    def variance(self):
        return self.m2 / max(self.count - 1, 1.0)
