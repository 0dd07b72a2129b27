"""Device mesh construction.

The reference's "distribution" layer is NCCL init helpers + manual
``device_map`` placement + a 2nd-GPU data-proc replica (SURVEY.md §5,
multimodal_editor.py:765-805). TPU-native replacement: a named
``jax.sharding.Mesh`` over ICI with two axes —

- ``dp``: data parallel — evaluation streams / training batch rows;
- ``tp``: tensor parallel — the 7B decoders' weight shards.

Collectives are inserted by XLA from sharding annotations (GSPMD); no
hand-written NCCL calls.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. ``dp`` defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))
