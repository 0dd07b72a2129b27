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


def make_multislice_mesh(tp: int = 1, dp_per_slice: Optional[int] = None,
                         devices: Optional[Sequence] = None,
                         slice_index_of=None) -> Mesh:
    """DCN-aware mesh for multi-slice deployments (SURVEY.md §5): a
    3-axis ("dcn", "dp", "tp") mesh where the leading axis crosses
    slices.

    Axis-to-fabric mapping follows the scaling-book recipe: ``tp`` is
    the fastest-varying axis (its all-reduces ride ICI within a slice),
    ``dp`` stays intra-slice, and only the outermost ``dcn`` axis — used
    for data parallelism over evaluation streams / gradient reduction,
    whose collectives are infrequent — crosses the slow DCN links.
    Devices are grouped by ``slice_index`` (multi-slice TPU runtimes
    expose it; single-slice and CPU devices fall back to one group, so
    the mesh degenerates to (1, dp, tp) and all code paths stay valid
    on the virtual test mesh).

    Sharding rules compose: batch specs shard rows over ("dcn", "dp")
    together (jax allows axis tuples in PartitionSpecs), params shard
    over "tp" exactly as on the flat mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if slice_index_of is None:  # kwarg: tests fake slices on CPU devices
        slice_index_of = lambda d: getattr(d, "slice_index", 0)  # noqa: E731
    groups: dict = {}
    for d in devices:
        groups.setdefault(slice_index_of(d), []).append(d)
    sizes = {len(v) for v in groups.values()}
    assert len(sizes) == 1, f"uneven slices: { {k: len(v) for k, v in groups.items()} }"
    per_slice = sizes.pop()
    assert per_slice % tp == 0, (per_slice, tp)
    dp = dp_per_slice if dp_per_slice is not None else per_slice // tp
    assert dp * tp == per_slice, f"slice mesh {dp}x{tp} != {per_slice}"
    arr = np.asarray(
        [groups[k] for k in sorted(groups)]).reshape(len(groups), dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))
