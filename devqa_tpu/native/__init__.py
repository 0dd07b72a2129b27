"""Native host-path helpers with automatic build + NumPy fallback.

``pack_samples_native(ids_list, prompt_lens, pad_id, L)`` → the four
[N, L] int32 arrays of data/xym.batch_samples in one C pass. Falls back
to NumPy when the extension cannot be built (no compiler).
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

_here = os.path.dirname(__file__)
_fastpack = None


def _try_load():
    global _fastpack
    if _fastpack is not None:
        return _fastpack
    try:
        sys.path.insert(0, _here)
        try:
            import _fastpack as m  # noqa
        finally:
            sys.path.pop(0)
        _fastpack = m
        return m
    except ImportError:
        pass
    # try to build once
    try:
        subprocess.run(["make", "-C", _here], check=True,
                       capture_output=True, timeout=120)
        sys.path.insert(0, _here)
        try:
            import _fastpack as m  # noqa
        finally:
            sys.path.pop(0)
        _fastpack = m
        return m
    except Exception:
        _fastpack = False
        return None


def have_native() -> bool:
    return bool(_try_load())


def pack_samples_native(
    ids_list: Sequence[np.ndarray],
    prompt_lens: Sequence[int],
    pad_id: int,
    L: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    m = _try_load()
    N = len(ids_list)
    if m:
        flat = np.concatenate([np.asarray(x, np.int32) for x in ids_list])
        lens = np.asarray([len(x) for x in ids_list], np.int32)
        plens = np.asarray(prompt_lens, np.int32)
        raw = m.pack(flat.tobytes(), lens.tobytes(), plens.tobytes(),
                     int(pad_id), int(L))
        # bytearray wrap → WRITABLE arrays, matching the NumPy fallback
        # (frombuffer over bytes is read-only: in-place edits would work
        # only on machines where the extension failed to build).
        arr = np.frombuffer(bytearray(raw), np.int32).reshape(4, N, L)
        return arr[0], arr[1], arr[2], arr[3]
    # NumPy fallback (identical semantics)
    input_ids = np.full((N, L), pad_id, np.int32)
    attn = np.zeros((N, L), np.int32)
    labels = np.full((N, L), pad_id, np.int32)
    masks = np.zeros((N, L), np.int32)
    for b, (ids, pl) in enumerate(zip(ids_list, prompt_lens)):
        n = len(ids)
        input_ids[b, :n] = ids
        attn[b, :n] = 1
        labels[b, :n] = np.roll(ids, -1)
        masks[b, max(pl - 1, 0):max(n - 1, 0)] = 1
    return input_ids, attn, labels, masks
