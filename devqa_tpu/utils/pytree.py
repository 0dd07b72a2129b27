"""Small pytree helpers used across the framework."""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp


def tree_stack(trees: Sequence[Any]) -> Any:
    """Stack a list of identical pytrees into one pytree of stacked leaves.

    Used to turn per-layer parameter dicts into scan-ready stacked arrays
    (leading axis = layer index) — the TPU-native replacement for the
    reference's per-layer ``nn.ModuleList`` iteration.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def tree_unstack(tree: Any, n: int) -> List[Any]:
    return [jax.tree.map(lambda x, i=i: x[i], tree) for i in range(n)]


def tree_slice(tree: Any, i) -> Any:
    """Select index ``i`` along the leading (layer) axis of every leaf."""
    return jax.tree.map(lambda x: x[i], tree)
