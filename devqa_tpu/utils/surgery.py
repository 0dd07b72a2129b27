"""Parameter surgery: path-addressed functional updates into param pytrees.

The reference addresses weights by torch module name strings
(``rewrite_module_tmp`` like
"language_model.model.decoder.layers.{}.fc2.weight", resolved via
``nethook.get_parameter`` — ft_vl.py:31-36,60). Here a target is a
``(path, layer_index)`` pair: ``path`` indexes the nested param dict and
``layer_index`` (optional) indexes the leading scan-stacked layer axis.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ParamTarget:
    path: Tuple[str, ...]          # e.g. ("decoder", "layers", "fc2", "w")
    layer: Optional[int] = None    # index into the stacked layer axis

    def __str__(self):
        p = ".".join(self.path)
        return p if self.layer is None else "%s[%d]" % (p, self.layer)


def get_target(tree: Any, t: ParamTarget):
    x = tree
    for k in t.path:
        x = x[k]
    return x if t.layer is None else x[t.layer]


def set_target(tree: Any, t: ParamTarget, value):
    """Functional nested update; shares all untouched subtrees."""

    def rec(node, path):
        if not path:
            if t.layer is None:
                return value
            return node.at[t.layer].set(value)
        k = path[0]
        new = dict(node)
        new[k] = rec(node[k], path[1:])
        return new

    return rec(tree, t.path)


def add_to_target(tree: Any, t: ParamTarget, delta):
    return set_target(tree, t, get_target(tree, t) + delta)


_TORCH_NAME_MAP = {
    # reference torch module names → our param keys (OPT + LLaMA)
    "fc1.weight": ("fc1", "w"), "fc1.bias": ("fc1", "b"),
    "fc2.weight": ("fc2", "w"), "fc2.bias": ("fc2", "b"),
    "self_attn.q_proj.weight": ("q", "w"), "self_attn.k_proj.weight": ("k", "w"),
    "self_attn.v_proj.weight": ("v", "w"), "self_attn.out_proj.weight": ("o", "w"),
    "self_attn.o_proj.weight": ("o", "w"),
    "mlp.gate_proj.weight": ("gate", "w"), "mlp.up_proj.weight": ("up", "w"),
    "mlp.down_proj.weight": ("down", "w"),
}


def parse_torch_module_template(tmp: str, layer: int) -> ParamTarget:
    """Translate a reference ``rewrite_module_tmp`` + layer index into a
    ParamTarget, e.g.
    "language_model.model.decoder.layers.{}.fc2.weight", 31 →
    ("decoder", "layers", "fc2", "w")[31].

    Note the torch weight is [out, in]; ours is [in, out] — callers doing
    *numeric* transplants must transpose, but targets produced here are
    used for in-framework optimization so no transpose is involved.
    """
    name = tmp.format(layer)
    m = re.search(r"layers\.(\d+)\.(.+)$", name)
    if not m:
        raise ValueError("cannot parse module template: %s" % name)
    layer_i = int(m.group(1))
    suffix = m.group(2)
    if suffix not in _TORCH_NAME_MAP:
        raise ValueError("unsupported module suffix: %s" % suffix)
    return ParamTarget(("decoder", "layers") + _TORCH_NAME_MAP[suffix], layer_i)
