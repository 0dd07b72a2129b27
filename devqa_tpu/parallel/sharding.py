"""Sharding rules: PartitionSpecs for model params and batches.

Megatron-style tensor parallelism for the decoders (the 7B Vicuna
backbones of LLaVA / MiniGPT-4 need sharding on v5e-8; BLIP-2's 2.7B OPT
can replicate or shard):

- attention q/k/v and MLP up-projections shard their **output** features
  over ``tp`` (column parallel);
- attention output and MLP down-projections shard their **input**
  features (row parallel) — XLA inserts the psum;
- embeddings / lm_head shard the vocab dimension;
- norms and biases of row-parallel layers replicate.

Stacked layer params carry a leading layer axis → specs get a leading
``None``. The vision tower and Q-Former (≤1.2B total) replicate; editor
params and edit pools (a few MB) replicate (SURVEY.md §5: "the editor
pools replicate").

Evaluation/training batches shard rows over ``dp``.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# key-path suffix (module, leaf) → spec for stacked decoder layer params
_DECODER_LAYER_RULES = {
    ("q", "w"): P(None, None, "tp"), ("q", "b"): P(None, "tp"),
    ("k", "w"): P(None, None, "tp"), ("k", "b"): P(None, "tp"),
    ("v", "w"): P(None, None, "tp"), ("v", "b"): P(None, "tp"),
    ("o", "w"): P(None, "tp", None), ("o", "b"): P(None),
    ("fc1", "w"): P(None, None, "tp"), ("fc1", "b"): P(None, "tp"),
    ("fc2", "w"): P(None, "tp", None), ("fc2", "b"): P(None),
    ("gate", "w"): P(None, None, "tp"),
    ("up", "w"): P(None, None, "tp"),
    ("down", "w"): P(None, "tp", None),
}


def _spec_for_path(path) -> P:
    keys = tuple(getattr(k, "key", str(k)) for k in path)
    if "decoder" in keys:
        if "layers" in keys and len(keys) >= 2:
            rule = _DECODER_LAYER_RULES.get(keys[-2:])
            if rule is not None:
                return rule
        if keys[-1] == "embed_tokens":
            return P("tp", None)
        if keys[-1] == "lm_head":
            return P(None, "tp")
    return P()  # replicate everything else (vision tower, qformer, norms)


def vllm_param_specs(params: Any):
    """Pytree of PartitionSpecs matching a VLLM param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path), params)


def shard_params(params: Any, mesh: Mesh):
    """device_put the param tree according to the rules."""
    specs = vllm_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)


def batch_specs(batch: Any, mesh: Mesh = None):
    """Shard batch rows over the data axes (leading axis of every array
    leaf): plain meshes use ``dp``; multi-slice ("dcn", "dp", "tp")
    meshes shard rows over BOTH data axes — infrequent row scatter/
    gather crosses DCN, per-row compute stays intra-slice."""
    row_axes = ("dp",)
    if mesh is not None and "dcn" in mesh.axis_names:
        row_axes = ("dcn", "dp")

    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd == 0:
            return P()
        return P(*((row_axes,) + (None,) * (nd - 1)))

    return jax.tree.map(spec, batch)


def shard_batch(batch: Any, mesh: Mesh):
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        batch, batch_specs(batch, mesh))
