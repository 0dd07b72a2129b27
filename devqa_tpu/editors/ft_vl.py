"""FT_VL: constrained fine-tuning editor.

Rebuild of ``editor/vllm_editors/ft_vl/ft_vl.py`` (FTvl): per edit batch,
AdamW-optimize the chosen weight tensors (default: fc2 of the last LLM
layer, configs/ft_vl/blip2-opt-2.7b.yaml) on the edit's supervised span,
optionally clamping each weight to ±norm_constraint of its original value
(ft_vl.py:135-141), then apply the resulting deltas to the live model
(ft_vl.py:51-61). ``restore_to_original_model`` writes the saved original
slices back (ft_vl.py:44-45).

TPU-native: the whole optimization loop is ONE jitted
``lax.while_loop`` — (step < num_steps) ∧ (loss ≥ 1e-2), matching the
reference's skip-when-converged rule (ft_vl.py:131-146) — instead of a
Python loop of separate forward/backward launches.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.losses import label_loss
from ..core.vllm import vllm_logits
from ..utils.config import BaseConfig
from ..utils.surgery import ParamTarget, get_target, parse_torch_module_template, set_target
from .base import EditRequest, VLLMEditor, instance_jit


@dataclasses.dataclass(frozen=True)
class FTvlConfig(BaseConfig):
    edit_model_name: str = ""
    rewrite_module_tmp: str = "language_model.model.decoder.layers.{}.fc2.weight"
    layers: Tuple[int, ...] = (31,)
    num_steps: int = 25
    lr: float = 1e-3
    weight_decay: float = 0.0
    norm_constraint: Optional[float] = None
    batch_size: int = 1
    min_loss: float = 1e-2  # the reference's hard-coded 1e-2 threshold


class FTvl(VLLMEditor):
    def __init__(self, vllm, config: FTvlConfig):
        super().__init__(vllm)
        self.cfg = config
        self.targets = tuple(
            parse_torch_module_template(config.rewrite_module_tmp, l)
            for l in config.layers)
        # Originals of only the edited slices (low-memory restore,
        # ft_vl.py:31-36).
        self.original = {t: get_target(vllm.params, t) for t in self.targets}
        self._opt = optax.adamw(config.lr, weight_decay=config.weight_decay)

    def name_of_editor_and_model(self):
        return "ft_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return True

    def restore_to_original_model(self):
        params = self.vllm.params
        for t, w in self.original.items():
            params = set_target(params, t, w)
        self.vllm.params = params

    # ------------------------------------------------------------------

    @instance_jit()
    def _execute_ft(self, params, embeds, kv_valid, label_ids, label_masks):
        """Jitted FT loop → new values for the target slices."""
        cfg = self.cfg
        vcfg = self.vllm.cfg
        targets = self.targets
        w0 = [get_target(params, t) for t in targets]

        def insert(params, ws):
            for t, w in zip(targets, ws):
                params = set_target(params, t, w)
            return params

        def loss_fn(ws):
            logits = vllm_logits(insert(params, ws), vcfg, embeds, kv_valid)
            return label_loss(logits, label_ids, label_masks)

        opt_state = self._opt.init(w0)

        def cond(carry):
            _, _, i, loss = carry
            return jnp.logical_and(i < cfg.num_steps, loss >= cfg.min_loss)

        def body(carry):
            ws, opt_state, i, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(ws)
            updates, opt_state2 = self._opt.update(grads, opt_state, ws)
            ws2 = optax.apply_updates(ws, updates)
            if cfg.norm_constraint is not None:
                eps = cfg.norm_constraint
                ws2 = [jnp.clip(w, o - eps, o + eps) for w, o in zip(ws2, w0)]
            # The reference evaluates loss BEFORE stepping and skips the
            # step when already converged (ft_vl.py:131-133); mirror that:
            skip = loss < cfg.min_loss
            ws = jax.tree.map(lambda a, b: jnp.where(skip, a, b), ws, ws2)
            opt_state = jax.tree.map(
                lambda a, b: jnp.where(skip, a, b), opt_state, opt_state2)
            return ws, opt_state, i + 1, loss

        init = (w0, opt_state, jnp.asarray(0), jnp.asarray(jnp.inf))
        ws, _, steps, last_loss = jax.lax.while_loop(cond, body, init)
        return ws, steps, last_loss

    def edit_batch(self, requests: List[EditRequest], pad_width=None):
        # pad_width ignored: the FT objective batch-means over rows, so
        # padding would change the optimized loss (base.edit_batch).
        qb = self.vllm.encode_queries(
            [r["prompt"] for r in requests],
            [r.get("image") for r in requests],
            [r["target_new"] for r in requests])
        ws, steps, loss = self._execute_ft(
            self.vllm.params, qb.embeds, qb.kv_valid, qb.label_ids,
            qb.label_masks)
        params = self.vllm.params
        for t, w in zip(self.targets, ws):
            params = set_target(params, t, w)
        self.vllm.params = params

    def edit_one_piece(self, request: EditRequest):
        self.edit_batch([request])
