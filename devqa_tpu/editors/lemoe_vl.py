"""LEMoE_VL — training-free lifelong MoE-LoRA editor.

Rebuild of ``editor/vllm_editors/lemoe_vl/lemoe_vl.py``: edits accumulate
in a buffer; every ``lora_edit_batch_size`` (20) requests a NEW two-layer
relu-LoRA expert is trained on that batch (Adam until ``min_loss`` or
``max_steps``, lemoe_vl.py:113-156) and appended to the expert pools.

Inference (hooks at fc1-input / fc2-output of the edit layer,
lemoe_vl.py:55-83): given the MLP input x,
  gate:   v_n = silu(mean(x)·kd_n)·ku_n ; sim = softmax_n(v_n·k_n)
  delta:  Σ_n sim_n · (relu(x·c1_n·r1_nᵀ)·c2_n·r2_nᵀ)
added to fc2's output — exactly the decoder's ``mlp_residual``
intervention point. The gating key ``k`` is random and NOT optimized
(faithful to lemoe_vl.py:122 which omits ``new_k`` from the optimizer).

Divergences (documented):
- the reference's expert-training resume path calls
  ``forward_from_mid_layer`` with a layer template lacking a ``{}``
  placeholder and a mismatched layer index (config
  ``edit_layer_i_of_inpt: 18`` vs edit layer 30) — an inert/broken
  combination; we resume exactly at the edit layer;
- the gate mean over positions is masked (the reference's batch=1 rows
  have no padding; ours do).
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor, instance_jit

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class LEMoEvlConfig(BaseConfig):
    edit_model_name: str = ""
    edit_layer: int = 30
    llm_hidden_dim1: int = 2560   # d_model (fc1 input / fc2 output)
    lora_rank: int = 32
    lora_edit_batch_size: int = 20
    max_steps: int = 100
    min_loss: float = 0.03
    lr: float = 1e-4
    topk: int = 1                 # present in the reference config; unused there too
    max_experts: int = 64


def _expert_zeros(cfg: LEMoEvlConfig):
    d1, r = cfg.llm_hidden_dim1, cfg.lora_rank
    m = cfg.max_experts
    return {
        "c1": jnp.zeros((m, d1, r)), "r1": jnp.zeros((m, d1, r)),
        "c2": jnp.zeros((m, d1, r)), "r2": jnp.zeros((m, d1, r)),
        "k": jnp.zeros((m, d1)),
        "kd": jnp.zeros((m, d1, d1 // 4)), "ku": jnp.zeros((m, d1 // 4, d1)),
        "count": jnp.zeros((), jnp.int32),
    }


def expert_delta(state, x, valid_mask):
    """The inpt_forward_hook math (lemoe_vl.py:56-69), batched + masked.

    x: [B, L, d1] MLP input; valid_mask [B, L]. → delta [B, L, d1].
    """
    m = valid_mask.astype(x.dtype)[..., None]
    mean = (x * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)  # [B, d1]
    v = jax.nn.silu(jnp.einsum("bD,nDd->bnd", mean, state["kd"]))
    v = jnp.einsum("bnd,ndD->bnD", v, state["ku"])
    logit = jnp.einsum("bnd,nd->bn", v, state["k"])
    active = jnp.arange(state["k"].shape[0]) < state["count"]
    logit = jnp.where(active[None, :], logit, NEG_INF)
    sim = jax.nn.softmax(logit, axis=1)
    sim = jnp.where(active[None, :], sim, 0.0)  # all-inactive → zeros
    t = jnp.einsum("bld,ndr,nDr->blnD", x, state["c1"], state["r1"])
    return jnp.einsum("blnD,bn,nDr,ndr->bld", jax.nn.relu(t), sim,
                      state["c2"], state["r2"])


class LEMoEvl(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: LEMoEvlConfig, seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        self.rng = np.random.default_rng(seed)
        self._opt = optax.adam(config.lr)
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "lemoe_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return True

    def restore_to_original_model(self):
        self.state = _expert_zeros(self.cfg)
        self.pending: List[EditRequest] = []

    # ------------------------------------------------------------------

    @instance_jit()
    def _logits_jit(self, state, vparams, embeds, kv_valid):
        vcfg = self.vllm.cfg
        h = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv_valid,
            mlp_residual=(self.cfg.edit_layer,
                          lambda x: expert_delta(state, x, kv_valid)))
        return dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)

    def query_logits(self, qb: QueryBatch):
        return self._logits_jit(self.state, self.vllm.params, qb.embeds,
                                qb.kv_valid)

    # ------------------------------------------------------------------

    def edit_one_piece(self, request: EditRequest):
        """Buffer-and-train-every-N (lemoe_vl.py:102-108)."""
        self.pending.append(request)
        if len(self.pending) >= self.cfg.lora_edit_batch_size:
            self._add_new_expert(self.pending)
            self.pending = []

    def flush_pending(self):
        """Force-train an expert on a partial buffer (the reference never
        edits leftovers < batch_size; call this to include them)."""
        if self.pending:
            self._add_new_expert(self.pending)
            self.pending = []

    def _add_new_expert(self, requests: List[EditRequest]):
        qb = self.vllm.encode_queries(
            [r["prompt"] for r in requests],
            [r.get("image") for r in requests],
            [r["target_new"] for r in requests])
        cfg = self.cfg
        d1, r = cfg.llm_hidden_dim1, cfg.lora_rank
        rngs = [jnp.asarray(self.rng.normal(size=s) * 0.01, jnp.float32)
                for s in [(d1, r), (d1, r), (d1, r), (d1, r), (d1,),
                          (d1, d1 // 4), (d1 // 4, d1)]]
        new = {"c1": rngs[0], "r1": rngs[1], "c2": rngs[2], "r2": rngs[3],
               "kd": rngs[5], "ku": rngs[6]}
        self.state = self._train_expert_jit(
            self.state, self.vllm.params, new, rngs[4],
            qb.embeds, qb.kv_valid, qb.label_ids, qb.label_masks)

    @instance_jit()
    def _train_expert_jit(self, state, vparams, new, new_k, embeds, kv,
                          labels, masks):
        cfg = self.cfg
        vcfg = self.vllm.cfg
        li = cfg.edit_layer
        pre = jax.lax.stop_gradient(dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv, lo=0, hi=li))

        def with_new(new):
            # ring: wrap at expert capacity (an out-of-bounds .at[].set
            # would be silently dropped by JAX)
            i = state["count"] % state["k"].shape[0]
            st = dict(state)
            for name in ("c1", "r1", "c2", "r2", "kd", "ku"):
                st[name] = state[name].at[i].set(new[name])
            st["k"] = state["k"].at[i].set(new_k)
            st["count"] = state["count"] + 1
            return st

        def loss_fn(new):
            st = with_new(new)
            h = dec.decoder_forward(
                vparams["decoder"], vcfg.decoder, pre, kv, lo=li,
                mlp_residual=(li, lambda x: expert_delta(st, x, kv)))
            logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            m = masks.astype(jnp.float32)
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

        opt_state = self._opt.init(new)

        def cond(carry):
            _, _, i, loss = carry
            return jnp.logical_and(i < cfg.max_steps, loss >= cfg.min_loss)

        def body(carry):
            new, opt_state, i, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(new)
            updates, opt_state = self._opt.update(grads, opt_state, new)
            return optax.apply_updates(new, updates), opt_state, i + 1, loss

        new, _, _, _ = jax.lax.while_loop(
            cond, body, (new, opt_state, jnp.asarray(0), jnp.asarray(jnp.inf)))
        return with_new(new)
