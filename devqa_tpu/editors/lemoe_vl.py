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
intervention point. Each expert is a rank-``lora_rank`` factorized
d1 → d2 → d1 MLP (d2 = the decoder FFN width, lemoe_vl.py:115-118:
``new_r1``/``new_c2`` carry ``llm_hidden_dim2``). The gating key ``k``
is random and NOT optimized (faithful to lemoe_vl.py:122 which omits
``new_k`` from the optimizer).

Reference quirks, reproduced (oracle-pinned in
tests/test_reference_oracle.py::TestLEMoEvlOracle):
- the kept expert is the last EVALUATED candidate, not the last stepped
  one: the reference cats the candidate into the pool at the top of
  each loop iteration (a value copy, lemoe_vl.py:134-140), so
  ``opt.step``'s in-place mutations never reach the kept tensors — the
  final optimization step is always discarded, and a ``min_loss`` break
  keeps exactly the state that met the threshold;
- the routing key ``new_k`` is never optimized (lemoe_vl.py:122).

Divergences (documented):
- the reference's expert-training resume path calls
  ``forward_from_mid_layer`` with a layer template lacking a ``{}``
  placeholder and a mismatched layer index (config
  ``edit_layer_i_of_inpt: 18`` vs edit layer 30) — the TraceDicts all
  land on the layers CONTAINER whose forward is never invoked, so the
  reference silently runs a FULL forward every step; we resume at the
  edit layer, which is mathematically identical (experts only touch
  layer ``edit_layer``) and actually skips the lower layers;
- the gate mean over positions is masked (the reference's batch=1 rows
  have no padding; ours do);
- batched editing (``lora_edit_batch_size`` > 1) CRASHES the reference
  on blip2: its wrapper encodes ``imgs[-1]`` only (blip2.py:54-57) and
  dies concatenating batch-1 vision tokens onto batch-N text embeds —
  our batched path is the repaired behavior (all images encoded).
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
    llm_hidden_dim2: int = 10240  # d_ffn (the expert's hidden width)
    lora_rank: int = 32
    lora_edit_batch_size: int = 20
    max_steps: int = 100
    min_loss: float = 0.03
    lr: float = 1e-4
    topk: int = 1                 # present in the reference config; unused there too
    max_experts: int = 64


def _expert_zeros(cfg: LEMoEvlConfig):
    d1, d2, r = cfg.llm_hidden_dim1, cfg.llm_hidden_dim2, cfg.lora_rank
    m = cfg.max_experts
    return {
        "c1": jnp.zeros((m, d1, r)), "r1": jnp.zeros((m, d2, r)),
        "c2": jnp.zeros((m, d2, r)), "r2": jnp.zeros((m, d1, r)),
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
        d1, d2, r = cfg.llm_hidden_dim1, cfg.llm_hidden_dim2, cfg.lora_rank
        # randn*0.01 in the reference's creation order (lemoe_vl.py:115-121)
        rngs = [jnp.asarray(self.rng.normal(size=s) * 0.01, jnp.float32)
                for s in [(d1, r), (d2, r), (d2, r), (d1, r), (d1,),
                          (d1, d1 // 4), (d1 // 4, d1)]]
        new = {"c1": rngs[0], "r1": rngs[1], "c2": rngs[2], "r2": rngs[3],
               "kd": rngs[5], "ku": rngs[6]}
        self.state = self._train_expert_jit(
            self.state, self.vllm.params, new, rngs[4],
            qb.embeds, qb.kv_valid, qb.label_ids, qb.label_masks)

    def _with_new(self, state, new, new_k):
        # ring: wrap at expert capacity (an out-of-bounds .at[].set
        # would be silently dropped by JAX)
        i = state["count"] % state["k"].shape[0]
        st = dict(state)
        for name in ("c1", "r1", "c2", "r2", "kd", "ku"):
            st[name] = state[name].at[i].set(new[name])
        st["k"] = state["k"].at[i].set(new_k)
        st["count"] = state["count"] + 1
        return st

    def _expert_loss(self, new, new_k, state, vparams, pre, kv, labels, masks):
        """Masked-mean label CE with candidate expert (new, new_k) joined
        to the pool, resuming from the layer-``edit_layer`` prefix
        ``pre`` (the reference's forward_from_mid_layer resume,
        lemoe_vl.py:141-143 — inert there, see module docstring)."""
        vcfg = self.vllm.cfg
        li = self.cfg.edit_layer
        st = self._with_new(state, new, new_k)
        h = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, pre, kv, lo=li,
            mlp_residual=(li, lambda x: expert_delta(st, x, kv)))
        logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        m = masks.astype(jnp.float32)
        return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

    @instance_jit()
    def _train_expert_jit(self, state, vparams, new, new_k, embeds, kv,
                          labels, masks):
        cfg = self.cfg
        vcfg = self.vllm.cfg
        li = cfg.edit_layer
        pre = jax.lax.stop_gradient(dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv, lo=0, hi=li))

        def loss_fn(new):
            return self._expert_loss(new, new_k, state, vparams, pre, kv,
                                     labels, masks)

        opt_state = self._opt.init(new)

        def cond(carry):
            _, _, i, loss, _ = carry
            return jnp.logical_and(i < cfg.max_steps, loss >= cfg.min_loss)

        def body(carry):
            new, opt_state, i, _, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(new)
            updates, opt_state = self._opt.update(grads, opt_state, new)
            # carry the EVALUATED state alongside the stepped one: the
            # pool keeps the last candidate whose loss was measured (see
            # module docstring — the reference's in-loop torch.cat copies
            # mean opt.step never reaches the kept tensors, so its final
            # step is always discarded, and a min_loss break keeps
            # exactly the state that met the threshold).
            return (optax.apply_updates(new, updates), opt_state, i + 1,
                    loss, new)

        _, _, _, _, kept = jax.lax.while_loop(
            cond, body,
            (new, opt_state, jnp.asarray(0), jnp.asarray(jnp.inf), new))
        return self._with_new(state, kept, new_k)

    def expert_loss_grads(self, requests: List[EditRequest], new, new_k):
        """Diagnostic: (loss, grads) of the expert-training objective at
        candidate ``new`` (dict of c1/r1/c2/r2/kd/ku) with routing key
        ``new_k`` and the CURRENT pool. Used by the cross-framework
        oracle to pin the loss surface independent of Adam's
        sign-normalized step chaos (see tp_vl.neuron_loss_grads)."""
        qb = self.vllm.encode_queries(
            [r["prompt"] for r in requests],
            [r.get("image") for r in requests],
            [r["target_new"] for r in requests])
        vcfg = self.vllm.cfg
        pre = dec.decoder_forward(
            self.vllm.params["decoder"], vcfg.decoder, qb.embeds,
            qb.kv_valid, lo=0, hi=self.cfg.edit_layer)
        return jax.value_and_grad(lambda n: self._expert_loss(
            n, new_k, self.state, self.vllm.params, pre, qb.kv_valid,
            qb.label_ids, qb.label_masks))(new)
