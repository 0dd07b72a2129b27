"""TP_VL — T-Patcher: per-edit neuron patching.

Rebuild of ``editor/vllm_editors/tp_vl/tp_vl.py``: each edit trains ONE
extra MLP neuron — key k [d_in], bias b, value v [d_out] — appended to
fc1/fc2 of the configured LLM layer (default: last layer,
configs/tp_vl/blip2-opt-2.7b.yaml). The widened-MLP hook pipeline
(tp_vl.py:71-109: concat extra pre-activations onto fc1's output, split
them back off before fc2, add value contributions to fc2's output) is
algebraically ``mlp_out += relu(x·K + B) @ V`` — realized here through
the decoder's ``mlp_residual`` intervention with zero hooks.

Per-edit training (tp_vl.py:154-195), one jitted ``fori_loop``:
- loss_e: CE on the edit sample (all previous patches active);
- loss_a: ``exp(-pre_act).mean()`` on the edit sample — push the new
  neuron to fire on the edited fact;
- loss_m: ``exp(relu(pre_act)).mean()`` on a per-step random locality
  text — suppress firing on unrelated text.

The reference streams wikitext-103 via HF datasets (tp_vl.py:40-44);
offline we accept any ``locality_texts`` corpus (defaults to the built-in
generic sentences below) — pass real wikitext for strict parity.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..utils.config import BaseConfig
from ..utils.pytree import tree_slice
from .base import EditRequest, VLLMEditor, instance_jit

_DEFAULT_LOCALITY_TEXTS = [
    "the history of the region is marked by long periods of agricultural "
    "development and trade between neighboring settlements",
    "in mathematics a continuous function preserves limits of convergent "
    "sequences and is determined by its values on a dense subset",
    "the committee published its annual report describing changes in "
    "industrial output employment and regional infrastructure",
    "early railway networks connected ports with inland mining towns and "
    "reduced the cost of transporting coal and timber",
    "the species inhabits coastal wetlands where it feeds on small "
    "crustaceans and nests among reeds during the spring months",
    "the novel follows three generations of a family as they migrate "
    "between the countryside and the growing industrial city",
    "under the treaty the two states agreed to demilitarize the border "
    "region and establish a joint commission on navigation rights",
    "the orchestra premiered the symphony to mixed reviews though later "
    "critics praised its unconventional harmonic structure",
]


@dataclasses.dataclass(frozen=True)
class TPvlConfig(BaseConfig):
    edit_model_name: str = ""
    edit_layer: int = 31
    num_steps: int = 25
    lr: float = 1e-2
    loss_a_lambda: float = 1e-4
    loss_m_lambda: float = 1e-4
    weight_decay: float = 0.0
    max_edits: int = 1024


class TPvl(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: TPvlConfig,
                 locality_texts: Optional[Sequence[str]] = None, seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        self.locality_texts = list(locality_texts or _DEFAULT_LOCALITY_TEXTS)
        self.rng = np.random.default_rng(seed)
        self._loc_cache = None
        dcfg = vllm.cfg.decoder
        self.d_in, self.d_out = dcfg.d_model, dcfg.d_model
        self._opt = optax.adamw(config.lr, weight_decay=config.weight_decay)
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "tp_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return False

    def restore_to_original_model(self):
        M = self.cfg.max_edits
        self.state = {
            "K": jnp.zeros((M, self.d_in)),
            "B": jnp.zeros((M,)),
            "V": jnp.zeros((M, self.d_out)),
            "count": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------

    @staticmethod
    def _patch_delta(state, x):
        """relu(x·K + B) @ V with inactive slots zero (V rows are zero)."""
        act = jax.nn.relu(jnp.einsum("bld,md->blm", x, state["K"]) + state["B"])
        return jnp.einsum("blm,md->bld", act, state["V"])

    def _mlp_residual(self, state):
        return (self.cfg.edit_layer, lambda x: TPvl._patch_delta(state, x))

    @instance_jit()
    def _logits_jit(self, state, vparams, embeds, kv_valid):
        vcfg = self.vllm.cfg
        h = dec.decoder_forward(vparams["decoder"], vcfg.decoder, embeds,
                                kv_valid, mlp_residual=self._mlp_residual(state))
        return dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)

    def query_logits(self, qb: QueryBatch):
        return self._logits_jit(self.state, self.vllm.params, qb.embeds,
                                qb.kv_valid)

    # ------------------------------------------------------------------

    @instance_jit()
    def _edit_jit(self, state, vparams, e_embeds, e_kv, e_labels, e_masks,
                  loc_embeds, loc_kv):
        """Train one neuron and append it. ``loc_embeds`` [S, L, d] holds
        one pre-encoded locality text per optimization step."""
        cfg = self.cfg
        vcfg = self.vllm.cfg
        li = cfg.edit_layer

        # Constant prefixes (the patch cannot affect layers < li).
        pre_e = jax.lax.stop_gradient(dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, e_embeds, e_kv, lo=0, hi=li))
        pre_loc = jax.lax.stop_gradient(dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, loc_embeds, loc_kv, lo=0, hi=li))

        layer_p = tree_slice(vparams["decoder"]["layers"], li)
        mlp_input = dec.mlp_input_at_layer  # single source of truth

        x_edit = jax.lax.stop_gradient(
            mlp_input(layer_p, vcfg.decoder, pre_e, e_kv))
        x_loc = jax.lax.stop_gradient(
            jax.vmap(lambda h, kv: mlp_input(
                layer_p, vcfg.decoder, h[None], kv[None])[0])(
                pre_loc, loc_kv))

        def run_with_patch(state2, pre, kv):
            h = dec.decoder_forward(
                vparams["decoder"], vcfg.decoder, pre, kv, lo=li,
                mlp_residual=(li, lambda x: TPvl._patch_delta(state2, x)))
            return dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)

        slot = state["count"] % state["K"].shape[0]  # ring: wrap at cap

        def loss_fn(new, step):
            k, b, v = new["k"], new["b"], new["v"]
            st2 = {"K": state["K"].at[slot].set(k),
                   "B": state["B"].at[slot].set(b[0]),
                   "V": state["V"].at[slot].set(v),
                   "count": state["count"] + 1}
            logits = run_with_patch(st2, pre_e, e_kv)
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, e_labels[..., None], -1)[..., 0]
            m = e_masks.astype(jnp.float32)
            loss_e = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
            # new-neuron pre-activation on edit tokens (tp_vl.py:166-169)
            em = e_kv.astype(jnp.float32)
            pre_act_e = jnp.einsum("bld,d->bl", x_edit, k) + b[0]
            loss_a = (jnp.exp(-pre_act_e) * em).sum() / jnp.maximum(em.sum(), 1.0)
            # locality suppression on this step's random text (tp_vl.py:171-183)
            xl = x_loc[step]
            lm = loc_kv[step].astype(jnp.float32)
            pre_act_l = jnp.einsum("ld,d->l", xl, k) + b[0]
            loss_m = (jnp.exp(jax.nn.relu(pre_act_l)) * lm).sum() \
                / jnp.maximum(lm.sum(), 1.0)
            return loss_e + loss_a * cfg.loss_a_lambda + loss_m * cfg.loss_m_lambda

        new = {"k": jnp.zeros((self.d_in,)), "b": jnp.zeros((1,)),
               "v": jnp.zeros((self.d_out,))}
        opt_state = self._opt.init(new)

        def body(step, carry):
            new, opt_state = carry
            grads = jax.grad(loss_fn)(new, step)
            updates, opt_state = self._opt.update(grads, opt_state, new)
            return optax.apply_updates(new, updates), opt_state

        new, _ = jax.lax.fori_loop(0, cfg.num_steps, body, (new, opt_state))
        return {"K": state["K"].at[slot].set(new["k"]),
                "B": state["B"].at[slot].set(new["b"][0]),
                "V": state["V"].at[slot].set(new["v"]),
                "count": state["count"] + 1}

    def _loc_corpus(self):
        """Locality texts encoded ONCE into one fixed [N, L] bucket.
        Re-encoding a fresh sample per edit makes the bucketed length a
        function of the sample, recompiling the fori_loop edit program
        inside the timed loop (30-90s per new shape on remote-compile
        runtimes) — and re-pays N text encodes per edit."""
        if self._loc_cache is None:
            self._loc_cache = self.vllm.encode_texts(self.locality_texts)
        return self._loc_cache

    def edit_one_piece(self, request: EditRequest):
        qb = self.vllm.encode_queries(
            [request["prompt"]], [request.get("image")], [request["target_new"]])
        steps = self.cfg.num_steps
        ce, ck = self._loc_corpus()
        idx = jnp.asarray(self.rng.integers(len(self.locality_texts),
                                            size=steps))
        self.state = self._edit_jit(
            self.state, self.vllm.params, qb.embeds, qb.kv_valid,
            qb.label_ids, qb.label_masks, ce[idx], ck[idx])
