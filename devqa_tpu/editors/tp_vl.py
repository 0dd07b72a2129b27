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

Reference quirk, reproduced behind ``faithful_loss_shadow`` (default
True — it is the behavior the published numbers come from): the
reference's training loop overwrites its ``input_embeds`` variable with
the locality embeds at the end of every step (tp_vl.py:173-175, shadows
the edit batch built at :156-157), so from step 2 onward loss_e and
loss_a are computed on the PREVIOUS step's locality text — the edit
sample is only ever seen at step 1. ``label_loss`` survives the length
mismatch because it right-aligns labels (``logits[:, -l_short:]``,
vllms_for_edit/base.py:111-119), gathering the edit's label ids against
the tail of the locality sequence. ``faithful_loss_shadow=False`` gives
the evidently intended semantics (loss_e/loss_a on the edit sample at
every step).

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
    # Reproduce the reference's input_embeds shadowing bug (module
    # docstring): steps >= 2 compute loss_e/loss_a on the previous
    # step's locality text instead of the edit sample.
    faithful_loss_shadow: bool = True


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

    def _edit_prep(self, vparams, e_embeds, e_kv, loc_embeds, loc_kv):
        """Patch-independent constants of one edit: the below-layer
        prefixes and the fc1 inputs (the patch lives in layer li's MLP,
        so nothing under it can depend on the neuron being trained)."""
        vcfg = self.vllm.cfg
        li = self.cfg.edit_layer
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
        return pre_e, x_edit, pre_loc, x_loc

    @staticmethod
    def _with_candidate(state, slot, new):
        return {"K": state["K"].at[slot].set(new["k"]),
                "B": state["B"].at[slot].set(new["b"][0]),
                "V": state["V"].at[slot].set(new["v"]),
                "count": state["count"] + 1}

    def _neuron_loss(self, new, state, slot, vparams, pre_e, e_kv, e_labels,
                     e_masks, x_edit, xl, lm_row):
        """loss_e + λa·loss_a + λm·loss_m for candidate neuron ``new``
        (tp_vl.py:154-195); ``xl``/``lm_row`` are ONE locality text's fc1
        inputs and validity row."""
        cfg = self.cfg
        vcfg = self.vllm.cfg
        li = cfg.edit_layer
        k, b = new["k"], new["b"]
        st2 = self._with_candidate(state, slot, new)
        h = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, pre_e, e_kv, lo=li,
            mlp_residual=(li, lambda x: TPvl._patch_delta(st2, x)))
        logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
        logp = jax.nn.log_softmax(logits, -1)
        picked = jnp.take_along_axis(logp, e_labels[..., None], -1)[..., 0]
        m = e_masks.astype(jnp.float32)
        loss_e = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        # new-neuron pre-activation on edit tokens (tp_vl.py:166-169)
        em = e_kv.astype(jnp.float32)
        pre_act_e = jnp.einsum("bld,d->bl", x_edit, k) + b[0]
        loss_a = (jnp.exp(-pre_act_e) * em).sum() / jnp.maximum(em.sum(), 1.0)
        # locality suppression on this step's random text (tp_vl.py:171-183)
        lm = lm_row.astype(jnp.float32)
        pre_act_l = jnp.einsum("ld,d->l", xl, k) + b[0]
        loss_m = (jnp.exp(jax.nn.relu(pre_act_l)) * lm).sum() \
            / jnp.maximum(lm.sum(), 1.0)
        return loss_e + loss_a * cfg.loss_a_lambda + loss_m * cfg.loss_m_lambda

    def _neuron_loss_shadow(self, new, state, slot, vparams, pre_prev,
                            lk_prev, x_prev, e_kv, e_labels, e_masks,
                            x_cur, lm_cur):
        """The reference's step >= 2 loss (module docstring): loss_e and
        loss_a run on the PREVIOUS step's locality text; the edit's label
        ids are right-aligned onto its tail (label_loss slices
        ``logits[:, -l_short:]``, vllms_for_edit/base.py:113). ``l_short``
        is the edit's TEXT token count; a full-layout edit label at
        position q is text index ``q - V``, and the reference's sliced
        position ``n_loc - l_short + (q - V)`` maps back into our slotted
        loc row as k if k < img_slot_pos else V + k."""
        cfg = self.cfg
        vcfg = self.vllm.cfg
        li = cfg.edit_layer
        k, b = new["k"], new["b"]
        st2 = self._with_candidate(state, slot, new)
        h = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, pre_prev[None], lk_prev[None],
            lo=li, mlp_residual=(li, lambda x: TPvl._patch_delta(st2, x)))
        logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
        logp = jax.nn.log_softmax(logits, -1)[0]          # [L_loc, V]
        V, p = vcfg.n_img_tokens, vcfg.img_slot_pos
        vis_valid = e_kv[0, p]                            # 1 iff edit has image
        n_text = e_kv[0].sum() - V * vis_valid            # reference l_short
        n_loc = lk_prev.sum()                             # loc token count
        q = jnp.arange(e_labels.shape[1])
        ref_k = n_loc - n_text + (q - V)                  # text-seq index
        loc_pos = jnp.clip(jnp.where(ref_k < p, ref_k, V + ref_k),
                           0, logp.shape[0] - 1)
        picked = jnp.take_along_axis(
            logp[loc_pos], e_labels[0][:, None], -1)[:, 0]
        m = e_masks[0].astype(jnp.float32)
        loss_e = -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        # loss_a: new-neuron pre-activation on the prev loc text
        lmp = lk_prev.astype(jnp.float32)
        pre_act_a = jnp.einsum("ld,d->l", x_prev, k) + b[0]
        loss_a = (jnp.exp(-pre_act_a) * lmp).sum() / jnp.maximum(lmp.sum(), 1.0)
        lm = lm_cur.astype(jnp.float32)
        pre_act_l = jnp.einsum("ld,d->l", x_cur, k) + b[0]
        loss_m = (jnp.exp(jax.nn.relu(pre_act_l)) * lm).sum() \
            / jnp.maximum(lm.sum(), 1.0)
        return loss_e + loss_a * cfg.loss_a_lambda + loss_m * cfg.loss_m_lambda

    @instance_jit()
    def _edit_jit(self, state, vparams, e_embeds, e_kv, e_labels, e_masks,
                  loc_embeds, loc_kv):
        """Train one neuron and append it. ``loc_embeds`` [S, L, d] holds
        one pre-encoded locality text per optimization step."""
        cfg = self.cfg
        pre_e, x_edit, pre_loc, x_loc = self._edit_prep(
            vparams, e_embeds, e_kv, loc_embeds, loc_kv)
        slot = state["count"] % state["K"].shape[0]  # ring: wrap at cap

        def edit_loss(new, step):
            return self._neuron_loss(new, state, slot, vparams, pre_e, e_kv,
                                     e_labels, e_masks, x_edit, x_loc[step],
                                     loc_kv[step])

        if cfg.faithful_loss_shadow:
            def loss_fn(new, step):
                prev = jnp.maximum(step - 1, 0)
                return jax.lax.cond(
                    step == 0,
                    lambda: edit_loss(new, step),
                    lambda: self._neuron_loss_shadow(
                        new, state, slot, vparams, pre_loc[prev],
                        loc_kv[prev], x_loc[prev], e_kv, e_labels, e_masks,
                        x_loc[step], loc_kv[step]))
        else:
            loss_fn = edit_loss

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

    def neuron_loss_grads(self, request: EditRequest, new, loc_index: int = 0,
                          shadowed: bool = False):
        """Diagnostic: gradients of the per-edit neuron loss at candidate
        ``new`` = {"k","b","v"} with the CURRENT pool state. Used by the
        cross-framework oracle to pin the loss surface itself — Adam's
        sign-normalized steps amplify ~1e-6 float drift to ±lr whenever
        the first moment crosses zero (observed from step 2 of the
        reference's own trajectory), so post-optimizer params are only
        comparable for one step; gradients are comparable at any state.
        ``shadowed`` selects the step >= 2 loss surface (the reference's
        input_embeds shadowing bug — loss_e/loss_a on loc text
        ``loc_index``, which also serves as the loss_m row)."""
        qb = self.vllm.encode_queries(
            [request["prompt"]], [request.get("image")], [request["target_new"]])
        ce, ck = self._loc_corpus()
        pre_e, x_edit, pre_loc, x_loc = self._edit_prep(
            self.vllm.params, qb.embeds, qb.kv_valid, ce, ck)
        slot = self.state["count"] % self.state["K"].shape[0]
        i = loc_index
        if shadowed:
            return jax.grad(lambda n: self._neuron_loss_shadow(
                n, self.state, slot, self.vllm.params, pre_loc[i], ck[i],
                x_loc[i], qb.kv_valid, qb.label_ids, qb.label_masks,
                x_loc[i], ck[i]))(new)
        return jax.grad(lambda n: self._neuron_loss(
            n, self.state, slot, self.vllm.params, pre_e, qb.kv_valid,
            qb.label_ids, qb.label_masks, x_edit, x_loc[i], ck[i]))(new)
