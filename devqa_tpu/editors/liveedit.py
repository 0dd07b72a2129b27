"""LiveEdit — lifelong VLLM editing with per-edit LoRA experts and
two-stage (hard visual / soft query) routing.

Rebuild of the reference flagship editor
``editor/vllm_editors/liveedit/liveedit.py``:

Edit (``edit_one_piece`` :216-227): capture hidden states at LLM layer
``edit_layer_i`` (21), split into vision/query/answer spans
(``get_reps_for_edit`` :158-167), extract an edit-query rep (eqr), an
edit-vision rep (evr), and two LoRA factors (moe_c, moe_r) via the
hypernetworks (``get_new_edit`` :169-178), and append to the edit pools.

Inference (hook ``edit_with_moes`` :111-130 + ``retrieve_moes`` :132-153
+ ``get_edit_residual`` :180-190): at layer 21, hard-route by comparing
per-expert visual similarity against a learned prototype similarity
(vis_sim > vis_sim_prot), softly fuse selected experts by
softmax·sigmoid query similarity (``get_moe_fuse_coe`` :192-198), and add
the relu-LoRA mixture residual to the layer output. Probes without an
image receive no residual (the reference's hook only fires when a
vt_range exists — :115).

TPU-native redesign:
- pools are **fixed-capacity ring buffers** ([max_edits, …] + count)
  instead of ``torch.cat`` growth (:223-226) — jit-stable sequential
  editing with zero recompilation;
- hard routing keeps all slots and zeroes unselected experts in the fuse
  coefficient (masked softmax == the reference's subset softmax);
- the whole probe batch routes **vectorized** (the reference asserts
  batch=1 — :136); span slicing is replaced by span masks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import decoder as dec
from ..core.losses import gathered_token_accuracy, token_accuracy
from ..core.wrapper import JaxVLLM, QueryBatch, assemble_packed
from ..ops.layers import layer_norm
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor, instance_jit
from . import liveedit_modules as M


@dataclasses.dataclass(frozen=True)
class LiveEditConfig(BaseConfig):
    @dataclasses.dataclass(frozen=True)
    class TrainConfig(BaseConfig):
        lr: float = 1e-4
        lr_cut_it: Tuple[int, ...] = (10000,)
        lr_cut_rate: float = 0.1
        rel_lambda: float = 1.0
        gen_lambda: float = 1.0
        loc_lambda: float = 1.0
        soft_routing_lambda: float = 1.0
        hard_routing_lambda: float = 1.0

    @dataclasses.dataclass(frozen=True)
    class RetrievalEditor(BaseConfig):
        module_dim: int = 1024
        cross_att_head_n: int = 8
        lora_rank: int = 4
        lora_scale: float = 5.0
        eqe_n: int = 4

    edit_model_name: str = ""
    retrieval_editor: "LiveEditConfig.RetrievalEditor" = dataclasses.field(
        default_factory=lambda: LiveEditConfig.RetrievalEditor())
    train_cfg: "LiveEditConfig.TrainConfig" = dataclasses.field(
        default_factory=lambda: LiveEditConfig.TrainConfig())
    llm_mid_dim: int = 2560
    edit_layer_i: int = 21
    max_edits: int = 1024  # pool capacity (TPU addition; reference grows unbounded)
    # Residual mixing gathers only the top-K hard-gated experts instead of
    # einsumming the whole pool (O(M) per token). Exact whenever the hard
    # gate selects ≤ K experts (the paper's routing selects ~0-2); cost
    # drops from M=1024 to K per token.
    retrieve_top_k: int = 32
    # Faithful A/B flag for the reference's training-path quirk: its
    # forward_from_mid_layer skips layers 0..k-1 and edit_input-replaces
    # layer k's INPUT with the captured layer-k OUTPUT, so layer k runs
    # twice during training relative to inference (base.py:164-185 +
    # liveedit.py:295-317; see core/decoder.py module docstring). False =
    # this framework's consistent resume-after-k (default); True = re-run
    # layer k like the reference, making reference-trained checkpoints
    # numerically comparable.
    faithful_mid_layer_rerun: bool = False


def init_liveedit_params(cfg: LiveEditConfig, img_token_n: int, key):
    re = cfg.retrieval_editor
    d = cfg.llm_mid_dim
    ks = jax.random.split(key, 5)
    return {
        "edit_extractor": M.init_qv_extractor(
            ks[0], re.eqe_n, d, re.module_dim, img_token_n, vis_prot=False),
        "inpt_extractor": M.init_qv_extractor(
            ks[1], re.eqe_n, d, re.module_dim, img_token_n, vis_prot=True),
        "moegen_c": M.init_lowrank_generator(
            ks[2], d, re.lora_rank, re.lora_scale, d, re.module_dim),
        "moegen_r": M.init_lowrank_generator(
            ks[3], d, re.lora_rank, re.lora_scale, d, re.module_dim),
        "instant_reps_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def empty_state(cfg: LiveEditConfig):
    re = cfg.retrieval_editor
    d = cfg.llm_mid_dim
    m = cfg.max_edits
    return {
        "eqr": jnp.zeros((m, re.eqe_n, re.module_dim)),
        "evr": jnp.zeros((m, re.eqe_n, re.module_dim)),
        "moe_c": jnp.zeros((m, re.lora_rank, d)),
        "moe_r": jnp.zeros((m, re.lora_rank, d)),
        "count": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# Pure functions
# ---------------------------------------------------------------------------

def span_masks(kv_valid, vt_range, query_ends):
    """→ (vision_mask, query_mask, ans_mask, edit_mask) each [B, L].

    vision span = the slot block [p, p+V) (zeroed when the row has no
    image via kv_valid); query span = [p+V, query_end); ans span =
    [query_end, valid end); edit span = vision+query+ans (the reference's
    ``torch.cat([vision, query, ans], 1)`` fed to the LoRA generators).
    """
    b, L = kv_valid.shape
    p, pe = vt_range
    idx = jnp.arange(L)[None, :]
    valid = kv_valid > 0
    vision = (idx >= p) & (idx < pe) & valid
    query = (idx >= pe) & (idx < query_ends[:, None]) & valid
    ans = (idx >= query_ends[:, None]) & valid
    return vision, query, ans, vision | query | ans


def extract_new_edit(params, cfg: LiveEditConfig, reps, vision_mask,
                     query_mask, ans_mask):
    """``get_new_edit`` (liveedit.py:169-178), batched: reps [B, L, d] →
    (eqr, evr, moe_c, moe_r)."""
    h = cfg.retrieval_editor.cross_att_head_n
    scale = 1.0 / (cfg.retrieval_editor.lora_scale
                   * cfg.retrieval_editor.lora_rank ** 0.5)
    evr = M.qv_extract_vision(params["edit_extractor"], h, reps, reps,
                              query_mask, vision_mask)
    eqr = M.qv_extract_query(params["edit_extractor"], h, reps, query_mask)
    edit_mask = vision_mask | query_mask | ans_mask
    moe_c = M.lowrank_generate(params["moegen_c"], h, scale, reps, edit_mask)
    moe_r = M.lowrank_generate(params["moegen_r"], h, scale, reps, edit_mask)
    return eqr, evr, moe_c, moe_r


def fuse_coefficients(sim, sel_mask):
    """``get_moe_fuse_coe`` (liveedit.py:192-198) restricted to selected
    experts: masked softmax × sigmoid × selection."""
    s = jnp.where(sel_mask, sim, M.NEG_INF)
    any_sel = jnp.any(sel_mask, axis=1, keepdims=True)
    rela = jax.nn.softmax(s, axis=1)
    rela = jnp.where(any_sel, rela, 0.0)
    return rela * jax.nn.sigmoid(sim) * sel_mask


def make_residual_fn(params, cfg: LiveEditConfig, state, vt_range,
                     kv_valid, query_ends, has_image):
    """Build the layer-residual intervention closure for the current pools
    (``edit_with_moes`` + ``retrieve_moes`` + ``get_edit_residual``)."""
    re = cfg.retrieval_editor
    hn = re.cross_att_head_n
    sim_scale = 1.0 / re.module_dim ** 0.5
    slot_active = (jnp.arange(cfg.max_edits) < state["count"])[None, :]  # [1,M]

    def fn(h):
        vision_mask, query_mask, _, _ = span_masks(kv_valid, vt_range, query_ends)
        inpt = params["inpt_extractor"]
        ivr = M.qv_extract_vision(inpt, hn, h, h, query_mask, vision_mask)
        # vis_sim[b, m] = mean_e ivr[b]·evr[m] (liveedit.py:139)
        vis_sim = jnp.einsum("bed,med->bm", ivr, state["evr"]) / ivr.shape[1]
        vis_sim = vis_sim * sim_scale
        ivr_prot = M.qv_extract_from_visprot(inpt, hn, h, query_mask)
        vis_sim_prot = jnp.einsum("bed,bed->b", ivr, ivr_prot)[:, None] \
            / ivr.shape[1] * sim_scale
        selected = (vis_sim > vis_sim_prot) & slot_active \
            & (has_image[:, None] > 0)
        iqr = M.qv_extract_query(inpt, hn, h, query_mask)
        q_sim = jnp.einsum("bed,med->bm", iqr, state["eqr"]) / iqr.shape[1]
        q_sim = q_sim * sim_scale
        # Top-K expert gather: restrict the mixture to the K best-gated
        # experts per row (exact when ≤ K pass the hard gate).
        K = min(cfg.retrieve_top_k, cfg.max_edits)
        gate_score = jnp.where(selected, vis_sim, M.NEG_INF)
        topv, topi = jax.lax.top_k(gate_score, K)          # [B, K]
        sel_k = topv > M.NEG_INF / 2
        q_sim_k = jnp.take_along_axis(q_sim, topi, axis=1)  # [B, K]
        fuse = fuse_coefficients(q_sim_k, sel_k)            # [B, K]
        mc = state["moe_c"][topi]                           # [B, K, r, d]
        mr = state["moe_r"][topi]
        # residual (liveedit.py:186-190): relu-LoRA mixture
        x = layer_norm(h, params["instant_reps_norm"]["scale"],
                       params["instant_reps_norm"]["bias"])
        t = jax.nn.relu(jnp.einsum("bld,bkrd->blkr", x, mc))
        res = jnp.einsum("blkr,bkrd,bk->bld", t, mr, fuse)
        return h + res

    return fn


# ---------------------------------------------------------------------------
# Editor
# ---------------------------------------------------------------------------

class LiveEdit(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: LiveEditConfig,
                 params=None, seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        if params is None:
            params = init_liveedit_params(
                config, vllm.cfg.n_img_tokens, jax.random.PRNGKey(seed))
        self.params = params
        self.state = empty_state(config)
        self._is_editing = False

    def name_of_editor_and_model(self):
        return "liveedit", self.cfg.edit_model_name or self.vllm.cfg.name

    def restore_to_original_model(self):
        self.state = empty_state(self.cfg)

    # ---------------- edit ----------------

    @instance_jit()
    def _edit_jit(self, lparams, state, vparams, embeds, kv_valid, query_ends):
        cfg = self.cfg
        vcfg = self.vllm.cfg
        reps = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv_valid,
            lo=0, hi=cfg.edit_layer_i + 1)
        vision_mask, query_mask, ans_mask, _ = span_masks(
            kv_valid, vcfg.vt_range, query_ends)
        eqr, evr, moe_c, moe_r = extract_new_edit(
            lparams, cfg, reps, vision_mask, query_mask, ans_mask)
        # True ring buffer: wrap at capacity (an out-of-bounds .at[].set
        # would be SILENTLY dropped by JAX — edit discarded, count still
        # growing). Lifelong editing keeps the newest max_edits edits.
        i = state["count"] % state["eqr"].shape[0]
        return {
            "eqr": state["eqr"].at[i].set(eqr[0]),
            "evr": state["evr"].at[i].set(evr[0]),
            "moe_c": state["moe_c"].at[i].set(moe_c[0]),
            "moe_r": state["moe_r"].at[i].set(moe_r[0]),
            "count": state["count"] + 1,
        }

    def edit_one_piece(self, request: EditRequest):
        qb = self.vllm.encode_queries(
            [request["prompt"]], [request.get("image")], [request["target_new"]])
        qe = jnp.asarray(self.vllm.query_end_positions(qb))
        self.state = self._edit_jit(
            self.params, self.state, self.vllm.params, qb.embeds, qb.kv_valid, qe)

    # Batched edit: pool appends are order-preserving and independent, so
    # one batched rep-extraction is exactly equivalent to N sequential
    # edit_one_piece calls (the reference's batch=1 restriction is a hook
    # artifact, not an algorithmic one).
    def if_can_batch_edit(self):
        return True

    @instance_jit()
    def _edit_batch_jit(self, lparams, state, vparams, embeds, kv_valid,
                        query_ends, n_real):
        return self._edit_batch_core(lparams, state, vparams, embeds,
                                     kv_valid, query_ends, n_real)

    @instance_jit()
    def _edit_batch_packed_jit(self, lparams, state, vparams, ints,
                               rowmeta, img_buf, n_real):
        """Packed edit: assemble + rep-extraction + pool scatter in ONE
        program (same dispatch-floor economics as query_metrics_packed)."""
        embeds, kv, _, _ = assemble_packed(vparams, self.vllm.cfg, ints,
                                           rowmeta, img_buf)
        return self._edit_batch_core(lparams, state, vparams, embeds, kv,
                                     rowmeta[1], n_real)

    def _edit_batch_core(self, lparams, state, vparams, embeds, kv_valid,
                         query_ends, n_real):
        cfg = self.cfg
        vcfg = self.vllm.cfg
        reps = dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv_valid,
            lo=0, hi=cfg.edit_layer_i + 1)
        vision_mask, query_mask, ans_mask, _ = span_masks(
            kv_valid, vcfg.vt_range, query_ends)
        eqr, evr, moe_c, moe_r = extract_new_edit(
            lparams, cfg, reps, vision_mask, query_mask, ans_mask)
        i = state["count"]
        cap = state["eqr"].shape[0]
        pos = jnp.arange(embeds.shape[0])
        # Real rows ring-wrap; PADDING rows (pos >= n_real, the traced
        # real count) scatter out of bounds on purpose — JAX drops OOB
        # scatter updates — so a width-padded call leaves a state
        # IDENTICAL to the unpadded one (count advances by n_real).
        idx = jnp.where(pos < n_real, (i + pos) % cap, cap)
        return {
            "eqr": state["eqr"].at[idx].set(eqr),
            "evr": state["evr"].at[idx].set(evr),
            "moe_c": state["moe_c"].at[idx].set(moe_c),
            "moe_r": state["moe_r"].at[idx].set(moe_r),
            "count": i + n_real,
        }

    def edit_batch(self, requests, pad_width=None):
        cap = int(self.state["eqr"].shape[0])
        if len(requests) > cap:
            # More requests than pool capacity: only the LAST cap survive
            # the ring anyway, and a wrapped scatter with duplicate
            # indices has UNSPECIFIED winner order in JAX — the newest
            # edits could silently lose to older ones from the same call.
            self.state = dict(self.state,
                              count=self.state["count"]
                              + (len(requests) - cap))
            requests = requests[-cap:]
        n_real = len(requests)
        if pad_width and pad_width > n_real:
            # Shape-stability hint honored exactly (base.edit_batch):
            # padded duplicate rows are masked out of the scatter above,
            # so a ragged tail chunk reuses the compiled width.
            requests = list(requests) \
                + [requests[-1]] * (pad_width - n_real)
        prompts = [r["prompt"] for r in requests]
        imgs = [r.get("image") for r in requests]
        tgts = [r["target_new"] for r in requests]
        if (hasattr(self.vllm, "encode_queries_packed")
                and getattr(self.vllm, "mesh", None) is None):
            pq = self.vllm.encode_queries_packed(prompts, imgs, tgts)
            self.state = self._edit_batch_packed_jit(
                self.params, self.state, self.vllm.params, pq.ints,
                pq.rowmeta, pq.img_buf, jnp.asarray(n_real, jnp.int32))
            return
        qb = self.vllm.encode_queries(prompts, imgs, tgts)
        qe = jnp.asarray(self.vllm.query_end_positions(qb))
        self.state = self._edit_batch_jit(
            self.params, self.state, self.vllm.params, qb.embeds,
            qb.kv_valid, qe, jnp.asarray(n_real, jnp.int32))

    # ---------------- inference ----------------

    def _edited_hidden(self, lparams, state, vparams, embeds, kv_valid,
                       query_ends, has_image):
        """Traced forward (no LM head) under the current pools."""
        vcfg = self.vllm.cfg
        fn = make_residual_fn(lparams, self.cfg, state, vcfg.vt_range,
                              kv_valid, query_ends, has_image)
        return dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, embeds, kv_valid,
            layer_residual=(self.cfg.edit_layer_i, fn))

    def _edited_logits(self, lparams, state, vparams, embeds, kv_valid,
                       query_ends, has_image):
        """Traced forward under the current pools (shared by the logits
        and the fused-metrics jits)."""
        h = self._edited_hidden(lparams, state, vparams, embeds, kv_valid,
                                query_ends, has_image)
        return dec.decoder_logits(vparams["decoder"], self.vllm.cfg.decoder,
                                  h)

    @instance_jit()
    def _logits_jit(self, lparams, state, vparams, embeds, kv_valid,
                    query_ends, has_image):
        return self._edited_logits(lparams, state, vparams, embeds,
                                   kv_valid, query_ends, has_image)

    @instance_jit()
    def _metrics_fused_jit(self, lparams, state, vparams, embeds, kv_valid,
                           query_ends, has_image, label_ids, label_masks):
        # Forward + masked-argmax metrics in ONE program: the [B, L, V]
        # f32 logits never round-trip HBM between dispatches (profiled:
        # lm head 25ms + separate metrics 9ms per 120-row probe chunk).
        logits = self._edited_logits(lparams, state, vparams, embeds,
                                     kv_valid, query_ends, has_image)
        return token_accuracy(logits, label_ids, label_masks)

    def query_logits(self, qb: QueryBatch):
        qe = jnp.asarray(self.vllm.query_end_positions(qb))
        return self._logits_jit(
            self.params, self.state, self.vllm.params, qb.embeds, qb.kv_valid,
            qe, jnp.asarray(qb.has_image))

    def query_metrics(self, qb: QueryBatch):
        qe = jnp.asarray(self.vllm.query_end_positions(qb))
        return self._metrics_fused_jit(
            self.params, self.state, self.vllm.params, qb.embeds, qb.kv_valid,
            qe, jnp.asarray(qb.has_image), qb.label_ids, qb.label_masks)

    @instance_jit()
    def _metrics_packed_jit(self, lparams, state, vparams, ints, rowmeta,
                            img_buf):
        embeds, kv, labels, masks = assemble_packed(
            vparams, self.vllm.cfg, ints, rowmeta, img_buf)
        logits = self._edited_logits(lparams, state, vparams, embeds, kv,
                                     rowmeta[1], rowmeta[0])
        return token_accuracy(logits, labels, masks)

    @instance_jit(static_argnums=(6,))
    def _metrics_packed_gathered_jit(self, lparams, state, vparams, ints,
                                     rowmeta, img_buf, n_pos):
        """Gathered-head packed metrics: the LM head runs only at
        supervised positions (losses.gathered_token_accuracy — 2/3 of
        the head's 26.5ms/chunk is unsupervised positions at the
        headline geometry). Eligibility is checked on host by
        query_metrics_packed (wrapper._gather_head_ok). ``n_pos`` is a
        STATIC argument (not a closed-over ``self.vllm._gather_positions``
        read) so run-level width raises retrace instead of silently
        reusing a narrower stale executable."""
        vcfg = self.vllm.cfg
        embeds, kv, labels, masks = assemble_packed(
            vparams, vcfg, ints, rowmeta, img_buf)
        h = self._edited_hidden(lparams, state, vparams, embeds, kv,
                                rowmeta[1], rowmeta[0])
        return gathered_token_accuracy(
            h, labels, masks, n_pos,
            pred_fn=lambda hg: dec.decoder_pred_ids(vparams["decoder"],
                                                    vcfg.decoder, hg))

    def query_metrics_packed(self, pq):
        """One-program probe path: assemble + edited forward + metrics
        fused (wrapper.PackedQuery — each extra device program pays a
        fixed dispatch floor on remote runtimes). Returns (acc, pred,
        valid_or_None) per the wrapper's packed contract."""
        if self.vllm._gather_head_ok(pq):
            return self._metrics_packed_gathered_jit(
                self.params, self.state, self.vllm.params, pq.ints,
                pq.rowmeta, pq.img_buf, self.vllm._gather_positions)
        a, p = self._metrics_packed_jit(self.params, self.state,
                                        self.vllm.params, pq.ints,
                                        pq.rowmeta, pq.img_buf)
        return a, p, None


# ---------------------------------------------------------------------------
# Training (liveedit.py:251-476 — organize_batch_data / train_a_batch)
# ---------------------------------------------------------------------------

def _per_row_label_loss(logits, label_ids, label_masks):
    """Per-row averaged CE then batch mean — the reference averages each
    sample's loss then divides by batch_size (liveedit.py:373-383)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, label_ids[..., None], axis=-1)[..., 0]
    m = label_masks.astype(jnp.float32)
    per_row = -(picked * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
    return per_row.mean()


class LiveEditTrainingMixin:
    """Training methods for LiveEdit (mixed into the class below)."""

    # ---- host-side batch organization (prefetch thread) ----

    def organize_batch_data(self, cases):
        """The reference's ``organize_batch_data`` (liveedit.py:251-352):
        sample rel/gen/loc queries per case, draw the random expert-subset
        masks and the contrastive neighbor/prototype picks. All heavy
        device work (mid-layer reps) happens inside the jitted step."""
        rng = self._rng_data
        B = len(cases)
        gen_keys = list(cases[0].generality.keys())
        loc_keys = [k for k in cases[0].locality.keys()
                    if cases[0].locality[k][0]["image"] is not None]
        prompts, images, targets = [], [], []

        def add(p, i, t):
            prompts.append(p); images.append(i); targets.append(t)

        for c in cases:  # rel rows [0, B)
            r = c.requests[int(rng.integers(0, len(c.requests)))]
            add(r["prompt"], r["image"], r["target_new"])
        for g in gen_keys:  # gen rows [B(1+gi), B(2+gi))
            for c in cases:
                lst = c.generality[g]
                e = lst[int(rng.integers(0, len(lst)))]
                add(e["prompt"], e["image"], e["target"])
        for l in loc_keys:
            for c in cases:
                lst = c.locality[l]
                e = lst[int(rng.integers(0, len(lst)))]
                add(e["prompt"], e["image"], e["target"])

        qb = self.vllm.encode_queries(prompts, images, targets)
        G, K = len(gen_keys), len(loc_keys)

        # Expert-subset masks (liveedit.py:279-292). With one request per
        # case the request index grid is the identity.
        eye = np.eye(B, dtype=bool)
        rel_mask, gen_mask, loc_mask = eye.copy(), eye.copy(), np.zeros((B, B), bool)
        for i in range(B):
            ns = self._rng_train.integers(0, B + 1, 3)
            rel_mask[i, :ns[0]] = True
            gen_mask[i, :ns[1]] = True
            loc_mask[i, :ns[2]] = True

        def row_of(kind, key_idx, b):
            if kind == 0:
                return b
            if kind == 1:
                return B * (1 + key_idx) + b
            return B * (1 + G + key_idx) + b

        def rand_pick(kinds, b):
            k = int(rng.integers(0, len(kinds)))
            kind = kinds[k]
            key_idx = int(rng.integers(0, G)) if kind == 1 else (
                int(rng.integers(0, K)) if kind == 2 else 0)
            return row_of(kind, key_idx, b)

        n1, n2, p1, p2 = [], [], [], []
        for b in range(B):  # neighbor pairs (liveedit.py:326-337)
            n = int(rng.integers(0, 3))
            n1.append(rand_pick([n], b) if n != 1 else rand_pick([1], b))
            n_b = int(rng.integers(0, 2)) if n != 2 else 2
            n2.append(rand_pick([n_b], b))
        for b in range(B):  # prototype pairs (liveedit.py:339-349)
            n = int(rng.integers(0, 2))
            first = [int(rng.integers(0, 2)), 2]
            p1.append(rand_pick([first[n]], b))
            p2.append(rand_pick([first[1 - n]], b))

        return {
            "embeds": qb.embeds, "kv_valid": qb.kv_valid,
            "label_ids": qb.label_ids, "label_masks": qb.label_masks,
            "query_ends": jnp.asarray(self.vllm.query_end_positions(qb)),
            "has_image": jnp.asarray(qb.has_image),
            "rel_mask": jnp.asarray(rel_mask),
            "gen_mask": jnp.asarray(gen_mask),
            "loc_mask": jnp.asarray(loc_mask),
            "n1": jnp.asarray(n1), "n2": jnp.asarray(n2),
            "p1": jnp.asarray(p1), "p2": jnp.asarray(p2),
            "B": B, "G": G, "K": K,
        }

    # ---- device-side training step ----

    @instance_jit(static_argnums=(4, 5, 6))
    def _train_step_jit(self, lparams, opt_state, vparams, batch, B, G, K):
        # vparams is an ARGUMENT, never a closure: closing over the
        # multi-GB backbone bakes it into the program as constants and
        # pins the jit cache to stale weights (CLAUDE.md rule).
        cfg = self.cfg
        vcfg = self.vllm.cfg
        tc = cfg.train_cfg
        re = cfg.retrieval_editor
        hn = re.cross_att_head_n
        sim_scale = 1.0 / re.module_dim ** 0.5
        eps = 1e-8

        kv, qe, him = batch["kv_valid"], batch["query_ends"], batch["has_image"]
        vis_m, q_m, ans_m, _ = span_masks(kv, vcfg.vt_range, qe)

        # frozen prefix reps for every row (the data-proc replica's job)
        reps = jax.lax.stop_gradient(dec.decoder_forward(
            vparams["decoder"], vcfg.decoder, batch["embeds"], kv,
            lo=0, hi=cfg.edit_layer_i + 1))
        rel = jnp.arange(B)
        rows_of = lambda gi, base: base + gi * B + jnp.arange(B)

        # Resume after the edit layer (consistent with inference), or —
        # faithful mode — reproduce the reference train path exactly:
        # forward_from_mid_layer feeds the captured layer-k OUTPUT back
        # as layer k's INPUT (base.py:173-184), so layer k re-runs on the
        # raw rep, and the edit_with_moes hook then adds the residual to
        # the RE-RUN layer's output (liveedit.py:111-114) — i.e. the
        # residual lands AFTER the rerun, not inside its input.
        resume_lo = cfg.edit_layer_i if cfg.faithful_mid_layer_rerun \
            else cfg.edit_layer_i + 1

        def suffix(h, kv_rows, lo=None):
            hh = dec.decoder_forward(
                vparams["decoder"], vcfg.decoder, h, kv_rows,
                lo=resume_lo if lo is None else lo)
            return dec.decoder_logits(vparams["decoder"], vcfg.decoder, hh)

        def edited_suffix(r, res, kv_rows):
            if cfg.faithful_mid_layer_rerun:
                rerun = dec.decoder_forward(
                    vparams["decoder"], vcfg.decoder, r, kv_rows,
                    lo=cfg.edit_layer_i, hi=cfg.edit_layer_i + 1)
                return suffix(rerun + res, kv_rows, lo=cfg.edit_layer_i + 1)
            return suffix(r + res, kv_rows)

        def loss_fn(lp):
            logs = {}
            eqr, _evr, moe_c, moe_r = extract_new_edit(
                lp, cfg, reps[rel], vis_m[rel], q_m[rel], ans_m[rel])

            def edited_logits(rows, mm):
                r, qm = reps[rows], q_m[rows]
                iqr = M.qv_extract_query(lp["inpt_extractor"], hn, r, qm)
                sim = jnp.einsum("bed,med->bm", iqr, eqr) / iqr.shape[1] * sim_scale
                fuse = fuse_coefficients(sim, mm)
                x = layer_norm(r, lp["instant_reps_norm"]["scale"],
                               lp["instant_reps_norm"]["bias"])
                t = jax.nn.relu(jnp.einsum("bld,mrd->blmr", x, moe_c))
                res = jnp.einsum("blmr,mrd,bm->bld", t, moe_r, fuse)
                return edited_suffix(r, res, kv[rows])

            total = 0.0
            # Reliability
            rel_logits = edited_logits(rel, batch["rel_mask"])
            rel_loss = _per_row_label_loss(
                rel_logits, batch["label_ids"][rel], batch["label_masks"][rel])
            logs["rel_loss"] = rel_loss
            total = total + rel_loss * tc.rel_lambda

            def per_key_rows(logits, rows, n_keys, kl_pre=None):
                """Per-key token-mean losses from ONE batched forward."""
                m = batch["label_masks"][rows].astype(jnp.float32)
                if kl_pre is None:
                    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                    picked = jnp.take_along_axis(
                        logp, batch["label_ids"][rows][..., None], -1)[..., 0]
                    per_row = (-(picked * m).sum(-1)
                               / jnp.maximum(m.sum(-1), 1.0))
                else:
                    lp1 = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                    lp2 = jax.nn.log_softmax(kl_pre.astype(jnp.float32), -1)
                    klv = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)
                    per_row = ((klv * m).sum(-1)
                               / jnp.maximum(m.sum(-1), 1.0))
                return per_row.reshape(n_keys, B).mean(1).sum()

            # Generality: ALL G·B rows in one suffix forward (per-key means
            # recovered by reshape — identical math to the per-key loop)
            gen_rows = B + jnp.arange(G * B)
            gen_logits = edited_logits(gen_rows,
                                       jnp.tile(batch["gen_mask"], (G, 1)))
            gen_loss = per_key_rows(gen_logits, gen_rows, G)
            logs["gen_loss"] = gen_loss
            total = total + gen_loss * tc.gen_lambda
            # Locality: one batched forward + KL to the unedited suffix
            loc_rows = B * (1 + G) + jnp.arange(K * B)
            pre = jax.lax.stop_gradient(suffix(reps[loc_rows], kv[loc_rows]))
            loc_logits = edited_logits(loc_rows,
                                       jnp.tile(batch["loc_mask"], (K, 1)))
            loc_loss = per_key_rows(loc_logits, loc_rows, K, kl_pre=pre)
            logs["loc_loss"] = loc_loss
            total = total + loc_loss * tc.loc_lambda
            # Soft-routing contrastive (liveedit.py:424-438)
            n1, n2 = batch["n1"], batch["n2"]
            iqrs = M.qv_extract_query(lp["inpt_extractor"], hn, reps[n1], q_m[n1])
            eqrs2 = M.qv_extract_query(lp["edit_extractor"], hn, reps[n2], q_m[n2])
            sim = jnp.einsum("ned,med->nm", iqrs, eqrs2) / iqrs.shape[1] * sim_scale
            rela = jax.nn.softmax(sim, axis=1)
            absim = jax.nn.sigmoid(sim)
            soft_rela = -jnp.log(jnp.diag(rela) + eps).mean()
            abs_pos = jnp.diag(absim)
            abs_neg = jnp.diag(jnp.roll(absim, 1, axis=1))
            soft_abs = -(jnp.log(abs_pos + eps) + jnp.log(1 - abs_neg + eps)).mean()
            soft = soft_rela + soft_abs
            logs["soft_routing_loss"] = soft
            total = total + soft * tc.soft_routing_lambda

            # Hard-routing (liveedit.py:440-458)
            def hard_sim(rows_i, rows_e):
                ivrs = M.qv_extract_vision(lp["inpt_extractor"], hn,
                                           reps[rows_i], reps[rows_i],
                                           q_m[rows_i], vis_m[rows_i])
                evrs = M.qv_extract_vision(lp["edit_extractor"], hn,
                                           reps[rows_e], reps[rows_e],
                                           q_m[rows_e], vis_m[rows_e])
                s = jnp.einsum("bed,med->bm", ivrs, evrs) / ivrs.shape[1] * sim_scale
                prot = M.qv_extract_from_visprot(lp["inpt_extractor"], hn,
                                                 reps[rows_i], q_m[rows_i])
                sp = jnp.einsum("bed,bed->b", ivrs, prot)[:, None] \
                    / ivrs.shape[1] * sim_scale
                return jax.nn.softmax(jnp.concatenate([s, sp], 1), axis=1)

            sim_nb = hard_sim(n1, n2)
            hard_nb = -jnp.log(jnp.diag(sim_nb) + eps).mean()
            sim_pr = hard_sim(batch["p1"], batch["p2"])
            hard_pr = -jnp.log(sim_pr[:, -1] + eps).mean()
            hard = hard_nb + hard_pr
            logs["hard_routing_neighbor_loss"] = hard_nb
            logs["hard_routing_prototype_loss"] = hard_pr
            total = total + hard * tc.hard_routing_lambda
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(lparams)
        updates, opt_state = self._opt.update(grads, opt_state, lparams)
        lparams = optax.apply_updates(lparams, updates)
        return lparams, opt_state, loss, logs

    def train_step(self, batch):
        B, G, K = batch["B"], batch["G"], batch["K"]
        self.params, self._opt_state, loss, logs = self._train_step_jit(
            self.params, self._opt_state, self.vllm.params,
            {k: v for k, v in batch.items() if k not in ("B", "G", "K")},
            B, G, K)
        return float(loss), {k: float(v) for k, v in logs.items()}

    def train_init_editor(self, seed: int):
        self.params = init_liveedit_params(
            self.cfg, self.vllm.cfg.n_img_tokens, jax.random.PRNGKey(seed))
        self._rng_data = np.random.default_rng(seed)
        self._rng_train = np.random.default_rng(seed + 1)
        tc = self.cfg.train_cfg
        cut_it = np.asarray(tc.lr_cut_it)

        def schedule(step):
            return tc.lr * tc.lr_cut_rate ** jnp.sum(step > jnp.asarray(cut_it))

        self._opt = optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(schedule),
            optax.scale(-1.0))
        self._opt_state = self._opt.init(self.params)

    def reseed_host(self, seed: int):
        """Host-RNG-only reseed for checkpoint resume (train/loop.py
        load_ckpt): the device state is about to be replaced by
        set_train_state, so re-running the full train_init would only
        waste a second optimizer-state allocation."""
        self._rng_data = np.random.default_rng(seed)
        self._rng_train = np.random.default_rng(seed + 1)

    def get_train_state(self):
        return {"params": self.params, "opt_state": self._opt_state}

    def set_train_state(self, state):
        self.params = state["params"]
        self._opt_state = state["opt_state"]


# Mix training into LiveEdit.
class LiveEditTrainable(LiveEditTrainingMixin, LiveEdit):
    """LiveEdit with the meta-training protocol attached (the reference's
    VLLMBaseEditorWithTraining side)."""

    def __init__(self, vllm, config, params=None, seed: int = 0):
        LiveEdit.__init__(self, vllm, config, params=params, seed=seed)
        self.train_init_editor(seed)
        if params is not None:
            self.params = params
