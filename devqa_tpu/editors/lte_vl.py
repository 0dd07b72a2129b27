"""LTE_VL — "Learning To Edit": prefix-following fine-tune + retrieval.

Rebuild of ``editor/vllm_editors/lte_vl/lte_vl.py``:

- **Edit** (:145-150): store the request, its *edit prefix* embeddings —
  "[Updated Information]<prompt><target>\\n[Query]" with the edit image
  (``__get_edit_prefix__`` :112-118) — and a sentence embedding of
  "<prompt> <target>" for retrieval.
- **Inference** (:75-110): embed the query prompt, cosine-match against
  the pool; if best sim > ``sim_threshold`` (0.3), prepend that edit's
  prefix embeddings and run the (fine-tuned) LLM, slicing logits after
  the prefix; else run unprefixed.
- **Training** (:205-240): fine-tune the whole language model (lr 5e-6)
  so it follows the prefix: CE on prefixed rel/gen, locality KL both with
  and without the prefix against pre-tune logits.

TPU redesign: the prefix pool is a fixed-capacity padded block
[M, Lp, d]; at inference the prefix is prepended as a maskable block —
rows that retrieve nothing mask the whole block off (same masked-block
trick as the vision slot), so the batch stays one fused forward. The
sentence encoder is pluggable (hash encoder in tests, MiniLM/mpnet in
production via retrieval/encoders.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor, instance_jit


@dataclasses.dataclass(frozen=True)
class LTEvlConfig(BaseConfig):
    @dataclasses.dataclass(frozen=True)
    class TrainConfig(BaseConfig):
        lr: float = 5e-6
        relia_lambda: float = 1.0
        gen_lambda: float = 1.0
        loc_lambda: float = 1.0

    edit_model_name: str = ""
    retrieval_embed_dim: int = 768
    sim_threshold: float = 0.3
    max_edits: int = 256
    max_prefix_len: int = 96
    train_config: "LTEvlConfig.TrainConfig" = dataclasses.field(
        default_factory=lambda: LTEvlConfig.TrainConfig())


EDIT_SIGN = "[Updated Information]"
QUERY_SIGN = "\n[Query]"


class LTEvl(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: LTEvlConfig,
                 sentence_encoder: Callable[[Sequence[str]], np.ndarray]):
        super().__init__(vllm)
        self.cfg = config
        self.sentence_encoder = sentence_encoder
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "lte_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return False

    def restore_to_original_model(self):
        cfg = self.cfg
        d = self.vllm.cfg.decoder.d_model
        self.state = {
            "prefix_embeds": jnp.zeros((cfg.max_edits, cfg.max_prefix_len, d)),
            "prefix_mask": jnp.zeros((cfg.max_edits, cfg.max_prefix_len), jnp.int32),
            "count": jnp.zeros((), jnp.int32),
        }
        self.retr_pool = np.zeros((cfg.max_edits, cfg.retrieval_embed_dim),
                                  np.float32)
        self.requests: List[EditRequest] = []
        self._last_prompts: List[str] = []

    # ------------------------------------------------------------------

    def _edit_prefix(self, request: EditRequest):
        """__get_edit_prefix__ (lte_vl.py:112-118): embeds of
        '[Updated Information]<prompt><target>\\n[Query]' + edit image,
        padded/truncated to max_prefix_len."""
        p, t = request["prompt"], request["target_new"]
        if p[-1] != " " and t[0] != " ":
            t = " " + t
        text = EDIT_SIGN + p + t + QUERY_SIGN
        qb = self.vllm.encode_queries([text], [request.get("image")], [""])
        E = self.cfg.max_prefix_len
        emb = np.asarray(qb.embeds[0])
        msk = np.asarray(qb.kv_valid[0])
        # Compact to the VALID positions first: no-image rows carry an
        # invalid vision-slot hole mid-sequence, so windowing by
        # sum(valid) on the uncompacted layout dropped the trailing
        # target + '\n[Query]' marker. Overlong prefixes then keep the
        # TAIL of the valid span: the prompt/target and the trailing
        # marker the LTE fine-tune conditions on live at the end
        # ("[Updated Information]" boilerplate at the head is the
        # expendable part). The reference never truncates (dynamic
        # shapes, lte_vl.py:112-118); E is this build's
        # shape-stability cap.
        emb = emb[msk == 1]
        v = emb.shape[0]
        if v >= E:
            return emb[v - E:], np.ones(E, msk.dtype)
        pad = ((0, E - v), (0, 0))
        return np.pad(emb, pad), np.pad(np.ones(v, msk.dtype), ((0, E - v),))

    def edit_one_piece(self, request: EditRequest):
        emb, msk = self._edit_prefix(request)
        cap = int(self.state["prefix_embeds"].shape[0])
        slot = int(self.state["count"]) % cap  # ring: overwrite oldest
        self.state = {
            "prefix_embeds": self.state["prefix_embeds"].at[slot].set(
                jnp.asarray(emb)),
            "prefix_mask": self.state["prefix_mask"].at[slot].set(
                jnp.asarray(msk, jnp.int32)),
            "count": self.state["count"] + 1,
        }
        e = np.asarray(self.sentence_encoder(
            [request["prompt"] + " " + request["target_new"]]), np.float32)[0]
        self.retr_pool[slot] = e
        self.requests.append(request)

    # ------------------------------------------------------------------

    def _retrieve(self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """→ (best index [B], use_prefix [B]) by cosine sim > threshold
        (lte_vl.py:96-110)."""
        n = min(int(self.state["count"]), self.retr_pool.shape[0])
        q = np.asarray(self.sentence_encoder(list(prompts)), np.float32)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        pool = self.retr_pool[:n]
        pool = pool / np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
        sim = q @ pool.T  # [B, n]
        best = sim.argmax(1)
        use = sim.max(1) > self.cfg.sim_threshold
        return best.astype(np.int32), use.astype(np.int32)

    @instance_jit()
    def _logits_jit(self, state, vparams, embeds, kv_valid, best, use):
        vcfg = self.vllm.cfg
        E = self.cfg.max_prefix_len
        pe = state["prefix_embeds"][best]                       # [B, E, d]
        pm = state["prefix_mask"][best] * use[:, None]          # [B, E]
        full = jnp.concatenate([pe.astype(embeds.dtype), embeds], axis=1)
        kv = jnp.concatenate([pm, kv_valid], axis=1)
        h = dec.decoder_forward(vparams["decoder"], vcfg.decoder, full, kv)
        logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
        return logits[:, E:]  # positions realign with the unprefixed layout

    def query_logits(self, qb: QueryBatch):
        if int(self.state["count"]) == 0:
            return self.vllm.logits(qb.embeds, qb.kv_valid)
        # Retrieval keys on the raw prompt text carried with the batch
        # (fallback: the last build_query_batch call, for callers that
        # reconstructed the QueryBatch through a jit boundary).
        prompts = getattr(qb, "raw_prompts", None) or self._last_prompts
        best, use = self._retrieve(prompts)
        return self._logits_jit(self.state, self.vllm.params, qb.embeds,
                                qb.kv_valid, jnp.asarray(best), jnp.asarray(use))

    def build_query_batch(self, prompts, image_paths, targets) -> QueryBatch:
        self._last_prompts = list(prompts)
        qb = self.vllm.encode_queries(prompts, image_paths, targets)
        # Carry the raw prompts WITH the batch: query_logits retrieves by
        # prompt text, and falling back to call-order state silently
        # retrieves against the wrong prompts if batches are pre-encoded.
        qb.raw_prompts = list(prompts)
        return qb


class LTEvlTrainable(LTEvl):
    """LTE training (lte_vl.py:205-240): fine-tunes the decoder to follow
    the '[Updated Information]…[Query]' prefix format."""

    # The train state IS the full decoder + Adam state: snapshotting the
    # EMA-best generation would double multi-GB HBM residency, so the
    # trainer's throttled 'Best' save stores the flush-time state instead
    # (train/loop.py _mark_ema_best).
    snapshot_best_state = False

    def __init__(self, vllm, config, sentence_encoder, seed: int = 0):
        super().__init__(vllm, config, sentence_encoder)
        self.train_init_editor(seed)

    def organize_batch_data(self, cases):
        c = cases[0]  # the reference trains with batch size 1 (lte_vl.py:173)
        r = c.requests[0]
        emb, msk = self._edit_prefix(r)
        rel = self.vllm.encode_queries([r["prompt"]], [r["image"]],
                                       [r["target_new"]])
        gens = {k: self.vllm.encode_queries([v[0]["prompt"]], [v[0]["image"]],
                                            [v[0]["target"]])
                for k, v in c.generality.items()}
        locs = {k: self.vllm.encode_queries([v[0]["prompt"]], [v[0]["image"]],
                                            [v[0]["target"]])
                for k, v in c.locality.items()}
        return {"prefix": (jnp.asarray(emb)[None], jnp.asarray(msk, jnp.int32)[None]),
                "rel": rel, "gens": gens, "locs": locs}

    def _prefixed_loss(self, dparams, prefix, qb, kl_ref=None):
        vcfg = self.vllm.cfg
        pe, pm = prefix
        full = jnp.concatenate([pe.astype(qb.embeds.dtype), qb.embeds], 1)
        kv = jnp.concatenate([pm, qb.kv_valid], 1)
        h = dec.decoder_forward(dparams, vcfg.decoder, full, kv)
        logits = dec.decoder_logits(dparams, vcfg.decoder, h)[:, pe.shape[1]:]
        m = qb.label_masks.astype(jnp.float32)
        if kl_ref is None:
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, qb.label_ids[..., None], -1)[..., 0]
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)
        lp1 = jax.nn.log_softmax(kl_ref, -1)
        lp2 = jax.nn.log_softmax(logits, -1)
        kl = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)
        return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)

    def train_step(self, batch):
        dparams, self._opt_state, loss, logs = self._train_step_jit(
            self.vllm.params["decoder"], self._opt_state,
            self._frozen_decoder, batch["prefix"], batch["rel"],
            batch["gens"], batch["locs"])
        self.vllm.params = dict(self.vllm.params, decoder=dparams)
        return float(loss), {k: float(v) for k, v in logs.items()}

    @instance_jit()
    def _train_step_jit(self, dparams, opt_state, frozen, prefix, rel,
                        gens, locs):
        """One fused fwd+bwd+update program (every other trainable editor
        jits its step; eager per-op dispatch is pathological on the
        remote-compile runtime). All multi-GB trees are ARGUMENTS."""
        tc = self.cfg.train_config
        vcfg = self.vllm.cfg

        def loss_fn(dparams):
            total = 0.0
            logs = {}
            rel_l = self._prefixed_loss(dparams, prefix, rel)
            logs["rel_loss"] = rel_l
            total += rel_l * tc.relia_lambda
            g = jnp.float32(0.0)        # cases may carry no generality /
            kl1 = kl2 = jnp.float32(0.0)  # locality keys at all
            for k, qb in gens.items():
                g = self._prefixed_loss(dparams, prefix, qb)
                total += g * tc.gen_lambda
                logs["gen_loss:" + k] = g
            logs["gen_loss_last"] = g
            for k, qb in locs.items():
                pre = jax.lax.stop_gradient(dec.decoder_logits(
                    frozen, vcfg.decoder,
                    dec.decoder_forward(frozen, vcfg.decoder,
                                        qb.embeds, qb.kv_valid)))
                # unprefixed KL
                h = dec.decoder_forward(dparams, vcfg.decoder, qb.embeds,
                                        qb.kv_valid)
                logits1 = dec.decoder_logits(dparams, vcfg.decoder, h)
                m = qb.label_masks.astype(jnp.float32)
                lp1 = jax.nn.log_softmax(pre, -1)
                lp2 = jax.nn.log_softmax(logits1, -1)
                kl1 = ((jnp.exp(lp1) * (lp1 - lp2)).sum(-1) * m).sum() \
                    / jnp.maximum(m.sum(), 1.0)
                kl2 = self._prefixed_loss(dparams, prefix, qb, kl_ref=pre)
                total += (kl1 + kl2) / 2 * tc.loc_lambda
                logs["loc_loss:" + k] = (kl1 + kl2) / 2
            logs["loc_loss_last"] = (kl1 + kl2) / 2
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(dparams)
        updates, opt_state = self._opt.update(grads, opt_state, dparams)
        return optax.apply_updates(dparams, updates), opt_state, loss, logs

    def train_init_editor(self, seed: int):
        # The trainable state IS the decoder; keep the pristine copy for
        # locality references and restoration.
        self._frozen_decoder = self.vllm.params["decoder"]
        self._opt = optax.adam(self.cfg.train_config.lr)
        self._opt_state = self._opt.init(self.vllm.params["decoder"])

    def get_train_state(self):
        return {"decoder": self.vllm.params["decoder"],
                "opt_state": self._opt_state}

    def reseed_host(self, seed: int):
        pass  # no host RNG streams (resume path)

    def set_train_state(self, state):
        self.vllm.params = dict(self.vllm.params, decoder=state["decoder"])
        self._opt_state = state["opt_state"]
