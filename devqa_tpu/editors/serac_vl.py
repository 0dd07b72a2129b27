"""SERAC_VL: scope classifier + counterfactual model editor.

Rebuild of ``editor/vllm_editors/serac_vl/``:

- **Classifier** (modules.py:30-58): project LLM input embeddings through
  a ResBlock + LN/32, run a BERT encoder over the (last ≤512) projected
  embeddings, pool mean|max|min of the last hidden state → similarity
  rep; similarity = dot / √dim.
- **Counterfactual model** (modules.py:60-82): a small causal LM run over
  proj_in([edit_embeds ; query_embeds]); its last hidden states map back
  through proj_out and are decoded by the frozen LLM's final-norm +
  lm_head (serac_vl.py:47-51).
- **Edit** (serac_vl.py:99-106): store the request's full (prompt+target)
  input embeddings and its classifier rep in the pools.
- **Inference** (serac_vl.py:61-83): classify the query span; when the
  best pool similarity ≥ 10, answer with the counterfactual model
  conditioned on that edit's embeddings; else the frozen backbone.

TPU redesign: fixed-capacity pools (padded edit embeddings + lengths);
inference computes base and counterfactual logits for the whole probe
batch and selects per row by threshold — jit-stable, and the
counterfactual model is ~30× smaller than the backbone so the extra
forward is cheap.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import bert as bert_mod
from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..ops.layers import layer_norm, linear
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor, instance_jit


@dataclasses.dataclass(frozen=True)
class SERACvlConfig(BaseConfig):
    @dataclasses.dataclass(frozen=True)
    class TrainConfig(BaseConfig):
        lr: float = 1e-4
        relia_lambda: float = 1.0
        gen_lambda: float = 1.0
        loc_lambda: float = 1.0

    edit_model_name: str = ""
    classifier_rep_dim: int = 768
    counterfact_model_rep_dim: int = 768
    llm_hidden_size: int = 2560
    sim_threshold: float = 10.0  # serac_vl.py:72 hard-coded `>= 10`
    max_edits: int = 256
    max_edit_len: int = 64       # padded stored-edit length
    classifier: bert_mod.BertConfig = dataclasses.field(
        default_factory=lambda: bert_mod.BertConfig(
            vocab_size=2, d_model=768, n_layers=12, n_heads=12, d_ffn=3072))
    counterfact: dec.DecoderConfig = dataclasses.field(
        default_factory=lambda: dec.DecoderConfig(
            arch="opt", vocab_size=2, d_model=768, n_layers=12, n_heads=12,
            d_ffn=3072, max_positions=2048))
    train_config: "SERACvlConfig.TrainConfig" = dataclasses.field(
        default_factory=lambda: SERACvlConfig.TrainConfig())


def _init_resblock(key, in_dim, out_dim):
    ks = jax.random.split(key, 3)

    def dense(k, i, o):
        bound = 1.0 / i ** 0.5
        return {"w": jax.random.uniform(k, (i, o), jnp.float32, -bound, bound),
                "b": jnp.zeros((o,))}

    return {
        "ln": {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))},
        "l_in": dense(ks[0], in_dim, out_dim),
        "l_mid": dense(ks[1], out_dim, out_dim),
        "l_out": dense(ks[2], out_dim, out_dim),
    }


def _resblock(p, x):
    """modules.py:10-28: x = l_in(norm(x)); x = l_out(relu(l_mid(x))) + x."""
    x = linear(layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]),
               p["l_in"]["w"], p["l_in"]["b"])
    return linear(jax.nn.relu(linear(x, p["l_mid"]["w"], p["l_mid"]["b"])),
                  p["l_out"]["w"], p["l_out"]["b"]) + x


def init_serac_params(cfg: SERACvlConfig, key):
    ks = jax.random.split(key, 6)
    return {
        "classifier": {
            "bert": bert_mod.init_bert_params(cfg.classifier, ks[0]),
            "proj": _init_resblock(ks[1], cfg.llm_hidden_size,
                                   cfg.classifier_rep_dim),
            "ln": {"scale": jnp.ones((cfg.classifier_rep_dim,)),
                   "bias": jnp.zeros((cfg.classifier_rep_dim,))},
        },
        "counterfact": {
            "lm": dec.init_decoder_params(cfg.counterfact, ks[2]),
            "proj_in": _init_resblock(ks[3], cfg.llm_hidden_size,
                                      cfg.counterfact_model_rep_dim),
            "proj_out": _init_resblock(ks[4], cfg.counterfact_model_rep_dim,
                                       cfg.llm_hidden_size),
        },
    }


def _compact_valid(embeds, mask):
    """Stable-sort valid tokens to a dense prefix. The reference feeds
    the classifier UNPADDED batch-1 rows (modules.py:44-47); this build's
    layout keeps masked vision-slot holes (text-only rows) and query-span
    masks mid-sequence, and BERT adds ABSOLUTE position embeddings — a
    hole must not shift the real tokens' positions."""
    order = jnp.argsort((mask <= 0).astype(jnp.int32), axis=1, stable=True)
    e = jnp.take_along_axis(embeds, order[..., None], axis=1)
    m = jnp.take_along_axis(mask, order, axis=1)
    return e * (m > 0)[..., None], m


def classifier_reps(params, cfg: SERACvlConfig, embeds, mask):
    """``get_sim_reps`` (modules.py:41-50), batched: [B, L, D] → [B, 3d]."""
    p = params["classifier"]
    embeds, mask = _compact_valid(embeds, mask)
    # The reference truncates to the LAST 512 embeddings of an UNPADDED
    # batch-1 row (modules.py:44-47) — i.e. all tokens whenever the row
    # is ≤512 long. This build right-pads (valid tokens first), so the
    # faithful window is the FIRST 512 positions; [-512:] here would
    # feed the classifier trailing padding and drop the real head.
    x = _resblock(p["proj"], embeds[:, :512])
    x = layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]) / 32.0
    m = mask[:, :512]
    h = bert_mod.bert_encode(p["bert"], cfg.classifier, inputs_embeds=x,
                             attention_mask=m)
    mf = m[..., None].astype(h.dtype)
    mean = (h * mf).sum(1) / jnp.maximum(mf.sum(1), 1e-9)
    big = jnp.where(mf > 0, h, -jnp.inf).max(1)
    small = jnp.where(mf > 0, h, jnp.inf).min(1)
    return jnp.concatenate([mean, big, small], axis=-1)


def sim_matrix(rep1, rep2):
    """modules.py:52-58: dot / sqrt(dim)."""
    return jnp.einsum("bd,td->bt", rep1, rep2) / (rep2.shape[1] ** 0.5)


def counterfact_logits(params, cfg: SERACvlConfig, vllm_params, vcfg,
                       edit_embeds, edit_mask, query_embeds, query_mask):
    """``forward_with_request_embd`` (modules.py:71-82), batched: run the
    small LM over proj_in([edit ; query]) and decode the query part with
    the frozen LLM head. Returns [B, Lq, V]."""
    p = params["counterfact"]
    inpt = jnp.concatenate([edit_embeds, query_embeds], axis=1)
    x = _resblock(p["proj_in"], inpt)
    kv = jnp.concatenate([edit_mask, query_mask], axis=1).astype(jnp.int32)
    h = dec.decoder_forward(p["lm"], cfg.counterfact, x, kv)
    # HF's hidden_states[-1] is post-final-norm (OPTDecoder.forward norms
    # BEFORE appending the last entry) — the reference reads exactly that
    # (modules.py:78-80), so the small LM's own final norm applies here.
    h = layer_norm(h, p["lm"]["final_norm"]["scale"],
                   p["lm"]["final_norm"]["bias"], cfg.counterfact.norm_eps)
    h = _resblock(p["proj_out"], h)[:, edit_embeds.shape[1]:]
    # frozen LLM final-norm + head (reps_to_word_predict, serac_vl.py:49-50)
    return dec.decoder_logits(vllm_params["decoder"], vcfg.decoder, h)


class SERACvl(VLLMEditor):
    def __init__(self, vllm: JaxVLLM, config: SERACvlConfig, params=None,
                 seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        self.params = params if params is not None else init_serac_params(
            config, jax.random.PRNGKey(seed))
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "serac_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return False

    def restore_to_original_model(self):
        cfg = self.cfg
        d = cfg.llm_hidden_size
        self.state = {
            "sim_reps": jnp.zeros((cfg.max_edits, 3 * cfg.classifier.d_model)),
            "edit_embeds": jnp.zeros((cfg.max_edits, cfg.max_edit_len, d)),
            "edit_mask": jnp.zeros((cfg.max_edits, cfg.max_edit_len), jnp.int32),
            "count": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------

    @instance_jit()
    def _edit_jit(self, sparams, state, embeds, kv_valid):
        cfg = self.cfg
        reps = classifier_reps(sparams, cfg, embeds, kv_valid)
        L = embeds.shape[1]
        E = cfg.max_edit_len
        if L >= E:
            # Overlong edits keep the window ENDING at the last valid
            # position (prompt tail + target) — a head window would chop
            # off the target tokens, leaving the counterfactual model
            # conditioned on a fact with no answer. The end index must be
            # last-valid+1, NOT sum(valid): no-image rows have an invalid
            # vision-slot hole mid-sequence, so the valid count
            # underestimates where the tail actually sits (hole positions
            # inside the window stay masked out by em below).
            pos = jnp.arange(L)[None, :]
            v = jnp.max(jnp.where(kv_valid > 0, pos, -1), axis=1) + 1  # [B]
            start = jnp.maximum(v - E, 0)
            idx = start[:, None] + jnp.arange(E)[None, :]
            idxc = jnp.minimum(idx, L - 1)
            ee = jnp.take_along_axis(embeds, idxc[..., None], axis=1)
            em = jnp.take_along_axis(kv_valid, idxc, axis=1) * (idx < L)
        else:
            ee = jnp.pad(embeds, ((0, 0), (0, E - L), (0, 0)))
            em = jnp.pad(kv_valid, ((0, 0), (0, E - L)))
        i = state["count"] % cfg.max_edits  # ring: overwrite oldest
        return {
            "sim_reps": state["sim_reps"].at[i].set(reps[0]),
            "edit_embeds": state["edit_embeds"].at[i].set(ee[0]),
            "edit_mask": state["edit_mask"].at[i].set(em[0].astype(jnp.int32)),
            "count": state["count"] + 1,
        }

    def edit_one_piece(self, request: EditRequest):
        qb = self.vllm.encode_queries(
            [request["prompt"]], [request.get("image")], [request["target_new"]])
        self.state = self._edit_jit(self.params, self.state, qb.embeds,
                                    qb.kv_valid)

    # ------------------------------------------------------------------

    @instance_jit()
    def _logits_jit(self, sparams, state, vparams, embeds, kv_valid,
                    query_ends):
        cfg = self.cfg
        vcfg = self.vllm.cfg
        L = embeds.shape[1]
        idx = jnp.arange(L)[None, :]
        qmask = (idx < query_ends[:, None]) * kv_valid
        reps = classifier_reps(sparams, cfg, embeds * (qmask > 0)[..., None],
                               qmask)
        sim = sim_matrix(reps, state["sim_reps"])  # [B, M]
        active = jnp.arange(cfg.max_edits) < state["count"]
        sim = jnp.where(active[None, :], sim, -jnp.inf)
        best = jnp.argmax(sim, axis=1)
        best_sim = jnp.max(sim, axis=1)
        use_cf = best_sim >= cfg.sim_threshold  # serac_vl.py:72

        base = dec.decoder_logits(
            vparams["decoder"], vcfg.decoder,
            dec.decoder_forward(vparams["decoder"], vcfg.decoder, embeds,
                                kv_valid))
        cf = counterfact_logits(
            sparams, cfg, vparams, vcfg,
            state["edit_embeds"][best], state["edit_mask"][best],
            embeds, kv_valid)
        return jnp.where(use_cf[:, None, None], cf, base)

    def query_logits(self, qb: QueryBatch):
        if int(self.state["count"]) == 0:
            return self.vllm.logits(qb.embeds, qb.kv_valid)
        qe = jnp.asarray(self.vllm.query_end_positions(qb))
        return self._logits_jit(self.params, self.state, self.vllm.params,
                                qb.embeds, qb.kv_valid, qe)


class SERACvlTrainable(SERACvl):
    """SERAC training (serac_vl.py:154-217): counterfactual edit losses on
    rel/gen, KL-to-base on loc, plus classifier contrastive losses (match
    own edit; locality below the fixed threshold column)."""

    def __init__(self, vllm, config, params=None, seed: int = 0):
        super().__init__(vllm, config, params=params, seed=seed)
        self.train_init_editor(seed)
        if params is not None:
            self.params = params

    def organize_batch_data(self, cases):
        rng = self._rng_data
        gen_keys = list(cases[0].generality.keys())
        loc_keys = list(cases[0].locality.keys())
        prompts, images, targets = [], [], []
        qonly_prompts, qonly_images = [], []

        def add(p, i, t):
            prompts.append(p); images.append(i); targets.append(t)
            qonly_prompts.append(p); qonly_images.append(i)

        for c in cases:
            r = c.requests[int(rng.integers(0, len(c.requests)))]
            add(r["prompt"], r["image"], r["target_new"])
        for g in gen_keys:
            for c in cases:
                e = c.generality[g][0]
                add(e["prompt"], e["image"], e["target"])
        for l in loc_keys:
            for c in cases:
                e = c.locality[l][0]
                add(e["prompt"], e["image"], e["target"])
        qb = self.vllm.encode_queries(prompts, images, targets)
        return {
            "embeds": qb.embeds, "kv_valid": qb.kv_valid,
            "label_ids": qb.label_ids, "label_masks": qb.label_masks,
            "query_ends": jnp.asarray(self.vllm.query_end_positions(qb)),
            "B": len(cases), "G": len(gen_keys), "K": len(loc_keys),
        }

    @instance_jit(static_argnums=(4, 5, 6))
    def _train_step_jit(self, sparams, opt_state, vparams, batch, B, G, K):
        # vparams is an ARGUMENT — closing over the multi-GB backbone
        # bakes it into the program as constants (CLAUDE.md rule).
        cfg = self.cfg
        vcfg = self.vllm.cfg
        tc = cfg.train_config
        eps = 1e-8
        E = cfg.max_edit_len

        embeds, kv = batch["embeds"], batch["kv_valid"]
        qe = batch["query_ends"]
        L = embeds.shape[1]
        idx = jnp.arange(L)[None, :]
        qmask = (idx < qe[:, None]) * kv
        rel = jnp.arange(B)

        def pad_e(x, m):
            if L >= E:
                return x[:, :E], m[:, :E]
            return (jnp.pad(x, ((0, 0), (0, E - L), (0, 0))),
                    jnp.pad(m, ((0, 0), (0, E - L))))

        ee, em = pad_e(embeds[rel], kv[rel])  # stored edits = rel requests

        def loss_fn(sp):
            logs = {}
            total = 0.0
            edit_reps = classifier_reps(sp, cfg, embeds[rel], kv[rel])

            def group_loss(rows, lam, is_loc):
                r_embeds = embeds[rows]
                logits = counterfact_logits(sp, cfg, vparams, vcfg, ee, em,
                                            r_embeds, kv[rows])
                if is_loc:
                    pre = jax.lax.stop_gradient(dec.decoder_logits(
                        vparams["decoder"], vcfg.decoder,
                        dec.decoder_forward(vparams["decoder"], vcfg.decoder,
                                            r_embeds, kv[rows])))
                    lp1 = jax.nn.log_softmax(logits, -1)
                    lp2 = jax.nn.log_softmax(pre, -1)
                    kl = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)
                    m = batch["label_masks"][rows].astype(jnp.float32)
                    edit_l = ((kl * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)).mean()
                else:
                    logp = jax.nn.log_softmax(logits, -1)
                    picked = jnp.take_along_axis(
                        logp, batch["label_ids"][rows][..., None], -1)[..., 0]
                    m = batch["label_masks"][rows].astype(jnp.float32)
                    edit_l = (-(picked * m).sum(-1)
                              / jnp.maximum(m.sum(-1), 1.0)).mean()
                # classifier loss: query-span reps vs edit reps
                q_reps = classifier_reps(
                    sp, cfg, embeds[rows] * (qmask[rows] > 0)[..., None],
                    qmask[rows])
                sim = sim_matrix(q_reps, edit_reps)
                if is_loc:
                    simx = jnp.concatenate(
                        [sim, jnp.full((B, 1), cfg.sim_threshold)], 1)
                    cls_l = -jnp.log(jax.nn.softmax(simx, 1) + eps)[:, -1].mean()
                else:
                    cls_l = -jnp.log(jnp.diag(jax.nn.softmax(sim, 1)) + eps).mean()
                return edit_l * lam, cls_l

            el, cl = group_loss(rel, tc.relia_lambda, False)
            logs["rel_edit_loss"], logs["rel_cls_loss"] = el, cl
            total += el + cl
            for gi in range(G):
                rows = B * (1 + gi) + jnp.arange(B)
                el, cl = group_loss(rows, tc.gen_lambda, False)
                total += el + cl
            logs["gen_loss_last"] = el
            for ki in range(K):
                rows = B * (1 + G + ki) + jnp.arange(B)
                el, cl = group_loss(rows, tc.loc_lambda, True)
                total += el + cl
            logs["loc_loss_last"] = el
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(sparams)
        updates, opt_state = self._opt.update(grads, opt_state, sparams)
        sparams = optax.apply_updates(sparams, updates)
        return sparams, opt_state, loss, logs

    def train_step(self, batch):
        B, G, K = batch["B"], batch["G"], batch["K"]
        arrays = {k: v for k, v in batch.items() if k not in ("B", "G", "K")}
        self.params, self._opt_state, loss, logs = self._train_step_jit(
            self.params, self._opt_state, self.vllm.params, arrays, B, G, K)
        return float(loss), {k: float(v) for k, v in logs.items()}

    def train_init_editor(self, seed: int):
        self.params = init_serac_params(self.cfg, jax.random.PRNGKey(seed))
        self._rng_data = np.random.default_rng(seed)
        self._opt = optax.adam(self.cfg.train_config.lr)
        self._opt_state = self._opt.init(self.params)

    def get_train_state(self):
        return {"params": self.params, "opt_state": self._opt_state}

    def reseed_host(self, seed: int):
        # resume path (train/loop.py load_ckpt): host RNG only
        self._rng_data = np.random.default_rng(seed)

    def set_train_state(self, state):
        self.params = state["params"]
        self._opt_state = state["opt_state"]
