"""RECIPE_VL — retrieval-prompt editor.

Rebuild of ``editor/vllm_editors/recipe_vl/``:

- **KnowledgeRepModel** (models.py:14-65): a RoBERTa-class encoder whose
  pooled output (pooler | masked-mean | masked-max | masked-min, 4×768)
  feeds separate knowledge ('k') and query ('q') residual-ReLU MLPs into
  a shared representation space; learned prototype tokens run through the
  bare encoder stack (no embedding stage) to produce the retrieval
  prototype rep.
- **PromptTransformer** (models.py:87-101): knowledge rep → ``prompt_token_n``
  soft prompt tokens in the LLM embedding space.
- **Edit** (recipe_vl.py:153-165): encode "<prompt> <target>" as a
  knowledge rep, generate its prompt tokens, append both to the pools
  (slot 0 is the prototype).
- **Inference** (recipe_vl.py:80-129): encode the query text, retrieve
  top-k reps whose similarity beats the prototype's, prepend the
  concatenated prompt tokens, and **drop the image entirely** — the
  reference calls ``get_llm_input_embeds(texts, None)`` at :94, so RECIPE
  answers every probe text-only. Reproduced faithfully.

TPU redesign: fixed-capacity pools; the prepended prompt block is a
masked fixed-size slot (retr_top_k × prompt_token_n positions), so probe
batches stay one fused forward.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import bert as bert_mod
from ..core import decoder as dec
from ..core.wrapper import JaxVLLM, QueryBatch
from ..ops.layers import linear
from ..utils.config import BaseConfig
from .base import EditRequest, VLLMEditor, instance_jit

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class RECIPEvlConfig(BaseConfig):
    @dataclasses.dataclass(frozen=True)
    class TrainConfig(BaseConfig):
        krm_lr: float = 1e-5
        pt_lr: float = 1e-5
        relia_lambda: float = 1.0
        gen_lambda: float = 1.0
        loc_lambda: float = 1.0
        contra_lambda: float = 1.0
        query_knowledge_t: float = 1.0
        query_prototype_t: float = 1.0
        constra_hinge_scale: float = 1.2
        # Parsed but never read by the reference's training
        # (recipe_vl.py:29 declares it; only constra_hinge_scale is used,
        # recipe_vl.py:181) — kept for config-surface parity.
        edit_hinge_scale: float = 1.2
        eps: float = 1e-8

    @dataclasses.dataclass(frozen=True)
    class KRMConfig(BaseConfig):
        krm_base_dim: int = 768
        prompt_token_n: int = 3
        knowledge_rep_dim: int = 4096
        knowl_rep_prot_token_n: int = 10

    edit_model_name: str = ""
    model_hidden_size: int = 2560
    retr_top_k: int = 1
    max_edits: int = 256
    krm: "RECIPEvlConfig.KRMConfig" = dataclasses.field(
        default_factory=lambda: RECIPEvlConfig.KRMConfig())
    encoder: bert_mod.BertConfig = dataclasses.field(
        default_factory=lambda: bert_mod.BertConfig(
            vocab_size=50265, d_model=768, n_layers=12, n_heads=12, d_ffn=3072))
    train: "RECIPEvlConfig.TrainConfig" = dataclasses.field(
        default_factory=lambda: RECIPEvlConfig.TrainConfig())


def _dense_init(key, i, o):
    bound = 1.0 / i ** 0.5
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (i, o), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (o,), jnp.float32, -bound, bound)}


def init_recipe_params(cfg: RECIPEvlConfig, key):
    ks = jax.random.split(key, 10)
    kd = cfg.krm.krm_base_dim
    rd = cfg.krm.knowledge_rep_dim
    return {
        "encoder": bert_mod.init_bert_params(cfg.encoder, ks[0]),
        "pooler": _dense_init(ks[1], kd, kd),
        "knowl_mlp1": _dense_init(ks[2], 4 * kd, rd),
        "knowl_mlp2": _dense_init(ks[3], rd, rd),
        "query_mlp1": _dense_init(ks[4], 4 * kd, rd),
        "query_mlp2": _dense_init(ks[5], rd, rd),
        "prot_tokens": (jax.random.uniform(
            ks[6], (1, cfg.krm.knowl_rep_prot_token_n, kd)) - 0.5) * 0.1,
        "prompt_l1": _dense_init(ks[7], rd, rd),
        "prompt_l2": _dense_init(ks[8], rd,
                                 cfg.model_hidden_size * cfg.krm.prompt_token_n),
    }


def krm_reps_from_hidden(params, cfg, hidden, mask, kind: str):
    """compute_reps (models.py:42-57): pooler|mean|max|min → k/q MLP."""
    po = jnp.tanh(linear(hidden[:, 0], params["pooler"]["w"],
                         params["pooler"]["b"]))
    mf = mask[..., None].astype(hidden.dtype)
    mean = (hidden * mf).sum(1) / jnp.maximum(mf.sum(1), 1e-9)
    mx = (hidden + (mf - 1) * 999999.0).max(1)
    mn = (hidden + (1 - mf) * 999999.0).min(1)
    x = jnp.concatenate([po, mean, mx, mn], axis=1)
    m1, m2 = (("knowl_mlp1", "knowl_mlp2") if kind == "k"
              else ("query_mlp1", "query_mlp2"))
    x = linear(x, params[m1]["w"], params[m1]["b"])
    return jax.nn.relu(linear(x, params[m2]["w"], params[m2]["b"])) + x


def krm_encode_texts(params, cfg: RECIPEvlConfig, input_ids, mask, kind: str):
    h = bert_mod.bert_encode(params["encoder"], cfg.encoder,
                             input_ids=input_ids, attention_mask=mask)
    return krm_reps_from_hidden(params, cfg, h, mask, kind)


def krm_prototype(params, cfg: RECIPEvlConfig):
    """get_knowl_rep_prot (models.py:60-65): encoder stack on the learned
    prototype tokens, no embedding stage."""
    h = bert_mod.bert_encode(params["encoder"], cfg.encoder,
                             inputs_embeds=params["prot_tokens"],
                             skip_embeddings=True)
    mask = jnp.ones(params["prot_tokens"].shape[:2], jnp.int32)
    return krm_reps_from_hidden(params, cfg, h, mask, "k")


def prompt_tokens(params, cfg: RECIPEvlConfig, knowl_reps):
    """PromptTransformer (models.py:95-101)."""
    x = jax.nn.relu(linear(knowl_reps, params["prompt_l1"]["w"],
                           params["prompt_l1"]["b"])) + knowl_reps
    x = linear(x, params["prompt_l2"]["w"], params["prompt_l2"]["b"])
    return x.reshape(knowl_reps.shape[0], cfg.krm.prompt_token_n,
                     cfg.model_hidden_size)


class RECIPEvl(VLLMEditor):
    """``text_tokenizer``: tokenizer for the knowledge-rep encoder
    (RoBERTa's in production; the toy tokenizer in tests)."""

    # The reference snaps pre-edit locality predictions through the
    # editor-wrapped forward (vllm_editor_eval.py:106-112), and RECIPE's
    # wrapper drops images even with an empty pool (recipe_vl.py:94) —
    # so the harness must route the pre-edit pass through this editor.
    pre_edit_locality_via_editor = True

    def __init__(self, vllm: JaxVLLM, config: RECIPEvlConfig, text_tokenizer,
                 params=None, seed: int = 0):
        super().__init__(vllm)
        self.cfg = config
        self.text_tokenizer = text_tokenizer
        self.params = params if params is not None else init_recipe_params(
            config, jax.random.PRNGKey(seed))
        self.restore_to_original_model()

    def name_of_editor_and_model(self) -> Tuple[str, str]:
        return "recipe_vl", self.cfg.edit_model_name or self.vllm.cfg.name

    def if_can_batch_edit(self):
        return True

    def restore_to_original_model(self):
        cfg = self.cfg
        # slot 0 = prototype (request_pool[0], recipe_vl.py:141-144)
        self.state = {
            "knowl_reps": jnp.zeros((cfg.max_edits, cfg.krm.knowledge_rep_dim)),
            "prompts": jnp.zeros((cfg.max_edits, cfg.krm.prompt_token_n,
                                  cfg.model_hidden_size)),
            "count": jnp.ones((), jnp.int32),  # prototype occupies slot 0
        }
        proto = krm_prototype(self.params, cfg)
        self.state["knowl_reps"] = self.state["knowl_reps"].at[0].set(proto[0])
        self._last_prompts: List[str] = []

    # ------------------------------------------------------------------

    def _krm_tok(self, texts: Sequence[str]):
        """Tokenize for the knowledge-rep model, padded to a 32-bucket so
        the encoder's compiled-shape set stays O(1) on the probe-batch
        hot path (exact-max padding makes the shape a function of each
        batch's longest prompt — CLAUDE.md shape-stability rule)."""
        ids_list = [self.text_tokenizer.encode(t)[:512] for t in texts]
        L = max(32, -(-max(len(x) for x in ids_list) // 32) * 32)
        ids = np.full((len(texts), L), self.text_tokenizer.pad_token_id,
                      np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        for i, x in enumerate(ids_list):
            ids[i, :len(x)] = x
            mask[i, :len(x)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def _encode_krm(self, texts: Sequence[str], kind: str):
        ids, mask = self._krm_tok(texts)
        return self._krm_encode_jit(self.params, ids, mask, kind)

    @instance_jit(static_argnums=(3,))
    def _krm_encode_jit(self, rparams, ids, mask, kind):
        return krm_encode_texts(rparams, self.cfg, ids, mask, kind)

    def edit_one_piece(self, request: EditRequest):
        p, t = request["prompt"], request["target_new"]
        text = p + (" " if p[-1] != " " and t[0] != " " else "") + t
        reps = self._encode_krm([text], "k")
        pt = prompt_tokens(self.params, self.cfg, reps)
        cap = int(self.state["knowl_reps"].shape[0])
        # ring over slots 1..cap-1 (the prototype owns slot 0); an
        # out-of-bounds .at[].set would silently drop the edit
        i = 1 + (int(self.state["count"]) - 1) % (cap - 1)
        self.state = {
            "knowl_reps": self.state["knowl_reps"].at[i].set(reps[0]),
            "prompts": self.state["prompts"].at[i].set(pt[0]),
            "count": self.state["count"] + 1,
        }

    def edit_batch(self, requests: List[EditRequest], pad_width=None):
        # pad_width irrelevant: edits apply one piece at a time, so the
        # compiled width is always 1 (base.edit_batch).
        for r in requests:
            self.edit_one_piece(r)

    # ------------------------------------------------------------------

    @instance_jit()
    def _logits_jit(self, rparams, state, vparams, embeds, kv_valid,
                    query_reps):
        """Retrieve + prepend prompt block + text-only forward."""
        cfg = self.cfg
        vcfg = self.vllm.cfg
        rd = cfg.krm.knowledge_rep_dim
        K = cfg.retr_top_k
        P = cfg.krm.prompt_token_n

        sim = jnp.einsum("bd,md->bm", query_reps, state["knowl_reps"]) / rd ** 0.5
        active = jnp.arange(cfg.max_edits) < state["count"]
        simm = jnp.where(active[None, :], sim, NEG_INF)
        prot_sim = simm[:, :1]
        # top-k over edits (slot 0 prototype included, as the reference
        # sorts the full pool — recipe_vl.py:86-90)
        topv, topi = jax.lax.top_k(simm, K)
        use = topv > prot_sim  # [B, K]
        blocks = state["prompts"][topi]          # [B, K, P, d]
        B = embeds.shape[0]
        blocks = blocks.reshape(B, K * P, -1)
        bmask = jnp.repeat(use, P, axis=1).astype(jnp.int32)  # [B, K*P]
        full = jnp.concatenate([blocks.astype(embeds.dtype), embeds], 1)
        kv = jnp.concatenate([bmask, kv_valid], 1)
        h = dec.decoder_forward(vparams["decoder"], vcfg.decoder, full, kv)
        logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder, h)
        return logits[:, K * P:]

    def build_query_batch(self, prompts, image_paths, targets) -> QueryBatch:
        # recipe_vl.py:94: inference drops images (texts, None).
        qb = self.vllm.encode_queries(prompts, [None] * len(prompts), targets)
        # Carry the KRM query texts WITH the batch (see lte_vl.py):
        # retrieval must key on THIS batch, not call order. The reference
        # harness reaches the wrapped get_llm_input_embeds through
        # prompts_imgs_target_to_xym, whose `texts` are the JOINED
        # prompt+target strings (base.py:89-96) — so eval-time KRM query
        # reps see the target text too, and parity requires the same.
        qb.krm_texts = [
            p + (" " + t if p[-1] not in " \n" and t[0] not in " \n" else t)
            for p, t in zip(prompts, targets)]
        self._last_prompts = qb.krm_texts
        return qb

    def query_logits(self, qb: QueryBatch):
        texts = getattr(qb, "krm_texts", None) or self._last_prompts
        reps = self._encode_krm(texts, "q")
        return self._logits_jit(self.params, self.state, self.vllm.params,
                                qb.embeds, qb.kv_valid, reps)


class RECIPEvlTrainable(RECIPEvl):
    """RECIPE meta-training (recipe_vl.py:169-259): q1/q2/q3 contrastive
    retrieval losses + prompted rel/gen CE + prompted loc KL."""

    def __init__(self, vllm, config, text_tokenizer, params=None, seed=0):
        super().__init__(vllm, config, text_tokenizer, params=params, seed=seed)
        self.train_init_editor(seed)
        if params is not None:
            self.params = params

    def organize_batch_data(self, cases):
        rng = self._rng_data

        def add_space(p, a):
            return "%s %s" % (p, a) if p[-1] != " " and a[0] != " " else p + a

        knowl, q1, q2, loc_q = [], [], [], []
        rel_list, gen_list, loc_list = [], [], []
        gen_keys = list(cases[0].generality.keys())
        loc_keys = list(cases[0].locality.keys())
        for c in cases:
            r = c.requests[0]
            knowl.append(add_space(r["prompt"], r["target_new"]))
            # q1/q2: the edit prompt or a rephrase (recipe_vl.py random_select_rg)
            for dest in (q1, q2):
                if rng.integers(0, 2) == 0:
                    dest.append(r["prompt"])
                else:
                    g = c.generality[gen_keys[int(rng.integers(0, len(gen_keys)))]][0]
                    dest.append(g["prompt"])
            l = c.locality[loc_keys[int(rng.integers(0, len(loc_keys)))]][0]
            loc_q.append(l["prompt"])
            rel_list.append((r["prompt"], r["image"], r["target_new"]))
            g = c.generality[gen_keys[int(rng.integers(0, len(gen_keys)))]][0]
            gen_list.append((g["prompt"], g["image"], g["target"]))
            loc_list.append((l["prompt"], l["image"], l["target"]))

        def enc(lst):
            return self.vllm.encode_queries([x[0] for x in lst],
                                            [x[1] for x in lst],
                                            [x[2] for x in lst])

        tok = self._krm_tok

        return {
            "knowl_tok": tok(knowl), "q1_tok": tok(q1), "q2_tok": tok(q2),
            "q3_tok": tok(loc_q),
            "rel": enc(rel_list), "gen": enc(gen_list), "loc": enc(loc_list),
            "B": len(cases),
        }

    @instance_jit(static_argnums=(3,))
    def _train_step_jit(self, carry, vparams, batch, B):
        # vparams is an ARGUMENT — closing over the multi-GB backbone
        # bakes it into the program as constants (CLAUDE.md rule).
        rparams, opt_state = carry
        cfg = self.cfg
        vcfg = self.vllm.cfg
        tc = cfg.train
        rd = cfg.krm.knowledge_rep_dim
        scale = 1.0 / rd ** 0.5
        eps = tc.eps
        P = cfg.krm.prompt_token_n

        def prompted_loss(rp, prompts_b, qb, kl_ref=None):
            full = jnp.concatenate([prompts_b.astype(qb.embeds.dtype),
                                    qb.embeds], 1)
            kv = jnp.concatenate(
                [jnp.ones((B, P), jnp.int32), qb.kv_valid], 1)
            h = dec.decoder_forward(vparams["decoder"], vcfg.decoder, full, kv)
            logits = dec.decoder_logits(vparams["decoder"], vcfg.decoder,
                                        h)[:, P:]
            m = qb.label_masks.astype(jnp.float32)
            if kl_ref is None:
                logp = jax.nn.log_softmax(logits, -1)
                picked = jnp.take_along_axis(
                    logp, qb.label_ids[..., None], -1)[..., 0]
                per = -(picked * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
            else:
                lp1 = jax.nn.log_softmax(logits, -1)
                lp2 = jax.nn.log_softmax(kl_ref, -1)
                kl = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)
                per = (kl * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
            return per.mean()

        def loss_fn(rp):
            logs = {}
            k_reps = krm_encode_texts(rp, cfg, *batch["knowl_tok"], "k")
            q1 = krm_encode_texts(rp, cfg, *batch["q1_tok"], "q")
            q2 = krm_encode_texts(rp, cfg, *batch["q2_tok"], "q")
            q3 = krm_encode_texts(rp, cfg, *batch["q3_tok"], "q")
            prot = krm_prototype(rp, cfg)
            kwp = jnp.concatenate([k_reps, prot], 0)  # [B+1, rd]
            chs = tc.constra_hinge_scale
            # q1: match own knowledge (recipe_vl.py:183-186)
            s1 = jax.nn.softmax(q1 @ kwp.T * scale * tc.query_knowledge_t, 1)
            l_q1 = -jnp.log(jnp.diag(s1[:, :B]) + eps).mean()
            # q2: beat prototype on own column (recipe_vl.py:187-197)
            s2 = q2 @ k_reps.T * scale
            s2 = s2 * (1 - jnp.eye(B)) + jnp.diag((q2 @ prot.T)[:, 0] * scale)
            s2 = jax.nn.softmax(s2 * tc.query_prototype_t, 1)
            second2 = jax.lax.top_k(s2, 2)[0][:, 1]
            d2 = jnp.diag(s2)
            sel2 = d2 < second2 * chs
            l_q2 = jnp.where(sel2.any(),
                             -(jnp.log(d2 + eps) * sel2).sum()
                             / jnp.maximum(sel2.sum(), 1), 0.0)
            # q3: locality queries match the prototype (recipe_vl.py:199-211)
            s3 = jax.nn.softmax(q3 @ kwp.T * scale * tc.query_prototype_t, 1)
            second3 = jax.lax.top_k(s3, 2)[0][:, 1]
            d3 = s3[:, -1]
            sel3 = d3 < second3 * chs
            l_q3 = jnp.where(sel3.any(),
                             -(jnp.log(d3 + eps) * sel3).sum()
                             / jnp.maximum(sel3.sum(), 1), 0.0)
            contra = l_q1 + l_q2 + l_q3
            logs["contra_loss"] = contra
            total = contra * tc.contra_lambda

            pb = prompt_tokens(rp, cfg, k_reps)  # [B, P, d]
            rel_l = prompted_loss(rp, pb, batch["rel"])
            logs["rel_loss"] = rel_l
            total += rel_l * tc.relia_lambda
            gen_l = prompted_loss(rp, pb, batch["gen"])
            logs["gen_loss"] = gen_l
            total += gen_l * tc.gen_lambda
            qb = batch["loc"]
            pre = jax.lax.stop_gradient(dec.decoder_logits(
                vparams["decoder"], vcfg.decoder,
                dec.decoder_forward(vparams["decoder"], vcfg.decoder,
                                    qb.embeds, qb.kv_valid)))
            loc_l = prompted_loss(rp, pb, qb, kl_ref=pre)
            logs["loc_loss"] = loc_l
            total += loc_l * tc.loc_lambda
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(rparams)
        updates, opt_state = self._opt.update(grads, opt_state, rparams)
        rparams = optax.apply_updates(rparams, updates)
        return (rparams, opt_state), loss, logs

    def train_step(self, batch):
        B = batch["B"]
        arrays = {k: v for k, v in batch.items() if k != "B"}
        (self.params, self._opt_state), loss, logs = self._train_step_jit(
            (self.params, self._opt_state), self.vllm.params, arrays, B)
        return float(loss), {k: float(v) for k, v in logs.items()}

    def train_init_editor(self, seed: int):
        self.params = init_recipe_params(self.cfg, jax.random.PRNGKey(seed))
        self._rng_data = np.random.default_rng(seed)
        tc = self.cfg.train

        def label_fn(path, _):
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            return "pt" if keys and keys[0].startswith("prompt_") else "krm"

        self._opt = optax.multi_transform(
            {"krm": optax.adam(tc.krm_lr), "pt": optax.adam(tc.pt_lr)},
            lambda params: jax.tree_util.tree_map_with_path(label_fn, params))
        self._opt_state = self._opt.init(self.params)

    def get_train_state(self):
        return {"params": self.params, "opt_state": self._opt_state}

    def reseed_host(self, seed: int):
        # resume path (train/loop.py load_ckpt): host RNG only
        self._rng_data = np.random.default_rng(seed)

    def set_train_state(self, state):
        self.params = state["params"]
        self._opt_state = state["opt_state"]
