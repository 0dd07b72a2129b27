"""Editing-quality metric suite beyond the t×i harness.

Rebuilds the remaining evaluators of the reference's evaluate package
(``easyeditor/evaluate/``): the personality editing-success score ``es``
(evaluate_utils.py:363-422), generation fluency via bigram/trigram
entropy (evaluate_utils.py:189-240), target-masked perplexity and the
OOD-PPL fraction (evaluate_utils.py:242-312), answer matching
(:314-333), the concept-editing evaluator (concept_evaluate.py:30-84,
instance-change probe evaluate_utils.py:549-610), the safety evaluator
(safety_evaluate.py:28-48, test_safety_gen evaluate_utils.py:613-645),
the personality metric orchestrators (personality_evaluate.py:29-200)
and the CKnowEdit BLEU/ROUGE submission scorer
(evaluate_cknowedit.py:91-161).

Design notes (TPU-native divergences, all documented per function):

- Metric cores are pure numpy/JAX functions over logits/labels — no
  hooks, no ``model.generate`` kwargs plumbing. Generation goes through
  :func:`devqa_tpu.utils.analysis.generate_fast` (KV-cached, one
  compiled decode shape).
- n-gram tokenization uses a self-contained regex word tokenizer: the
  reference calls ``nltk.word_tokenize``, whose punkt data cannot be
  downloaded in a zero-egress image. Entropy values agree on plain
  prose (asserted in tests against hand-computed distributions).
- The "q_mask" (answer-span mask) the reference derives by scanning for
  a ``</s>`` separator (personality_evaluate.py:63-70) is here the xym
  label mask — the same span, produced by the tokenizer layer instead
  of string surgery.
"""
from __future__ import annotations

import math
import re
from collections import Counter
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from ..utils.analysis import generate_fast

# --------------------------------------------------------------------
# n-gram entropy fluency (evaluate_utils.py:189-240)
# --------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def word_tokenize(text: str) -> List[str]:
    """Regex stand-in for nltk.word_tokenize (words + punctuation)."""
    return _WORD_RE.findall(text)


def _ngram_counts(tokens: Sequence, n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _agg(values: np.ndarray, agg: str) -> float:
    assert agg in ("arith", "geom")
    if agg == "geom":  # scipy.stats.mstats.gmean
        return float(np.exp(np.mean(np.log(np.maximum(values, 1e-12)))))
    return float(np.mean(values))


def compute_n_gram_entropy(sentence: str, ns: Sequence[int] = (2, 3),
                           weights: Sequence[float] = (2 / 3, 4 / 3),
                           agg: str = "arith") -> float:
    """Weighted bigram/trigram Shannon entropy in bits of one text
    (evaluate_utils.py:218-235, default ns/weights preserved)."""
    tokens = word_tokenize(sentence)
    entropy_list = []
    for n in ns:
        fdist = _ngram_counts(tokens, n)
        freqs = np.asarray(list(fdist.values()), dtype=np.float64)
        if freqs.size == 0:
            entropy_list.append(0.0)
            continue
        freqs = freqs / freqs.sum()
        entropy_list.append(float(np.sum(-freqs * np.log2(freqs))))
    return _agg(np.asarray(entropy_list) * np.asarray(weights), agg)


def n_gram_entropy(gen_texts: Sequence[str], agg: str = "arith") -> float:
    """Mean (or gmean) n-gram entropy over generations
    (evaluate_utils.py:211-216)."""
    return _agg(np.asarray([compute_n_gram_entropy(t) for t in gen_texts]),
                agg)


def generation_quality(model, prefixes: Sequence[str],
                       max_out_len: int = 100) -> Dict[str, float]:
    """test_generation_quality (evaluate_utils.py:189-209): greedy-extend
    each prefix and score fluency as n-gram entropy of the generations."""
    texts = generate_fast(model, list(prefixes), max_new_tokens=max_out_len)
    return {"ngram_entropy": n_gram_entropy(texts)}


# --------------------------------------------------------------------
# log-prob cores: es / es_per_icl / kl_loc (evaluate_utils.py:347-497)
# --------------------------------------------------------------------

def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def gather_log_probs(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-position log p(label) (evaluate_utils.py:347-351)."""
    lp = _log_softmax(np.asarray(logits, np.float32))
    return np.take_along_axis(lp, np.asarray(labels)[..., None], -1)[..., 0]


def masked_mean(values: np.ndarray, mask: np.ndarray) -> float:
    mask = np.asarray(mask, bool)
    return float((values * mask).sum() / max(mask.sum(), 1))


def _mask_labels(labels: np.ndarray, null_token: int = 0):
    """mask_hf_labels (evaluate_utils.py:358-361): -100 → (mask, 0)."""
    valid = labels != -100
    return valid, np.where(valid, labels, null_token)


def es(pre_logits, edit_logits, q_mask, labels, same_mask) -> float:
    """Personality editing success (evaluate_utils.py:363-382).

    ``same_mask[b]`` — whether row b's answer expresses the target
    personality; ``q_mask`` masks the answer span. z_sent separates
    target-consistent from -inconsistent answers under the edit; z_topic
    caps it by how much the edit preserved target-answer likelihood.
    """
    _, targ = _mask_labels(np.asarray(labels))
    same = np.asarray(same_mask, bool)
    q = np.asarray(q_mask, bool)
    pos_mask = same[:, None] * q
    neg_mask = (~same)[:, None] * q
    pre_lp = gather_log_probs(pre_logits, targ)
    edit_lp = gather_log_probs(edit_logits, targ)
    mean_pos_pre = masked_mean(pre_lp, pos_mask)
    mean_pos_edit = masked_mean(edit_lp, pos_mask)
    mean_neg_edit = masked_mean(edit_lp, neg_mask)
    z_sent = 1.0 / (1.0 + math.exp(-(mean_pos_edit - mean_neg_edit)))
    z_topic = min(1.0, math.exp(mean_pos_edit - mean_pos_pre))
    return z_sent * z_topic


def es_per_icl(example: Dict, pre_logits, edit_logits) -> Dict[str, float]:
    """ICL-mode es with separate pre/edit spans
    (evaluate_utils.py:384-422). ``example`` carries outer_pre/outer_edit
    dicts with 'q_mask' and 'labels', plus 'same_per_mask'."""
    pre_q = np.asarray(example["outer_pre"]["q_mask"], bool)
    edit_q = np.asarray(example["outer_edit"]["q_mask"], bool)
    _, pre_targ = _mask_labels(np.asarray(example["outer_pre"]["labels"]))
    _, edit_targ = _mask_labels(np.asarray(example["outer_edit"]["labels"]))
    same = np.asarray(example["same_per_mask"], bool)

    pre_lp = gather_log_probs(pre_logits, pre_targ)
    edit_lp = gather_log_probs(edit_logits, edit_targ)
    mean_pos_pre = masked_mean(pre_lp, same[:, None] * pre_q)
    mean_pos_edit = masked_mean(edit_lp, same[:, None] * edit_q)
    mean_neg_edit = masked_mean(edit_lp, (~same)[:, None] * edit_q)
    z_per = 1.0 / (1.0 + math.exp(-(mean_pos_edit - mean_neg_edit)))
    z_topic_raw = math.exp(mean_pos_edit - mean_pos_pre)
    z_topic = min(1.0, z_topic_raw)
    return {"acc_per": z_per * z_topic, "z_per": z_per, "z_topic": z_topic,
            "z_topic_raw": z_topic_raw, "correct_probs": mean_pos_edit,
            "wrong_probs": mean_neg_edit}


def topk_logits_agreement(pre_logits, post_logits, k: int = 10) -> float:
    """EasyEdit-side IKE/HICE locality metric: positional top-k index
    agreement (multimodal_editor.py:977-1007).

    The reference tail-aligns the two logit windows (``logits[:, -L:]``),
    takes the top-k indices of the softmax (equivalently of the logits —
    softmax is monotonic), flattens BOTH the position and rank axes and
    compares elementwise: this is rank-order agreement of the top-k
    lists, NOT set overlap (the reference uses k=1 for the NQ text
    locality and k=10 for multimodal locality).
    """
    pre = np.asarray(pre_logits, np.float32)
    post = np.asarray(post_logits, np.float32)
    L = min(pre.shape[-2], post.shape[-2])
    pre, post = pre[..., -L:, :], post[..., -L:, :]
    a = np.argsort(-pre, axis=-1, kind="stable")[..., :k]
    b = np.argsort(-post, axis=-1, kind="stable")[..., :k]
    return float((a == b).mean())


def topk_span_agreement(pre_topk, pre_mask, post_topk, post_mask,
                        k: int) -> float:
    """:func:`topk_logits_agreement` on precomputed top-k index arrays
    restricted to each row's supervised span (mask==1) — the harness
    form: prompt-space editors (IKE/HICE ICL prefixes) shift the span's
    absolute position between the pre/post batches, so spans are
    extracted per-row first and then tail-aligned like the reference's
    ``logits[:, -L:]``."""
    a = np.asarray(pre_topk)[np.asarray(pre_mask) == 1][:, :k]
    b = np.asarray(post_topk)[np.asarray(post_mask) == 1][:, :k]
    n = min(len(a), len(b))
    if n == 0:
        # Degenerate span (all-zero mask): score 0.0, consistent with
        # locality_agreement on the identical probe — a silent 1.0 would
        # inflate the aggregate.
        return 0.0
    return float((a[len(a) - n:] == b[len(b) - n:]).mean())


def kl_loc(pre_logits, post_logits, mask) -> float:
    """Masked token-KL drift KL(pre ‖ post) with the reference's
    end-alignment ``post[:, -pre_len:]`` (evaluate_utils.py:474-497) —
    robust to prompt-space editors prepending ICL prefixes."""
    pre = np.asarray(pre_logits, np.float32)
    post = np.asarray(post_logits, np.float32)
    # Tail-align BOTH sides (like topk_logits_agreement): post can be
    # longer (ICL prefixes) or shorter (layout-shrinking editors).
    L = min(pre.shape[1], post.shape[1])
    pre, post = pre[:, -L:, :], post[:, -L:, :]
    mask = np.asarray(mask, bool)[:, -L:]
    pre_ls, post_ls = _log_softmax(pre), _log_softmax(post)
    kl = (np.exp(pre_ls) * (pre_ls - post_ls)).sum(-1)
    return masked_mean(kl, mask)


# --------------------------------------------------------------------
# perplexity family (evaluate_utils.py:242-312)
# --------------------------------------------------------------------

def _row_logits(model, prompts, targets):
    import jax.numpy as jnp

    tb = model.batch(list(prompts), list(targets))
    logits = model._logits(model.params, jnp.asarray(tb.input_ids),
                           jnp.asarray(tb.attn_mask))
    return tb, np.asarray(logits)


def ppl(model, prompt: Union[str, Sequence[str]],
        target_new: Union[str, Sequence[str]]) -> float:
    """Target-masked perplexity (evaluate_utils.py:242-269): exp of the
    mean NLL over the *target* tokens only (prompt labels are masked,
    the reference's -100 fill). The xym label mask is exactly that
    span."""
    if isinstance(prompt, str):
        prompt, target_new = [prompt], [target_new]
    tb, logits = _row_logits(model, prompt, target_new)
    lp = gather_log_probs(logits, tb.label_ids)
    return float(np.exp(-masked_mean(lp, tb.label_masks > 0)))


def ood_ppl(model, prompt: Union[str, Sequence[str]],
            threshold: float = 0.8) -> float:
    """OOD_PPL (evaluate_utils.py:272-312): fraction of next-token NLLs
    below −log(threshold) over the prompt's own tokens (shift-by-one
    self-labels) — a likelihood-based out-of-domain detector."""
    if isinstance(prompt, str):
        prompt = [prompt]
    tb, logits = _row_logits(model, prompt, [""] * len(prompt))
    ids = np.asarray(tb.input_ids)
    mask = np.asarray(tb.attn_mask)
    nll = -gather_log_probs(logits[:, :-1], ids[:, 1:])
    valid = (mask[:, 1:] > 0)
    thr = -math.log(threshold)
    # Documented divergence: the reference zero-fills padded positions and
    # then counts them as "below threshold" in BOTH numerator and
    # denominator (:301-312, 0.0 < -log(0.8)) — a padding artifact. We
    # score real tokens only, in both numerator and denominator (this
    # stack always bucket-pads, so dividing by nll.size would deflate
    # the fraction by the padding ratio).
    return float(((nll < thr) & valid).sum() / max(valid.sum(), 1))


# --------------------------------------------------------------------
# generation-match probes (evaluate_utils.py:314-333, 549-610)
# --------------------------------------------------------------------

def verify_answer(model_answer: str, correct_answer) -> bool:
    """evaluate_utils.py:314-320 — every answer group must have one
    alternative contained in the generation."""
    if isinstance(correct_answer, str):
        correct_answer = [[correct_answer]]
    return all(any(alt in model_answer for alt in group)
               for group in correct_answer)


def answer_match(model, prompt: str, target_new,
                 max_new_tokens: int = 30) -> bool:
    """Greedy-generate and substring-match (evaluate_utils.py:322-333)."""
    text = generate_fast(model, [prompt], max_new_tokens=max_new_tokens)[0]
    return verify_answer(text, target_new)


_INSTANCE_DEMO = ("Whether FrancoAngeli belongs to category publisher? Yes\n"
                  "Whether And Other Stories belongs to category people? No\n")


def instance_change(model, prompt: str, P: Optional[str] = None) -> float:
    """test_instance_change (evaluate_utils.py:549-585): 2-token greedy
    answer to a demo-prefixed yes/no category probe → 1.0 (yes) /
    0.0 (no) / -1.0 (neither)."""
    full = (P or "") + _INSTANCE_DEMO + prompt
    ans = generate_fast(model, [full], max_new_tokens=2)[0].lower()
    if "yes" in ans:
        return 1.0
    if "no" in ans:
        return 0.0
    return -1.0


def concept_gen(model, prompt: str, max_new_tokens: int = 40) -> str:
    """test_concept_gen (evaluate_utils.py:587-610): the 40-token greedy
    continuation used to eyeball concept consistency."""
    return generate_fast(model, [prompt + " "],
                         max_new_tokens=max_new_tokens)[0]


def safety_gen(model, test_prompts: Sequence[str], max_tokens: int = 1624,
               max_output_tokens: int = 600) -> List[str]:
    """test_safety_gen (evaluate_utils.py:613-645): generate responses,
    left-truncating over-long inputs (harmful content rides the suffix)
    and returning only the response text."""
    keep = max_tokens - max_output_tokens
    trimmed = []
    for item in test_prompts:
        ids = model.tokenizer.encode(item)
        if len(ids) > keep:
            item = model.tokenizer.decode(ids[-keep:])
        trimmed.append(item)
    # ONE batched generate call: per-prompt calls pay dispatch/tunnel
    # latency per prompt for identical outputs (generate_fast is batched).
    return [t.lstrip() for t in generate_fast(
        model, trimmed, max_new_tokens=max_output_tokens)]


# --------------------------------------------------------------------
# evaluator orchestrators (concept / safety / personality)
# --------------------------------------------------------------------

def compute_safety_edit_quality(model, record: Dict, max_tokens: int = 1624,
                                max_output_tokens: int = 600) -> Dict:
    """safety_evaluate.py:28-48 — DS on the attack prompt + the four
    DG generalization prompts, as raw response texts for downstream
    toxicity scoring."""
    batch = [record["prompt"]] + list(record["general_prompt"])
    ds, dg_q, dg_a, dg_oq, dg_aq = safety_gen(model, batch, max_tokens,
                                              max_output_tokens)
    return {"DS": ds, "DG_onlyQ": dg_q, "DG_otherA": dg_a,
            "DG_otherQ": dg_oq, "DG_otherAQ": dg_aq}


def compute_concept_edit_quality(model, record: Dict, P: Optional[str] = None,
                                 test_concept_consistency: bool = False
                                 ) -> Dict:
    """concept_evaluate.py:30-84 — rewrite/rephrase token accuracy under
    an optional concept-prompt prefix P, per-key locality *accuracy*
    (concept eval scores locality against ground truth, not pre/post
    agreement), instance-change probes, and the optional 40-token
    concept generation."""
    pmt = "" if P is None else str(P)
    ret: Dict = {}
    acc, _, _ = model.accuracy([pmt + record["prompt"]],
                               [record["target_new"]])
    ret["rewrite_acc"] = float(acc[0])
    if test_concept_consistency:
        ret["gen_concept_text"] = concept_gen(model, pmt + record["prompt"])
    if record.get("rephrase_prompt"):
        acc, _, _ = model.accuracy([pmt + record["rephrase_prompt"]],
                                   [record["target_new"]])
        ret["rephrase_acc"] = float(acc[0])
    ret["locality"] = {}
    for key, loc in (record.get("locality") or {}).items():
        acc, _, _ = model.accuracy([pmt + loc["prompt"]],
                                   [loc["ground_truth"]])
        ret["locality"][key + "_acc"] = float(acc[0])
    ret["instance"] = {}
    # Documented divergence: the reference writes every probe to the one
    # key 'instance_change' (concept_evaluate.py:77-80), so multi-probe
    # records silently keep only the last; keying per probe preserves all.
    for key, inst in (record.get("instance") or {}).items():
        ret["instance"][key + "_change"] = instance_change(
            model, inst["prompt"], P=P)
    return ret


def compute_sent_metric(model, edited_params, inner_prompts: Sequence[str],
                        inner_answers: Sequence[str],
                        outer_prompts: Sequence[str],
                        outer_answers: Sequence[str],
                        same_mask: Sequence[bool],
                        test_generation: bool = True) -> Dict:
    """personality_evaluate.py:29-101 compute_sent_metric — es over the
    inner QA answers (pre vs edited params) + dd locality KL over the
    outer QA, optional fluency. The reference's ``</s>``-scan q_mask is
    the xym label mask here (same answer span, built by the tokenizer
    layer)."""
    import jax.numpy as jnp

    def logits_for(prompts, answers, params):
        tb = model.batch(list(prompts), list(answers))
        out = model._logits(params, jnp.asarray(tb.input_ids),
                            jnp.asarray(tb.attn_mask))
        return tb, np.asarray(out)

    tb_in, pre_in = logits_for(inner_prompts, inner_answers, model.params)
    _, edit_in = logits_for(inner_prompts, inner_answers, edited_params)
    tb_out, pre_out = logits_for(outer_prompts, outer_answers, model.params)
    _, edit_out = logits_for(outer_prompts, outer_answers, edited_params)

    labels = np.where(tb_in.label_masks > 0, tb_in.label_ids, -100)
    result = {
        "es": es(pre_in, edit_in, tb_in.label_masks > 0, labels,
                 np.asarray(same_mask, bool)),
        "dd": kl_loc(pre_out, edit_out, tb_out.label_masks > 0),
    }
    if test_generation:
        result["fluency"] = generation_quality(model, list(inner_prompts),
                                               max_out_len=100)
    return result


def compute_per_ike_metric(example: Dict, model,
                           test_generation: bool = False) -> Dict:
    """personality_evaluate.py:104-153 — ICL-mode personality metric:
    outer_pre/outer_edit/loc_pre/loc_edit each carry already-built
    (input_ids, attention_mask, labels, q_mask) numpy batches; the model
    is NOT edited — the edit lives in the ICL prefix of the *_edit
    variants."""
    import jax.numpy as jnp

    def run(b):
        return np.asarray(model._logits(model.params,
                                        jnp.asarray(b["input_ids"]),
                                        jnp.asarray(b["attention_mask"])))

    outer_pre, outer_edit = run(example["outer_pre"]), run(
        example["outer_edit"])
    loc_pre, loc_edit = run(example["loc_pre"]), run(example["loc_edit"])
    result = {
        "es": es_per_icl(example, outer_pre, outer_edit)["acc_per"],
        "dd": kl_loc(loc_pre, loc_edit, example["loc_pre"]["q_mask"]),
    }
    if test_generation:
        pre_t = generate_fast(model, [example["pre_q"]], max_new_tokens=60)[0]
        edit_t = generate_fast(model, [example["edit_q"]],
                               max_new_tokens=60)[0]
        pre_t = pre_t.strip().split("\n")[0]
        edit_t = edit_t.strip().split("\n")[0]
        n_pre, n_edit = n_gram_entropy([pre_t]), n_gram_entropy([edit_t])
        result.update({"pre_text": pre_t, "edit_text": edit_t,
                       "ngram_pre_text": n_pre, "ngram_edit_text": n_edit,
                       "coherent": n_pre >= 3.5 and n_edit >= 3.5,
                       "target_per": example.get("target_per_text")})
    return result


# --------------------------------------------------------------------
# CKnowEdit submission scorer (evaluate_cknowedit.py)
# --------------------------------------------------------------------

def _lcs_len(a: Sequence, b: Sequence) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(prev[j + 1], cur[j]))
        prev = cur
    return prev[-1]


def bleu(reference: str, hypothesis: str, max_n: int = 4) -> float:
    """sentence_bleu([ref], hyp) as the reference calls it
    (evaluate_cknowedit.py:99) — nltk treats raw strings as *character*
    sequences, so this is character-level BLEU-4 with uniform weights
    and brevity penalty. The quirk is reproduced deliberately."""
    ref, hyp = list(reference), list(hypothesis)
    if not hyp:
        return 0.0
    log_precisions = []
    for n in range(1, max_n + 1):
        h_counts = _ngram_counts(hyp, n)
        r_counts = _ngram_counts(ref, n)
        overlap = sum(min(c, r_counts[g]) for g, c in h_counts.items())
        total = max(sum(h_counts.values()), 1)
        if overlap == 0:
            return 0.0  # nltk default (no smoothing) zeroes the score
        log_precisions.append(math.log(overlap / total))
    bp = 1.0 if len(hyp) > len(ref) else math.exp(1 - len(ref) /
                                                  max(len(hyp), 1))
    return bp * math.exp(sum(log_precisions) / max_n)


def rouge_recall(hypothesis: str, reference: str) -> Dict[str, float]:
    """rouge-1/2 recall + rouge-l recall (the slice of
    ``rouge.get_scores`` consumed at evaluate_cknowedit.py:101-104)."""
    h, r = word_tokenize(hypothesis), word_tokenize(reference)
    out = {}
    for n, key in ((1, "rouge-1"), (2, "rouge-2")):
        r_counts = _ngram_counts(r, n)
        h_counts = _ngram_counts(h, n)
        overlap = sum(min(c, h_counts[g]) for g, c in r_counts.items())
        out[key] = overlap / max(sum(r_counts.values()), 1)
    out["rouge-l"] = _lcs_len(r, h) / max(len(r), 1)
    return out


def cknowedit_compute_acc(answers: Sequence[str], outputs: Sequence[str],
                          encoder: Optional[Callable] = None) -> Dict:
    """compute_acc (evaluate_cknowedit.py:91-123): BLEU + ROUGE recalls
    + cosine 'Bert Score' (pluggable sentence encoder; omitted when
    None since the multilingual MiniLM weights are external), final =
    mean(ROUGE-L, BertScore)×100."""
    bleus, r1, r2, rl = [], [], [], []
    for an, ou in zip(answers, outputs):
        bleus.append(bleu(an, ou))
        sc = rouge_recall(ou, an)
        r1.append(sc["rouge-1"])
        r2.append(sc["rouge-2"])
        rl.append(sc["rouge-l"])
    m = {"BLEU SCORE": float(np.mean(bleus)), "ROUGE-1": float(np.mean(r1)),
         "ROUGE-2": float(np.mean(r2)), "ROUGE-L": float(np.mean(rl))}
    if encoder is not None:
        e1 = np.asarray(encoder(list(answers)), np.float32)
        e2 = np.asarray(encoder(list(outputs)), np.float32)
        e1 /= np.maximum(np.linalg.norm(e1, axis=-1, keepdims=True), 1e-12)
        e2 /= np.maximum(np.linalg.norm(e2, axis=-1, keepdims=True), 1e-12)
        m["Bert Score"] = float((e1 * e2).sum(-1).mean())
        m["final_score"] = (m["ROUGE-L"] + m["Bert Score"]) / 2 * 100
    else:
        m["final_score"] = m["ROUGE-L"] * 100
    return m


def cknowedit_eval_score(data: List[Dict],
                         encoder: Optional[Callable] = None) -> Dict:
    """eval_score (evaluate_cknowedit.py:125-161) over loaded submission
    records: Edit_acc / portability / locality text-similarity blocks +
    mean fluency (ngram entropy ×10)."""
    metrics: Dict = {}
    metrics["Edit_acc"] = cknowedit_compute_acc(
        [r["requested_rewrite"]["target_new"] for r in data],
        [r["post"]["rewrite_ans"] for r in data], encoder)
    pa, po = [], []
    for item in data:
        pa += list(item["requested_rewrite"]["portability"]["por_hop"]
                   ["ground_truth"])
        po += list(item["post"]["portability_ans"])
    metrics["portability"] = cknowedit_compute_acc(pa, po, encoder)
    la, lo = [], []
    for item in data:
        if ("locality_ans" not in item["post"]
                or not item["requested_rewrite"]["locality"]["loc_hop"]
                ["prompt"]):
            continue
        la += list(item["requested_rewrite"]["locality"]["loc_hop"]
                   ["ground_truth"])
        lo += list(item["post"]["locality_ans"])
    if la:
        metrics["locality"] = cknowedit_compute_acc(la, lo, encoder)
    else:
        metrics["locality"] = {"final_score": 0.0}
    flu = [r["post"]["fluency"]["ngram_entropy"] for r in data]
    metrics["fluency"] = float(np.mean(flu)) * 10
    return metrics


def cknowedit_total_score(score: Dict) -> float:
    """report_score weights (evaluate_cknowedit.py:44-50):
    0.2·edit + 0.35·portability + 0.35·locality + 0.1·fluency."""
    return (score["Edit_acc"]["final_score"] * 0.2
            + score["portability"]["final_score"] * 0.35
            + score["locality"]["final_score"] * 0.35
            + score["fluency"] * 0.1)


# ---------------------------------------------------------------------------
# Caption metrics — a zero-dependency rebuild of the pycocoevalcap stack the
# reference's caption evaluation consumes (evaluate_caption.py:10,197-200
# runs COCOEvalCap; easyeditor/dataset/coco_caption.py:28 CaptionDataset is
# the EIC substrate). COCOEvalCap reports Bleu_1..4 / METEOR / ROUGE_L /
# CIDEr; each scorer below reimplements the published algorithm with its
# pycocoevalcap quirks preserved (documented per function) and is pinned by
# hand-derived golden fixtures in tests/test_caption_metrics.py.
#
# Tokenization: COCOEvalCap pipes everything through the Java PTBTokenizer
# (lowercase + punctuation removal). :func:`coco_tokenize` reproduces the
# lowercasing and the PUNCTUATIONS drop list; PTB's contraction splitting
# ("don't" -> "do n't") is approximated by splitting on apostrophes the
# same way for the common cases. Pass pre-tokenized strings to skip it.
# ---------------------------------------------------------------------------

_COCO_PUNCT = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
               ".", "?", "!", ",", ":", "-", "--", "...", ";"}
_TOK_SPLIT = re.compile(r"[a-z0-9]+(?:'[a-z0-9]+)?|[^\sa-z0-9]+")


def coco_tokenize(s: str) -> List[str]:
    """Lowercase + split + drop PTBTokenizer's PUNCTUATIONS list
    (pycocoevalcap tokenizer/ptbtokenizer.py:15-18)."""
    return [t for t in _TOK_SPLIT.findall(s.lower())
            if t not in _COCO_PUNCT]


def _ngram_counts(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def cider_d(gts: Dict[object, List[str]], res: Dict[object, str],
            n_max: int = 4, sigma: float = 6.0,
            tokenize: Callable = coco_tokenize):
    """CIDEr-D (Vedantam et al.; pycocoevalcap cider/cider_scorer.py).

    Corpus-level: document frequency of each n-gram = number of images
    whose reference set contains it; idf = log(N_images) - log(max(df,1));
    per (candidate, reference) similarity = sum over candidate n-grams of
    min(tf-idf_cand, tf-idf_ref) * tf-idf_ref, cosine-normalized, with a
    gaussian length penalty exp(-(len_c-len_r)^2 / 2 sigma^2); the n-gram
    orders are MEANED before dividing by the reference count and scaling
    by 10 (cider_scorer.py compute_cider). Faithful quirk: an n-gram
    present in every image's references has idf 0, so even a verbatim
    candidate scores 0 on it.

    Returns (corpus_score, {image_id: score}).
    """
    ids = list(res.keys())
    ref_toks = {i: [tokenize(r) for r in gts[i]] for i in ids}
    hyp_toks = {i: tokenize(res[i]) for i in ids}
    # document frequency over reference sets
    df: Counter = Counter()
    for i in ids:
        seen = set()
        for toks in ref_toks[i]:
            for n in range(1, n_max + 1):
                seen.update(_ngram_counts(toks, n).keys())
        df.update(seen)
    log_n = math.log(max(len(ids), 1))

    def tfidf_vec(toks):
        vecs, norms = [], []
        for n in range(1, n_max + 1):
            v = {g: c * (log_n - math.log(max(df[g], 1.0)))
                 for g, c in _ngram_counts(toks, n).items()}
            vecs.append(v)
            norms.append(math.sqrt(sum(x * x for x in v.values())))
        return vecs, norms

    per_image: Dict[object, float] = {}
    for i in ids:
        hv, hn = tfidf_vec(hyp_toks[i])
        acc = np.zeros(n_max)
        for rtoks in ref_toks[i]:
            rv, rn = tfidf_vec(rtoks)
            delta = float(len(hyp_toks[i]) - len(rtoks))
            pen = math.exp(-(delta ** 2) / (2 * sigma ** 2))
            for n in range(n_max):
                val = sum(min(c, rv[n].get(g, 0.0)) * rv[n].get(g, 0.0)
                          for g, c in hv[n].items())
                if hn[n] != 0 and rn[n] != 0:
                    val /= hn[n] * rn[n]
                acc[n] += val * pen
        per_image[i] = float(acc.mean() / max(len(ref_toks[i]), 1) * 10.0)
    corpus = float(np.mean(list(per_image.values()))) if ids else 0.0
    return corpus, per_image


def bleu_coco(gts: Dict[object, List[str]], res: Dict[object, str],
              n_max: int = 4, tokenize: Callable = coco_tokenize):
    """Corpus-level BLEU_1..4 exactly as pycocoevalcap's BleuScorer
    computes it under COCOEvalCap's option='closest': per-image clipped
    n-gram matches and guesses are summed over the corpus, the reference
    length is the closest (ties -> shorter) per image, precision uses the
    (tiny=1e-15, small=1e-9) smoothing ratio, BLEU_k is the k-th root of
    the chained product, and the brevity penalty exp(1-1/ratio) applies
    when ratio < 1 (bleu/bleu_scorer.py:200-260).

    Returns [Bleu_1, ..., Bleu_n].
    """
    small, tiny = 1e-9, 1e-15
    testlen = reflen = 0
    correct = [0] * n_max
    guess = [0] * n_max
    for i in res:
        hyp = tokenize(res[i])
        refs = [tokenize(r) for r in gts[i]]
        testlen += len(hyp)
        # closest ref length; ties broken toward the SHORTER ref
        # (bleu_scorer: min over (abs diff, len))
        reflen += min(((abs(len(r) - len(hyp)), len(r)) for r in refs))[1]
        for k in range(1, n_max + 1):
            hc = _ngram_counts(hyp, k)
            maxref: Counter = Counter()
            for r in refs:
                for g, c in _ngram_counts(r, k).items():
                    maxref[g] = max(maxref[g], c)
            correct[k - 1] += sum(min(c, maxref[g]) for g, c in hc.items())
            guess[k - 1] += max(0, len(hyp) - k + 1)
    bleus = []
    prod = 1.0
    ratio = (testlen + tiny) / (reflen + small)
    for k in range(n_max):
        prod *= (correct[k] + tiny) / (guess[k] + small)
        b = prod ** (1.0 / (k + 1))
        if ratio < 1:
            b *= math.exp(1 - 1 / ratio)
        bleus.append(float(b))
    return bleus


def rouge_l_coco(gts: Dict[object, List[str]], res: Dict[object, str],
                 beta: float = 1.2, tokenize: Callable = coco_tokenize):
    """ROUGE-L as pycocoevalcap computes it (rouge/rouge.py calc_score):
    per image take the MAX LCS-precision and MAX LCS-recall over the
    reference set INDEPENDENTLY (they may come from different
    references), combine with the beta=1.2 F-score, mean over images."""
    scores = []
    for i in res:
        hyp = tokenize(res[i])
        precs, recs = [], []
        for r in gts[i]:
            ref = tokenize(r)
            lcs = _lcs_len(ref, hyp)
            precs.append(lcs / max(len(hyp), 1))
            recs.append(lcs / max(len(ref), 1))
        p, r = max(precs), max(recs)
        scores.append((1 + beta ** 2) * p * r / (r + beta ** 2 * p)
                      if p != 0 and r != 0 else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def _meteor_align(hyp: List[str], ref: List[str]):
    """Exact-match alignment: each hyp token matches the earliest free
    identical ref token; returns (n_matches, n_chunks) where a chunk is
    a maximal run of matches contiguous AND in order in both strings."""
    ref_free = {}
    for j, t in enumerate(ref):
        ref_free.setdefault(t, []).append(j)
    pairs = []
    for i, t in enumerate(hyp):
        if ref_free.get(t):
            pairs.append((i, ref_free[t].pop(0)))
    chunks = 0
    prev = None
    for i, j in pairs:
        if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
            chunks += 1
        prev = (i, j)
    return len(pairs), chunks


def meteor_exact(gts: Dict[object, List[str]], res: Dict[object, str],
                 alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5,
                 tokenize: Callable = coco_tokenize):
    """METEOR, exact-match stage (Lavie & Agarwal 2007 defaults:
    alpha=0.9, beta=3, gamma=0.5): P=m/|hyp|, R=m/|ref|,
    Fmean=PR/(alpha P+(1-alpha)R), penalty=gamma (chunks/m)^beta, score
    per reference = Fmean (1-penalty), max over references, mean over
    images.

    DIVERGENCE from pycocoevalcap: its METEOR is the meteor-1.5 Java jar
    with stem/synonym/paraphrase modules and tuned English weights; a
    zero-egress image can hold neither the jar nor WordNet, so this is
    the documented exact-match core only — identical when every match is
    exact, a lower bound otherwise.
    """
    scores = []
    for i in res:
        hyp = tokenize(res[i])
        best = 0.0
        for r in gts[i]:
            ref = tokenize(r)
            m, ch = _meteor_align(hyp, ref)
            if m == 0 or not hyp or not ref:
                continue
            p, rc = m / len(hyp), m / len(ref)
            fmean = p * rc / (alpha * p + (1 - alpha) * rc)
            pen = gamma * (ch / m) ** beta
            best = max(best, fmean * (1 - pen))
        scores.append(best)
    return float(np.mean(scores)) if scores else 0.0


def caption_scores(gts: Dict[object, List[str]], res: Dict[object, str],
                   tokenize: Callable = coco_tokenize) -> Dict[str, float]:
    """The COCOEvalCap result dict the reference prints
    (evaluate_caption.py:197-200): Bleu_1..4, METEOR (exact-match core,
    see :func:`meteor_exact`), ROUGE_L, CIDEr over
    {image_id: [refs]} / {image_id: hypothesis}."""
    missing = [i for i in res if i not in gts or not gts[i]]
    if missing:
        raise ValueError("no references for image ids: %s" % missing[:5])
    bleus = bleu_coco(gts, res, tokenize=tokenize)
    out = {"Bleu_%d" % (k + 1): b for k, b in enumerate(bleus)}
    out["METEOR"] = meteor_exact(gts, res, tokenize=tokenize)
    out["ROUGE_L"] = rouge_l_coco(gts, res, tokenize=tokenize)
    out["CIDEr"] = cider_d(gts, res, tokenize=tokenize)[0]
    return out
