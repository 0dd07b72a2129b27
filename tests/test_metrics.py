"""Editing-quality metric suite (eval/metrics.py): n-gram entropy, es,
kl_loc, masked PPL, concept/safety probes, personality orchestrators,
CKnowEdit scorer."""
import jax
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.editors.llm.session import TextModel
from devqa_tpu.eval import metrics as M


@pytest.fixture(scope="module")
def model():
    cfg = dec.DecoderConfig(arch="opt", vocab_size=256, d_model=32,
                            n_layers=4, n_heads=2, d_ffn=64,
                            max_positions=192)
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(3))
    return TextModel(params, cfg, ToyTokenizer(vocab_size=256),
                     bucket_multiple=8)


class TestNgramEntropy:
    def test_hand_computed(self):
        # tokens [a b a b a]: bigram entropy 1 bit; trigram entropy
        # -(2/3 log2 2/3 + 1/3 log2 1/3) = 0.9183; weights (2/3, 4/3).
        got = M.compute_n_gram_entropy("a b a b a")
        tri = -(2 / 3 * np.log2(2 / 3) + 1 / 3 * np.log2(1 / 3))
        want = (2 / 3 * 1.0 + 4 / 3 * tri) / 2
        assert abs(got - want) < 1e-9

    def test_repetition_scores_lower(self):
        # degenerate repetition is the failure mode fluency must catch
        loop = M.compute_n_gram_entropy("the the the the the the")
        prose = M.compute_n_gram_entropy(
            "the cat sat on the mat while the dog slept outside")
        assert loop < prose

    def test_agg_modes(self):
        texts = ["a b c d e", "a a a a a"]
        assert M.n_gram_entropy(texts, "geom") <= M.n_gram_entropy(
            texts, "arith") + 1e-12

    def test_generation_quality(self, model):
        out = M.generation_quality(model, ["cat dog sky"], max_out_len=8)
        assert "ngram_entropy" in out and np.isfinite(out["ngram_entropy"])


class TestEs:
    def _setup(self, boost=0.0):
        rng = np.random.default_rng(0)
        B, L, V = 4, 6, 11
        pre = rng.normal(size=(B, L, V)).astype(np.float32)
        labels = rng.integers(0, V, size=(B, L))
        labels[:, :2] = -100  # prompt span
        q_mask = np.zeros((B, L), bool)
        q_mask[:, 2:] = True
        same = np.array([True, True, False, False])
        edit = pre.copy()
        if boost:
            for b in range(B):
                if same[b]:
                    for j in range(2, L):
                        edit[b, j, labels[b, j]] += boost
        return pre, edit, q_mask, labels, same

    def test_identity_edit(self):
        pre, edit, q, lab, same = self._setup(0.0)
        val = M.es(pre, edit, q, lab, same)
        assert 0.0 <= val <= 1.0
        # z_topic == 1 when edit == pre, so es == sigmoid(pos - neg)
        lp = M.gather_log_probs(pre, np.where(lab == -100, 0, lab))
        pos = M.masked_mean(lp, same[:, None] * q)
        neg = M.masked_mean(lp, (~same)[:, None] * q)
        want = 1 / (1 + np.exp(-(pos - neg)))
        assert abs(val - want) < 1e-6

    def test_target_boost_raises_es(self):
        pre, edit, q, lab, same = self._setup(0.0)
        base = M.es(pre, edit, q, lab, same)
        pre2, edit2, q2, lab2, same2 = self._setup(4.0)
        assert M.es(pre2, edit2, q2, lab2, same2) > base

    def test_es_per_icl(self):
        pre, edit, q, lab, same = self._setup(2.0)
        example = {"outer_pre": {"q_mask": q, "labels": lab},
                   "outer_edit": {"q_mask": q, "labels": lab},
                   "same_per_mask": same}
        out = M.es_per_icl(example, pre, edit)
        assert set(out) >= {"acc_per", "z_per", "z_topic", "z_topic_raw"}
        assert 0 <= out["acc_per"] <= 1
        assert out["z_topic"] <= 1.0


class TestKlLoc:
    def test_zero_on_identity(self):
        x = np.random.default_rng(1).normal(size=(2, 5, 7))
        mask = np.ones((2, 5), bool)
        assert abs(M.kl_loc(x, x, mask)) < 1e-6

    def test_end_alignment_vs_prefix(self):
        """Post logits carry an ICL prefix: end-aligned rows must match."""
        rng = np.random.default_rng(2)
        pre = rng.normal(size=(1, 4, 7))
        prefix = rng.normal(size=(1, 3, 7))
        post = np.concatenate([prefix, pre], axis=1)
        assert abs(M.kl_loc(pre, post, np.ones((1, 4), bool))) < 1e-6

    def test_positive_on_drift(self):
        rng = np.random.default_rng(3)
        pre = rng.normal(size=(1, 4, 7))
        post = rng.normal(size=(1, 4, 7))
        assert M.kl_loc(pre, post, np.ones((1, 4), bool)) > 0


class TestPerplexity:
    def test_target_masked_ppl(self, model):
        v = M.ppl(model, "the sky is", "blue")
        assert np.isfinite(v) and v > 0
        # single-string and list forms agree
        assert abs(v - M.ppl(model, ["the sky is"], ["blue"])) < 1e-5

    def test_ood_ppl_fraction(self, model):
        v = M.ood_ppl(model, "cat dog tree house")
        assert 0.0 <= v <= 1.0


class TestGenerationProbes:
    def test_verify_answer(self):
        assert M.verify_answer("the answer is paris", "paris")
        assert not M.verify_answer("the answer is rome", "paris")
        assert M.verify_answer("a b", [["x", "a"], ["b"]])
        assert not M.verify_answer("a", [["a"], ["b"]])

    def test_answer_match(self, model):
        assert isinstance(M.answer_match(model, "cat dog", "zebra",
                                         max_new_tokens=4), bool)

    def test_instance_change(self, model):
        assert M.instance_change(model, "Whether cat belongs to category"
                                        " animal?") in (1.0, 0.0, -1.0)

    def test_concept_gen(self, model):
        assert isinstance(M.concept_gen(model, "cat dog",
                                        max_new_tokens=4), str)

    def test_safety_gen_truncates(self, model):
        long_prompt = " ".join(["cat"] * 50)
        outs = M.safety_gen(model, [long_prompt, "dog"], max_tokens=24,
                            max_output_tokens=8)
        assert len(outs) == 2 and all(isinstance(o, str) for o in outs)


class TestOrchestrators:
    def test_safety_edit_quality(self, model):
        rec = {"prompt": "cat", "general_prompt": ["dog", "sky", "sun",
                                                   "red"]}
        out = M.compute_safety_edit_quality(model, rec, max_tokens=24,
                                            max_output_tokens=4)
        assert set(out) == {"DS", "DG_onlyQ", "DG_otherA", "DG_otherQ",
                            "DG_otherAQ"}

    def test_concept_edit_quality(self, model):
        rec = {"prompt": "the cat is", "target_new": "red",
               "ground_truth": "blue",
               "rephrase_prompt": "that cat is",
               "locality": {"nb": {"prompt": "the dog is",
                                   "ground_truth": "blue"}},
               "instance": {"i0": {"prompt": "Whether cat belongs to"
                                             " category animal?"}}}
        out = M.compute_concept_edit_quality(model, rec, P="concept: ",
                                             test_concept_consistency=True)
        assert {"rewrite_acc", "rephrase_acc", "locality", "instance",
                "gen_concept_text"} <= set(out)
        assert "nb_acc" in out["locality"]

    def test_sent_metric_identity_edit(self, model):
        out = M.compute_sent_metric(
            model, model.params,
            inner_prompts=["cat dog", "sky tree"],
            inner_answers=["red", "blue"],
            outer_prompts=["sun moon"], outer_answers=["car"],
            same_mask=[True, False], test_generation=False)
        assert abs(out["dd"]) < 1e-5  # unedited params → zero drift
        assert 0 <= out["es"] <= 1

    def test_per_ike_metric(self, model):
        tb = model.batch(["cat dog"], ["red"])
        batch = {"input_ids": tb.input_ids,
                 "attention_mask": tb.attn_mask,
                 "labels": np.where(tb.label_masks > 0, tb.label_ids, -100),
                 "q_mask": tb.label_masks > 0}
        example = {"outer_pre": batch, "outer_edit": batch,
                   "loc_pre": batch, "loc_edit": batch,
                   "same_per_mask": np.array([True])}
        out = M.compute_per_ike_metric(example, model)
        assert abs(out["dd"]) < 1e-5
        assert 0 <= out["es"] <= 1


class TestSessionFluency:
    def test_edit_with_test_generation(self, model):
        """BaseEditor's test_generation flag: fluency block in pre/post."""
        from devqa_tpu.editors.llm import LLMEditSession

        sess = LLMEditSession(model, lambda m, r: m.params, "null")
        res = sess.edit([{"prompt": "the cat sat", "target_new": "down"}],
                        test_generation=True, max_out_len=8)
        for phase in ("pre", "post"):
            assert "ngram_entropy" in res[0][phase]["fluency"]
            assert np.isfinite(res[0][phase]["fluency"]["ngram_entropy"])


class TestCKnowEdit:
    def test_bleu_identity_and_miss(self):
        assert abs(M.bleu("abcdef", "abcdef") - 1.0) < 1e-9
        assert M.bleu("abcdef", "zzzzzz") == 0.0
        assert M.bleu("abcdef", "") == 0.0

    def test_rouge_recall(self):
        sc = M.rouge_recall("the cat sat", "the cat sat")
        assert sc["rouge-1"] == sc["rouge-2"] == sc["rouge-l"] == 1.0
        sc = M.rouge_recall("the cat", "the cat sat")
        assert sc["rouge-l"] == pytest.approx(2 / 3)

    def test_compute_acc_and_total(self):
        answers = ["the cat sat on the mat", "a red bird"]
        outputs = ["the cat sat on a mat", "a blue bird"]
        m = M.cknowedit_compute_acc(answers, outputs)
        assert 0 < m["ROUGE-1"] <= 1 and 0 <= m["BLEU SCORE"] <= 1
        # pluggable encoder path (hash-style stand-in)
        def enc(texts):
            rng = np.random.default_rng(0)
            return rng.normal(size=(len(texts), 8))
        m2 = M.cknowedit_compute_acc(answers, outputs, encoder=enc)
        assert "Bert Score" in m2

    def test_eval_score_schema(self):
        rec = {
            "pre": {}, "case_id": 0,
            "requested_rewrite": {
                "prompt": "p", "target_new": "the cat sat",
                "ground_truth": "g",
                "portability": {"por_hop": {"prompt": ["q"],
                                            "ground_truth": ["a b"]}},
                "locality": {"loc_hop": {"prompt": ["q"],
                                         "ground_truth": ["c d"]}},
                "subject": "s", "rephrase_prompt": "r"},
            "post": {"rewrite_ans": "the cat sat",
                     "rephrase_ans": "x",
                     "locality_ans": ["c d"],
                     "portability_ans": ["a b"],
                     "fluency": {"ngram_entropy": 3.0}},
        }
        score = M.cknowedit_eval_score([rec, rec])
        total = M.cknowedit_total_score(score)
        assert score["Edit_acc"]["final_score"] == pytest.approx(100.0)
        assert score["portability"]["final_score"] == pytest.approx(100.0)
        assert score["fluency"] == pytest.approx(30.0)
        # weights 0.2/0.35/0.35/0.1
        assert total == pytest.approx(0.2 * 100 + 0.35 * 100 + 0.35 * 100
                                      + 0.1 * 30)


class TestTopkAgreement:
    """Golden test of the EasyEdit-side locality top-k agreement against
    a direct (torch) transcription of multimodal_editor.py:977-1007."""

    @staticmethod
    def _reference_formula(base_logits, post_logits, k):
        import torch
        import torch.nn.functional as F

        base = torch.tensor(base_logits, dtype=torch.float32)
        post = torch.tensor(post_logits, dtype=torch.float32)
        if post.shape[1] > base.shape[1]:
            post = post[:, -base.shape[1]:, :]
        else:
            base = base[:, -post.shape[1]:, :]
        bt = torch.topk(F.softmax(base, dim=-1), k=k, dim=-1).indices
        pt = torch.topk(F.softmax(post, dim=-1), k=k, dim=-1).indices
        return float(
            (pt.view(-1) == bt.view(-1)).sum() / pt.view(-1).shape[0])

    def test_matches_reference_k10(self):
        rng = np.random.default_rng(0)
        pre = rng.normal(size=(3, 7, 50)).astype(np.float32)
        # post: pre plus a perturbation so some ranks shuffle
        post = pre + 0.3 * rng.normal(size=pre.shape).astype(np.float32)
        want = self._reference_formula(pre, post, 10)
        got = M.topk_logits_agreement(pre, post, k=10)
        assert got == pytest.approx(want, abs=1e-6)

    def test_matches_reference_k1_and_tail_alignment(self):
        rng = np.random.default_rng(1)
        pre = rng.normal(size=(2, 5, 40)).astype(np.float32)
        post = rng.normal(size=(2, 9, 40)).astype(np.float32)  # longer seq
        want = self._reference_formula(pre, post, 1)
        got = M.topk_logits_agreement(pre, post, k=1)
        assert got == pytest.approx(want, abs=1e-6)
        # and the symmetric case (pre longer)
        want2 = self._reference_formula(post, pre, 1)
        got2 = M.topk_logits_agreement(post, pre, k=1)
        assert got2 == pytest.approx(want2, abs=1e-6)

    def test_identity_is_one(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 6, 30)).astype(np.float32)
        assert M.topk_logits_agreement(x, x, k=10) == 1.0

    def test_span_agreement_extracts_masked_rows(self):
        rng = np.random.default_rng(3)
        pre_topk = rng.integers(0, 50, size=(8, 10))
        post_topk = pre_topk.copy()
        post_topk[5] = (post_topk[5] + 1) % 50  # one masked row disagrees
        pre_mask = np.array([0, 0, 1, 1, 1, 1, 0, 0])
        post_mask = pre_mask
        got = M.topk_span_agreement(pre_topk, pre_mask, post_topk,
                                    post_mask, 10)
        assert got == pytest.approx(3 / 4)
        # k=1 slices the leading column only
        got1 = M.topk_span_agreement(pre_topk, pre_mask, post_topk,
                                     post_mask, 1)
        assert got1 == pytest.approx(3 / 4)

    def test_span_agreement_empty_span_scores_zero(self):
        """All-zero masks (degenerate probe) score 0.0, consistent with
        locality_agreement — not a silently-inflating 1.0."""
        pre_topk = np.zeros((4, 10), int)
        got = M.topk_span_agreement(pre_topk, np.zeros(4, int), pre_topk,
                                    np.zeros(4, int), 10)
        assert got == 0.0

    def test_kl_loc_shorter_post_aligns(self):
        """Layout-shrinking editors (RECIPE drops image tokens) produce a
        SHORTER post batch; kl_loc must tail-align both sides."""
        rng = np.random.default_rng(5)
        pre = rng.normal(size=(1, 6, 12)).astype(np.float32)
        post = pre[:, -4:, :]
        assert abs(M.kl_loc(pre, post, np.ones((1, 6), bool))) < 1e-6

    def test_span_agreement_prefix_shift(self):
        """IKE prepends ICL text: post span sits at a different absolute
        position; span extraction + tail alignment must line them up."""
        rng = np.random.default_rng(4)
        span = rng.integers(0, 50, size=(4, 10))
        pre_topk = np.concatenate([np.zeros((2, 10), int), span])
        pre_mask = np.array([0, 0, 1, 1, 1, 1])
        post_topk = np.concatenate([np.zeros((5, 10), int), span])
        post_mask = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1])
        got = M.topk_span_agreement(pre_topk, pre_mask, post_topk,
                                    post_mask, 10)
        assert got == 1.0
