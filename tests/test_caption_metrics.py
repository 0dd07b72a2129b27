"""Golden-fixture pins for the caption metric stack (COCOEvalCap rebuild).

The reference's caption evaluation
(mPLUG_Owl2/mplug_owl2/evaluate/evaluate_caption.py:197-200) runs
pycocoevalcap's COCOEvalCap and reports Bleu_1..4 / METEOR / ROUGE_L /
CIDEr. pycocoevalcap cannot live in this image (Java jars, WordNet), so
every expected value below is derived BY HAND from the published
algorithms, with the arithmetic spelled out next to each assertion —
the same zero-dep pinning pattern as tests/test_snippets.py.
"""
import math

import pytest

from devqa_tpu.eval.metrics import (
    bleu_coco,
    caption_scores,
    cider_d,
    coco_tokenize,
    meteor_exact,
    rouge_l_coco,
)


# ---------------------------------------------------------------- tokenizer

def test_tokenize_lowercases_and_drops_ptb_punctuation():
    assert coco_tokenize("A cat, sitting -- quietly...") == [
        "a", "cat", "sitting", "quietly"]


def test_tokenize_keeps_contractions_as_one_token():
    # documented approximation: "don't" stays one token (PTB would split
    # "do n't"); what matters for the metrics is determinism + lowercase.
    assert coco_tokenize("Don't stop!") == ["don't", "stop"]


def test_tokenize_keeps_digits():
    assert coco_tokenize("2 dogs; 10 cats") == ["2", "dogs", "10", "cats"]


# ---------------------------------------------------------------- BLEU

def test_bleu_identity_short_sentence():
    # hyp == ref == "a cat sits" (3 tokens):
    #   p1 = 3/3, p2 = 2/2, p3 = 1/1 -> Bleu_1..3 ~= 1
    #   guess_4 = 0 -> p4 = tiny/small = 1e-6, Bleu_4 = (1e-6)^(1/4)
    # ratio = (3+1e-15)/(3+1e-9) is a hair under 1 so the brevity penalty
    # multiplies by exp(1-1/ratio) ~= 1 to 9 decimals.
    g = {1: ["a cat sits"]}
    r = {1: "a cat sits"}
    b = bleu_coco(g, r)
    assert b[0] == pytest.approx(1.0, abs=1e-6)
    assert b[1] == pytest.approx(1.0, abs=1e-6)
    assert b[2] == pytest.approx(1.0, abs=1e-6)
    assert b[3] == pytest.approx((1e-15 / 1e-9) ** 0.25, rel=1e-3)


def test_bleu_clipping():
    # hyp "the the the" vs ref "the cat": clipped correct_1 = min(3,1) = 1,
    # guess_1 = 3 -> Bleu_1 = 1/3; testlen 3 > reflen 2 so no brevity
    # penalty.
    b = bleu_coco({1: ["the cat"]}, {1: "the the the"}, n_max=1)
    assert b[0] == pytest.approx(1.0 / 3.0, rel=1e-6)


def test_bleu_closest_reflen_tie_goes_short():
    # hyp has 3 tokens; refs have 2 and 4 (both |diff| = 1): pycocoevalcap's
    # min over (abs diff, len) picks the SHORTER (2), ratio = 3/2 > 1, no
    # brevity penalty; with ref len 4 chosen, ratio 3/4 would have cost
    # exp(1 - 4/3) ~= 0.7165 on every order.
    g = {1: ["b c", "a b c d"]}
    r = {1: "a b c"}
    b = bleu_coco(g, r, n_max=1)
    # clipped unigram matches: maxref counts a,b,c,d each 1 -> correct 3/3
    assert b[0] == pytest.approx(1.0, abs=1e-6)


def test_bleu_brevity_penalty():
    # hyp "a b" (2) vs ref "a b c d" (4): p1 = 2/2 = 1, ratio = 2/4,
    # BP = exp(1 - 1/0.5) = exp(-1).
    b = bleu_coco({1: ["a b c d"]}, {1: "a b"}, n_max=1)
    assert b[0] == pytest.approx(math.exp(-1.0), rel=1e-6)


# ---------------------------------------------------------------- ROUGE-L

def test_rouge_identity():
    # p = r = 1 -> F_{beta=1.2} = (1+1.44)*1*1 / (1 + 1.44*1) = 1.
    assert rouge_l_coco({1: ["a cat sits"]}, {1: "a cat sits"}) == (
        pytest.approx(1.0))


def test_rouge_max_p_and_max_r_from_different_refs():
    # hyp "a b"; ref1 "a b c d": lcs 2 -> prec 2/2 = 1, rec 2/4 = 0.5;
    # ref2 "b a": lcs 1 -> prec 0.5, rec 0.5.
    # pycocoevalcap takes max prec (1, from ref1) and max rec (0.5, from
    # EITHER) independently: F = 2.44*1*0.5 / (0.5 + 1.44*1) = 1.22/1.94.
    got = rouge_l_coco({1: ["a b c d", "b a"]}, {1: "a b"})
    assert got == pytest.approx(1.22 / 1.94, rel=1e-9)


def test_rouge_zero_when_no_overlap():
    assert rouge_l_coco({1: ["x y"]}, {1: "a b"}) == 0.0


# ---------------------------------------------------------------- METEOR

def test_meteor_identity_penalty():
    # perfect match of 3 tokens: P = R = 1, Fmean = 1, one chunk,
    # penalty = 0.5 * (1/3)^3 -> score = 1 - 0.5/27.
    got = meteor_exact({1: ["a cat sits"]}, {1: "a cat sits"})
    assert got == pytest.approx(1.0 - 0.5 / 27.0, rel=1e-9)


def test_meteor_chunk_fragmentation():
    # hyp [a b c] vs ref [a c b]: alignment (0,0) (1,2) (2,1) = 3 chunks,
    # m = 3, P = R = 1, Fmean = 1, penalty = 0.5 * (3/3)^3 = 0.5.
    got = meteor_exact({1: ["a c b"]}, {1: "a b c"})
    assert got == pytest.approx(0.5, rel=1e-9)


def test_meteor_best_of_refs():
    # ref "a b c" scores 1 - 0.5/27 (identity); ref "x y" scores 0 ->
    # the max over references wins.
    got = meteor_exact({1: ["x y", "a b c"]}, {1: "a b c"})
    assert got == pytest.approx(1.0 - 0.5 / 27.0, rel=1e-9)


def test_meteor_no_match_is_zero():
    assert meteor_exact({1: ["x y"]}, {1: "a b"}) == 0.0


# ---------------------------------------------------------------- CIDEr-D

def test_cider_single_image_corpus_is_zero():
    # Faithful pycocoevalcap quirk: idf = log(N) - log(df); with one image
    # every df >= 1 and log(1) = 0, so all tf-idf vectors vanish and even
    # a verbatim candidate scores 0.
    corpus, per = cider_d({1: ["a cat sits"]}, {1: "a cat sits"})
    assert corpus == 0.0
    assert per[1] == 0.0


def test_cider_two_image_hand_derivation():
    # gts = {1: ["a cat"], 2: ["a dog"]}, res identical to refs. N = 2.
    # df("a") = 2 -> idf = ln2 - ln2 = 0; df(cat) = df(dog) = 1 -> idf = ln2;
    # bigrams ("a","cat") / ("a","dog") each df 1 -> idf = ln2.
    # Image 1, n=1: hyp vec {a: 0, cat: ln2}, ref identical -> cosine sim 1.
    # n=2: {("a","cat"): ln2} both sides -> 1. n=3, n=4: empty -> 0.
    # length delta 0 -> gaussian penalty 1. acc = [1,1,0,0], mean 0.5,
    # / 1 ref * 10 = 5.0 per image; corpus = 5.0.
    corpus, per = cider_d({1: ["a cat"], 2: ["a dog"]},
                          {1: "a cat", 2: "a dog"})
    assert per[1] == pytest.approx(5.0, rel=1e-9)
    assert per[2] == pytest.approx(5.0, rel=1e-9)
    assert corpus == pytest.approx(5.0, rel=1e-9)


def test_cider_length_penalty():
    # Same corpus, but image 1's hypothesis "a cat today now" is 2 tokens
    # longer than its ref "a cat": every order's contribution is scaled by
    # exp(-(2^2) / (2 * 36)) = exp(-1/18).
    # n=1: hyp vec {a:0, cat:ln2, today:..., now:...} — but df(today) =
    # df(now) = 0 in the REFERENCE corpus -> idf = ln2 - ln(max(0,1)) = ln2.
    # val = min-clipped dot with ref {a:0, cat:ln2} = (ln2)^2;
    # norms: hyp sqrt(3)*ln2, ref ln2 -> sim_1 = 1/sqrt(3).
    # n=2: hyp bigrams (a,cat) idf ln2, (cat,today) ln2, (today,now) ln2;
    # ref (a,cat) ln2 -> val (ln2)^2 / (sqrt(3)ln2 * ln2) = 1/sqrt(3).
    # n=3: hyp trigrams df 0 -> idf ln2 each, ref has none -> ref norm 0 ->
    # contribution 0 (guard). n=4 likewise 0.
    # acc = pen * [1/sqrt3, 1/sqrt3, 0, 0]; mean = pen/(2 sqrt3);
    # score_1 = 10 * exp(-1/18) / (2*sqrt(3)).
    corpus, per = cider_d({1: ["a cat"], 2: ["a dog"]},
                          {1: "a cat today now", 2: "a dog"})
    want = 10.0 * math.exp(-4.0 / 72.0) / (2.0 * math.sqrt(3.0))
    assert per[1] == pytest.approx(want, rel=1e-9)
    assert per[2] == pytest.approx(5.0, rel=1e-9)


# ---------------------------------------------------------------- facade

def test_caption_scores_schema_and_missing_refs():
    g = {1: ["a cat"], 2: ["a dog"]}
    r = {1: "a cat", 2: "a dog"}
    out = caption_scores(g, r)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                        "METEOR", "ROUGE_L", "CIDEr"}
    assert out["CIDEr"] == pytest.approx(5.0, rel=1e-9)
    assert out["ROUGE_L"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        caption_scores({1: ["a cat"]}, {1: "a cat", 2: "a dog"})
