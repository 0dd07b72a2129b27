"""Golden tests for the xym label/mask semantics.

These pin the exact behavior of the reference's
``prompts_imgs_target_to_xym`` (vllms_for_edit/base.py:75-109): the
space-joining rule, roll-by-one labels, mask span, and the
min-prompt-length truncation. Expected arrays are hand-derived from the
published semantics — any off-by-one here silently shifts every metric.
"""
import numpy as np
import pytest

from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.data.xym import (
    batch_samples,
    build_xym,
    join_prompt_target,
    tokenize_sample,
)


@pytest.fixture
def tok():
    return ToyTokenizer(vocab_size=512, add_bos=True)


def ids_of(tok, text):
    return tok.encode(text)


class TestJoinRule:
    def test_space_inserted(self):
        assert join_prompt_target("q", "a") == "q a"

    def test_prompt_trailing_space(self):
        assert join_prompt_target("q ", "a") == "q a"

    def test_target_leading_space(self):
        assert join_prompt_target("q", " a") == "q a"

    def test_newline_counts_as_whitespace(self):
        assert join_prompt_target("q\n", "a") == "q\na"


class TestSingleSample:
    def test_basic_label_alignment(self, tok):
        # prompt "a b c", target "d" → joined "a b c d"
        # ids = [BOS, a, b, c, d]; labels = roll(-1) = [a, b, c, d, BOS]
        # prompt_len = 4 (BOS a b c) → mask[3:4] = 1: only the position
        # predicting the first (and only) target token is supervised.
        ids_pad, label_ids, label_masks, min_p = build_xym(tok, ["a b c"], ["d"])
        full = ids_of(tok, "a b c d")
        assert ids_pad.tolist() == [full]
        assert min_p == 4
        # cut = 3 → labels[:, 3:] = [d, BOS-rolled]
        assert label_ids.shape == (1, 2)
        assert label_ids[0, 0] == full[4]  # token "d"
        assert label_ids[0, 1] == full[0]  # rolled-around BOS
        assert label_masks.tolist() == [[1, 0]]

    def test_multi_token_target(self, tok):
        # target "x y z" → 3 supervised positions
        _, label_ids, label_masks, min_p = build_xym(tok, ["q w"], ["x y z"])
        full = ids_of(tok, "q w x y z")
        assert min_p == 3  # BOS q w
        # L=6, cut=2, short length 4: positions 2..5 of labels
        assert label_masks.tolist() == [[1, 1, 1, 0]]
        assert label_ids[0, :3].tolist() == full[3:6]  # x y z


class TestBatchTruncation:
    def test_min_prompt_cut_and_padding(self, tok):
        prompts = ["a b c", "p"]
        targets = ["d", "u v"]
        ids_pad, label_ids, label_masks, min_p = build_xym(tok, prompts, targets)
        # prompt lens: 4 and 2 → min_prompt = 2, cut = 1
        assert min_p == 2
        f0 = ids_of(tok, "a b c d")       # len 5
        f1 = ids_of(tok, "p u v")         # len 4
        lmax = 5
        assert ids_pad.shape == (2, lmax)
        assert ids_pad[1, 4] == tok.pad_token_id
        assert label_ids.shape == (2, lmax - 1)
        # row 0: mask positions (absolute 3) → after cut at 1 → index 2
        assert label_masks[0].tolist() == [0, 0, 1, 0]
        # row 1: prompt_len=2, L=4 → absolute mask [1,3) → after cut [0,2)
        assert label_masks[1].tolist() == [1, 1, 0, 0]
        # row 1 labels: positions 1,2 (absolute) are u,v
        assert label_ids[1, 0] == f1[2]
        assert label_ids[1, 1] == f1[3]


class TestTokenBatchEquivalence:
    def test_supervised_tokens_match_reference_layout(self, tok):
        """The absolute-position TokenBatch supervision must select exactly
        the same (label, position) pairs as the reference-shaped build_xym."""
        prompts = ["what color is the sky The answer is:", "q"]
        targets = ["blue", "a b"]
        # reference-shaped
        _, ref_labels, ref_masks, min_p = build_xym(tok, prompts, targets)
        # batched layout
        samples = [tokenize_sample(tok, p, t) for p, t in zip(prompts, targets)]
        tb = batch_samples(samples, tok.pad_token_id, bucket_multiple=4, min_len=4)
        for b in range(2):
            ref_sup = ref_labels[b][ref_masks[b] == 1].tolist()
            tb_sup = tb.label_ids[b][tb.label_masks[b] == 1].tolist()
            assert ref_sup == tb_sup
            # and the positions line up: absolute j = short k + (min_p - 1)
            abs_pos = np.nonzero(tb.label_masks[b])[0]
            short_pos = np.nonzero(ref_masks[b])[0]
            assert (abs_pos == short_pos + (min_p - 1)).all()

    def test_bucketing(self, tok):
        samples = [tokenize_sample(tok, "a b", "c")]
        tb = batch_samples(samples, tok.pad_token_id, bucket_multiple=16, min_len=16)
        assert tb.seq_len == 16
        assert tb.attn_mask[0].sum() == 4

    def test_image_ids_carried(self, tok):
        s = tokenize_sample(tok, "a", "b", image_id="img_7")
        tb = batch_samples([s], tok.pad_token_id)
        assert tb.image_ids == ["img_7"]


class TestNativePacker:
    def test_native_matches_numpy(self, tok):
        """The C packer and the NumPy fallback must agree bit-for-bit."""
        import numpy as np

        from devqa_tpu import native

        ids_list = [np.asarray(tok.encode("a b c d"), np.int32),
                    np.asarray(tok.encode("x y"), np.int32)]
        plens = [3, 2]
        got = native.pack_samples_native(ids_list, plens, tok.pad_token_id, 8)
        # force fallback path
        saved = native._fastpack
        native._fastpack = False
        try:
            want = native.pack_samples_native(ids_list, plens,
                                              tok.pad_token_id, 8)
        finally:
            native._fastpack = saved
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_native_built(self):
        from devqa_tpu import native

        # the toolchain is available in this environment; the extension
        # must actually build (fallback is for restricted installs)
        assert native.have_native()
