"""Text-only VLLM (bridge='none', V=0): the editor zoo and evaluation
harness on bare decoders — the EasyEdit BaseEditor setting
(``easyeditor/editors/editor.py:39``) through the SAME code path as the
multimodal stack."""
import json
import os

import jax
import numpy as np
import pytest

from devqa_tpu.core import decoder as dec
from devqa_tpu.core import vllm as V
from devqa_tpu.core.tokenizer import ToyTokenizer
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import SyntheticImageProvider


@pytest.fixture(scope="module")
def tvllm():
    dcfg = dec.DecoderConfig(arch="opt", vocab_size=256, d_model=32,
                             n_layers=4, n_heads=2, d_ffn=64,
                             max_positions=96)
    cfg = V.text_only_vllm_config(dcfg)
    params = V.init_vllm_params(cfg, jax.random.PRNGKey(0))
    assert sorted(params) == ["decoder"]  # no vision params at all
    return JaxVLLM(cfg, params, ToyTokenizer(vocab_size=256),
                   SyntheticImageProvider(16), bucket_multiple=8)


class TestTextOnlyCore:
    def test_layout_is_pure_text(self, tvllm):
        qb = tvllm.encode_queries(["the sky is", "water is"], [None, None],
                                  ["blue", "wet"])
        # V=0: layout length == text length, all-text kv
        assert qb.embeds.shape[1] == qb.label_ids.shape[1]
        logits = tvllm.logits(qb.embeds, qb.kv_valid)
        assert logits.shape[:2] == qb.embeds.shape[:2]

    def test_matches_bare_decoder_forward(self, tvllm):
        """The V=0 slotted layout must be numerically identical to a
        plain decoder forward on the same tokens."""
        import jax.numpy as jnp

        qb = tvllm.encode_queries(["the sky is"], [None], ["blue"])
        via_vllm = np.asarray(tvllm.logits(qb.embeds, qb.kv_valid))
        dcfg = tvllm.cfg.decoder
        ids = jnp.asarray(qb.input_ids)
        bare = np.asarray(dec.decoder_apply(
            tvllm.params["decoder"], dcfg,
            dec.embed_tokens(tvllm.params["decoder"], dcfg, ids),
            jnp.asarray(qb.kv_valid)))
        assert np.allclose(via_vllm, bare, atol=1e-5)


class TestTextOnlyEditors:
    def test_ft_vl_edits_text(self, tvllm):
        from devqa_tpu.editors.ft_vl import FTvl, FTvlConfig

        ed = FTvl(tvllm, FTvlConfig(layers=(3,), num_steps=5, lr=1e-2))
        qb = tvllm.encode_queries(["the sky is"], [None], ["green"])
        base = np.asarray(tvllm.logits(qb.embeds, qb.kv_valid))
        ed.edit_one_piece({"prompt": "the sky is", "target_new": "green",
                           "image": None})
        out = np.asarray(ed.query_logits(qb))
        assert not np.allclose(out, base, atol=1e-5)
        ed.restore_to_original_model()

    def test_tp_vl_edits_text(self, tvllm):
        from devqa_tpu.editors.tp_vl import TPvl, TPvlConfig

        tp = TPvl(tvllm, TPvlConfig(edit_layer=3, num_steps=5, max_edits=8),
                  seed=0)
        tp.edit_one_piece({"prompt": "the sky is", "target_new": "green",
                           "image": None})
        qb = tvllm.encode_queries(["the sky is"], [None], ["green"])
        out = tp.query_logits(qb)
        assert np.isfinite(np.asarray(out)).all()


class TestTextOnlyHarness:
    def test_harness_runs_text_cases(self, tvllm, tmp_path):
        from devqa_tpu.data.text_datasets import BaseLLMEditData
        from devqa_tpu.editors.ft_vl import FTvl, FTvlConfig
        from devqa_tpu.editors.llm.mend import as_test_cases
        from devqa_tpu.eval.harness import EditorEvaluation

        reqs = [{"prompt": f"fact {i} is", "target_new": "blue",
                 "rephrase_prompt": f"restated fact {i}:",
                 "locality": {"nb": {"prompt": "rome is in",
                                     "ground_truth": "italy"}}}
                for i in range(3)]
        data_obj = type("D", (), {})()
        data_obj.data = as_test_cases(BaseLLMEditData(reqs).data)
        ed = FTvl(tvllm, FTvlConfig(layers=(3,), num_steps=5, lr=1e-2))
        ev = EditorEvaluation(ed, data_obj, "TEXT", str(tmp_path))
        ev.evaluate_sequential_edit(1, False, None)
        mr = json.load(open(os.path.join(
            str(tmp_path), "ft_vl", tvllm.cfg.name, "TEXT",
            "sequential_edit_1", "mean_results.json")))
        assert "text_loc" in mr["total_mean"]["locality"]
        assert "text_rephrase" in mr["total_mean"]["generality"]
