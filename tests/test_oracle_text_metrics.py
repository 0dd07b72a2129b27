"""Text-side metric-primitive oracle: the easyeditor evaluation that
BaseEditor runs (``evaluate/evaluate_utils.py::test_prediction_acc``)
executed on the shared tiny llama + word-level tokenizer, vs our
``TextModel.accuracy`` / session locality token lists.

Pins the ' '-join target tokenization, the left-pad slice arithmetic
(answers[prompt_len-1:-1] vs labels[prompt_len:]) and the locality
answer-id protocol.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/DE-VQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


def _load_eval_utils():
    from test_reference_oracle import _load_ref_easyeditor_pkg
    _load_ref_easyeditor_pkg()
    if "refee.evaluate.evaluate_utils" in sys.modules:
        return sys.modules["refee.evaluate.evaluate_utils"]
    # stub the deps the module pulls but never uses on this path
    for name in ("openai", "nltk"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    tr = types.ModuleType("refee.trainer")
    tr.__all__ = []
    sys.modules.setdefault("refee.trainer", tr)
    ev = importlib.machinery.ModuleSpec("refee.evaluate", None,
                                        is_package=True)
    m = importlib.util.module_from_spec(ev)
    m.__path__ = []
    sys.modules.setdefault("refee.evaluate", m)
    spec = importlib.util.spec_from_file_location(
        "refee.evaluate.evaluate_utils",
        os.path.join(REF, "easyeditor/evaluate/evaluate_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refee.evaluate.evaluate_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


import importlib.machinery  # noqa: E402  (used above)


class TestTextMetricOracle:
    @pytest.fixture(scope="class")
    def rig(self):
        from test_reference_oracle import TestFTOracle, _make_tokenizer

        from devqa_tpu.core import convert_hf, decoder as dec
        from devqa_tpu.core.tokenizer import HFTokenizerAdapter
        from devqa_tpu.editors.llm.session import TextModel
        from transformers import LlamaConfig, LlamaForCausalLM

        hf_tok = _make_tokenizer()
        cfg = LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=3, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False)
        torch.manual_seed(7)
        model = LlamaForCausalLM(cfg).eval().requires_grad_(False)
        ours_cfg = dec.DecoderConfig(
            arch="llama", vocab_size=64, d_model=16, n_layers=3, n_heads=2,
            d_ffn=32, max_positions=64, activation="silu",
            tie_word_embeddings=False, norm_eps=cfg.rms_norm_eps)
        params = convert_hf.convert_llama(
            convert_hf.torch_state_dict_to_numpy(model), ours_cfg)
        text_model = TextModel(params, ours_cfg, HFTokenizerAdapter(hf_tok),
                               bucket_multiple=8)
        hp = types.SimpleNamespace(max_length=40, alg_name="ROME")
        return dict(model=model, tok=hf_tok, text_model=text_model, hp=hp,
                    patch=TestFTOracle._cpu_patch_devices)

    @pytest.mark.parametrize("prompt,target", [
        ("the picture near the river is shown", "zebra"),
        ("who wrote about the tree", "red lion"),
        ("which animal is in the picture", "a big zebra here"),
    ])
    def test_prediction_acc_parity(self, rig, prompt, target):
        eu = _load_eval_utils()
        with rig["patch"]():
            ref_acc = eu.test_prediction_acc(
                rig["model"], rig["tok"], rig["hp"], prompt, target,
                device=0)
        ours, _, _ = rig["text_model"].accuracy([prompt], [target])
        np.testing.assert_allclose(float(ours[0]), float(ref_acc[0]),
                                   atol=1e-6)

    def test_locality_token_list_parity(self, rig):
        eu = _load_eval_utils()
        prompt, gt = "the capital near the river", "blue sky"
        with rig["patch"]():
            ref_tokens = eu.test_prediction_acc(
                rig["model"], rig["tok"], rig["hp"], prompt, gt,
                device=0, locality=True)
        _, preds, masks = rig["text_model"].accuracy([prompt], [gt])
        sup = np.nonzero(masks[0])[0]
        ours_tokens = [int(t) for t in preds[0][sup]]
        assert ours_tokens == list(ref_tokens[0])
