"""Cross-framework oracle for the LLaVA wrapper: run the reference's OWN
``LlavaForEdit`` (editor/vllms_for_edit/llava/llava.py:8-81) +
``VLLMEditorEvaluation`` on a tiny random HF
``LlavaForConditionalGeneration``, then run this framework on the SAME
weights / tokenizer / records and compare.

This pins the one layout variant the BLIP-2 rig (test_reference_oracle.py)
cannot: a MID-SEQUENCE image slot. llava-v1.5 places 576 vision tokens at
the ``<image>`` position AFTER the BOS (llava.py:56-60 computes
``vt_range = [img_begin, img_begin + n_patches)`` from the first image
token in ``input_ids``), so editor routing, vt-rep extraction and probe
alignment all see vt_range = [1, 17) here instead of BLIP-2's [0, 32).

Reference-API shims (the reference targets transformers 4.36; this image
ships 4.57):

- ``Llava436`` restores the 4.36 surface of
  ``LlavaForConditionalGeneration`` that llava.py:25-51 calls into:
  ``language_model`` as a causal LM with ``.logits`` (4.57's property
  returns the bare backbone) and ``_merge_input_ids_with_image_features``
  (removed in 4.47; with 4.44+ processors pre-expanding ``<image>`` into
  n_patches placeholder ids, the merge is exactly a scatter into those
  slots — same final [text | img×16 | text] layout the 4.36 pair
  produced).
- ``LegacyOrderLlavaProcessor`` restores the 4.36 call order
  ``processor(text, images, ...)`` (4.57 swapped to (images, text)) and
  — patched-in-driver, see PARITY.md — returns ``pixel_values=None`` for
  text-only batches: llava.py:54 reads ``inpt.pixel_values``
  unconditionally, which raises AttributeError on every text-only probe
  (BatchFeature never contains the key when images=None, on ANY
  transformers version). The guard at llava.py:33
  (``if pixel_values is not None``) then takes the text-only path the
  author intended.
"""
import copy
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/DE-VQA"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

from devqa_tpu.core import convert_hf, decoder as dec, vllm as vllm_mod
from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.core.tokenizer import HFTokenizerAdapter
from devqa_tpu.core.vit import ViTConfig
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import FileImageProvider
from devqa_tpu.data.schema import BaseVLLMEditData
from devqa_tpu.data.xym import build_xym
from devqa_tpu.editors.convert_reference import load_reference_editor_ckpt
from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
from devqa_tpu.eval.harness import EditorEvaluation, case_probe_specs

from test_reference_oracle import (WORDS, _acc_leaves, _make_cases,
                                   _ref_edit_data, _write_pngs)

IMG_SIZE = 28
BOS_ID, IMG_ID = 62, 63
N_PATCH = (IMG_SIZE // 7) ** 2  # 16 — get_img_token_n (llava.py:78-79)


def _make_llava_tokenizer():
    """Word-level tokenizer with llava-v1.5's special-token layout: a BOS
    prepended to every encoding (TemplateProcessing) and ``<image>`` as
    an added special token — so the image slot lands at position 1."""
    from tokenizers import Tokenizer as RawTok
    from tokenizers import models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2}
    for w in WORDS:
        vocab[w] = len(vocab)
    vocab["<s>"] = BOS_ID
    vocab["<image>"] = IMG_ID
    raw = RawTok(models.WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.Whitespace()
    raw.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", BOS_ID)])
    tok = PreTrainedTokenizerFast(
        tokenizer_object=raw, pad_token="<pad>", unk_token="<unk>",
        eos_token="</s>", bos_token="<s>")
    tok.add_special_tokens({"additional_special_tokens": ["<image>"]})
    return tok


class _CausalLMView(torch.nn.Module):
    """4.36-era ``model.language_model``: causal LM with ``.logits``.
    Child names (.model/.lm_head) mirror LlamaForCausalLM so reference
    path templates like 'language_model.lm_head' stay meaningful."""

    def __init__(self, backbone, lm_head):
        super().__init__()
        self.model, self.lm_head = backbone, lm_head

    def forward(self, input_ids=None, attention_mask=None, position_ids=None,
                inputs_embeds=None, use_cache=False,
                output_hidden_states=None, **kw):
        from transformers.modeling_outputs import CausalLMOutputWithPast

        out = self.model(input_ids=input_ids, attention_mask=attention_mask,
                         position_ids=position_ids,
                         inputs_embeds=inputs_embeds, use_cache=use_cache,
                         output_hidden_states=output_hidden_states)
        return CausalLMOutputWithPast(
            logits=self.lm_head(out.last_hidden_state),
            hidden_states=out.hidden_states)


class Llava436(transformers.LlavaForConditionalGeneration):
    """Tiny HF llava presenting the transformers-4.36 surface
    llava.py:25-51 was written against (see module docstring)."""

    @property
    def language_model(self):
        if "_lm_view" not in self.__dict__:
            object.__setattr__(
                self, "_lm_view",
                _CausalLMView(self.model.language_model, self.lm_head))
        return self._lm_view

    def _merge_input_ids_with_image_features(
            self, image_features, inputs_embeds, input_ids, attention_mask,
            labels):
        mask = input_ids == self.config.image_token_index
        emb = inputs_embeds.clone()
        emb[mask] = image_features.reshape(
            -1, image_features.shape[-1]).to(emb.dtype)
        position_ids = (attention_mask.cumsum(-1) - 1).clamp_min(0)
        return emb, attention_mask, labels, position_ids


class LegacyOrderLlavaProcessor(transformers.LlavaProcessor):
    def __call__(self, text=None, images=None, **kw):
        out = super().__call__(images=images, text=text, **kw)
        if images is None and "pixel_values" not in out:
            # patched-in-driver for the llava.py:54 text-only crash
            out["pixel_values"] = None
        return out


def _tiny_hf_llava(vocab_size=64):
    """Tiny random HF llava (f32) + the matching devqa_tpu config — same
    geometry as tests/test_hf_parity.py::tiny_llava, vocab shared with
    the word tokenizer (ids < 36, BOS=62, <image>=63)."""
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig

    vision = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=IMG_SIZE, patch_size=7)
    text = LlamaConfig(
        vocab_size=vocab_size, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=96, tie_word_embeddings=False)
    hf_cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG_ID,
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    hf_cfg.ignore_index = -100  # removed in 4.57; llava.py:49 reads it
    torch.manual_seed(3)
    model = Llava436(hf_cfg).eval().requires_grad_(False)

    ours = vllm_mod.VLLMConfig(
        name="tiny-llava", bridge="mlp", img_slot_pos=1,
        n_img_tokens=N_PATCH,
        vit=ViTConfig(image_size=IMG_SIZE, patch_size=7, d_model=32,
                      n_layers=3, n_heads=2, d_ffn=64,
                      activation="quick_gelu", fused_qkv=False,
                      pre_layernorm=True),
        qformer=None,
        decoder=dec.DecoderConfig(
            arch="llama", vocab_size=vocab_size, d_model=16, n_layers=2,
            n_heads=2, d_ffn=32, max_positions=96, activation="silu",
            tie_word_embeddings=False, norm_eps=text.rms_norm_eps),
        vit_feature_layer=2,
    )
    return model, ours


@pytest.fixture(scope="module")
def lrig(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("llava_oracle"))
    hf_tok = _make_llava_tokenizer()
    model, cfg = _tiny_hf_llava()
    img = _write_pngs(tmp)

    from transformers import CLIPImageProcessor

    from editor.vllms_for_edit.base import BaseVLLMForEdit
    from editor.vllms_for_edit.llava.llava import LlavaForEdit

    proc = LegacyOrderLlavaProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": IMG_SIZE},
            crop_size={"height": IMG_SIZE, "width": IMG_SIZE}),
        tokenizer=hf_tok, patch_size=7,
        vision_feature_select_strategy="default", image_token="<image>",
        num_additional_image_tokens=1)
    ref_vllm = LlavaForEdit.__new__(LlavaForEdit)
    ref_vllm.model = model
    ref_vllm.processor = proc
    # auto_add_img_special_token=True: LlavaForEdit's default — prompts
    # gain the '<image>\n' prefix (base.py:51-52)
    BaseVLLMForEdit.__init__(ref_vllm, model, "cpu", True)

    params = convert_hf.convert_llava(
        convert_hf.torch_state_dict_to_numpy(model), cfg)
    vllm = JaxVLLM(cfg, params, HFTokenizerAdapter(hf_tok),
                   FileImageProvider(IMG_SIZE), bucket_multiple=8)

    our_cases, ref_cases = _make_cases(img)
    return dict(tmp=tmp, hf_tok=hf_tok, model=model, cfg=cfg,
                ref_vllm=ref_vllm, vllm=vllm, img=img,
                our_cases=our_cases, ref_cases=ref_cases)


class TestLlavaXymParity:
    def test_image_batch(self, lrig):
        """Batched image xym: the reference tokenizes '<image>\\n'-prefixed
        strings for labels (base.py:95-104) while we tokenize the bare
        prompt — after the min_prompt slice both produce identical label
        rows; vt_range is the mid-sequence [1, 1+16)."""
        prompts = ["what animal is shown in the picture here",
                   "who wrote the book"]
        targets = ["zebra", "lion red"]
        imgs = [lrig["img"][0], lrig["img"][1]]
        (x, vt), y, m = lrig["ref_vllm"].prompts_imgs_target_to_xym(
            prompts, imgs, targets)
        assert list(vt) == [1, 1 + N_PATCH]
        ids, lab, msk, _ = build_xym(
            HFTokenizerAdapter(lrig["hf_tok"]), prompts, targets)
        np.testing.assert_array_equal(lab, y.numpy())
        np.testing.assert_array_equal(msk, m.numpy())
        # ref embeds: [BOS | img×16 | words...]; ours: ids + spliced block
        assert x["inputs_embeds"].shape[1] == ids.shape[1] + N_PATCH

    def test_text_only_crash_is_reference_behavior(self, lrig):
        """UNPATCHED llava.py:54 crashes on text-only input — the bug the
        LegacyOrderLlavaProcessor patch documents (PARITY.md)."""
        from transformers import BatchFeature

        proc = lrig["ref_vllm"].processor

        class Unpatched:
            def __call__(self, text=None, images=None, **kw):
                out = transformers.LlavaProcessor.__call__(
                    proc, images=images, text=text, **kw)
                if images is None:
                    out = BatchFeature(
                        {k: v for k, v in out.items()
                         if k != "pixel_values"})
                return out

            def __getattr__(self, k):
                return getattr(proc, k)

        ref = lrig["ref_vllm"]
        orig = ref.processor
        ref.processor = Unpatched()
        try:
            with pytest.raises(AttributeError):
                ref.prompts_imgs_target_to_xym(
                    ["who wrote the book"], [None], ["lion"])
        finally:
            ref.processor = orig

    def test_text_only_batch_patched(self, lrig):
        """With the documented patch, text-only labels match ours."""
        prompts = ["who wrote the book about the sky"]
        targets = ["lion"]
        (x, vt), y, m = lrig["ref_vllm"].prompts_imgs_target_to_xym(
            prompts, [None], targets)
        assert vt is None
        ids, lab, msk, _ = build_xym(
            HFTokenizerAdapter(lrig["hf_tok"]), prompts, targets)
        np.testing.assert_array_equal(lab, y.numpy())
        np.testing.assert_array_equal(msk, m.numpy())
        assert tuple(x["inputs_embeds"].shape)[:2] == ids.shape


def _ref_probe_acc(ref_vllm, prompt, image, target):
    """accuracy_and_prediction (vllm_editor_eval.py:143-150), pre-edit."""
    (x, vt), y, m = ref_vllm.prompts_imgs_target_to_xym(
        [prompt], [image], [target])
    logits = ref_vllm.get_llm_outpt(x, vt).logits.detach()
    pre_y = torch.softmax(logits, -1).argmax(-1)[:, -y.shape[1]:]
    acc = float(((pre_y == y) * m).sum() / m.sum())
    return acc, pre_y[m.to(bool)].numpy(), logits.numpy()


class TestLlavaProbeParity:
    def test_pre_edit_accuracy_and_logits(self, lrig):
        """Every probe of case 0 (incl. text-only locality rows via the
        documented patch): accuracy, masked argmax ids AND raw logits
        match the reference executable on the mid-sequence layout."""
        vllm = lrig["vllm"]
        case = lrig["our_cases"][0]
        n_img_probes = 0
        for s in case_probe_specs(case):
            acc_ref, pred_ref, logits_ref = _ref_probe_acc(
                lrig["ref_vllm"], s.prompt, s.image, s.target)
            n_img_probes += s.image is not None
            qb = vllm.encode_queries([s.prompt], [s.image], [s.target])
            logits = vllm.logits(qb.embeds, qb.kv_valid)
            acc, pred = token_accuracy(logits, qb.label_ids, qb.label_masks)
            assert float(acc[0]) == pytest.approx(acc_ref, abs=1e-6), s
            ours_pred = np.asarray(pred)[np.asarray(qb.label_masks, bool)]
            np.testing.assert_array_equal(ours_pred, pred_ref)
            valid = np.asarray(qb.kv_valid[0], bool)
            ours_valid = np.asarray(logits[0], np.float32)[valid]
            assert ours_valid.shape == logits_ref[0].shape
            np.testing.assert_allclose(ours_valid, logits_ref[0],
                                       rtol=2e-3, atol=2e-3)
        assert n_img_probes >= 6  # the grid exercises the image layout


def _tiny_ref_liveedit_cfg():
    from editor.vllm_editors.liveedit.liveedit import \
        LiveEditConfig as RefCfg

    return RefCfg(
        edit_model_name="tiny-llava",
        retrieval_editor=RefCfg.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        train_cfg=RefCfg.TrainConfig(
            lr=1e-4, lr_cut_it=[10], lr_cut_rate=0.1, rel_lambda=1,
            gen_lambda=1, loc_lambda=1, soft_routing_lambda=1,
            hard_routing_lambda=1),
        llm_mid_dim=16,
        # 4.57 registered-module path (nethook.get_module walks
        # named_modules, so the 4.36 'language_model.model.layers.{}'
        # property path would not resolve; same submodule either way)
        llm_layer_tmp="model.language_model.layers.{}",
        edit_layer_i=1)


def _tiny_our_liveedit_cfg():
    return LiveEditConfig(
        edit_model_name="tiny-llava",
        retrieval_editor=LiveEditConfig.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        llm_mid_dim=16, edit_layer_i=1, max_edits=8)


@pytest.fixture(scope="module")
def llava_editors(lrig):
    """Reference LiveEdit (random torch init) on the llava wrapper + our
    LiveEdit loaded from its exact 'Best' checkpoint."""
    from editor.vllm_editors.liveedit.liveedit import LiveEdit as RefEdit

    torch.manual_seed(21)
    ref_ed = RefEdit(lrig["ref_vllm"], _tiny_ref_liveedit_cfg(),
                     device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(lrig["tmp"], "Best")
    torch.save(ckpt, path)

    our_ed = LiveEdit(lrig["vllm"], _tiny_our_liveedit_cfg(), seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestLlavaLiveEditOracle:
    def test_single_edit_mean_results(self, lrig, llava_editors, tmp_path):
        """LiveEdit single-edit evaluation on the llava layout: every
        mean_results acc identical — vt-rep extraction at [1,17), routing
        and residual application on a mid-sequence slot all pinned."""
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = llava_editors
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(lrig["ref_cases"]), "oracle",
            str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(lrig["our_cases"]), "oracle",
            str(tmp_path / "ours"))
        our_ev.evaluate_single_edit()
        with open(os.path.join(our_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            our_mean = json.load(f)

        ref_accs = _acc_leaves(ref_mean)
        our_accs = _acc_leaves(our_mean)
        assert set(ref_accs) <= set(our_accs)
        for k, v in ref_accs.items():
            assert our_accs[k] == pytest.approx(v, abs=1e-4), k

    def test_sequential_edit_total_mean(self, lrig, llava_editors,
                                        tmp_path):
        """edit_n=3: pool accumulation + routing over 3 live experts whose
        queries came from mid-sequence vt reps."""
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = llava_editors
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(lrig["ref_cases"]), "oracle-seq",
            str(tmp_path / "ref"))
        ref_ev.evaluate_sequential_edit(edit_n=3)
        with open(os.path.join(ref_ev.result_dir, "sequential_edit_3",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)["total_mean"]

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(lrig["our_cases"]), "oracle-seq",
            str(tmp_path / "ours"))
        our_ev.evaluate_sequential_edit(edit_n=3)
        with open(os.path.join(our_ev.result_dir, "sequential_edit_3",
                               "mean_results.json")) as f:
            our_mean = json.load(f)["total_mean"]

        ref_accs = _acc_leaves(ref_mean)
        our_accs = _acc_leaves(our_mean)
        assert set(ref_accs) <= set(our_accs)
        for k, v in ref_accs.items():
            assert our_accs[k] == pytest.approx(v, abs=1e-4), k
