"""Cross-framework oracle: run the reference's OWN torch implementation
and assert this framework produces identical metric numbers.

Drives /root/reference/DE-VQA's executable code — ``BLIP2OPTForEdit``
(editor/vllms_for_edit/{base.py,blip2/blip2.py}), ``LiveEdit``
(editor/vllm_editors/liveedit/{liveedit.py,modules.py}) and
``VLLMEditorEvaluation`` (evaluation/vllm_editor_eval.py) — on a tiny
random HF BLIP-2 on CPU, with a shared word-level tokenizer and real PNG
image files, then runs this framework on the SAME weights (via
core/convert_hf.py + editors/convert_reference.py), the SAME tokenizer
and the SAME records, and compares:

  1. xym label semantics (label ids / masks / embed layout),
  2. per-probe pre-edit logits, argmax predictions and accuracy,
  3. LiveEdit single-edit evaluation: every mean_results number,
  4. LiveEdit sequential-edit evaluation (pool accumulation + routing
     with multiple live experts): total_mean numbers.

This is the strongest quality-parity evidence available without
pretrained checkpoints: the reference is executed as an oracle (not
re-derived from its source), so any drift in tokenization, label
construction, probe accuracy math, editor routing/residual application
or harness aggregation fails loudly here.
"""
import copy
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
    sys.path.append(REF)  # reference top-level pkgs: editor/dataset/evaluation

import jax
import jax.numpy as jnp

from devqa_tpu.core import convert_hf, decoder as dec, vllm as vllm_mod
from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.core.qformer import QFormerConfig
from devqa_tpu.core.tokenizer import HFTokenizerAdapter
from devqa_tpu.core.vit import ViTConfig
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import FileImageProvider
from devqa_tpu.data.schema import BaseVLLMEditData, TestCase
from devqa_tpu.data.xym import build_xym
from devqa_tpu.editors.convert_reference import load_reference_editor_ckpt
from devqa_tpu.editors.liveedit import LiveEdit, LiveEditConfig
from devqa_tpu.eval.harness import EditorEvaluation, case_probe_specs

IMG_SIZE = 28

WORDS = [
    "what", "which", "animal", "color", "is", "the", "shown", "in",
    "picture", "near", "tree", "river", "answer", "zebra", "lion", "red",
    "blue", "green", "who", "wrote", "book", "about", "sky", "this",
    "a", "big", "small", "cat", "dog", "bird", "it", "here",
]


def _make_tokenizer():
    """Word-level HF tokenizer built offline (no downloads): the SAME
    object drives the reference's ``tokenizer(text, return_tensors='pt')``
    calls and our HFTokenizerAdapter."""
    from tokenizers import Tokenizer as RawTok
    from tokenizers import models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2}
    for w in WORDS:
        vocab[w] = len(vocab)
    raw = RawTok(models.WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.Whitespace()
    return PreTrainedTokenizerFast(
        tokenizer_object=raw, pad_token="<pad>", unk_token="<unk>",
        eos_token="</s>")


def _tiny_hf_blip2(vocab_size=64):
    """Tiny random HF BLIP-2 (f32) + the matching devqa_tpu config —
    same geometry as tests/test_hf_parity.py::tiny_blip2."""
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)

    vision = Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=IMG_SIZE, patch_size=7)
    qformer = Blip2QFormerConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, encoder_hidden_size=32,
        cross_attention_frequency=2)
    text = OPTConfig(
        vocab_size=vocab_size, hidden_size=16, ffn_dim=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=64, do_layer_norm_before=True,
        word_embed_proj_dim=16)
    cfg = Blip2Config.from_vision_qformer_text_configs(
        vision, qformer, text, num_query_tokens=4)
    torch.manual_seed(7)
    model = Blip2ForConditionalGeneration(cfg).eval().requires_grad_(False)

    ours = vllm_mod.VLLMConfig(
        name="tiny-blip2", bridge="qformer", img_slot_pos=0, n_img_tokens=4,
        vit=ViTConfig(image_size=IMG_SIZE, patch_size=7, d_model=32,
                      n_layers=2, n_heads=2, d_ffn=64, fused_qkv=True,
                      pre_layernorm=False),
        qformer=QFormerConfig(d_model=24, n_layers=2, n_heads=2, d_ffn=48,
                              n_query_tokens=4, encoder_width=32,
                              cross_attention_frequency=2),
        decoder=dec.DecoderConfig(
            arch="opt", vocab_size=vocab_size, d_model=16, n_layers=2,
            n_heads=2, d_ffn=32, max_positions=64, activation="relu",
            tie_word_embeddings=True),
    )
    return model, ours


def _write_pngs(tmp, n=10):
    from PIL import Image

    rng = np.random.default_rng(11)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, (IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
        p = os.path.join(tmp, "img_%d.png" % i)
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _make_cases(img):
    """Three full-probe-grid cases. Field names match both frameworks'
    record structure (dataset/vllm.py:10-37 == data/schema.TestCase)."""

    def case(i):
        w = WORDS
        req = {"prompt": "what animal is shown in the picture %s" % w[i],
               "image": img[i], "target_new": "zebra %s" % w[i + 1]}
        gen = {
            "text_rephrase": [{"prompt": "which animal is in this %s" % w[i],
                               "image": img[i], "target": "zebra %s" % w[i + 1]}],
            "image_rephrase": [{"prompt": req["prompt"],
                                "image": img[i + 3],
                                "target": "zebra %s" % w[i + 1]}],
        }
        loc = {
            "text_loc": [{"prompt": "who wrote the book about the %s" % w[i],
                          "image": None, "target": "lion"}],
            "t1i4": [{"prompt": req["prompt"], "image": None,
                      "target": "red %s" % w[i]}],
            "t2i4": [{"prompt": "which %s is near the river" % w[i],
                      "image": None, "target": "blue"}],
            "t1i2": [{"prompt": req["prompt"], "image": img[i + 4],
                      "target": "red"}],
            "t1i3": [{"prompt": req["prompt"], "image": img[i + 5],
                      "target": "green"}],
            "t2i1": [{"prompt": "which %s is near the river" % w[i],
                      "image": img[i], "target": "blue %s" % w[i]}],
            "t2i2": [{"prompt": "which %s is near the river" % w[i],
                      "image": img[i + 4], "target": "blue"}],
            "t3i1": [{"prompt": "what color is the sky here", "image": img[i],
                      "target": "blue"}],
            "t3i3": [{"prompt": "what color is the sky here",
                      "image": img[i + 5], "target": "blue"}],
        }
        return req, gen, loc

    ours, theirs = [], []
    for i in range(3):
        req, gen, loc = case(i)
        ours.append(TestCase(requests=[dict(req)],
                             generality=copy.deepcopy(gen),
                             locality=copy.deepcopy(loc)))
        theirs.append({"requests": [dict(req)],
                       "generality": copy.deepcopy(gen),
                       "locality": copy.deepcopy(loc)})
    return ours, theirs


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("oracle"))
    hf_tok = _make_tokenizer()
    model, cfg = _tiny_hf_blip2()
    img = _write_pngs(tmp)

    # --- reference wrapper (skip from_pretrained: build the processor
    # from local parts, then run the REAL __init__ tail) ---
    from transformers import Blip2Processor, BlipImageProcessor

    from editor.vllms_for_edit.base import BaseVLLMForEdit
    from editor.vllms_for_edit.blip2.blip2 import BLIP2OPTForEdit

    proc = Blip2Processor(
        image_processor=BlipImageProcessor(
            size={"height": IMG_SIZE, "width": IMG_SIZE}),
        tokenizer=hf_tok)
    ref_vllm = BLIP2OPTForEdit.__new__(BLIP2OPTForEdit)
    ref_vllm.model = model
    ref_vllm.processor = proc
    BaseVLLMForEdit.__init__(ref_vllm, model, "cpu", False)

    # --- our wrapper on the converted weights + the same tokenizer ---
    params = convert_hf.convert_blip2(
        convert_hf.torch_state_dict_to_numpy(model), cfg)
    vllm = JaxVLLM(cfg, params, HFTokenizerAdapter(hf_tok),
                   FileImageProvider(IMG_SIZE), bucket_multiple=8)

    our_cases, ref_cases = _make_cases(img)
    return dict(tmp=tmp, hf_tok=hf_tok, model=model, cfg=cfg,
                ref_vllm=ref_vllm, vllm=vllm, img=img,
                our_cases=our_cases, ref_cases=ref_cases)


class TestXymParity:
    def test_text_only_batch(self, rig):
        """Batched text-only xym: label ids/masks and the
        min_prompt_tok_n slice match base.py:75-109 bit-for-bit."""
        prompts = ["what animal is shown in the picture here",
                   "who wrote the book"]
        targets = ["zebra", "lion red"]
        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            prompts, [None, None], targets)
        assert vt is None
        ids, lab, msk, mpt = build_xym(
            HFTokenizerAdapter(rig["hf_tok"]), prompts, targets)
        np.testing.assert_array_equal(lab, y.numpy())
        np.testing.assert_array_equal(msk, m.numpy())
        # embed layout: [B, Ltext, d]
        assert tuple(x["inputs_embeds"].shape)[:2] == ids.shape

    def test_image_xym(self, rig):
        p, t = "what animal is shown in the picture", "zebra"
        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            [p], [rig["img"][0]], [t])
        assert list(vt) == [0, 4]
        ids, lab, msk, _ = build_xym(
            HFTokenizerAdapter(rig["hf_tok"]), [p], [t])
        np.testing.assert_array_equal(lab, y.numpy())
        np.testing.assert_array_equal(msk, m.numpy())
        assert x["inputs_embeds"].shape[1] == 4 + ids.shape[1]


def _ref_probe_acc(ref_vllm, prompt, image, target):
    """The reference harness's accuracy_and_prediction
    (vllm_editor_eval.py:143-150), pre-edit."""
    (x, vt), y, m = ref_vllm.prompts_imgs_target_to_xym(
        [prompt], [image], [target])
    logits = ref_vllm.get_llm_outpt(x, vt).logits.detach()
    pre_y = torch.softmax(logits, -1).argmax(-1)[:, -y.shape[1]:]
    acc = float(((pre_y == y) * m).sum() / m.sum())
    return acc, pre_y[m.to(bool)].numpy(), logits.numpy()


class TestProbeParity:
    def test_pre_edit_accuracy_and_logits(self, rig):
        """Every probe of case 0: accuracy, masked argmax ids AND raw
        logits match the reference executable."""
        vllm = rig["vllm"]
        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            acc_ref, pred_ref, logits_ref = _ref_probe_acc(
                rig["ref_vllm"], s.prompt, s.image, s.target)
            qb = vllm.encode_queries([s.prompt], [s.image], [s.target])
            logits = vllm.logits(qb.embeds, qb.kv_valid)
            acc, pred = token_accuracy(logits, qb.label_ids, qb.label_masks)
            assert float(acc[0]) == pytest.approx(acc_ref, abs=1e-6), s
            ours_pred = np.asarray(pred)[np.asarray(qb.label_masks, bool)]
            np.testing.assert_array_equal(ours_pred, pred_ref)
            # Raw logits on the valid region. Our layout keeps (masked)
            # vision slots even for text-only rows; mask-derived
            # positions make that equivalent to an absent prefix, so
            # select by kv_valid to align with the reference's dense
            # [V|text] / [text] layout.
            valid = np.asarray(qb.kv_valid[0], bool)
            ours_valid = np.asarray(logits[0], np.float32)[valid]
            assert ours_valid.shape == logits_ref[0].shape
            np.testing.assert_allclose(ours_valid, logits_ref[0],
                                       rtol=2e-3, atol=2e-3)


def _tiny_ref_liveedit_cfg():
    from editor.vllm_editors.liveedit.liveedit import \
        LiveEditConfig as RefCfg

    return RefCfg(
        edit_model_name="tiny-blip2",
        retrieval_editor=RefCfg.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        train_cfg=RefCfg.TrainConfig(
            lr=1e-4, lr_cut_it=[10], lr_cut_rate=0.1, rel_lambda=1,
            gen_lambda=1, loc_lambda=1, soft_routing_lambda=1,
            hard_routing_lambda=1),
        llm_mid_dim=16,
        llm_layer_tmp="language_model.model.decoder.layers.{}",
        edit_layer_i=1)


def _tiny_our_liveedit_cfg():
    return LiveEditConfig(
        edit_model_name="tiny-blip2",
        retrieval_editor=LiveEditConfig.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        llm_mid_dim=16, edit_layer_i=1, max_edits=8)


@pytest.fixture(scope="module")
def editors(rig):
    """Reference LiveEdit (random torch init) + our LiveEdit loaded from
    its exact state via the reference 'Best' checkpoint format."""
    from editor.vllm_editors.liveedit.liveedit import LiveEdit as RefEdit

    torch.manual_seed(21)
    ref_ed = RefEdit(rig["ref_vllm"], _tiny_ref_liveedit_cfg(), device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "Best")
    torch.save(ckpt, path)

    our_ed = LiveEdit(rig["vllm"], _tiny_our_liveedit_cfg(), seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


def _acc_leaves(d, prefix=""):
    """Flatten a mean_results dict to {path: value} keeping only the
    cross-framework-comparable numbers (acc; not edit_time)."""
    out = {}
    for k, v in d.items():
        p = "%s/%s" % (prefix, k)
        if isinstance(v, dict):
            out.update(_acc_leaves(v, p))
        elif isinstance(v, (int, float)) and k == "acc":
            out[p] = float(v)
    return out


def _ref_edit_data(cases):
    """Concrete BaseVLLMEditData (the ABC requires dataset_name)."""
    from dataset.vllm import BaseVLLMEditData as RefEditData

    class OracleData(RefEditData):
        def dataset_name(self):
            return "ORACLE"

    return OracleData(copy.deepcopy(cases), copy.deepcopy(cases))


class TestLiveEditOracle:
    def test_single_edit_mean_results(self, rig, editors, tmp_path):
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = editors
        ref_data_ns = _ref_edit_data(rig["ref_cases"])
        ref_ev = VLLMEditorEvaluation(
            ref_ed, ref_data_ns, "oracle", str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        import json

        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(rig["our_cases"]), "oracle",
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

    def test_post_edit_logits(self, rig, editors):
        """One edit, then the edited-query logits themselves (not just
        accs) match: routing + fused-coefficient + relu-LoRA residual
        numerics cross-checked against the reference executable."""
        ref_ed, our_ed = editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        case = rig["our_cases"][0]
        req = case.requests[0]
        ref_ed.edit_one_piece(dict(req))
        our_ed.edit_one_piece(dict(req))
        # the reference applies the residual only when a query_range is
        # attached (the harness's get_eval_xym does this)
        s = [s for s in case_probe_specs(case) if s.kind == "reliability"][0]
        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            [s.prompt], [s.image], [s.target])
        x["query_range"] = (0, x["inputs_embeds"].shape[1] - m.shape[1] + 1)
        ref_logits = ref_ed.vllm.get_llm_outpt(x, vt).logits.detach().numpy()

        qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
        logits = np.asarray(our_ed.query_logits(qb), np.float32)
        valid = np.asarray(qb.kv_valid[0], bool)
        np.testing.assert_allclose(logits[0][valid], ref_logits[0],
                                   rtol=5e-3, atol=5e-3)
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()

    def test_sequential_edit_total_mean(self, rig, editors, tmp_path):
        """edit_n=3 accumulates all three edits before measuring: the
        routing sees m=3 live experts — pool semantics, hard routing vs
        prototype and soft fusion all cross-checked."""
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = editors
        ref_data_ns = _ref_edit_data(rig["ref_cases"])
        ref_ev = VLLMEditorEvaluation(
            ref_ed, ref_data_ns, "oracle-seq", str(tmp_path / "ref"))
        ref_ev.evaluate_sequential_edit(edit_n=3)
        import json

        with open(os.path.join(ref_ev.result_dir, "sequential_edit_3",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)["total_mean"]

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(rig["our_cases"]), "oracle-seq",
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


def _make_ref_mend(rig, tmp):
    """Reference MENDvl with perturbed aux nets + consistently-filled
    Welford buffers, saved as a 'Best' checkpoint (the state-dict format
    base.py:237-255 produces)."""
    from editor.vllm_editors.mend_vl.mend_vl import MENDvl as RefMEND
    from editor.vllm_editors.mend_vl.mend_vl import \
        MENDvlConfig as RefMENDCfg

    tmpl = "language_model.model.decoder.layers.%d.%s"
    ref_cfg = RefMENDCfg(
        edit_modules=[tmpl % (l, m) for l in (0, 1) for m in ("fc1", "fc2")],
        init_edit_lr=1e-2, edit_lr_lr=1e-4,
        aux_model=RefMENDCfg.AuxModelConfig(
            n_hidden=1, hidden_dim=0, init="id", norm=True, act="relu",
            rank=8, shared=True, lr=1e-6),
        edit_model_name="tiny-blip2",
        relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0)
    torch.manual_seed(33)
    ref_ed = RefMEND(rig["ref_vllm"], ref_cfg, device="cpu")
    gen = torch.Generator().manual_seed(5)
    for gt in ref_ed.aux_models.values():
        k = 5.0
        gt.k.fill_(k)
        gt.u_mean.copy_(torch.randn(gt.x_dim, generator=gen) * 0.1)
        gt.v_mean.copy_(torch.randn(gt.delta_dim, generator=gen) * 0.1)
        u_std = torch.rand(gt.x_dim, generator=gen) * 0.5 + 0.75
        v_std = torch.rand(gt.delta_dim, generator=gen) * 0.5 + 0.75
        gt.u_std.copy_(u_std)
        gt.v_std.copy_(v_std)
        # converter derives std from (s, k): keep them consistent
        gt.u_s.copy_(u_std ** 2 * (k - 1))
        gt.v_s.copy_(v_std ** 2 * (k - 1))
        for lin in gt.mlp.layers:
            lin.u.data.normal_(0, 0.05, generator=gen)
            lin.bias.data.normal_(0, 0.01, generator=gen)
            lin.mode_scale.weight.data.normal_(1.0, 0.05, generator=gen)
            lin.mode_shift.weight.data.normal_(0.0, 0.05, generator=gen)
    for i, p in enumerate(ref_ed.edit_lrs):
        p.data.fill_(1e-2 * (i + 1))
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(tmp, "BestMEND")
    torch.save(ckpt, path)
    return ref_ed, path


@pytest.fixture(scope="module")
def mend_editors(rig):
    """Reference MENDvl + ours loaded from its exact state via the
    'Best' checkpoint converter."""
    from devqa_tpu.editors.mend_vl import MENDvl, MENDvlConfig

    ref_ed, path = _make_ref_mend(rig, rig["tmp"])
    our_ed = MENDvl(rig["vllm"], MENDvlConfig(
        edit_model_name="tiny-blip2", edit_layers=(0, 1),
        edit_modules=("fc1", "fc2"), init_edit_lr=1e-2,
        aux_model=MENDvlConfig.AuxModelConfig(
            n_hidden=1, init="id", norm=True, act="relu", rank=8)))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestMENDvlOracle:
    """MEND_VL cross-framework parity: the torch-hook x/δ capture +
    GradientTransform + running-mean rank-1 deltas vs our vjp-probe
    capture (decoder_forward_with_linear_probes) on identical aux-net
    weights and Welford stats. The subtlest surface in the zoo: any
    drift in probe placement, normalization, mode indexing, outer-
    product layout or sequential averaging shows up in the logits."""

    def _our_probe_logits(self, our_ed, s):
        qb = our_ed.vllm.encode_queries([s.prompt], [s.image], [s.target])
        logits = np.asarray(our_ed.query_logits(qb), np.float32)
        valid = np.asarray(qb.kv_valid[0], bool)
        return logits[0][valid]

    def test_single_and_sequential_edit_logits(self, rig, mend_editors):
        ref_ed, our_ed = mend_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        case0, case1 = rig["our_cases"][0], rig["our_cases"][1]
        rel0 = [s for s in case_probe_specs(case0)
                if s.kind == "reliability"][0]
        rel1 = [s for s in case_probe_specs(case1)
                if s.kind == "reliability"][0]

        # edit 1
        ref_ed.edit_one_piece(dict(case0.requests[0]))
        our_ed.edit_one_piece(dict(case0.requests[0]))
        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            [rel0.prompt], [rel0.image], [rel0.target])
        ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
        ref_logits = ref_logits.detach().numpy()
        ours = self._our_probe_logits(our_ed, rel0)
        np.testing.assert_allclose(ours, ref_logits[0], rtol=5e-3, atol=5e-3)

        # edit 2 (sequential): capture runs through the edited model and
        # the running-mean delta accumulates across both edits
        ref_ed.edit_one_piece(dict(case1.requests[0]))
        our_ed.edit_one_piece(dict(case1.requests[0]))
        for s in (rel0, rel1):
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
            ref_logits = ref_logits.detach().numpy()
            ours = self._our_probe_logits(our_ed, s)
            np.testing.assert_allclose(ours, ref_logits[0],
                                       rtol=5e-3, atol=5e-3)

        # restore: both sides back to the pre-edit model
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        acc_ref, pred_ref, logits_ref = _ref_probe_acc(
            rig["ref_vllm"], rel0.prompt, rel0.image, rel0.target)
        ours = self._our_probe_logits(our_ed, rel0)
        np.testing.assert_allclose(ours, logits_ref[0], rtol=2e-3, atol=2e-3)


class TestFTvlOracle:
    """FT_VL cross-framework parity: same AdamW trajectory (lr, wd=0,
    per-step loss gate) on the same converted fc2 weight → same edited
    logits. Pins optimizer equivalence (torch AdamW vs optax.adamw) and
    the delta-apply/restore semantics (ft_vl.py:66-158)."""

    def test_edit_logits_and_restore(self, rig):
        from editor.vllm_editors.ft_vl.ft_vl import FTvl as RefFT
        from editor.vllm_editors.ft_vl.ft_vl import FTvlConfig as RefFTCfg

        from devqa_tpu.editors.ft_vl import FTvl, FTvlConfig

        tmp = "language_model.model.decoder.layers.{}.fc2.weight"
        ref_cfg = RefFTCfg(edit_model_name="tiny-blip2",
                           rewrite_module_tmp=tmp, layers=[1], num_steps=5,
                           lr=1e-3, weight_decay=0.0, norm_constraint=False,
                           batch_size=1)
        ref_ed = RefFT(rig["ref_vllm"], ref_cfg, device="cpu")
        our_ed = FTvl(rig["vllm"], FTvlConfig(
            edit_model_name="tiny-blip2", rewrite_module_tmp=tmp,
            layers=[1], num_steps=5, lr=1e-3, weight_decay=0.0,
            norm_constraint=None))

        case = rig["our_cases"][1]
        req = dict(case.requests[0])
        s = [p for p in case_probe_specs(case)
             if p.kind == "reliability"][0]

        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        ref_ed.edit_one_piece(dict(req))
        our_ed.edit_one_piece(dict(req))

        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            [s.prompt], [s.image], [s.target])
        ref_logits = ref_ed.vllm.get_llm_outpt(x, vt).logits.detach().numpy()
        qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
        logits = np.asarray(our_ed.query_logits(qb), np.float32)
        valid = np.asarray(qb.kv_valid[0], bool)
        np.testing.assert_allclose(logits[0][valid], ref_logits[0],
                                   rtol=5e-3, atol=5e-3)

        # restore: both sides return to the pre-edit model exactly
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        acc_ref, pred_ref, logits_ref = _ref_probe_acc(
            rig["ref_vllm"], s.prompt, s.image, s.target)
        qb2 = rig["vllm"].encode_queries([s.prompt], [s.image], [s.target])
        ours2 = np.asarray(
            rig["vllm"].logits(qb2.embeds, qb2.kv_valid), np.float32)
        valid2 = np.asarray(qb2.kv_valid[0], bool)
        np.testing.assert_allclose(ours2[0][valid2], logits_ref[0],
                                   rtol=2e-3, atol=2e-3)


# NOTE: class order below IS execution order. The reference SERAC/RECIPE
# editors WRAP the shared ref_vllm's get_llm_outpt / get_llm_input_embeds
# (and RECIPE's wrapper drops images), so editors that need the bare
# backbone (FT above) must run before their fixtures instantiate.


def _make_ref_serac(rig, tmp):
    """Reference SERACvl: tiny random HF BERT + OPT saved locally so the
    reference's ``from_pretrained`` constructor paths (modules.py:34,64)
    work offline; perturbed ResBlocks; saved as a 'Best' checkpoint."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel, OPTConfig, OPTForCausalLM

    bert_dir = os.path.join(tmp, "tiny-bert")
    cf_dir = os.path.join(tmp, "tiny-opt-cf")
    if not os.path.isdir(bert_dir):
        torch.manual_seed(41)
        BertModel(HFBertConfig(
            vocab_size=30, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=64)).save_pretrained(bert_dir)
        OPTForCausalLM(OPTConfig(
            vocab_size=32, hidden_size=20, ffn_dim=40, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=96,
            word_embed_proj_dim=20)).save_pretrained(cf_dir)

    from editor.vllm_editors.serac_vl.serac_vl import SERACvl as RefSERAC
    from editor.vllm_editors.serac_vl.serac_vl import \
        SERACvlConfig as RefSERACCfg

    ref_cfg = RefSERACCfg(
        edit_model_name="tiny-blip2",
        counterfact_model_path=cf_dir, counterfact_model_rep_dim=20,
        classifier_path=bert_dir, classifier_rep_dim=24,
        llm_hidden_size=16,
        train_config=RefSERACCfg.TrainConfig(
            lr=1e-4, relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0),
        llm_norm_path="language_model.model.decoder.final_layer_norm",
        llm_voc_path="language_model.lm_head")
    torch.manual_seed(43)
    ref_ed = RefSERAC(rig["ref_vllm"], ref_cfg, device="cpu")
    # Reference bug: restore_to_original_model sizes the pool
    # [0, classifier_rep_dim] (serac_vl.py:98) but get_sim_reps returns
    # 3×hidden since modules.py:48-50 pools mean|max|min — torch.cat on
    # the FIRST edit crashes in the reference itself (any dims). Patch
    # the pool width so the oracle can execute; our framework sizes the
    # pool 3×d_model from the start.
    orig_restore = ref_ed.restore_to_original_model

    def _restore():
        orig_restore()
        ref_ed.sim_reps_pool = torch.zeros([0, 3 * 24])

    ref_ed.restore_to_original_model = _restore
    ref_ed.restore_to_original_model()
    gen = torch.Generator().manual_seed(9)
    for rb in (ref_ed.classifier.classifier_proj,
               ref_ed.counterfact_model.counterfact_model_proj_in,
               ref_ed.counterfact_model.counterfact_model_proj_out):
        for lin in (rb.l_in, rb.l_mid, rb.l_out):
            lin.weight.data.normal_(0, 0.2, generator=gen)
            lin.bias.data.normal_(0, 0.05, generator=gen)
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(tmp, "BestSERAC")
    torch.save(ckpt, path)
    return ref_ed, path


@pytest.fixture(scope="module")
def serac_editors(rig):
    from devqa_tpu.core.bert import BertConfig
    from devqa_tpu.core.decoder import DecoderConfig
    from devqa_tpu.editors.serac_vl import SERACvl, SERACvlConfig

    ref_ed, path = _make_ref_serac(rig, rig["tmp"])
    our_ed = SERACvl(rig["vllm"], SERACvlConfig(
        edit_model_name="tiny-blip2", classifier_rep_dim=24,
        counterfact_model_rep_dim=20, llm_hidden_size=16,
        max_edits=8, max_edit_len=32,
        classifier=BertConfig(vocab_size=30, d_model=24, n_layers=2,
                              n_heads=2, d_ffn=48, max_positions=64),
        counterfact=DecoderConfig(
            arch="opt", vocab_size=32, d_model=20, n_layers=2, n_heads=2,
            d_ffn=40, max_positions=96, activation="relu",
            tie_word_embeddings=True)))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestSERACvlOracle:
    """SERAC_VL cross-framework parity: the BERT scope classifier
    (ResBlock proj → LN/32 → BertModel → mean|max|min pooling → dot/√d
    sims), the counterfactual-LM branch (proj_in → tiny OPT →
    post-final-norm → proj_out → frozen backbone head) and the ≥10
    routing, against the reference executable on identical weights."""

    def test_sim_reps_and_routing(self, rig, serac_editors):
        ref_ed, our_ed = serac_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        for c in rig["our_cases"][:2]:
            ref_ed.edit_one_piece(dict(c.requests[0]))
            our_ed.edit_one_piece(dict(c.requests[0]))
        # pool reps parity (classifier over full prompt+target rows)
        ref_pool = ref_ed.sim_reps_pool.detach().numpy()
        our_pool = np.asarray(our_ed.state["sim_reps"][:2], np.float32)
        np.testing.assert_allclose(our_pool, ref_pool, rtol=5e-3, atol=5e-3)

        # per-probe query reps + sims + branch decision parity
        from devqa_tpu.editors.serac_vl import classifier_reps, sim_matrix
        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            qr = (0, x["inputs_embeds"].shape[1] - m.shape[1] + 1)
            rep_ref = ref_ed.classifier.get_sim_reps(
                x["inputs_embeds"][:, qr[0]:qr[1]],
                x["attention_mask"][:, qr[0]:qr[1]])
            sim_ref = ref_ed.classifier.get_sim(
                rep_ref, ref_ed.sim_reps_pool).detach().numpy()

            qb = our_ed.vllm.encode_queries([s.prompt], [s.image], [s.target])
            qe = jnp.asarray(our_ed.vllm.query_end_positions(qb))
            idx = jnp.arange(qb.embeds.shape[1])[None, :]
            qmask = (idx < qe[:, None]) * qb.kv_valid
            rep = classifier_reps(our_ed.params, our_ed.cfg,
                                  qb.embeds, qmask)
            sim = np.asarray(
                sim_matrix(rep, our_ed.state["sim_reps"][:2]), np.float32)
            np.testing.assert_allclose(sim, sim_ref, rtol=5e-3, atol=5e-3)
            assert (sim.max() >= 10) == (sim_ref.max() >= 10), s

    def test_counterfact_branch_logits(self, rig, serac_editors):
        """Force the counterfactual branch on both sides and compare raw
        logits (independent of whether the sims cross the threshold)."""
        from devqa_tpu.editors.serac_vl import counterfact_logits
        ref_ed, our_ed = serac_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        case = rig["our_cases"][0]
        ref_ed.edit_one_piece(dict(case.requests[0]))
        our_ed.edit_one_piece(dict(case.requests[0]))
        s = [p for p in case_probe_specs(case) if p.kind == "generality"][0]
        (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
            [s.prompt], [s.image], [s.target])
        ref_logits = ref_ed.counterfact_model.forward_with_request_embd(
            [ref_ed.request_embed_pool[0]],
            [x["inputs_embeds"]])[0].detach().numpy()

        qb = our_ed.vllm.encode_queries([s.prompt], [s.image], [s.target])
        n = int(our_ed.state["count"])
        ours = counterfact_logits(
            our_ed.params, our_ed.cfg, our_ed.vllm.params, our_ed.vllm.cfg,
            our_ed.state["edit_embeds"][:n], our_ed.state["edit_mask"][:n],
            qb.embeds, qb.kv_valid)
        valid = np.asarray(qb.kv_valid[0], bool)
        np.testing.assert_allclose(np.asarray(ours, np.float32)[0][valid],
                                   ref_logits[0], rtol=5e-3, atol=5e-3)

    def test_single_edit_mean_results(self, rig, serac_editors, tmp_path):
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = serac_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(rig["ref_cases"]), "oracle-serac",
            str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        import json

        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)
        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(rig["our_cases"]), "oracle-serac",
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


def _make_tiny_roberta(tmp):
    """Tiny random HF RoBERTa (model + byte-level BPE tokenizer with no
    merges) saved locally so the reference KRM's ``from_pretrained``
    (recipe models.py:18-19) works offline."""
    import json

    from transformers import RobertaConfig, RobertaModel, RobertaTokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = os.path.join(tmp, "tiny-roberta")
    if os.path.isdir(d):
        return d
    os.makedirs(d)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in bytes_to_unicode().values():
        vocab.setdefault(ch, len(vocab))
    vocab["<mask>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = RobertaTokenizer(os.path.join(d, "vocab.json"),
                           os.path.join(d, "merges.txt"))
    tok.save_pretrained(d)
    torch.manual_seed(47)
    # the reference KRM hard-codes 768 (prot_tokens + 4*768 MLP widths,
    # models.py:20-25) regardless of krm_base_dim — the oracle encoder
    # must be 768-wide (kept tiny via 2 layers / 64-d FFN)
    RobertaModel(RobertaConfig(
        vocab_size=len(vocab), hidden_size=768, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=130)).save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def recipe_editors(rig):
    from transformers import RobertaTokenizer

    from devqa_tpu.core.bert import BertConfig
    from devqa_tpu.editors.recipe_vl import RECIPEvl, RECIPEvlConfig

    rob_dir = _make_tiny_roberta(rig["tmp"])

    from editor.vllm_editors.recipe_vl.recipe_vl import RECIPEvl as RefRECIPE
    from editor.vllm_editors.recipe_vl.recipe_vl import \
        RECIPEvlConfig as RefCfg

    ref_cfg = RefCfg(
        edit_model_name="tiny-blip2", model_hidden_size=16, retr_top_k=2,
        train=RefCfg.TrainConfig(
            krm_lr=1e-5, pt_lr=1e-5, relia_lambda=1.0, gen_lambda=1.0,
            loc_lambda=1.0, contra_lambda=1.0, query_knowledge_t=1.0,
            query_prototype_t=1.0, constra_hinge_scale=1.2,
            edit_hinge_scale=1.2),
        krm=RefCfg.KRMConfig(
            krm_base_path=rob_dir, krm_base_dim=768, prompt_token_n=2,
            knowledge_rep_dim=20, knowl_rep_prot_token_n=3))
    torch.manual_seed(51)
    ref_ed = RefRECIPE(rig["ref_vllm"], ref_cfg, device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "BestRECIPE")
    torch.save(ckpt, path)

    our_ed = RECIPEvl(
        rig["vllm"],
        RECIPEvlConfig(
            edit_model_name="tiny-blip2", model_hidden_size=16,
            retr_top_k=2, max_edits=8,
            krm=RECIPEvlConfig.KRMConfig(
                krm_base_dim=768, prompt_token_n=2, knowledge_rep_dim=20,
                knowl_rep_prot_token_n=3),
            encoder=BertConfig(
                vocab_size=ref_ed.knowl_rep_model.base_model.config.vocab_size,
                d_model=768, n_layers=2, n_heads=2, d_ffn=64,
                max_positions=128, type_vocab_size=1, norm_eps=1e-5)),
        text_tokenizer=RobertaTokenizer.from_pretrained(rob_dir))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestRECIPEvlOracle:
    """RECIPE_VL cross-framework parity: the RoBERTa-class KRM
    (pooler|mean|max|min reps, k/q MLPs, encoder-only prototype), the
    PromptTransformer, prototype-gated top-k retrieval and the
    prompt-block-prepended text-only forward, vs the reference
    executable on identical weights (incl. the RoBERTa pad-offset
    position-table shift in the converter)."""

    def test_pools_and_prototype(self, rig, recipe_editors):
        ref_ed, our_ed = recipe_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        proto_ref = ref_ed.knowl_reps_pool.detach().numpy()
        np.testing.assert_allclose(
            np.asarray(our_ed.state["knowl_reps"][:1], np.float32),
            proto_ref, rtol=5e-3, atol=5e-3)
        for c in rig["our_cases"][:2]:
            ref_ed.edit_one_piece(dict(c.requests[0]))
            our_ed.edit_one_piece(dict(c.requests[0]))
        np.testing.assert_allclose(
            np.asarray(our_ed.state["knowl_reps"][1:3], np.float32),
            ref_ed.knowl_reps_pool.detach().numpy()[1:], rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(our_ed.state["prompts"][1:3], np.float32),
            ref_ed.prompts_pool.detach().numpy()[1:], rtol=5e-3, atol=5e-3)

    def test_probe_logits(self, rig, recipe_editors):
        """Every probe of case 0 after two edits: retrieval decisions and
        final logits (prompt blocks prepended, images dropped) match."""
        ref_ed, our_ed = recipe_editors
        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
            ref_logits = ref_logits.detach().numpy()
            qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
            logits = np.asarray(our_ed.query_logits(qb), np.float32)
            valid = np.asarray(qb.kv_valid[0], bool)
            ours = logits[0][valid]
            # reference logits are sliced to the ORIGINAL row length
            # (recipe_vl.py:128-130), rows right-padded to batch max
            assert ours.shape[0] >= ref_logits.shape[1]
            np.testing.assert_allclose(ours[:ref_logits.shape[1]],
                                       ref_logits[0], rtol=5e-3, atol=5e-3)

    def test_single_edit_mean_results(self, rig, recipe_editors, tmp_path):
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = recipe_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(rig["ref_cases"]), "oracle-recipe",
            str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        import json

        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)
        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(rig["our_cases"]), "oracle-recipe",
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


def _make_tiny_st(rig):
    """Tiny local SentenceTransformer dir: a bare HF BERT + the shared
    word tokenizer (ST wraps bare dirs with mean pooling)."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    d = os.path.join(rig["tmp"], "tiny-st")
    if not os.path.isdir(d):
        torch.manual_seed(61)
        BertModel(HFBertConfig(
            vocab_size=len(rig["hf_tok"].get_vocab()), hidden_size=24,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=48,
            max_position_embeddings=64)).save_pretrained(d)
        rig["hf_tok"].save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def lte_editors(rig):
    from sentence_transformers import SentenceTransformer

    from devqa_tpu.editors.lte_vl import LTEvl, LTEvlConfig

    # Unwrap the shared ref_vllm first: the reference SERAC/RECIPE
    # fixtures above wrapped get_llm_outpt / get_llm_input_embeds, and
    # reference wrappers COMPOSE (each editor saves whatever fn is
    # current) — LTE must wrap the bare backbone.
    rv = rig["ref_vllm"]
    if hasattr(rv, "original_get_llm_outpt"):
        rv.get_llm_outpt = rv.original_get_llm_outpt
    if hasattr(rv, "original_get_llm_input_embeds"):
        rv.get_llm_input_embeds = rv.original_get_llm_input_embeds

    st_dir = _make_tiny_st(rig)
    st = SentenceTransformer(st_dir, device="cpu")

    from editor.vllm_editors.lte_vl.lte_vl import LTEvl as RefLTE
    from editor.vllm_editors.lte_vl.lte_vl import LTEvlConfig as RefLTECfg

    ref_cfg = RefLTECfg(
        edit_model_name="tiny-blip2",
        train_config=RefLTECfg.TrainConfig(
            lr=5e-6, relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0),
        fine_tune_modules_path="language_model",
        retriever_path=st_dir, retrieval_embed_dim=24, sim_threshold=0.3)
    ref_ed = RefLTE(rv, ref_cfg, device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "BestLTE")
    torch.save(ckpt, path)

    our_ed = LTEvl(
        rig["vllm"],
        LTEvlConfig(edit_model_name="tiny-blip2", retrieval_embed_dim=24,
                    sim_threshold=0.3, max_edits=8, max_prefix_len=32),
        sentence_encoder=lambda texts: st.encode(list(texts)))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestLTEvlOracle:
    """LTE_VL cross-framework parity: the '[Updated Information]…[Query]'
    prefix construction (WITH the edit image), SentenceTransformer
    cosine retrieval with the 0.3 threshold, prefix-prepended forward
    with post-prefix logit slicing, and the fine-tuned-language-model
    'Best' checkpoint mapping, vs the reference executable."""

    def test_retrieval_and_probe_logits(self, rig, lte_editors):
        ref_ed, our_ed = lte_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        for c in rig["our_cases"][:2]:
            ref_ed.edit_one_piece(dict(c.requests[0]))
            our_ed.edit_one_piece(dict(c.requests[0]))
        # retrieval pool + per-probe decisions
        np.testing.assert_allclose(
            our_ed.retr_pool[:2], ref_ed.text_retr_pool.detach().numpy(),
            rtol=5e-3, atol=5e-3)
        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            rr, rp, t_sim = ref_ed.retrieval([s.prompt])
            best, use = our_ed._retrieve([s.prompt])
            if rp[0] is not None:
                assert use[0] == 1
                assert int(best[0]) == int(t_sim[0].argmax())
            else:
                assert use[0] == 0
            # end-to-end logits through the wrapped forward
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            x["query_triple"] = (s.prompt, s.image, s.target)
            ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
            ref_logits = ref_logits.detach().numpy()
            qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
            logits = np.asarray(our_ed.query_logits(qb), np.float32)
            valid = np.asarray(qb.kv_valid[0], bool)
            np.testing.assert_allclose(logits[0][valid], ref_logits[0],
                                       rtol=5e-3, atol=5e-3)

    def test_single_edit_mean_results(self, rig, lte_editors, tmp_path):
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = lte_editors
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(rig["ref_cases"]), "oracle-lte",
            str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        import json

        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)
        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(rig["our_cases"]), "oracle-lte",
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

@pytest.fixture(scope="module")
def tp_editors(rig):
    from devqa_tpu.editors.tp_vl import TPvl, TPvlConfig

    # Unwrap the shared ref_vllm (LTE/RECIPE wrappers above would route
    # TP's training forwards through retrieval/prefix logic).
    rv = rig["ref_vllm"]
    if hasattr(rv, "original_get_llm_outpt"):
        rv.get_llm_outpt = rv.original_get_llm_outpt
    if hasattr(rv, "original_get_llm_input_embeds"):
        rv.get_llm_input_embeds = rv.original_get_llm_input_embeds

    # ONE locality sentence (>20 words, no '=' edges): the reference
    # samples a random corpus row per optimization step (tp_vl.py:171);
    # a single-row corpus makes the data stream identical on both sides
    # without seed plumbing.
    loc_text = " ".join(WORDS[:24])
    import editor.vllm_editors.tp_vl.tp_vl as ref_tp_mod
    ref_tp_mod.load_dataset = lambda *a, **k: {"text": [loc_text]}

    tmpl = "language_model.model.decoder.layers.{}.%s"

    def make_ref(num_steps):
        return ref_tp_mod.TPvl(rv, ref_tp_mod.TPvlConfig(
            edit_model_name="tiny-blip2", edit_layer=1, num_steps=num_steps,
            lr=1e-2, loss_a_lambda=1e-4, loss_m_lambda=1e-4, weight_decay=0,
            mlp_in_module_tmps=[tmpl % "fc1"],
            mlp_out_module_tmps=[tmpl % "fc2"]), device="cpu")

    def make_ours(num_steps):
        return TPvl(rig["vllm"], TPvlConfig(
            edit_model_name="tiny-blip2", edit_layer=1, num_steps=num_steps,
            lr=1e-2, loss_a_lambda=1e-4, loss_m_lambda=1e-4,
            weight_decay=0.0, max_edits=8), locality_texts=[loc_text])

    def cleanup(ref_ed):
        # the reference's register_hooks loses the fc2 pre-hook handle
        # (the variable is overwritten before append) — clear directly
        for h in ref_ed.hooks:
            h.remove()
        for l in list(ref_ed.edit_in_layers) + list(ref_ed.edit_out_layers):
            l._forward_hooks.clear()
            l._forward_pre_hooks.clear()

    return make_ref, make_ours, cleanup


class TestTPvlOracle:
    """TP_VL cross-framework parity, in three Adam-chaos-free layers:
    exact 1-step neuron trajectory, analytic loss-surface gradients at a
    post-step-1 state, and widened-MLP inference on injected neuron
    pools. Full multi-step trajectories are NOT comparable across
    frameworks: measured on the reference's own run, the step-2 gradient
    opposes step-1 (loss_a falls while loss_m rises), the Adam first
    moment crosses zero and its sign-normalized update turns ~1e-6
    float noise into ±lr divergence."""

    def test_one_step_trajectory(self, rig, tp_editors):
        make_ref, make_ours, cleanup = tp_editors
        ref_ed, our_ed = make_ref(1), make_ours(1)
        req = dict(rig["our_cases"][0].requests[0])
        ref_ed.edit_one_piece(dict(req))
        our_ed.edit_one_piece(dict(req))
        k_ref = ref_ed.edit_in_layers[0].extra_weights.detach().numpy()[:, 0]
        b_ref = ref_ed.edit_in_layers[0].extra_biases.detach().numpy()[0]
        v_ref = ref_ed.edit_out_layers[0].extra_weights.detach().numpy()[0]
        np.testing.assert_allclose(np.asarray(our_ed.state["K"][0]), k_ref,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(our_ed.state["B"][0]), b_ref,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(our_ed.state["V"][0]), v_ref,
                                   rtol=1e-4, atol=1e-6)
        cleanup(ref_ed)

    def test_loss_surface_gradients(self, rig, tp_editors):
        """Step-2 gradients at the (matching) post-step-1 state: pins
        loss_e through the patched forward + loss_a/loss_m masking and
        activation semantics, independent of optimizer chaos. Step 2 in
        the reference runs under its input_embeds shadowing bug (loss_e/
        loss_a on the locality text, labels right-aligned onto its tail
        — tp_vl.py:173-175 + base.py:113), so the comparison drives our
        faithful_loss_shadow surface (shadowed=True)."""
        import jax.numpy as jnp

        make_ref, make_ours, cleanup = tp_editors
        ref_ed, our_ed = make_ref(2), make_ours(2)
        req = dict(rig["our_cases"][0].requests[0])

        grads = []
        orig_step = torch.optim.Adam.step

        def rec_step(self, *a, **k):
            grads.append([p.grad.detach().clone().numpy()
                          for g in self.param_groups for p in g["params"]])
            return orig_step(self, *a, **k)

        torch.optim.Adam.step = rec_step
        try:
            ref_ed.edit_one_piece(dict(req))
        finally:
            torch.optim.Adam.step = orig_step
        cleanup(ref_ed)
        assert len(grads) == 2
        g2_kin, g2_b, g2_vout = grads[1]

        # our candidate state after step 1 == the reference's (the
        # one-step trajectory test above proves the equivalence)
        our_ed.edit_one_piece(dict(req))  # runs 2 steps; only prep reused
        new = {"k": jnp.zeros((our_ed.d_in,)), "b": jnp.zeros((1,)),
               "v": jnp.zeros((our_ed.d_out,))}
        ref1 = make_ref(1)
        ref1.edit_one_piece(dict(req))
        k1 = ref1.edit_in_layers[0].extra_weights.detach().numpy()[:, 0]
        b1 = ref1.edit_in_layers[0].extra_biases.detach().numpy()
        v1 = ref1.edit_out_layers[0].extra_weights.detach().numpy()[0]
        cleanup(ref1)
        new = {"k": jnp.asarray(k1), "b": jnp.asarray(b1),
               "v": jnp.asarray(v1)}
        our_ed.restore_to_original_model()  # empty pool = ref's state
        g = our_ed.neuron_loss_grads(dict(req), new, loc_index=0,
                                     shadowed=True)
        np.testing.assert_allclose(np.asarray(g["k"]), g2_kin[:, 0],
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g["b"]), g2_b,
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g["v"]), g2_vout[0],
                                   rtol=1e-3, atol=1e-6)

    def test_injected_pool_inference(self, rig, tp_editors):
        """Two handcrafted neurons injected into both frameworks' pools:
        every probe's logits match — pins the widened-MLP application
        (concat → decoder activation → value add) and restore."""
        make_ref, make_ours, cleanup = tp_editors
        ref_ed, our_ed = make_ref(1), make_ours(1)
        rng = np.random.default_rng(17)
        d = our_ed.d_in
        K = rng.normal(0, 0.5, (2, d)).astype(np.float32)
        B = rng.normal(0, 0.2, (2,)).astype(np.float32)
        V = rng.normal(0, 0.3, (2, d)).astype(np.float32)

        ref_ed.edit_in_layers[0].extra_weights = torch.tensor(K.T)
        ref_ed.edit_in_layers[0].extra_biases = torch.tensor(B)
        ref_ed.edit_out_layers[0].extra_weights = torch.tensor(V)
        import jax.numpy as jnp
        our_ed.state = {
            "K": our_ed.state["K"].at[:2].set(jnp.asarray(K)),
            "B": our_ed.state["B"].at[:2].set(jnp.asarray(B)),
            "V": our_ed.state["V"].at[:2].set(jnp.asarray(V)),
            "count": jnp.asarray(2, jnp.int32),
        }
        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
            ref_logits = ref_logits.detach().numpy()
            qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
            logits = np.asarray(our_ed.query_logits(qb), np.float32)
            valid = np.asarray(qb.kv_valid[0], bool)
            np.testing.assert_allclose(logits[0][valid], ref_logits[0],
                                       rtol=5e-3, atol=5e-3)
        # restore: both sides identical to the bare backbone
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        s = [p for p in case_probe_specs(case) if p.kind == "reliability"][0]
        acc_ref, pred_ref, logits_ref = _ref_probe_acc(
            rig["ref_vllm"], s.prompt, s.image, s.target)
        qb = rig["vllm"].encode_queries([s.prompt], [s.image], [s.target])
        ours = np.asarray(our_ed.query_logits(qb), np.float32)
        valid = np.asarray(qb.kv_valid[0], bool)
        np.testing.assert_allclose(ours[0][valid], logits_ref[0],
                                   rtol=2e-3, atol=2e-3)
        cleanup(ref_ed)


@pytest.fixture(scope="module")
def lemoe_editors(rig):
    from devqa_tpu.editors.lemoe_vl import LEMoEvl, LEMoEvlConfig

    rv = rig["ref_vllm"]
    if hasattr(rv, "original_get_llm_outpt"):
        rv.get_llm_outpt = rv.original_get_llm_outpt
    if hasattr(rv, "original_get_llm_input_embeds"):
        rv.get_llm_input_embeds = rv.original_get_llm_input_embeds

    import editor.vllm_editors.lemoe_vl.lemoe_vl as ref_mod
    d1, d2, r = 16, 32, 2
    base = "language_model.model.decoder.layers.1.%s"

    def make_ref(max_steps, batch_size=1, lr=1e-2):
        # batch_size=1: the reference's blip2 wrapper uses imgs[-1] for
        # the WHOLE batch (blip2.py:54-57) and then crashes concatenating
        # batch-1 vision tokens onto batch-N text embeds (blip2.py:49) —
        # LEMoE's batch-of-20 editing cannot run on the reference's
        # blip2 backbone at all; per-request experts are the comparable
        # configuration.
        # llm_layer_tmp uses the reference configs' literal value (no {}
        # placeholder): forward_from_mid_layer's skip/inject TraceDicts
        # all land on the layers CONTAINER, whose forward is never
        # invoked, so the "resume" degenerates to a full forward — the
        # code path the published numbers ran.
        return ref_mod.LEMoEvl(rv, ref_mod.LEMoEvlConfig(
            edit_model_name="tiny-blip2",
            edit_layer_inpt_path=base % "fc1",
            edit_layer_outpt_path=base % "fc2",
            edit_layer_i_of_inpt=1,
            llm_layer_tmp="language_model.model.decoder.layers",
            llm_hidden_dim1=d1, llm_hidden_dim2=d2, lora_rank=r,
            lora_edit_batch_size=batch_size, max_steps=max_steps,
            min_loss=0.0, lr=lr, topk=1), device="cpu")

    def make_ours(max_steps, batch_size=1, lr=1e-2):
        return LEMoEvl(rig["vllm"], LEMoEvlConfig(
            edit_model_name="tiny-blip2", edit_layer=1,
            llm_hidden_dim1=d1, llm_hidden_dim2=d2, lora_rank=r,
            lora_edit_batch_size=batch_size, max_steps=max_steps,
            min_loss=0.0, lr=lr, max_experts=8))

    # randn creation order of one expert (lemoe_vl.py:115-121)
    shapes = [(d1, r), (d2, r), (d2, r), (d1, r), (d1,),
              (d1, d1 // 4), (d1 // 4, d1)]

    def raw_init(seed, n_experts=1):
        rng = np.random.default_rng(seed)
        return [rng.normal(size=s).astype(np.float32)
                for _ in range(n_experts) for s in shapes]

    class PatchedRandn:
        """Route the reference's torch.randn calls to a preset queue."""

        def __init__(self, arrays):
            self.q = list(arrays)
            self.orig = None

        def __enter__(self):
            self.orig = torch.randn

            def fake(*size, **kw):
                if len(size) == 1 and isinstance(size[0], (list, tuple)):
                    size = tuple(size[0])
                t = torch.from_numpy(self.q.pop(0)).unsqueeze(0)
                assert tuple(t.shape) == tuple(size), (t.shape, size)
                return t
            torch.randn = fake
            return self

        def __exit__(self, *a):
            torch.randn = self.orig

    class PresetRng:
        """Our editor's rng.normal(size=...) from the same queue."""

        def __init__(self, arrays):
            self.q = list(arrays)

        def normal(self, size):
            a = self.q.pop(0)
            assert a.shape == tuple(size if isinstance(size, tuple) else (size,))
            return a

    # two SAME-token-length requests (the reference's gate mean and
    # training mean run over the unmasked padded batch; equal lengths
    # make its batch padding-free so both frameworks see the same math)
    reqs = [
        {"prompt": "what animal is shown in the picture",
         "image": rig["img"][0], "target_new": "zebra"},
        {"prompt": "which animal is near the big tree",
         "image": rig["img"][1], "target_new": "lion"},
    ]

    def cleanup(ref_ed):
        # the reference's hook_for_edit_layer never clears fc2's hooks
        # (its `if not x is x` guard is always False) and they accumulate
        # across editors — clear both directly
        layer = rv.model.language_model.model.decoder.layers[1]
        layer.fc1._forward_hooks.clear()
        layer.fc2._forward_hooks.clear()
        rv.get_llm_outpt = rv.original_get_llm_outpt

    return dict(make_ref=make_ref, make_ours=make_ours, raw_init=raw_init,
                PatchedRandn=PatchedRandn, PresetRng=PresetRng, reqs=reqs,
                cleanup=cleanup, d1=d1, d2=d2, r=r)


class TestLEMoEvlOracle:
    """LEMoE_VL cross-framework parity in the same Adam-chaos-free
    layers as TestTPvlOracle: exact 1-step expert trajectory from a
    shared random init, loss-surface gradients at that init, and
    injected-pool MoE inference (gating softmax + rank-factorized
    d1->d2->d1 expert math + fc2-output application)."""

    REF_KEYS = [("lora_cs1", "c1"), ("lora_rs1", "r1"), ("lora_cs2", "c2"),
                ("lora_rs2", "r2"), ("lora_ks", "k"), ("kws_down", "kd"),
                ("kws_up", "ku")]

    def test_one_step_trajectory(self, rig, lemoe_editors):
        """Two sequential per-request experts, one Adam step each: the
        second expert trains WITH the first routing in the gate, so this
        also pins sequential pool interaction."""
        L = lemoe_editors
        ref_ed, our_ed = L["make_ref"](1), L["make_ours"](1)
        raw = L["raw_init"](5, n_experts=2)
        with L["PatchedRandn"](raw):
            for rq in L["reqs"]:
                ref_ed.edit_one_piece(dict(rq))
        our_ed.rng = L["PresetRng"](raw)
        for rq in L["reqs"]:
            our_ed.edit_one_piece(dict(rq))
        assert int(our_ed.state["count"]) == 2
        for ref_name, our_name in self.REF_KEYS:
            ref_v = getattr(ref_ed, ref_name).detach().numpy()
            our_v = np.asarray(our_ed.state[our_name][:2])
            np.testing.assert_allclose(
                our_v, ref_v, rtol=1e-4, atol=1e-6, err_msg=our_name)
        # the routing keys are never optimized: must equal their inits
        np.testing.assert_allclose(np.asarray(our_ed.state["k"][0]),
                                   raw[4] * 0.01, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(our_ed.state["k"][1]),
                                   raw[11] * 0.01, rtol=1e-6)
        L["cleanup"](ref_ed)

    def test_loss_surface_gradients(self, rig, lemoe_editors):
        import jax.numpy as jnp

        L = lemoe_editors
        ref_ed, our_ed = L["make_ref"](2), L["make_ours"](2)
        raw = L["raw_init"](9)

        grads, orig_step = [], torch.optim.Adam.step

        def rec_step(self, *a, **k):
            grads.append([p.grad.detach().clone().numpy()
                          for g in self.param_groups for p in g["params"]])
            return orig_step(self, *a, **k)

        torch.optim.Adam.step = rec_step
        try:
            with L["PatchedRandn"](raw):
                ref_ed.edit_one_piece(dict(L["reqs"][0]))
        finally:
            torch.optim.Adam.step = orig_step
        L["cleanup"](ref_ed)
        assert len(grads) == 2
        # opt param order: new_c1, new_r1, new_c2, new_r2, kws_down, kws_up
        g1 = grads[0]

        new = {"c1": jnp.asarray(raw[0] * 0.01), "r1": jnp.asarray(raw[1] * 0.01),
               "c2": jnp.asarray(raw[2] * 0.01), "r2": jnp.asarray(raw[3] * 0.01),
               "kd": jnp.asarray(raw[5] * 0.01), "ku": jnp.asarray(raw[6] * 0.01)}
        new_k = jnp.asarray(raw[4] * 0.01)
        loss, g = our_ed.expert_loss_grads([dict(L["reqs"][0])], new, new_k)
        assert np.isfinite(float(loss))
        for our_name, ref_g in zip(["c1", "r1", "c2", "r2", "kd", "ku"], g1):
            np.testing.assert_allclose(
                np.asarray(g[our_name]), ref_g[0], rtol=1e-3, atol=1e-7,
                err_msg=our_name)

    def test_injected_pool_inference(self, rig, lemoe_editors):
        import jax.numpy as jnp

        L = lemoe_editors
        d1, d2, r = L["d1"], L["d2"], L["r"]
        ref_ed, our_ed = L["make_ref"](1), L["make_ours"](1)
        rng = np.random.default_rng(23)
        pool = {n: rng.normal(0, 0.3, (2,) + s).astype(np.float32)
                for n, s in [("c1", (d1, r)), ("r1", (d2, r)),
                             ("c2", (d2, r)), ("r2", (d1, r)), ("k", (d1,)),
                             ("kd", (d1, d1 // 4)), ("ku", (d1 // 4, d1))]}
        for ref_name, our_name in self.REF_KEYS:
            setattr(ref_ed, ref_name, torch.from_numpy(pool[our_name]))
        st = dict(our_ed.state)
        for n in pool:
            st[n] = our_ed.state[n].at[:2].set(jnp.asarray(pool[n]))
        st["count"] = jnp.asarray(2, jnp.int32)
        our_ed.state = st

        case = rig["our_cases"][0]
        for s in case_probe_specs(case):
            (x, vt), y, m = rig["ref_vllm"].prompts_imgs_target_to_xym(
                [s.prompt], [s.image], [s.target])
            ref_logits = rig["ref_vllm"].get_llm_outpt(x, vt).logits
            ref_logits = ref_logits.detach().numpy()
            qb = our_ed.build_query_batch([s.prompt], [s.image], [s.target])
            logits = np.asarray(our_ed.query_logits(qb), np.float32)
            valid = np.asarray(qb.kv_valid[0], bool)
            np.testing.assert_allclose(logits[0][valid], ref_logits[0],
                                       rtol=5e-3, atol=5e-3, err_msg=s.kind)
        # restore drops every expert on both sides
        ref_ed.restore_to_original_model()
        our_ed.restore_to_original_model()
        s = [p for p in case_probe_specs(case) if p.kind == "reliability"][0]
        acc_ref, pred_ref, logits_ref = _ref_probe_acc(
            rig["ref_vllm"], s.prompt, s.image, s.target)
        qb = rig["vllm"].encode_queries([s.prompt], [s.image], [s.target])
        ours = np.asarray(our_ed.query_logits(qb), np.float32)
        valid = np.asarray(qb.kv_valid[0], bool)
        np.testing.assert_allclose(ours[0][valid], logits_ref[0],
                                   rtol=2e-3, atol=2e-3)
        L["cleanup"](ref_ed)


# ---------------------------------------------------------------------------
# GRACE (text-LLM) oracle: reference easyeditor/models/grace/GRACE.py on a
# tiny HF OPT vs our GraceEditor on the converted weights + same tokenizer.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def grace_rig():
    # tiny LLaMA, not OPT: HF OPT flattens the decoder-layer MLP input
    # to [B*L, d] and the reference adapter's args[0][:, t, :] indexing
    # needs 3-D — reference GRACE only runs on GPT2/llama-shaped models.
    from transformers import LlamaConfig, LlamaForCausalLM

    from devqa_tpu.editors.llm.grace import GraceEditor, GRACEHyperParams
    from devqa_tpu.editors.llm.session import TextModel

    hf_tok = _make_tokenizer()
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(13)
    model = LlamaForCausalLM(cfg).eval().requires_grad_(False)

    ours_cfg = dec.DecoderConfig(
        arch="llama", vocab_size=64, d_model=16, n_layers=3, n_heads=2,
        d_ffn=32, max_positions=64, activation="silu",
        tie_word_embeddings=False, norm_eps=cfg.rms_norm_eps)
    params = convert_hf.convert_llama(
        convert_hf.torch_state_dict_to_numpy(model), ours_cfg)
    text_model = TextModel(params, ours_cfg, HFTokenizerAdapter(hf_tok),
                           bucket_multiple=8)

    # load the reference GRACE module standalone: the easyeditor package
    # __init__ chain pulls trainer deps (higher, omegaconf) that are not
    # installed — GRACE.py itself only needs torch/transformers
    import importlib.util
    import types as _types

    gdir = os.path.join(REF, "easyeditor/models/grace")
    if "refgrace" not in sys.modules:
        pkg = _types.ModuleType("refgrace")
        pkg.__path__ = [gdir]
        sys.modules["refgrace"] = pkg
        for name in ("utils", "GRACE"):
            spec = importlib.util.spec_from_file_location(
                f"refgrace.{name}", os.path.join(gdir, name + ".py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refgrace.{name}"] = mod
            spec.loader.exec_module(mod)
    ref_grace_mod = sys.modules["refgrace.GRACE"]
    ref_tokenize = sys.modules["refgrace.utils"].tokenize

    def make_ref(replacement="replace_all", n_iter=1, val_init="warm",
                 eps=1.0):
        class HP:  # GraceHyperParams surface the GRACE class reads
            inner_params = ["model.layers[1].mlp.down_proj.weight"]
            dist_fn = "euc"
            val_train = "none"
            num_pert = 1
            eps_expand = "coverage"
        hp = HP()
        hp.replacement = replacement
        hp.n_iter = n_iter
        hp.val_init = val_init
        hp.eps = eps
        hp.edit_lr = 1e-2
        ed = ref_grace_mod.GRACE(config=hp, model=model, device="cpu")
        return ed, hp

    def make_ours(replacement="replace_all", n_iter=1, val_init="warm",
                  eps=1.0):
        return GraceEditor(text_model, GRACEHyperParams(
            layer=1, eps=eps, edit_lr=1e-2, n_iter=n_iter,
            val_init=val_init, replacement=replacement, max_keys=16))

    def ref_edit(ed, hp, request):
        # the reference appends " <|endoftext|>" to the target
        # (grace/utils.py:70) — its pieces are deterministic unks under
        # the word-level tokenizer
        tokens = ref_tokenize(dict(request), tokenizer=hf_tok, device="cpu")
        ed.edit(config=hp, tokens=tokens)
        return tokens

    def our_request(request):
        # mirror the reference's eos suffix so spans + label rows match
        return {**request, "target_new": request["target_new"]
                + " <|endoftext|>"}

    def cleanup():
        # un-wrap the adapter: restore the original fc2 module
        mlp = model.model.layers[1].mlp
        if hasattr(mlp.down_proj, "layer"):
            mlp.down_proj = mlp.down_proj.layer

    return dict(model=model, hf_tok=hf_tok, text_model=text_model,
                make_ref=make_ref, make_ours=make_ours, ref_edit=ref_edit,
                our_request=our_request, cleanup=cleanup)


class TestGRACEOracle:
    """Three Adam-chaos-free layers: value-loss gradients at the warm
    init, the value-independent codebook trajectory over a sequence of
    edits (keys / eps / count — these never touch the trained value, so
    they are exactly comparable across many edits), and injected-codebook
    inference across the reference's three replacement modes."""

    REQS = [
        {"prompt": "what animal is shown here", "target_new": "zebra"},
        {"prompt": "what animal is shown here", "target_new": "zebra"},
        {"prompt": "who wrote the book", "target_new": "lion"},
        {"prompt": "which color is the sky near the river", "target_new": "blue"},
    ]

    def _codebook(self, ref_ed):
        ad = ref_ed.model.model.layers[1].mlp.down_proj
        return (ad.keys.detach().numpy(), ad.epsilons.detach().numpy()[:, 0],
                ad.values.detach().numpy())

    def test_codebook_trajectory(self, grace_rig):
        """4 edits: add, same-label retrain, different-label split, far
        add — keys, eps and count must match element-wise (the trained
        values are excluded: Adam sign-chaos, see TestTPvlOracle)."""
        G = grace_rig
        G["cleanup"]()
        ref_ed, hp = G["make_ref"](eps=1.0, n_iter=2)
        our_ed = G["make_ours"](eps=1.0, n_iter=2)
        for rq in self.REQS:
            G["ref_edit"](ref_ed, hp, rq)
            our_ed.edit(G["our_request"](rq))
        keys, eps, _ = self._codebook(ref_ed)
        n = keys.shape[0]
        assert int(our_ed.state["count"]) == n
        np.testing.assert_allclose(np.asarray(our_ed.state["keys"][:n]),
                                   keys, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(our_ed.state["eps"][:n]),
                                   eps, rtol=1e-4, atol=1e-7)
        # same-label second edit retrained in place: count < #edits
        assert n < len(self.REQS)
        G["cleanup"]()

    def test_value_loss_gradients(self, grace_rig):
        """First-iteration gradient of the edit NLL wrt the trained
        value, replace_all mode, at the shared warm init."""
        import jax.numpy as jnp
        from devqa_tpu.core import decoder as jdec

        G = grace_rig
        G["cleanup"]()
        ref_ed, hp = G["make_ref"](n_iter=2, val_init="warm")
        rq = self.REQS[0]

        grads, orig_step = [], torch.optim.Adam.step

        def rec_step(self, *a, **k):
            grads.append([p.grad.detach().clone().numpy()
                          for g in self.param_groups for p in g["params"]
                          if p.grad is not None])
            return orig_step(self, *a, **k)

        torch.optim.Adam.step = rec_step
        try:
            G["ref_edit"](ref_ed, hp, rq)
        finally:
            torch.optim.Adam.step = orig_step
        assert len(grads) == 2 and len(grads[0]) == 1
        g_ref = grads[0][0][0]  # [d_model] grad of the single value row

        our_ed = G["make_ours"](n_iter=2, val_init="warm")
        req = G["our_request"](rq)
        tb = our_ed.model.batch([req["prompt"]], [req["target_new"]])
        ids = jnp.asarray(tb.input_ids)
        mask = jnp.asarray(tb.attn_mask)
        labels = jnp.asarray(tb.label_ids)
        lmask = jnp.asarray(tb.label_masks)
        edit_tok = int(np.nonzero(np.asarray(tb.label_masks)[0])[0][0])

        from devqa_tpu.editors.llm.mlp_common import (
            capture_down_inputs, down_input_from_mlp_input, down_out,
            down_weight_bias)
        params, cfg = our_ed.model.params, our_ed.model.cfg
        embeds = jdec.embed_tokens(params, cfg, ids)
        _, xs = capture_down_inputs(params, cfg, embeds, mask, (1,))
        w, b = down_weight_bias(params, cfg, 1)
        warm = down_out(xs[1][0, edit_tok], w, b)
        repl = jnp.ones((ids.shape[1],))[None, :, None]

        def loss_fn(v):
            def fn(x1):
                q = down_input_from_mlp_input(params, cfg, 1, x1)
                return repl * (v - down_out(q, w, b))
            logits = jdec.decoder_apply(params, cfg, embeds, mask,
                                        mlp_residual=(1, fn))
            logp = jax.nn.log_softmax(logits, -1)
            picked = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            m = lmask.astype(jnp.float32)
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

        g_ours = np.asarray(jax.grad(loss_fn)(warm))
        np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-7)
        G["cleanup"]()

    def test_injected_codebook_inference(self, grace_rig):
        """Identical handcrafted codebooks on both sides: probe logits
        match for every replacement mode, including the stale
        edit-token-index query semantics."""
        import jax.numpy as jnp

        G = grace_rig
        rng = np.random.default_rng(31)
        d_ffn, d_model = 32, 16
        K = rng.normal(0, 1.0, (2, d_ffn)).astype(np.float32)
        V = rng.normal(0, 0.5, (2, d_model)).astype(np.float32)
        EPS = np.array([3.0, 7.0], np.float32)
        probes = [("what animal is near the tree", "zebra"),
                  ("who wrote this book about the sky", "lion")]

        for mode in ["replace_all", "replace_last", "replace_prompt"]:
            G["cleanup"]()
            ref_ed, hp = G["make_ref"](replacement=mode)
            ad = ref_ed.model.model.layers[1].mlp.down_proj
            ad.keys = torch.from_numpy(K)
            ad.values = torch.nn.Parameter(torch.from_numpy(V))
            ad.epsilons = torch.from_numpy(EPS[:, None])
            ad.key_labels = [torch.zeros(1), torch.zeros(1)]
            ad.key_id = 4
            # iter != 0: a reference adapter whose last edit ended on
            # iter 0 mutates its codebook on EVERY eval forward
            # (GRACE.py:163 runs outside training mode)
            ad.iter = 1
            ad.edit_label = torch.zeros(1)
            our_ed = G["make_ours"](replacement=mode)
            st = dict(our_ed.state)
            st["keys"] = st["keys"].at[:2].set(jnp.asarray(K))
            st["values"] = st["values"].at[:2].set(jnp.asarray(V))
            st["eps"] = st["eps"].at[:2].set(jnp.asarray(EPS))
            st["count"] = jnp.asarray(2, jnp.int32)
            st["edit_tok"] = jnp.asarray(4, jnp.int32)
            our_ed.state = st

            for prompt, target in probes:
                tokens = G["hf_tok"]([f"{prompt} {target}"],
                                     return_tensors="pt")
                with torch.no_grad():
                    ref_logits = ref_ed.model(
                        input_ids=tokens["input_ids"],
                        attention_mask=tokens["attention_mask"],
                    ).logits.numpy()
                tb = our_ed.model.batch([prompt], [target])
                ours = np.asarray(our_ed.logits(
                    jnp.asarray(tb.input_ids), jnp.asarray(tb.attn_mask)))
                n = tokens["input_ids"].shape[1]
                np.testing.assert_allclose(
                    ours[0][:n], ref_logits[0], rtol=2e-3, atol=2e-3,
                    err_msg=f"{mode}:{prompt}")
            G["cleanup"]()


# ---------------------------------------------------------------------------
# ROME oracle: reference easyeditor/models/rome on the tiny llama vs our
# apply_rome on the converted weights — full edited-weight comparison.
# ---------------------------------------------------------------------------

def _load_ref_easyeditor_pkg():
    """Load easyeditor's util/ and models/rome as a synthetic package —
    the top-level easyeditor __init__ chain pulls uninstalled deps
    (higher, omegaconf, timm, iopath, torchvision)."""
    import importlib
    import importlib.machinery
    import importlib.util

    if "refee.models.rome" in sys.modules:
        return sys.modules["refee.models.rome"]
    base = os.path.join(REF, "easyeditor")

    def load_ns(name):
        spec = importlib.machinery.ModuleSpec(name, None, is_package=True)
        m = importlib.util.module_from_spec(spec)
        m.__path__ = []
        sys.modules[name] = m

    def load_real(name, dirpath):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(dirpath, "__init__.py"),
            submodule_search_locations=[dirpath])
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    load_ns("refee")
    load_real("refee.util", os.path.join(base, "util"))
    load_ns("refee.models")
    return load_real("refee.models.rome", os.path.join(base, "models/rome"))


class TestROMEOracle:
    """Full-pipeline weight-delta parity: compute_u (template-averaged,
    normalized k*), compute_v (delta optimization incl. the reference's
    skip-last-backward loop and KL/weight-decay forms), and the bare-row
    rank-one solve. v_num_grad_steps=2 → exactly ONE Adam step, so the
    comparison is free of multi-step optimizer chaos (see
    TestTPvlOracle's docstring)."""

    def _hp(self, rome_pkg, steps):
        return rome_pkg.rome_hparams.ROMEHyperParams(
            layers=[1], fact_token="subject_last", v_num_grad_steps=steps,
            v_lr=5e-1, v_loss_layer=2, v_weight_decay=0.5,
            clamp_norm_factor=4.0, kl_factor=0.0625, mom2_adjustment=False,
            context_template_length_params=[],
            rewrite_module_tmp="model.layers.{}.mlp.down_proj",
            layer_module_tmp="model.layers.{}",
            mlp_module_tmp="model.layers.{}.mlp",
            attn_module_tmp="model.layers.{}.self_attn",
            ln_f_module="model.norm", lm_head_module="lm_head",
            mom2_dataset="none", mom2_n_samples=0, mom2_dtype="float32",
            alg_name="ROME", device=0, model_name="tiny", stats_dir="/tmp")

    @staticmethod
    def _cpu_device_patch():
        """Context manager mapping the reference's hardcoded
        f"cuda:{device}" strings to cpu (compute_v.py creates tensors
        and moves BatchEncodings there unconditionally)."""
        import contextlib

        from transformers import BatchEncoding

        def fix(d):
            return "cpu" if isinstance(d, str) and d.startswith("cuda") else d

        @contextlib.contextmanager
        def cm():
            o_tensor, o_zeros = torch.tensor, torch.zeros
            o_be_to = BatchEncoding.to

            def tensor(*a, **k):
                if "device" in k:
                    k["device"] = fix(k["device"])
                return o_tensor(*a, **k)

            def zeros(*a, **k):
                if "device" in k:
                    k["device"] = fix(k["device"])
                return o_zeros(*a, **k)

            def be_to(self, device, *a, **k):
                return o_be_to(self, fix(device), *a, **k)

            torch.tensor, torch.zeros = tensor, zeros
            BatchEncoding.to = be_to
            try:
                yield
            finally:
                torch.tensor, torch.zeros = o_tensor, o_zeros
                BatchEncoding.to = o_be_to
        return cm()

    @pytest.mark.parametrize("req", [
        {"prompt": "the picture near the {} is shown", "subject": "river",
         "target_new": "zebra"},
        {"prompt": "who wrote about the {}", "subject": "big tree",
         "target_new": "lion"},
    ])
    def test_weight_delta_parity(self, grace_rig, req):
        from devqa_tpu.editors.llm.rome import ROMEHyperParams, apply_rome
        from devqa_tpu.editors.llm.mlp_common import down_target
        from devqa_tpu.utils.surgery import get_target

        rome_pkg = _load_ref_easyeditor_pkg()
        rm = sys.modules["refee.models.rome.rome_main"]
        G = grace_rig
        G["cleanup"]()  # no GRACE adapter left on the shared model
        model, tok = G["model"], G["hf_tok"]
        rm.CONTEXT_TEMPLATES_CACHE = None  # reset the module-level cache

        w_name = "model.layers.1.mlp.down_proj.weight"
        w_before = dict(model.named_parameters())[w_name].detach().clone()

        hp = self._hp(rome_pkg, steps=2)
        with self._cpu_device_patch():
            edited, _ = rm.apply_rome_to_model(
                model, tok, [dict(req, prompt=req["prompt"].format(
                    req["subject"]))], hp,
                return_orig_weights=True, keep_original_weight=True)
        w_after = dict(model.named_parameters())[w_name].detach().clone()
        with torch.no_grad():
            dict(model.named_parameters())[w_name].copy_(w_before)
        ref_dw = (w_after - w_before).numpy()  # [d_model, d_ffn]
        assert np.abs(ref_dw).max() > 0

        ours_hp = ROMEHyperParams(
            layer=1, v_num_grad_steps=2, v_lr=5e-1, v_weight_decay=0.5,
            clamp_norm_factor=4.0, kl_factor=0.0625)
        our_req = dict(req, prompt=req["prompt"].format(req["subject"]))
        new_params = apply_rome(G["text_model"], our_req, ours_hp,
                                context_templates=["{}"])
        tgt = down_target(G["text_model"].cfg, 1)
        our_dw = np.asarray(get_target(new_params, tgt)) \
            - np.asarray(get_target(G["text_model"].params, tgt))
        np.testing.assert_allclose(our_dw.T, ref_dw, rtol=2e-3, atol=1e-7)

    def test_v_loss_gradients_at_nonzero_delta(self, grace_rig):
        """Pins the KL direction (KL(cur‖init), not the reverse) and the
        un-squared ‖δ‖ weight-decay — both have zero gradient at δ=0, so
        only a nonzero-δ comparison can distinguish them. The reference
        runs 3 iterations (2 steps); its recorded step-2 gradient is
        compared against our loss gradient at its recorded post-step-1
        delta (clamp disabled via a huge clamp_norm_factor)."""
        import jax.numpy as jnp
        from devqa_tpu.editors.llm.rome import (ROMEHyperParams,
                                                rome_v_loss_grads)

        rome_pkg = _load_ref_easyeditor_pkg()
        rm = sys.modules["refee.models.rome.rome_main"]
        G = grace_rig
        G["cleanup"]()
        rm.CONTEXT_TEMPLATES_CACHE = None

        hp = self._hp(rome_pkg, steps=3)
        hp.v_lr = 0.05
        hp.clamp_norm_factor = 1000.0
        req = {"prompt": "the picture near the {} is shown",
               "subject": "river", "target_new": "zebra"}

        recs, orig_step = [], torch.optim.Adam.step

        def rec_step(self, *a, **k):
            g = [p.grad.detach().clone().numpy()
                 for gr in self.param_groups for p in gr["params"]]
            out = orig_step(self, *a, **k)
            v = [p.detach().clone().numpy()
                 for gr in self.param_groups for p in gr["params"]]
            recs.append((g, v))
            return out

        w_name = "model.layers.1.mlp.down_proj.weight"
        w_before = dict(G["model"].named_parameters())[w_name].detach().clone()
        torch.optim.Adam.step = rec_step
        try:
            with self._cpu_device_patch():
                rm.apply_rome_to_model(
                    G["model"], G["hf_tok"],
                    [dict(req, prompt=req["prompt"].format(req["subject"]))],
                    hp, return_orig_weights=True, keep_original_weight=True)
        finally:
            torch.optim.Adam.step = orig_step
            with torch.no_grad():
                dict(G["model"].named_parameters())[w_name].copy_(w_before)
        assert len(recs) == 2
        delta1 = recs[0][1][0]     # post-step-1 delta (unclamped)
        g2_ref = recs[1][0][0]     # gradient at delta1

        ours_hp = ROMEHyperParams(
            layer=1, v_num_grad_steps=3, v_lr=0.05, v_weight_decay=0.5,
            clamp_norm_factor=1000.0, kl_factor=0.0625)
        our_req = dict(req, prompt=req["prompt"].format(req["subject"]))
        loss, g2 = rome_v_loss_grads(G["text_model"], our_req, ours_hp,
                                     jnp.asarray(delta1),
                                     context_templates=["{}"])
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(np.asarray(g2), g2_ref, rtol=1e-3,
                                   atol=1e-7)


class TestMEMITOracle:
    """Full-pipeline weight-delta parity over a 2-layer range and 2
    simultaneous requests: compute_z (layer-output delta, loss-layer tie,
    essence-KL row, skip-last-backward loop), compute_ks (template-mean
    keys), the bare-prompt cur_z capture, and the covariance-regularized
    spread solve — with the SAME synthetic mom2 matrix seeded into the
    reference's COV_CACHE and passed to ours. v_num_grad_steps=2 → one
    Adam step (see TestROMEOracle's docstring)."""

    REQS = [
        {"prompt": "the picture near the {} is shown", "subject": "river",
         "target_new": "zebra"},
        {"prompt": "who wrote about the {}", "subject": "tree",
         "target_new": "lion"},
    ]

    def _hp(self, memit_pkg, layers, steps):
        return memit_pkg.MEMITHyperParams(
            layers=list(layers), layer_selection="all",
            fact_token="subject_last", v_num_grad_steps=steps, v_lr=5e-1,
            v_loss_layer=2, v_weight_decay=0.5, clamp_norm_factor=4.0,
            kl_factor=0.0625, mom2_adjustment=True, mom2_update_weight=0.7,
            rewrite_module_tmp="model.layers.{}.mlp.down_proj",
            layer_module_tmp="model.layers.{}",
            mlp_module_tmp="model.layers.{}.mlp",
            attn_module_tmp="model.layers.{}.self_attn",
            ln_f_module="model.norm", lm_head_module="lm_head",
            mom2_dataset="none", mom2_n_samples=0, mom2_dtype="float32",
            alg_name="MEMIT", device=0, model_name="tiny", stats_dir="/tmp")

    @staticmethod
    def _cpu_patch_with_tensor_to():
        """ROME's patch + Tensor.to: memit_main moves the cached cov and
        deltas with tensor.to(f"cuda:{device}") (memit_main.py:49,283)."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            o_to = torch.Tensor.to

            def fix(d):
                return "cpu" if isinstance(d, str) and d.startswith("cuda") \
                    else d

            def t_to(self, *a, **k):
                a = tuple(fix(x) for x in a)
                if "device" in k:
                    k["device"] = fix(k["device"])
                return o_to(self, *a, **k)

            torch.Tensor.to = t_to
            try:
                with TestROMEOracle._cpu_device_patch():
                    yield
            finally:
                torch.Tensor.to = o_to
        return cm()

    @staticmethod
    def _tuple_layer_trace_patch():
        """compute_z.py was written for transformers<4.44, where decoder
        LAYER modules returned ``(hidden,)`` tuples: its edit_output_fn
        indexes ``cur_out[0][i, idx]`` and its loss reads
        ``tr[loss_layer].output[0]``. Installed transformers returns bare
        tensors from LlamaDecoderLayer — this patch swaps in a Trace
        subclass that presents decoder-layer outputs to edit/retention as
        1-tuples (the old semantics) while returning the bare tensor to
        the model. Non-layer modules (down_proj, mlp) are untouched, so
        ROME's compute_v and repr_tools behave identically."""
        import contextlib
        import re

        nh = sys.modules["refee.util.nethook"]

        class TupleLayerTrace(nh.Trace):
            def __init__(self, module, layer=None, retain_output=True,
                         retain_input=False, clone=False, detach=False,
                         retain_grad=False, edit_output=None, stop=False):
                retainer = self
                self.layer = layer
                mod = nh.get_module(module, layer) if layer is not None \
                    else module
                is_layer = bool(layer) and bool(
                    re.fullmatch(r"model\.layers\.\d+", layer))

                def hook(m, inputs, output):
                    wrap = is_layer and torch.is_tensor(output)
                    out = (output,) if wrap else output
                    if retain_input:
                        retainer.input = nh.recursive_copy(
                            inputs[0] if len(inputs) == 1 else inputs,
                            clone=clone, detach=detach, retain_grad=False)
                    if edit_output:
                        out = nh.invoke_with_optional_args(
                            edit_output, output=out, layer=self.layer)
                    if retain_output:
                        retainer.output = nh.recursive_copy(
                            out, clone=clone, detach=detach,
                            retain_grad=retain_grad)
                        if retain_grad:
                            out = nh.recursive_copy(retainer.output,
                                                    clone=True, detach=False)
                    if stop:
                        raise nh.StopForward()
                    return out[0] if wrap else out

                self.registered_hook = mod.register_forward_hook(hook)
                self.stop = stop

        @contextlib.contextmanager
        def cm():
            orig = nh.Trace
            nh.Trace = TupleLayerTrace
            try:
                yield
            finally:
                nh.Trace = orig
        return cm()

    def test_weight_delta_parity(self, grace_rig):
        from devqa_tpu.editors.llm.memit import (MEMITHyperParams,
                                                 apply_memit)
        from devqa_tpu.editors.llm.mlp_common import down_target
        from devqa_tpu.utils.surgery import get_target

        _load_ref_easyeditor_pkg()
        base = os.path.join(REF, "easyeditor")
        if "refee.models.memit" not in sys.modules:
            import importlib.util
            mdir = os.path.join(base, "models/memit")
            spec = importlib.util.spec_from_file_location(
                "refee.models.memit", os.path.join(mdir, "__init__.py"),
                submodule_search_locations=[mdir])
            m = importlib.util.module_from_spec(spec)
            sys.modules["refee.models.memit"] = m
            spec.loader.exec_module(m)
        memit_pkg = sys.modules["refee.models.memit"]
        mm = sys.modules["refee.models.memit.memit_main"]

        G = grace_rig
        G["cleanup"]()
        model, tok = G["model"], G["hf_tok"]
        # z_layer (= layers[-1]) must sit BELOW the loss layer: at the
        # last layer the subject-token hidden has no attention path to
        # the label positions, the z-gradient is mathematically zero and
        # Adam amplifies pure float noise (non-reproducible across
        # frameworks). Reference configs always place it mid-stack.
        layers = (0, 1)
        d_ffn = G["text_model"].cfg.d_ffn

        # identical synthetic mom2 on both sides (bypasses layer_stats —
        # get_cov reads COV_CACHE keyed by (name, layer), memit_main:248)
        rng = np.random.RandomState(7)
        covs = {}
        for l in layers:
            R = rng.randn(d_ffn, d_ffn).astype(np.float32)
            covs[l] = R @ R.T / d_ffn + np.eye(d_ffn, dtype=np.float32)
        name = model.config._name_or_path.replace("/", "_")
        mm.COV_CACHE.clear()
        for l in layers:
            mm.COV_CACHE[(name, f"model.layers.{l}.mlp.down_proj")] = \
                torch.from_numpy(covs[l])
        # two UNEQUAL groups pin compute_ks's mean-of-group-means: the
        # bare prompt carries 1/2 weight, not 1/3
        groups = [["{}"], ["it is {}", "here {}"]]
        mm.CONTEXT_TEMPLATES_CACHE = groups

        w_names = [f"model.layers.{l}.mlp.down_proj.weight" for l in layers]
        w_before = {w: dict(model.named_parameters())[w].detach().clone()
                    for w in w_names}
        reqs = [dict(r, prompt=r["prompt"].format(r["subject"]),
                     case_id=i) for i, r in enumerate(self.REQS)]

        hp = self._hp(memit_pkg, layers, steps=2)
        try:
            with self._cpu_patch_with_tensor_to(), \
                    self._tuple_layer_trace_patch():
                mm.apply_memit_to_model(
                    model, tok, [dict(r) for r in reqs], hp,
                    return_orig_weights=True, keep_original_weight=True)
            ref_dw = {w: (dict(model.named_parameters())[w].detach()
                          - w_before[w]).numpy() for w in w_names}
        finally:
            with torch.no_grad():
                for w in w_names:
                    dict(model.named_parameters())[w].copy_(w_before[w])
        for w in w_names:
            assert np.abs(ref_dw[w]).max() > 0

        ours_hp = MEMITHyperParams(
            layers=layers, v_num_grad_steps=2, v_lr=5e-1, v_loss_layer=2,
            v_weight_decay=0.5, clamp_norm_factor=4.0, kl_factor=0.0625,
            mom2_update_weight=0.7)
        new_params = apply_memit(
            G["text_model"], reqs, ours_hp,
            cov={l: jnp.asarray(covs[l]) for l in layers},
            context_templates=groups)
        for l, w in zip(layers, w_names):
            tgt = down_target(G["text_model"].cfg, l)
            our_dw = np.asarray(get_target(new_params, tgt)) \
                - np.asarray(get_target(G["text_model"].params, tgt))
            np.testing.assert_allclose(our_dw.T, ref_dw[w], rtol=5e-3,
                                       atol=2e-6, err_msg=f"layer {l}")


class TestKNOracle:
    """Integrated-gradients attribution, coarse/refined selection and the
    embedding-delta edit vs the vendored knowledge-neurons package run on
    the same weights/tokenizer. Pins the llama activation choice (raw
    pre-silu gate_proj output), the single-position patch, the
    linspace(0,1,steps) grid, the argmax-continuation multi-token loop,
    and the x2 single-token edit factor."""

    @staticmethod
    def _ref_kn(G):
        _load_ref_easyeditor_pkg()
        base = os.path.join(REF, "easyeditor")
        if "refee.models.kn" not in sys.modules:
            import importlib.util
            kdir = os.path.join(base, "models/kn")
            spec = importlib.util.spec_from_file_location(
                "refee.models.kn", os.path.join(kdir, "__init__.py"),
                submodule_search_locations=[kdir])
            m = importlib.util.module_from_spec(spec)
            sys.modules["refee.models.kn"] = m
            spec.loader.exec_module(m)
        kn_mod = sys.modules[
            "refee.models.kn.knowledge_neurons.knowledge_neurons"]
        return kn_mod.KnowledgeNeurons(
            G["model"], G["hf_tok"], model_type="llama", device="cpu")

    def test_attribution_and_selection_parity(self, grace_rig):
        from devqa_tpu.editors.llm.kn import (KNHyperParams,
                                              attribution_scores,
                                              coarse_neurons, refine_neurons)
        G = grace_rig
        G["cleanup"]()
        kn = self._ref_kn(G)
        prompt, gt = "the picture near the river is shown", "zebra lion"

        ref_scores = np.stack([
            kn.get_scores_for_layer(prompt, gt, layer_idx=l, batch_size=4,
                                    steps=8).detach().numpy()
            for l in range(3)])
        hp = KNHyperParams(steps=8, adaptive_threshold=0.3)
        ours = attribution_scores(G["text_model"], prompt, gt, hp)
        np.testing.assert_allclose(ours, ref_scores, rtol=5e-3, atol=1e-9)

        ref_coarse = kn.get_coarse_neurons(prompt, gt, batch_size=4, steps=8,
                                           adaptive_threshold=0.3, pbar=False)
        assert sorted(map(tuple, ref_coarse)) == sorted(
            coarse_neurons(ours, hp))

        prompts = [prompt, "which animal is shown near the river"]
        ref_refined = kn.get_refined_neurons(
            prompts, gt, p=0.5, batch_size=4, steps=8,
            coarse_adaptive_threshold=0.3, quiet=True, refine=True)
        hp_r = KNHyperParams(steps=8, adaptive_threshold=0.3, p=0.5,
                             refine=True)
        assert sorted(map(tuple, ref_refined)) == sorted(
            refine_neurons(G["text_model"], prompts, gt, hp_r))

    @pytest.mark.parametrize("target", ["zebra", "red lion"])
    def test_edit_delta_parity(self, grace_rig, target):
        from devqa_tpu.editors.llm.kn import KNHyperParams, apply_kn
        from devqa_tpu.editors.llm.mlp_common import down_target
        from devqa_tpu.utils.surgery import get_target

        G = grace_rig
        G["cleanup"]()
        kn = self._ref_kn(G)
        prompt, gt = "the picture near the river is shown", "zebra"
        hp = KNHyperParams(steps=8, adaptive_threshold=0.3)

        w_names = [f"model.layers.{l}.mlp.down_proj.weight"
                   for l in range(3)]
        w_before = {w: dict(G["model"].named_parameters())[w].detach()
                    .clone() for w in w_names}
        try:
            neurons = kn.get_refined_neurons(
                [prompt], gt, p=0.5, batch_size=4, steps=8,
                coarse_adaptive_threshold=0.3, quiet=True, refine=False)
            assert neurons
            kn.edit_knowledge(prompt, target=target, neurons=neurons,
                              undo_modification=False, quiet=True)
            ref_dw = {w: (dict(G["model"].named_parameters())[w].detach()
                          - w_before[w]).numpy() for w in w_names}
        finally:
            with torch.no_grad():
                for w in w_names:
                    dict(G["model"].named_parameters())[w].copy_(
                        w_before[w])

        req = {"prompt": prompt, "ground_truth": gt, "target_new": target}
        new_params = apply_kn(G["text_model"], req, hp)
        for l, w in enumerate(w_names):
            tgt = down_target(G["text_model"].cfg, l)
            our_dw = np.asarray(get_target(new_params, tgt)) \
                - np.asarray(get_target(G["text_model"].params, tgt))
            np.testing.assert_allclose(our_dw.T, ref_dw[w], rtol=1e-5,
                                       atol=1e-7, err_msg=f"layer {l}")


class TestFTOracle:
    """Weight-delta parity for the constrained fine-tune: pins the
    non-teacher-forced last-position objective, the pad-included
    unk-only target mask, coupled Adam weight decay, the step-skip at
    loss<1e-2 and the ±ε clamp-after-step."""

    @staticmethod
    def _cpu_patch_devices():
        """Tensor.to / BatchEncoding.to accepting torch.device('cuda:0')
        — execute_ft builds a torch.device and moves batches onto it."""
        import contextlib

        from transformers import BatchEncoding

        def fix(d):
            if isinstance(d, str) and d.startswith("cuda"):
                return "cpu"
            if isinstance(d, torch.device) and d.type == "cuda":
                return torch.device("cpu")
            return d

        @contextlib.contextmanager
        def cm():
            o_to, o_be_to = torch.Tensor.to, BatchEncoding.to

            def t_to(self, *a, **k):
                a = tuple(fix(x) for x in a)
                if "device" in k:
                    k["device"] = fix(k["device"])
                return o_to(self, *a, **k)

            def be_to(self, device, *a, **k):
                return o_be_to(self, fix(device), *a, **k)

            torch.Tensor.to, BatchEncoding.to = t_to, be_to
            try:
                yield
            finally:
                torch.Tensor.to, BatchEncoding.to = o_to, o_be_to
        return cm()

    def test_weight_delta_parity(self, grace_rig):
        from devqa_tpu.editors.llm.ft import FTHyperParams, apply_ft
        from devqa_tpu.editors.llm.mlp_common import down_target
        from devqa_tpu.utils.surgery import get_target

        _load_ref_easyeditor_pkg()
        base = os.path.join(REF, "easyeditor")
        if "refee.models.ft" not in sys.modules:
            import importlib.util
            fdir = os.path.join(base, "models/ft")
            spec = importlib.util.spec_from_file_location(
                "refee.models.ft", os.path.join(fdir, "__init__.py"),
                submodule_search_locations=[fdir])
            m = importlib.util.module_from_spec(spec)
            sys.modules["refee.models.ft"] = m
            spec.loader.exec_module(m)
        ft_pkg = sys.modules["refee.models.ft"]

        G = grace_rig
        G["cleanup"]()
        model, tok = G["model"], G["hf_tok"]
        reqs = [
            {"prompt": "the picture near the river is shown",
             "target_new": "zebra"},
            {"prompt": "who wrote about the tree",
             "target_new": "red lion"},   # 2 tokens: pads row 0's targets
        ]
        hp = ft_pkg.FTHyperParams(
            layers=[1], num_steps=2, lr=1e-3, weight_decay=0.1,
            kl_factor=0.0, norm_constraint=5e-4,
            rewrite_module_tmp="model.layers.{}.mlp.down_proj",
            layer_module_tmp="model.layers.{}",
            mlp_module_tmp="model.layers.{}.mlp",
            attn_module_tmp="model.layers.{}.self_attn",
            ln_f_module="model.norm", lm_head_module="lm_head",
            device=0, alg_name="FT", model_name="llama-tiny", batch_size=64)

        w_name = "model.layers.1.mlp.down_proj.weight"
        w_before = dict(model.named_parameters())[w_name].detach().clone()
        try:
            with self._cpu_patch_devices():
                ft_pkg.apply_ft_to_model(
                    model, tok, [dict(r) for r in reqs], hp,
                    return_orig_weights=True, keep_original_weight=True)
            ref_dw = (dict(model.named_parameters())[w_name].detach()
                      - w_before).numpy()
        finally:
            with torch.no_grad():
                dict(model.named_parameters())[w_name].copy_(w_before)
            for _, p in model.named_parameters():
                p.requires_grad_(False)   # execute_ft flips requires_grad
        assert np.abs(ref_dw).max() > 0

        ours_hp = FTHyperParams(layers=(1,), module="down", num_steps=2,
                                lr=1e-3, weight_decay=0.1,
                                norm_constraint=5e-4)
        new_params = apply_ft(G["text_model"], reqs, ours_hp)
        tgt = down_target(G["text_model"].cfg, 1)
        our_dw = np.asarray(get_target(new_params, tgt)) \
            - np.asarray(get_target(G["text_model"].params, tgt))
        np.testing.assert_allclose(our_dw.T, ref_dw, rtol=2e-3, atol=1e-8)


class TestLoRAOracle:
    """The reference's "LoRA" is AdaLoRA: SVD adapters (E-gated), peft's
    orthogonal regularization added to the CE loss, coupled Adam. Parity
    is checked on the merged weight delta after 2 steps with the peft
    init copied into our adapters."""

    @pytest.mark.parametrize("pad_is_eos", [False, True])
    def test_weight_delta_parity(self, grace_rig, pad_is_eos):
        from copy import deepcopy

        from devqa_tpu.core.tokenizer import HFTokenizerAdapter
        from devqa_tpu.editors.llm.lora import LoRAHyperParams, apply_lora
        from devqa_tpu.editors.llm.session import TextModel
        from devqa_tpu.utils.surgery import ParamTarget, get_target

        peft = pytest.importorskip("peft")
        _load_ref_easyeditor_pkg()
        base = os.path.join(REF, "easyeditor")
        if "refee.models.lora" not in sys.modules:
            import importlib.util
            ldir = os.path.join(base, "models/lora")
            spec = importlib.util.spec_from_file_location(
                "refee.models.lora", os.path.join(ldir, "__init__.py"),
                submodule_search_locations=[ldir])
            m = importlib.util.module_from_spec(spec)
            sys.modules["refee.models.lora"] = m
            spec.loader.exec_module(m)
        lora_pkg = sys.modules["refee.models.lora"]

        G = grace_rig
        G["cleanup"]()
        if pad_is_eos:
            # llama/GPT-2 easyeditor setup: pad falls back to eos, so the
            # appended " {eos}" counts into num_pad_toks and shifts the
            # reference's masked label window by one
            tok = _make_tokenizer()
            tok.pad_token = tok.eos_token
            text_model = TextModel(G["text_model"].params,
                                   G["text_model"].cfg,
                                   HFTokenizerAdapter(tok),
                                   bucket_multiple=8)
        else:
            tok = G["hf_tok"]
            text_model = G["text_model"]
        # pad==eos needs a MULTI-token target: the shifted window eats
        # the first target token and the pad rule masks the eos, so a
        # 1-token target leaves nothing supervised and the reference
        # itself NaNs out (loss over zero labels)
        tgt = "red zebra lion" if pad_is_eos else "zebra"
        reqs = [{"prompt": "the picture near the river is shown",
                 "target_new": tgt}]
        # NOTE: AdaLora layers are built at init_r (default 12); the r
        # passed below is the TARGET rank and never takes effect because
        # execute_lora never runs the rank allocator.
        rank, init_r, alpha, lr, wd, steps = 2, 12, 4.0, 1e-3, 0.05, 2

        # wrap a COPY so the shared rig model stays pristine
        torch.manual_seed(31)
        peft_model = peft.get_peft_model(
            deepcopy(G["model"]).train().requires_grad_(False),
            peft.AdaLoraConfig(
                task_type=peft.TaskType.CAUSAL_LM, inference_mode=False,
                r=rank, lora_alpha=alpha, lora_dropout=0.0,
                layers_to_transform=[1],
                target_modules=["q_proj", "v_proj"], total_step=10))

        def peft_abe():
            out = {}
            for n, p in peft_model.named_parameters():
                for kind in ("lora_A", "lora_B", "lora_E"):
                    if kind in n and "layers.1." in n:
                        mod = "q" if "q_proj" in n else "v"
                        out.setdefault(mod, {})[kind[-1].lower()] = \
                            p.detach().clone().numpy()
            return out

        init = peft_abe()
        assert set(init) == {"q", "v"}

        hp = lora_pkg.LoRAHyperParams(
            layers=[1], num_steps=steps, lr=lr, weight_decay=wd,
            kl_factor=0.0, norm_constraint=False,
            target_modules=["q_proj", "v_proj"], rank=rank,
            lora_alpha=alpha, lora_dropout=0.0, device=0, alg_name="LoRA",
            model_name="llama-tiny", batch_size=128)

        import contextlib

        @contextlib.contextmanager
        def module_to_cpu():
            o_to = torch.nn.Module.to

            def fix(d):
                if isinstance(d, str) and d.startswith("cuda"):
                    return "cpu"
                if isinstance(d, torch.device) and d.type == "cuda":
                    return torch.device("cpu")
                return d

            def m_to(self, *a, **k):
                a = tuple(fix(x) for x in a)
                if "device" in k:
                    k["device"] = fix(k["device"])
                return o_to(self, *a, **k)

            torch.nn.Module.to = m_to
            try:
                with TestFTOracle._cpu_patch_devices():
                    yield
            finally:
                torch.nn.Module.to = o_to

        with module_to_cpu():
            lora_pkg.execute_lora(peft_model, tok,
                                  [dict(r) for r in reqs], hp,
                                  keep_original_weight=False)
        trained = peft_abe()

        def merged(abe):
            return (abe["b"] @ (abe["a"] * abe["e"])) * alpha \
                / (init_r + 1e-5)

        ref_dw = {m: merged(trained[m]) - merged(init[m]) for m in ("q", "v")}
        assert all(np.abs(d).max() > 0 for d in ref_dw.values())

        ours_hp = LoRAHyperParams(
            rank=rank, init_r=init_r, lora_alpha=alpha,
            target_modules=("q_proj", "v_proj"),
            layers=(1,), num_steps=steps, lr=lr, weight_decay=wd)
        adapters = {"1.%s" % m: {"a": jnp.asarray(init[m]["a"]),
                                 "b": jnp.asarray(init[m]["b"]),
                                 "e": jnp.asarray(init[m]["e"])}
                    for m in ("q", "v")}
        new_params = apply_lora(text_model, reqs, ours_hp,
                                adapters=adapters)
        for m in ("q", "v"):
            tgt = ParamTarget(("layers", m, "w"), 1)
            our_dw = np.asarray(get_target(new_params, tgt)) \
                - np.asarray(get_target(text_model.params, tgt))
            np.testing.assert_allclose(our_dw.T, ref_dw[m], rtol=2e-3,
                                       atol=5e-9, err_msg=m)

