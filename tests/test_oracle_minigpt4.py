"""Cross-framework oracle for the MiniGPT-4 wrapper: run the reference's
OWN ``MiniGPT4ForEdit`` (editor/vllms_for_edit/minigpt4/minigpt4.py:9-81)
over the reference's OWN vendored module tree — ``eva_vit.VisionTransformer``
(modules/eva_vit.py:319-425), LAVIS ``Qformer`` built by
``MiniGPT4.init_Qformer`` (modules/minigpt4.py:189-214), the vendored
``modeling_llama.LlamaForCausalLM`` and ``Blip2ImageEvalProcessor``
(modules/blip_processors.py:47-72) — at tiny dimensions on shared random
weights, then run this framework on ``convert_minigpt4`` of the SAME
state dict and compare.

This closes the last parity gap in the model-wrapper zoo: MiniGPT-4's
[BOS | qformer×32 | text] layout (``get_context_emb`` splice,
minigpt4.py:85-99; vt_range = [1, 33), wrapper minigpt4.py:60), the
LAVIS-layout Q-Former (separate q_bias/v_bias with an implicit zero k
bias, eva_vit.py:191-197), and the external ``ln_vision`` post-norm
(minigpt4.py:224).

Why ``__new__`` assembly: ``MiniGPT4ForEdit.__init__`` hard-codes
absolute checkpoint paths (minigpt4.py:16-20) and
``MiniGPT4.__init__``/``from_config`` insist on downloading EVA/Q-Former
weights when no local path exists (base_model.py:127-129,
eva_vit.py:502-510) — neither is offline-runnable, so the rig constructs
the exact same module graph attribute-by-attribute and then runs the
reference's real init paths where they ARE offline-safe
(``init_Qformer`` from a local BERT config json) plus the reference's
real forward code everywhere.

Environment shims (installed in ``sys.modules`` before the vendored
imports; this file runs in its own subprocess under the conftest
orchestrator so they cannot leak):

- ``omegaconf``: not installed in this image; the vendored modules only
  import it at module scope (the ``from_config`` paths that would call
  it are the download paths bypassed above).
- ``torchvision``: not installed; ``blip_processors.py`` needs exactly
  Compose/Lambda/Resize/ToTensor/Normalize on PIL inputs — reproduced
  with their literal semantics (torchvision's ``F.resize`` on a PIL
  image is ``img.resize(size[::-1], pil_mode)``; ToTensor is CHW
  float/255).
- transformers 4.57 vs the 4.36 the reference targets:
  ``apply_chunking_to_forward`` et al. moved from ``modeling_utils`` to
  ``pytorch_utils``; ``LLAMA_INPUTS_DOCSTRING``/``_CONFIG_FOR_DOC`` were
  deleted from ``modeling_llama`` (the vendored subclass only uses them
  in docstring decorators).
"""
import json
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

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


def _install_reference_shims():
    import importlib.machinery

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def load(*a, **k):
                raise RuntimeError("omegaconf stub: not available offline")

            @staticmethod
            def create(*a, **k):
                raise RuntimeError("omegaconf stub: not available offline")

        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc

    if "torchvision" not in sys.modules:
        from PIL import Image as PILImage

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")

        class InterpolationMode:
            BICUBIC = PILImage.BICUBIC

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        class Lambda:
            def __init__(self, fn):
                self.fn = fn

            def __call__(self, x):
                return self.fn(x)

        class Resize:
            def __init__(self, size, interpolation=PILImage.BICUBIC):
                self.size, self.interpolation = size, interpolation

            def __call__(self, img):
                h, w = self.size
                return img.resize((w, h), self.interpolation)

        class ToTensor:
            def __call__(self, img):
                arr = np.asarray(img, dtype=np.float32) / 255.0
                return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tvf.InterpolationMode = InterpolationMode
        tvt.Compose, tvt.Lambda = Compose, Lambda
        tvt.Resize, tvt.ToTensor, tvt.Normalize = Resize, ToTensor, Normalize
        tvt.functional = tvf
        tv.transforms = tvt
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvt.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)
        tvf.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms.functional", None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf

    import transformers.modeling_utils as mu
    from transformers import pytorch_utils as pu

    for n in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
              "prune_linear_layer"):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(pu, n))

    import transformers.models.llama.modeling_llama as hf_llama

    if not hasattr(hf_llama, "LLAMA_INPUTS_DOCSTRING"):
        hf_llama.LLAMA_INPUTS_DOCSTRING = ""
    if not hasattr(hf_llama, "_CONFIG_FOR_DOC"):
        hf_llama._CONFIG_FOR_DOC = "LlamaConfig"


_install_reference_shims()

from devqa_tpu.core import convert_hf, decoder as dec, vllm as vllm_mod
from devqa_tpu.core.losses import token_accuracy
from devqa_tpu.core.qformer import QFormerConfig
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

IMG_SIZE = 28          # 4×4 patches of 7 through the tiny EVA tower
BOS_ID = 62
N_QUERY = 32           # pinned by the wrapper: get_img_token_n() == 32
D_VIT, D_Q, D_LM, VOCAB = 32, 16, 16, 64


def _make_mg4_tokenizer():
    """Word-level tokenizer with Vicuna's special-token behavior: BOS
    prepended when add_special_tokens=True (get_context_emb relies on
    ``add_special_tokens=i==0`` to BOS only the pre-image segment,
    minigpt4.py:90-94)."""
    from tokenizers import Tokenizer as RawTok
    from tokenizers import models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2}
    for w in WORDS:
        vocab[w] = len(vocab)
    vocab["<s>"] = BOS_ID
    raw = RawTok(models.WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.Whitespace()
    raw.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", BOS_ID)])
    return PreTrainedTokenizerFast(
        tokenizer_object=raw, pad_token="<pad>", unk_token="<unk>",
        eos_token="</s>", bos_token="<s>")


def _tiny_reference_minigpt4(tmp):
    """Assemble the reference MiniGPT4 module graph at tiny dimensions
    (see module docstring for why not from_config)."""
    from functools import partial

    import torch.nn as nn

    from editor.vllms_for_edit.minigpt4.modules.base_model import \
        LayerNorm as Fp32LayerNorm
    from editor.vllms_for_edit.minigpt4.modules.eva_vit import \
        VisionTransformer
    from editor.vllms_for_edit.minigpt4.modules.minigpt4 import MiniGPT4
    from editor.vllms_for_edit.minigpt4.modules.modeling_llama import \
        LlamaForCausalLM
    from transformers import LlamaConfig

    torch.manual_seed(7)
    vis = VisionTransformer(
        img_size=IMG_SIZE, patch_size=7, embed_dim=D_VIT, depth=2,
        num_heads=2, mlp_ratio=2.0, qkv_bias=True, use_mean_pooling=False,
        norm_layer=partial(nn.LayerNorm, eps=1e-6))
    with torch.no_grad():
        # perturb every ViT param: q_bias/v_bias start at zero, and the
        # converter's [q_bias | 0 | v_bias] assembly (convert_hf.py:381-386)
        # is only pinned if they are nonzero
        for p in vis.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    bert_cfg_path = os.path.join(tmp, "tiny_bert_config.json")
    with open(bert_cfg_path, "w") as f:
        json.dump(dict(
            architectures=["BertModel"], model_type="bert",
            hidden_size=D_Q, num_attention_heads=2, num_hidden_layers=2,
            intermediate_size=2 * D_Q, vocab_size=VOCAB,
            max_position_embeddings=64, layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            pad_token_id=0, initializer_range=0.02), f)

    lm_cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=D_LM, intermediate_size=2 * D_LM,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=96, tie_word_embeddings=False)
    llama = LlamaForCausalLM(lm_cfg)

    mg4 = MiniGPT4.__new__(MiniGPT4)
    nn.Module.__init__(mg4)
    mg4.llama_model = llama
    mg4.llama_tokenizer = _make_mg4_tokenizer()
    mg4.visual_encoder = vis
    mg4.ln_vision = Fp32LayerNorm(D_VIT)
    with torch.no_grad():
        for p in mg4.ln_vision.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    mg4.max_txt_len = 32
    mg4.max_context_len = 3800
    mg4.end_sym = "\n"
    mg4.prompt_template = ""
    mg4.prompt_list = []
    mg4.has_qformer = True
    # the reference's REAL init path (offline-safe given a local config)
    mg4.Qformer, mg4.query_tokens = MiniGPT4.init_Qformer(
        N_QUERY, D_VIT, bert_cfg_path)
    mg4.llama_proj = nn.Linear(D_Q, D_LM)
    mg4.config = types.SimpleNamespace(is_encoder_decoder=False)
    mg4 = mg4.eval().float()
    mg4.requires_grad_(False)
    return mg4, lm_cfg


def _our_cfg(lm_cfg) -> vllm_mod.VLLMConfig:
    return vllm_mod.VLLMConfig(
        name="tiny-minigpt4", bridge="qformer", img_slot_pos=1,
        n_img_tokens=N_QUERY,
        vit=ViTConfig(image_size=IMG_SIZE, patch_size=7, d_model=D_VIT,
                      n_layers=2, n_heads=2, d_ffn=2 * D_VIT,
                      activation="gelu", fused_qkv=True,
                      pre_layernorm=False, norm_eps=1e-6),
        qformer=QFormerConfig(d_model=D_Q, n_layers=2, n_heads=2,
                              d_ffn=2 * D_Q, n_query_tokens=N_QUERY,
                              encoder_width=D_VIT,
                              cross_attention_frequency=2),
        decoder=dec.DecoderConfig(
            arch="llama", vocab_size=VOCAB, d_model=D_LM, n_layers=2,
            n_heads=2, d_ffn=2 * D_LM, max_positions=96,
            activation="silu", tie_word_embeddings=False,
            norm_eps=lm_cfg.rms_norm_eps),
        img_special_token="<ImageHere>")


@pytest.fixture(scope="module")
def mrig(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mg4_oracle"))
    img = _write_pngs(tmp)

    from editor.vllms_for_edit.base import BaseVLLMForEdit
    from editor.vllms_for_edit.minigpt4.minigpt4 import MiniGPT4ForEdit
    from editor.vllms_for_edit.minigpt4.modules.blip_processors import \
        Blip2ImageEvalProcessor

    mg4, lm_cfg = _tiny_reference_minigpt4(tmp)
    ref_vllm = MiniGPT4ForEdit.__new__(MiniGPT4ForEdit)
    ref_vllm.model = mg4
    ref_vllm.img_processor = Blip2ImageEvalProcessor(image_size=IMG_SIZE)
    BaseVLLMForEdit.__init__(ref_vllm, mg4, "cpu", True)

    cfg = _our_cfg(lm_cfg)
    params = convert_hf.convert_minigpt4(
        convert_hf.torch_state_dict_to_numpy(mg4), cfg)
    vllm = JaxVLLM(cfg, params, HFTokenizerAdapter(mg4.llama_tokenizer),
                   FileImageProvider(IMG_SIZE), bucket_multiple=8)

    our_cases, ref_cases = _make_cases(img)
    return dict(tmp=tmp, hf_tok=mg4.llama_tokenizer, mg4=mg4, cfg=cfg,
                ref_vllm=ref_vllm, vllm=vllm, img=img,
                our_cases=our_cases, ref_cases=ref_cases)


class TestMiniGPT4XymParity:
    def test_image_batch(self, mrig):
        """Batched image xym: '<ImageHere>\\n'-prefix auto-added
        (base.py:51-52), get_context_emb splices [BOS | q×32 | text]
        (minigpt4.py:85-99) → vt_range [1, 33); labels from the bare
        prompt+target match ours bit-for-bit."""
        prompts = ["what animal is shown in the picture here",
                   "who wrote the book"]
        targets = ["zebra", "lion red"]
        imgs = [mrig["img"][0], mrig["img"][1]]
        (x, vt), y, m = mrig["ref_vllm"].prompts_imgs_target_to_xym(
            prompts, imgs, targets)
        assert list(vt) == [1, 1 + N_QUERY]
        ids, lab, msk, _ = build_xym(
            HFTokenizerAdapter(mrig["hf_tok"]), prompts, targets)
        np.testing.assert_array_equal(lab, y.numpy())
        np.testing.assert_array_equal(msk, m.numpy())
        assert x["inputs_embeds"].shape[1] == ids.shape[1] + N_QUERY

    def test_text_only_batch(self, mrig):
        """MiniGPT4ForEdit's text-only path (minigpt4.py:55-58, no crash
        unlike llava): labels and embed geometry match ours."""
        prompts = ["who wrote the book about the sky"]
        targets = ["lion"]
        (x, vt), y, m = mrig["ref_vllm"].prompts_imgs_target_to_xym(
            prompts, [None], targets)
        assert vt is None
        ids, lab, msk, _ = build_xym(
            HFTokenizerAdapter(mrig["hf_tok"]), prompts, targets)
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


class TestMiniGPT4ProbeParity:
    def test_pre_edit_accuracy_and_logits(self, mrig):
        """Every probe of case 0 (image probes through EVA-ViT + LAVIS
        Q-Former + ln_vision, text probes through the bare decoder):
        accuracy, masked argmax ids AND raw logits match the reference
        executable."""
        vllm = mrig["vllm"]
        case = mrig["our_cases"][0]
        n_img_probes = 0
        for s in case_probe_specs(case):
            acc_ref, pred_ref, logits_ref = _ref_probe_acc(
                mrig["ref_vllm"], s.prompt, s.image, s.target)
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
        assert n_img_probes >= 6


def _tiny_ref_liveedit_cfg():
    from editor.vllm_editors.liveedit.liveedit import \
        LiveEditConfig as RefCfg

    return RefCfg(
        edit_model_name="tiny-minigpt4",
        retrieval_editor=RefCfg.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        train_cfg=RefCfg.TrainConfig(
            lr=1e-4, lr_cut_it=[10], lr_cut_rate=0.1, rel_lambda=1,
            gen_lambda=1, loc_lambda=1, soft_routing_lambda=1,
            hard_routing_lambda=1),
        llm_mid_dim=16,
        # configs/liveedit/minigpt-4-vicuna-7b.yaml:18
        llm_layer_tmp="llama_model.model.layers.{}",
        edit_layer_i=1)


def _tiny_our_liveedit_cfg():
    return LiveEditConfig(
        edit_model_name="tiny-minigpt4",
        retrieval_editor=LiveEditConfig.RetrievalEditor(
            module_dim=16, cross_att_head_n=2, lora_rank=2, lora_scale=5.0,
            eqe_n=2),
        llm_mid_dim=16, edit_layer_i=1, max_edits=8)


@pytest.fixture(scope="module")
def mg4_editors(mrig):
    """Reference LiveEdit (random torch init) on the minigpt4 wrapper +
    our LiveEdit loaded from its exact 'Best' checkpoint."""
    from editor.vllm_editors.liveedit.liveedit import LiveEdit as RefEdit

    torch.manual_seed(21)
    ref_ed = RefEdit(mrig["ref_vllm"], _tiny_ref_liveedit_cfg(),
                     device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(mrig["tmp"], "Best")
    torch.save(ckpt, path)

    our_ed = LiveEdit(mrig["vllm"], _tiny_our_liveedit_cfg(), seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestMiniGPT4LiveEditOracle:
    def test_single_edit_mean_results(self, mrig, mg4_editors, tmp_path):
        """LiveEdit single-edit evaluation on the minigpt4 layout: every
        mean_results acc identical — vt-rep extraction at [1, 33) over
        Q-Former outputs, routing and residual application all pinned."""
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = mg4_editors
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(mrig["ref_cases"]), "oracle",
            str(tmp_path / "ref"))
        ref_ev.evaluate_single_edit()
        with open(os.path.join(ref_ev.result_dir, "single_edit",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(mrig["our_cases"]), "oracle",
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

    def test_sequential_edit_total_mean(self, mrig, mg4_editors, tmp_path):
        """edit_n=3: pool accumulation + routing over 3 live experts on
        the q-former layout."""
        from evaluation.vllm_editor_eval import VLLMEditorEvaluation

        ref_ed, our_ed = mg4_editors
        ref_ev = VLLMEditorEvaluation(
            ref_ed, _ref_edit_data(mrig["ref_cases"]), "oracle-seq",
            str(tmp_path / "ref"))
        ref_ev.evaluate_sequential_edit(edit_n=3)
        with open(os.path.join(ref_ev.result_dir, "sequential_edit_3",
                               "mean_results.json")) as f:
            ref_mean = json.load(f)["total_mean"]

        our_ev = EditorEvaluation(
            our_ed, BaseVLLMEditData(mrig["our_cases"]), "oracle-seq",
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
