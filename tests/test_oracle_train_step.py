"""Cross-framework oracle for ONE META-TRAINING STEP.

The editing/eval paths are oracle-pinned in test_reference_oracle.py;
this file closes the train-path gap: run the reference's OWN
``LiveEdit.train_a_batch`` (editor/vllm_editors/liveedit/liveedit.py:
354-465) and ``MENDvl.train_a_batch`` (editor/vllm_editors/mend_vl/
mend_vl.py:290-341) for one step on shared tiny weights and assert
loss-component parity against this framework's trainable editors — for
LiveEdit with ``faithful_mid_layer_rerun=True``, reproducing the
reference's forward_from_mid_layer quirk (the captured layer-k OUTPUT is
fed back as layer k's INPUT, so layer k re-runs and the hook adds the
edit residual to the RE-RUN output; vllms_for_edit/base.py:164-185 +
liveedit.py:111-114).

Randomness is removed by construction, not by syncing rng streams: both
frameworks' organized batches are built with FIXED expert-subset masks
and FIXED contrastive neighbor/prototype picks (every per-case probe
list has exactly one entry, so sample draws are forced to index 0).

A second train_a_batch call on the same batch pins the optimizer step
itself (torch Adam + LambdaLR vs optax scale_by_adam + schedule).
"""
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

import jax.numpy as jnp

from devqa_tpu.core import convert_hf
from devqa_tpu.core.tokenizer import HFTokenizerAdapter
from devqa_tpu.core.wrapper import JaxVLLM
from devqa_tpu.data.images import FileImageProvider
from devqa_tpu.editors.convert_reference import load_reference_editor_ckpt
from devqa_tpu.editors.liveedit import LiveEditConfig, LiveEditTrainable
from devqa_tpu.editors.mend_vl import MENDvlConfig, MENDvlTrainable

from test_reference_oracle import (IMG_SIZE, _make_cases, _make_tokenizer,
                                   _tiny_hf_blip2, _tiny_our_liveedit_cfg,
                                   _tiny_ref_liveedit_cfg, _write_pngs)

B = 3
# Fixed expert-subset masks [B, B] (the reference draws these per-row
# with rng_train.integers; liveedit.py:289-292). Loc row 1 is ALL-ZERO
# on purpose: an empty expert subset must produce a zero residual
# (empty-tensor einsum in torch == masked-softmax zeroing here).
REL_MASK = np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], bool)
GEN_MASK = np.array([[1, 1, 0], [0, 1, 0], [1, 1, 1]], bool)
LOC_MASK = np.array([[1, 0, 0], [0, 0, 0], [1, 1, 0]], bool)
# Fixed neighbor/prototype picks: (kind, key_idx) per row j, where kind
# 0=reliability, 1=generality[key_idx], 2=(image-bearing) locality[key_idx]
# (liveedit.py:326-349 draws these with rng_data_proc).
PICKS = {
    "n1": [(0, 0), (1, 1), (2, 3)],
    "n2": [(1, 0), (0, 0), (2, 0)],
    "p1": [(0, 0), (1, 0), (0, 0)],
    "p2": [(2, 1), (2, 5), (2, 2)],
}


def _fresh_ref_vllm(hf_tok, base_model):
    """An isolated BLIP2OPTForEdit on a DEEPCOPY of the torch model —
    editor hooks (LiveEdit's layer hook, MEND's EditLinear hooks) must
    not leak between the two oracle rigs."""
    import copy as _copy

    from transformers import Blip2Processor, BlipImageProcessor

    from editor.vllms_for_edit.base import BaseVLLMForEdit
    from editor.vllms_for_edit.blip2.blip2 import BLIP2OPTForEdit

    model = _copy.deepcopy(base_model)
    proc = Blip2Processor(
        image_processor=BlipImageProcessor(
            size={"height": IMG_SIZE, "width": IMG_SIZE}),
        tokenizer=hf_tok)
    rv = BLIP2OPTForEdit.__new__(BLIP2OPTForEdit)
    rv.model = model
    rv.processor = proc
    BaseVLLMForEdit.__init__(rv, model, "cpu", False)
    return rv


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("train_oracle"))
    hf_tok = _make_tokenizer()
    model, cfg = _tiny_hf_blip2()
    img = _write_pngs(tmp)
    params = convert_hf.convert_blip2(
        convert_hf.torch_state_dict_to_numpy(model), cfg)
    vllm = JaxVLLM(cfg, params, HFTokenizerAdapter(hf_tok),
                   FileImageProvider(IMG_SIZE), bucket_multiple=8)
    our_cases, ref_cases = _make_cases(img)
    return dict(tmp=tmp, hf_tok=hf_tok, model=model, cfg=cfg, vllm=vllm,
                img=img, our_cases=our_cases, ref_cases=ref_cases)


# ---------------------------------------------------------------------------
# LiveEdit
# ---------------------------------------------------------------------------

def _ref_organized_liveedit(ref_ed, cases):
    """Build ``a_batch_organized_data`` (liveedit.py:251-352) with the
    fixed masks/picks, driving the reference's own helpers."""
    rv = ref_ed.vllm
    gen_keys = list(cases[0]["generality"].keys())
    loc_keys = [k for k in cases[0]["locality"]
                if cases[0]["locality"][k][0]["image"] is not None]

    def req_of(d):
        r = d["requests"][0]
        return {"prompt": r["prompt"], "image": r["image"],
                "target": r["target_new"]}

    def xym_of(e):
        return rv.prompts_imgs_target_to_xym(
            [e["prompt"]], [e["image"]], [e["target"]])

    def mid_of(xym):
        (x, vt), _y, _m = xym
        return rv.get_mid_module_outpt(x, vt, ref_ed.edit_layer_path)

    bes = [[ref_ed.get_reps_for_edit(rv, req_of(d))] for d in cases]

    def pack(entries, with_pre_logits=False):
        xs, ms, pls, es = [], [], [], []
        for e in entries:
            xym = xym_of(e)
            mr = mid_of(xym)
            xs.append(xym)
            ms.append(mr)
            if with_pre_logits:
                (x, vt), _y, _mk = xym
                with torch.no_grad():
                    pls.append(rv.forward_from_mid_layer(
                        x, vt, mr, ref_ed.cfg.llm_layer_tmp,
                        ref_ed.cfg.edit_layer_i).logits)
            es.append(ref_ed.get_reps_for_edit(rv, e))
        return (xs, ms, pls, es) if with_pre_logits else (xs, ms, es)

    packed_rel = pack([req_of(d) for d in cases])
    packed_gen = {k: pack([d["generality"][k][0] for d in cases])
                  for k in gen_keys}
    packed_loc = {k: pack([d["locality"][k][0] for d in cases],
                          with_pre_logits=True) for k in loc_keys}

    def er_of(kind, key_idx, j):
        if kind == 0:
            return packed_rel[-1][j][1:3]
        if kind == 1:
            return packed_gen[gen_keys[key_idx]][-1][j][1:3]
        return packed_loc[loc_keys[key_idx]][-1][j][1:3]

    neib = [[er_of(*PICKS["n1"][j], j=j) for j in range(B)],
            [er_of(*PICKS["n2"][j], j=j) for j in range(B)]]
    prot = [[er_of(*PICKS["p1"][j], j=j) for j in range(B)],
            [er_of(*PICKS["p2"][j], j=j) for j in range(B)]]
    return (B, bes,
            torch.from_numpy(REL_MASK), torch.from_numpy(GEN_MASK),
            torch.from_numpy(LOC_MASK),
            packed_rel, packed_gen, packed_loc, neib, prot)


def _our_row(kind, key_idx, j, G):
    if kind == 0:
        return j
    if kind == 1:
        return B * (1 + key_idx) + j
    return B * (1 + G + key_idx) + j


@pytest.fixture(scope="module")
def liveedit_pair(rig):
    import dataclasses

    from editor.vllm_editors.liveedit.liveedit import LiveEdit as RefEdit

    rv = _fresh_ref_vllm(rig["hf_tok"], rig["model"])
    torch.manual_seed(77)
    ref_ed = RefEdit(rv, _tiny_ref_liveedit_cfg(), device="cpu")
    ref_ed.set_train(False)  # data-prep must see the inference no-op hook
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "BestLiveTrain")
    torch.save(ckpt, path)

    cfg = dataclasses.replace(
        _tiny_our_liveedit_cfg(), faithful_mid_layer_rerun=True,
        train_cfg=LiveEditConfig.TrainConfig(
            lr=1e-4, lr_cut_it=(10,), lr_cut_rate=0.1))
    our_ed = LiveEditTrainable(rig["vllm"], cfg, seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestLiveEditTrainOracle:
    def test_one_step_loss_components(self, rig, liveedit_pair):
        ref_ed, our_ed = liveedit_pair
        organized = _ref_organized_liveedit(ref_ed, rig["ref_cases"])
        ref_ed.set_train(True)
        ref_ed.opt, ref_ed.lr_scheduler = ref_ed.get_a_new_optimizer()
        ref_loss, ref_log = ref_ed.train_a_batch(organized)

        batch = our_ed.organize_batch_data(rig["our_cases"])
        assert batch["B"] == B and batch["G"] == 2 and batch["K"] == 6
        G = batch["G"]
        batch["rel_mask"] = jnp.asarray(REL_MASK)
        batch["gen_mask"] = jnp.asarray(GEN_MASK)
        batch["loc_mask"] = jnp.asarray(LOC_MASK)
        for key in ("n1", "n2", "p1", "p2"):
            batch[key] = jnp.asarray(
                [_our_row(*PICKS[key][j], j=j, G=G) for j in range(B)])
        loss, logs = our_ed.train_step(batch)

        pairs = [
            (logs["rel_loss"], ref_log["Reliability loss"]),
            (logs["gen_loss"], ref_log["Generality loss"]),
            (logs["loc_loss"], ref_log["Locality loss"]),
            (logs["soft_routing_loss"], ref_log["MoE soft routing loss"]),
            (logs["hard_routing_neighbor_loss"],
             ref_log["MoE hard routing neighbor loss"]),
            (logs["hard_routing_prototype_loss"],
             ref_log["MoE hard routing prototype loss"]),
            (loss, ref_loss),
        ]
        for ours, ref in pairs:
            assert ours == pytest.approx(ref, rel=2e-3, abs=2e-4), pairs

        # One more step on the SAME batch: the first Adam update itself
        # (bias-corrected moments, LambdaLR factor 1 at step 0) is pinned
        # by the post-step loss.
        ref_loss2, _ = ref_ed.train_a_batch(organized)
        loss2, _ = our_ed.train_step(batch)
        assert loss2 == pytest.approx(ref_loss2, rel=5e-3, abs=5e-4)
        assert loss2 != pytest.approx(ref_loss, rel=1e-6)  # step did move
        ref_ed.set_train(False)


# ---------------------------------------------------------------------------
# MEND_VL
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mend_pair(rig):
    from editor.vllm_editors.mend_vl.mend_vl import MENDvl as RefMEND
    from editor.vllm_editors.mend_vl.mend_vl import \
        MENDvlConfig as RefMENDCfg

    rv = _fresh_ref_vllm(rig["hf_tok"], rig["model"])
    tmpl = "language_model.model.decoder.layers.%d.%s"
    ref_cfg = RefMENDCfg(
        edit_modules=[tmpl % (l, m) for l in (0, 1) for m in ("fc1", "fc2")],
        init_edit_lr=1e-2, edit_lr_lr=1e-4,
        aux_model=RefMENDCfg.AuxModelConfig(
            n_hidden=1, hidden_dim=0, init="id", norm=True, act="relu",
            rank=8, shared=True, lr=1e-6),
        edit_model_name="tiny-blip2",
        relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0)
    torch.manual_seed(41)
    ref_ed = RefMEND(rv, ref_cfg, device="cpu")
    # organize_batch_data reads self.vllm_proc_data (the separate
    # data-prep model in real runs); sharing the edit model is safe here
    # because train_a_batch clears all stashed x/δ before capturing
    ref_ed.vllm_proc_data = rv
    # consistently-filled Welford buffers (k=5) so normalization is live
    # from the first training step on both sides
    gen = torch.Generator().manual_seed(9)
    for gt in ref_ed.aux_models.values():
        k = 5.0
        gt.k.fill_(k)
        gt.norm_init = True
        gt.u_mean.copy_(torch.randn(gt.x_dim, generator=gen) * 0.1)
        gt.v_mean.copy_(torch.randn(gt.delta_dim, generator=gen) * 0.1)
        u_std = torch.rand(gt.x_dim, generator=gen) * 0.5 + 0.75
        v_std = torch.rand(gt.delta_dim, generator=gen) * 0.5 + 0.75
        gt.u_std.copy_(u_std)
        gt.v_std.copy_(v_std)
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
    path = os.path.join(rig["tmp"], "BestMENDTrain")
    torch.save(ckpt, path)

    our_ed = MENDvlTrainable(rig["vllm"], MENDvlConfig(
        edit_model_name="tiny-blip2", edit_layers=(0, 1),
        edit_modules=("fc1", "fc2"), init_edit_lr=1e-2, edit_lr_lr=1e-4,
        relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0,
        train_loss_variant="0",
        aux_model=MENDvlConfig.AuxModelConfig(
            n_hidden=1, init="id", norm=True, act="relu", rank=8,
            lr=1e-6)), seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestMENDvlTrainOracle:
    def test_one_step_loss_components(self, rig, mend_pair):
        """MENDvl.train_a_batch is rng-free (organize takes entry [0] of
        every probe list): organize on both sides, one step, compare the
        rel CE / per-key gen CE / per-key loc KL(pre‖post) components.
        This pins the training-mode Welford semantics too: each module's
        (x, δ) rows are normalized with the shared stats updated
        sequentially up to THAT module (auxiliary_networks.py:122-140).

        batch_size is 1 by EXECUTION necessity: the reference BLIP-2
        wrapper encodes only ONE image per batch (blip2.py:54-56 does
        ``imgs = imgs[-1]`` on list input), so MENDvl's batched
        organize_batch_data (mend_vl.py:248-270) crashes with
        "Expected size 1 but got size N" on any image-bearing probe
        batch of N>1 — reference MEND_VL/BLIP-2 training only runs at
        train_batch_size=1 (verified live; see PARITY.md)."""
        ref_ed, our_ed = mend_pair
        organized = ref_ed.organize_batch_data(rig["ref_cases"][:1])
        ref_ed.set_train(True)
        ref_ed.opt = ref_ed.get_a_new_optimizer()
        ref_loss, ref_log = ref_ed.train_a_batch(organized)

        batch = our_ed.organize_batch_data(rig["our_cases"][:1])
        loss, logs = our_ed.train_step(batch)

        gen_total = sum(ref_log["Generality loss"].values())
        loc_total = sum(ref_log["Locality loss"].values())
        assert logs["rel_loss"] == pytest.approx(
            ref_log["Reliability loss"], rel=2e-3, abs=2e-4)
        assert logs["gen_loss"] == pytest.approx(gen_total, rel=2e-3,
                                                 abs=2e-4)
        assert logs["loc_loss"] == pytest.approx(loc_total, rel=2e-3,
                                                 abs=2e-4)
        assert loss == pytest.approx(ref_loss, rel=2e-3, abs=2e-4)

        # second step on the same batch: pins the two-group Adam update
        # (aux lr 1e-6, edit-lr lr 1e-4) + grad clip at 100 + the further
        # Welford accumulation from the repeated capture
        ref_loss2, _ = ref_ed.train_a_batch(organized)
        loss2, _ = our_ed.train_step(batch)
        assert loss2 == pytest.approx(ref_loss2, rel=5e-3, abs=5e-4)
        ref_ed.set_train(False)


# ---------------------------------------------------------------------------
# SERAC_VL
# ---------------------------------------------------------------------------

class _ScriptedRng:
    """np.random.Generator stand-in that scripts ONLY the 0/1 coins
    (``integers(0, 2)``) and forces every other draw to 0. Both
    frameworks' organize paths draw the same coins in the same order
    (q1 then q2 per case) but differ in how many forced-0 index draws
    surround them — scripting by (lo, hi) keeps them in sync."""

    def __init__(self, coins):
        self.coins = list(coins)

    def integers(self, lo, hi=None, **kw):
        if hi is None:
            lo, hi = 0, lo
        if (lo, hi) == (0, 2):
            return self.coins.pop(0)
        return 0


@pytest.fixture(scope="module")
def serac_train_pair(rig):
    from test_reference_oracle import _make_ref_serac

    from devqa_tpu.core.bert import BertConfig
    from devqa_tpu.core.decoder import DecoderConfig
    from devqa_tpu.editors.serac_vl import SERACvlConfig, SERACvlTrainable

    rv = _fresh_ref_vllm(rig["hf_tok"], rig["model"])
    ref_ed, path = _make_ref_serac({"ref_vllm": rv}, rig["tmp"])

    our_ed = SERACvlTrainable(rig["vllm"], SERACvlConfig(
        edit_model_name="tiny-blip2", classifier_rep_dim=24,
        counterfact_model_rep_dim=20, llm_hidden_size=16,
        max_edits=8, max_edit_len=64,
        classifier=BertConfig(vocab_size=30, d_model=24, n_layers=2,
                              n_heads=2, d_ffn=48, max_positions=64),
        counterfact=DecoderConfig(
            arch="opt", vocab_size=32, d_model=20, n_layers=2, n_heads=2,
            d_ffn=40, max_positions=96, activation="relu",
            tie_word_embeddings=True),
        train_config=SERACvlConfig.TrainConfig(
            lr=1e-3, relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0)),
        seed=0)
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestSERACvlTrainOracle:
    def test_one_step_loss_components(self, rig, serac_train_pair):
        """serac_vl.py:154-217 train_a_batch: per-group counterfactual
        edit CE (rel/gen) / KL-to-base (loc) + the three classifier
        contrastive losses, then one Adam step, vs the reference's own
        executable on identical weights. The reference's train_config
        lambdas are parsed but NEVER multiplied into the loss
        (serac_vl.py:179,199,215 add the raw terms) — both configs pin
        λ=1 so 'as configured' and 'as executed' coincide. Note the
        reference's Adam uses lr for BOTH param groups (serac_vl.py:220).
        organize is rng-free on both sides (every pick is [0] /
        integers(0,1))."""
        ref_ed, our_ed = serac_train_pair
        ref_ed.set_train(True)  # organize must see the passthrough fwd
        # set_train(True) puts the HF classifier/counterfact in train
        # mode, enabling their default dropout (p=0.1) — RNG noise no
        # cross-framework oracle can model (measured: train-mode reps
        # differ run-to-run). eval() only disables dropout here (no
        # batchnorm anywhere); requires_grad stays on, so the
        # backward/Adam semantics under test are unchanged.
        ref_ed.classifier.eval()
        ref_ed.counterfact_model.eval()
        organized = ref_ed.organize_batch_data(rig["ref_cases"])
        ref_ed.opt = ref_ed.get_a_new_optimizer()
        ref_loss, ref_log = ref_ed.train_a_batch(organized)

        batch = our_ed.organize_batch_data(rig["our_cases"])
        assert batch["B"] == B and batch["G"] == 2 and batch["K"] == 9
        loss, logs = our_ed.train_step(batch)

        pairs = [
            (logs["rel_edit_loss"], ref_log["Reliability edit loss"]),
            (logs["rel_cls_loss"], ref_log["Reliability class loss"]),
            (logs["gen_loss_last"],
             ref_log["Generality-image_rephrase edit loss"]),
            (logs["loc_loss_last"], ref_log["Locality-t3i3 edit loss"]),
            (loss, ref_loss),
        ]
        for ours, ref in pairs:
            assert ours == pytest.approx(ref, rel=2e-3, abs=2e-4), pairs

        # Second step on the SAME batch pins the Adam update on the
        # ROBUST components only. A first Adam step at lr=1e-3 is a
        # near-sign step (v̂≈ĝ²), so params whose grads are float-noise
        # small flip sign differently across frameworks and land ±1e-3
        # apart; the smooth CE/KL/softmax-diag terms still agree at the
        # ~1% level (measured: ≤0.3% edit, ~1% cls), but the TOTAL is
        # dominated by the nine locality-class terms whose
        # -log softmax([sim, +10])[:, -1] explodes whenever a random-
        # weight sim crosses ~10 — O(1) chaos per CLAUDE.md's
        # float-noise rule, so it is deliberately NOT compared.
        ref_loss2, ref_log2 = ref_ed.train_a_batch(organized)
        loss2, logs2 = our_ed.train_step(batch)
        pairs2 = [
            (logs2["rel_edit_loss"], ref_log2["Reliability edit loss"]),
            (logs2["rel_cls_loss"], ref_log2["Reliability class loss"]),
            (logs2["gen_loss_last"],
             ref_log2["Generality-image_rephrase edit loss"]),
            (logs2["loc_loss_last"], ref_log2["Locality-t3i3 edit loss"]),
        ]
        for ours, ref in pairs2:
            assert ours == pytest.approx(ref, rel=2e-2, abs=1e-3), pairs2
        assert loss2 != pytest.approx(ref_loss, rel=1e-6)
        ref_ed.set_train(False)


# ---------------------------------------------------------------------------
# RECIPE_VL
# ---------------------------------------------------------------------------

def _trim_cases(rig):
    """One generality key / one locality key per case so every
    key/entry index draw is forced to 0 on both sides (recipe's
    organize draws them independently; see _ScriptedRng)."""
    import copy as _copy

    from devqa_tpu.data.schema import TestCase

    ours, theirs = [], []
    for oc, rc in zip(rig["our_cases"], rig["ref_cases"]):
        ours.append(TestCase(
            requests=[dict(oc.requests[0])],
            generality={"text_rephrase":
                        _copy.deepcopy(oc.generality["text_rephrase"])},
            locality={"t2i1": _copy.deepcopy(oc.locality["t2i1"])}))
        theirs.append({
            "requests": [dict(rc["requests"][0])],
            "generality": {"text_rephrase":
                           _copy.deepcopy(rc["generality"]["text_rephrase"])},
            "locality": {"t2i1": _copy.deepcopy(rc["locality"]["t2i1"])}})
    return ours, theirs


@pytest.fixture(scope="module")
def recipe_train_pair(rig):
    from transformers import RobertaTokenizer

    from test_reference_oracle import _make_tiny_roberta

    from devqa_tpu.core.bert import BertConfig
    from devqa_tpu.editors.recipe_vl import (RECIPEvlConfig,
                                             RECIPEvlTrainable)

    rob_dir = _make_tiny_roberta(rig["tmp"])
    rv = _fresh_ref_vllm(rig["hf_tok"], rig["model"])

    from editor.vllm_editors.recipe_vl.recipe_vl import RECIPEvl as RefRECIPE
    from editor.vllm_editors.recipe_vl.recipe_vl import \
        RECIPEvlConfig as RefCfg

    ref_cfg = RefCfg(
        edit_model_name="tiny-blip2", model_hidden_size=16, retr_top_k=2,
        train=RefCfg.TrainConfig(
            krm_lr=1e-4, pt_lr=1e-4, relia_lambda=1.0, gen_lambda=1.0,
            loc_lambda=1.0, contra_lambda=1.0, query_knowledge_t=1.0,
            query_prototype_t=1.0, constra_hinge_scale=1.2,
            edit_hinge_scale=1.2),
        krm=RefCfg.KRMConfig(
            krm_base_path=rob_dir, krm_base_dim=768, prompt_token_n=2,
            knowledge_rep_dim=20, knowl_rep_prot_token_n=3))
    torch.manual_seed(53)
    ref_ed = RefRECIPE(rv, ref_cfg, device="cpu")
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "BestRECIPETrain")
    torch.save(ckpt, path)

    our_ed = RECIPEvlTrainable(
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
                max_positions=128, type_vocab_size=1, norm_eps=1e-5),
            # pt_lr == krm_lr: the reference's optimizer puts BOTH module
            # groups at krm_lr (recipe_vl.py:306-308) — pt_lr is parsed
            # but never reaches the optimizer there.
            train=RECIPEvlConfig.TrainConfig(
                krm_lr=1e-4, pt_lr=1e-4, relia_lambda=1.0, gen_lambda=1.0,
                loc_lambda=1.0, contra_lambda=1.0, query_knowledge_t=1.0,
                query_prototype_t=1.0, constra_hinge_scale=1.2,
                edit_hinge_scale=1.2)),
        text_tokenizer=RobertaTokenizer.from_pretrained(rob_dir))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestRECIPEvlTrainOracle:
    def test_one_step_loss_components(self, rig, recipe_train_pair):
        """recipe_vl.py:170-259 train_a_batch: q1/q2/q3 contrastive
        retrieval losses (hinge-selected, prototype-gated), prompted
        rel/gen CE, prompted loc KL(post‖pre), one Adam step. Coins
        (rel-vs-gen picks for q1/q2) are scripted identically on both
        sides; all other draws are forced to 0 by single-key cases."""
        ref_ed, our_ed = recipe_train_pair
        our_cases, ref_cases = _trim_cases(rig)
        coins = [0, 1, 1, 0, 1, 1]  # (q1, q2) per case
        ref_ed.rng_data_proc = _ScriptedRng(coins)
        our_ed._rng_data = _ScriptedRng(coins)

        ref_ed.set_train(True)  # organize must keep images + bare fwd
        # dropout off (see TestSERACvlTrainOracle): the RoBERTa KRM and
        # the prompt transformer both default to p=0.1.
        ref_ed.knowl_rep_model.eval()
        ref_ed.prompt_transformer.eval()
        organized = ref_ed.organize_batch_data(ref_cases)
        ref_ed.opt = ref_ed.get_a_new_optimizer()
        ref_loss, ref_log = ref_ed.train_a_batch(organized)

        batch = our_ed.organize_batch_data(our_cases)
        assert batch["B"] == B
        loss, logs = our_ed.train_step(batch)

        pairs = [
            (logs["contra_loss"], ref_log["Contrastive loss"]),
            (logs["rel_loss"], ref_log["Reliability loss"]),
            (logs["gen_loss"], ref_log["Generality loss"]),
            (logs["loc_loss"], ref_log["Locality loss"]),
            (loss, ref_loss),
        ]
        for ours, ref in pairs:
            assert ours == pytest.approx(ref, rel=2e-3, abs=2e-4), pairs

        ref_loss2, _ = ref_ed.train_a_batch(organized)
        loss2, _ = our_ed.train_step(batch)
        assert loss2 == pytest.approx(ref_loss2, rel=5e-3, abs=5e-4)
        assert loss2 != pytest.approx(ref_loss, rel=1e-6)
        ref_ed.set_train(False)


# ---------------------------------------------------------------------------
# LTE_VL
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lte_train_pair(rig):
    from sentence_transformers import SentenceTransformer

    from test_reference_oracle import _make_tiny_st

    from devqa_tpu.editors.lte_vl import LTEvlConfig, LTEvlTrainable

    st_dir = _make_tiny_st(rig)
    st = SentenceTransformer(st_dir, device="cpu")
    rv = _fresh_ref_vllm(rig["hf_tok"], rig["model"])

    from editor.vllm_editors.lte_vl.lte_vl import LTEvl as RefLTE
    from editor.vllm_editors.lte_vl.lte_vl import LTEvlConfig as RefLTECfg

    ref_cfg = RefLTECfg(
        edit_model_name="tiny-blip2",
        train_config=RefLTECfg.TrainConfig(
            lr=1e-3, relia_lambda=1.0, gen_lambda=1.0, loc_lambda=1.0),
        fine_tune_modules_path="language_model",
        retriever_path=st_dir, retrieval_embed_dim=24, sim_threshold=0.3)
    ref_ed = RefLTE(rv, ref_cfg, device="cpu")
    ref_ed.vllm_proc_data = rv  # the reference's separate data-prep model
    ckpt = {"i": 0, "epoch": 0, "loss": 0.0, "ema_loss": None,
            "train_modules": {
                k: v.state_dict()
                for k, v in ref_ed.get_modules_for_training().items()}}
    path = os.path.join(rig["tmp"], "BestLTETrain")
    torch.save(ckpt, path)

    # LTE fine-tunes the wrapper's decoder IN PLACE — give it its own
    # JaxVLLM so the module-shared rig["vllm"] stays pristine.
    our_vllm = JaxVLLM(rig["cfg"], rig["vllm"].params,
                       HFTokenizerAdapter(rig["hf_tok"]),
                       FileImageProvider(IMG_SIZE), bucket_multiple=8)
    our_ed = LTEvlTrainable(
        our_vllm,
        LTEvlConfig(edit_model_name="tiny-blip2", retrieval_embed_dim=24,
                    sim_threshold=0.3, max_edits=8, max_prefix_len=32,
                    train_config=LTEvlConfig.TrainConfig(
                        lr=1e-3, relia_lambda=1.0, gen_lambda=1.0,
                        loc_lambda=1.0)),
        sentence_encoder=lambda texts: st.encode(list(texts)))
    load_reference_editor_ckpt(our_ed, path)
    return ref_ed, our_ed


class TestLTEvlTrainOracle:
    def test_one_step_loss_components(self, rig, lte_train_pair):
        """lte_vl.py:205-240 train_a_batch: prefixed rel/gen CE + the
        averaged two-branch locality KL(pre‖unprefixed)+KL(pre‖prefixed),
        one Adam step over the WHOLE language model, vs the reference's
        executable. rng-free on both sides (batch of 1, all picks [0])."""
        ref_ed, our_ed = lte_train_pair
        ref_ed.set_train(True)
        # dropout off (see TestSERACvlTrainOracle): set_train flipped the
        # fine-tuned language_model to train mode (OPT dropout p=0.1).
        # eval() the whole backbone — requires_grad is untouched.
        ref_ed.vllm.model.eval()
        # The fixture shares ONE BLIP-2 between vllm and vllm_proc_data
        # (the reference trains with two separate copies, train.py's
        # data-proc model); set_train's trailing
        # vllm_proc_data.requires_grad_(False) (lte_vl.py:162-164)
        # therefore also froze the fine-tuned language_model. Re-enable —
        # exactly the state a separate proc-data model would leave.
        for v in ref_ed.get_modules_for_training().values():
            v.requires_grad_(True)
        # organize under no_grad, as the frozen proc-data model would
        # produce: its prefix/xym/pre_logits are CONSTANTS of training
        # (lte_vl.py:172-189 runs them through vllm_proc_data), so each
        # train_a_batch must build a fresh graph — with grads attached
        # here, the second step would hit torch's freed-graph error.
        with torch.no_grad():
            organized = ref_ed.organize_batch_data([rig["ref_cases"][0]])
        ref_ed.opt = ref_ed.get_a_new_optimizer()
        ref_loss, ref_log = ref_ed.train_a_batch(organized)

        batch = our_ed.organize_batch_data([rig["our_cases"][0]])
        loss, logs = our_ed.train_step(batch)

        pairs = [
            (logs["rel_loss"], ref_log["Reliability loss"]),
            (logs["gen_loss:image_rephrase"],
             ref_log["Generality loss"]["image_rephrase"]),
            (logs["loc_loss:t3i3"], ref_log["Locality loss"]["t3i3"]),
            (loss, ref_loss),
        ]
        for ours, ref in pairs:
            assert ours == pytest.approx(ref, rel=2e-3, abs=2e-4), pairs

        # second step on the SAME batch: pins the Adam update over the
        # full decoder (the reference reuses organize-time pre_logits;
        # ours uses the pristine frozen decoder — identical by
        # construction).
        ref_loss2, _ = ref_ed.train_a_batch(organized)
        loss2, _ = our_ed.train_step(batch)
        assert loss2 == pytest.approx(ref_loss2, rel=5e-3, abs=5e-4)
        assert loss2 != pytest.approx(ref_loss, rel=1e-6)
        ref_ed.set_train(False)
