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
