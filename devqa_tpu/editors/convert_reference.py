"""Reference-trained editor checkpoint interop.

The reference persists trained editors as ``torch.save`` blobs named
"Best" with ``{'train_modules': {name: state_dict}, 'i','epoch','loss',
'ema_loss','opt',...}`` (editor/vllm_editors/base.py:237-255). These
loaders map those state dicts onto this framework's editor param
pytrees, so a user switching frameworks can reuse editors they already
meta-trained on the reference:

- LiveEdit (liveedit.py:235-239 registers edit_extractor /
  inpt_extractor / moegen_c / moegen_r / instant_reps_norm);
- MEND_VL (mend_vl.py:238-240 registers aux_models keyed by the
  "(in, out)" shape string — the same keying this framework uses — and
  the flat edit_lrs ParameterList in shape-grouped module order).

Caveat: the reference's TRAINING path re-runs the edit layer
(forward_from_mid_layer quirk); evaluate reference-trained LiveEdit
checkpoints with ``LiveEditConfig.faithful_mid_layer_rerun`` in mind
when comparing training losses (inference-time behavior matches).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _arr(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return jnp.asarray(np.asarray(v, np.float32))


def _attention(sd, prefix):
    """torch modules.Attention (q_mlp/k_mlp/v_mlp Linears) → our
    init_attention layout ([in, out] weights)."""
    return {name: {"w": _arr(sd, f"{prefix}.{t}_mlp.weight").T,
                   "b": _arr(sd, f"{prefix}.{t}_mlp.bias")}
            for name, t in (("q", "q"), ("k", "k"), ("v", "v"))}


def _ln(sd, prefix):
    return {"scale": _arr(sd, prefix + ".weight"),
            "bias": _arr(sd, prefix + ".bias")}


def _qv_extractor(sd, vis_prot: bool):
    p = {
        "ln1": _ln(sd, "layer_norm1"),
        "eqe1": _arr(sd, "eqe1"),
        "ca_query1": _attention(sd, "ca_query_info_ext1"),
        "ca_vision": _attention(sd, "ca_vision_info_ext"),
        "ln2": _ln(sd, "layer_norm2"),
        "eqe2": _arr(sd, "eqe2"),
        "ca_query2": _attention(sd, "ca_query_info_ext2"),
    }
    if vis_prot:
        p["vis_rep_prot"] = _arr(sd, "vis_rep_prot")
    return p


def _lowrank(sd):
    return {"phi": _arr(sd, "phi"),
            "ca": _attention(sd, "ca_lora"),
            "ln": _ln(sd, "layer_norm")}


def convert_liveedit_train_modules(tm: Dict[str, Dict]) -> Dict:
    """ckpt['train_modules'] → LiveEdit param pytree."""
    return {
        "edit_extractor": _qv_extractor(tm["edit_extractor"],
                                        vis_prot=False),
        "inpt_extractor": _qv_extractor(tm["inpt_extractor"], vis_prot=True),
        "moegen_c": _lowrank(tm["moegen_c"]),
        "moegen_r": _lowrank(tm["moegen_r"]),
        # a bare nn.LayerNorm state_dict keys are "weight"/"bias"
        "instant_reps_norm": {
            "scale": _arr(tm["instant_reps_norm"], "weight"),
            "bias": _arr(tm["instant_reps_norm"], "bias")},
    }


def convert_mend_train_modules(tm: Dict[str, Dict], targets, shape_of,
                               n_hidden: int) -> Tuple[Dict, Dict]:
    """ckpt['train_modules'] → (MEND params, norm_state).

    ``targets``/``shape_of``: the editor's (layer, module) list and
    module→(in, out) map (MENDvl attributes) — used to reproduce the
    reference's shape-grouped flat edit_lrs order (mend_vl.py:200-223).
    """
    aux_sd = tm["aux_models"]
    groups: Dict[tuple, list] = {}
    for t in targets:
        groups.setdefault(shape_of[t[1]], []).append(t)
    params = {"aux": {}, "edit_lrs": {}}
    norm_state = {}
    for shape in groups:
        key = str(shape)
        layers = []
        for i in range(n_hidden + 1):
            p = f"{key}.mlp.layers.{i}."
            layers.append({
                "u": _arr(aux_sd, p + "u"),
                "v": _arr(aux_sd, p + "v"),
                "bias": _arr(aux_sd, p + "bias"),
                "mode_scale": _arr(aux_sd, p + "mode_scale.weight"),
                "mode_shift": _arr(aux_sd, p + "mode_shift.weight"),
            })
        params["aux"][key] = {"layers": layers}
        norm_state[key] = {
            "u_mean": _arr(aux_sd, key + ".u_mean"),
            "u_s": _arr(aux_sd, key + ".u_s"),
            "v_mean": _arr(aux_sd, key + ".v_mean"),
            "v_s": _arr(aux_sd, key + ".v_s"),
            "k": _arr(aux_sd, key + ".k").reshape(()),
        }
    lr_sd = tm["edit_lrs"]
    flat = [t for shape in groups for t in groups[shape]]
    for i, (l, m) in enumerate(flat):
        params["edit_lrs"]["%d.%s" % (l, m)] = _arr(lr_sd, str(i)).reshape(())
    return params, norm_state


def _resblock_ref(sd, prefix):
    """torch serac modules.ResBlock → our _init_resblock layout."""
    return {
        "ln": {"scale": _arr(sd, prefix + ".l_in_norm.weight"),
               "bias": _arr(sd, prefix + ".l_in_norm.bias")},
        "l_in": {"w": _arr(sd, prefix + ".l_in.weight").T,
                 "b": _arr(sd, prefix + ".l_in.bias")},
        "l_mid": {"w": _arr(sd, prefix + ".l_mid.weight").T,
                  "b": _arr(sd, prefix + ".l_mid.bias")},
        "l_out": {"w": _arr(sd, prefix + ".l_out.weight").T,
                  "b": _arr(sd, prefix + ".l_out.bias")},
    }


def convert_serac_train_modules(tm: Dict[str, Dict], cfg) -> Dict:
    """ckpt['train_modules'] → SERAC param pytree (serac_vl.py:114-115
    registers counterfact_model + classifier; their sub-state-dicts embed
    full HF BertModel / OPTForCausalLM trees)."""
    from ..core import bert as bert_mod
    from ..core import convert_hf as C

    cl = tm["classifier"]
    cf = tm["counterfact_model"]
    return {
        "classifier": {
            "bert": bert_mod.convert_hf_bert(cl, cfg.classifier,
                                             prefix="classifier."),
            "proj": _resblock_ref(cl, "classifier_proj"),
            "ln": {"scale": _arr(cl, "ln.weight"),
                   "bias": _arr(cl, "ln.bias")},
        },
        "counterfact": {
            "lm": C.convert_opt(cf, cfg.counterfact,
                                "counterfact_model.model.decoder."),
            "proj_in": _resblock_ref(cf, "counterfact_model_proj_in"),
            "proj_out": _resblock_ref(cf, "counterfact_model_proj_out"),
        },
    }


def convert_recipe_train_modules(tm: Dict[str, Dict], cfg) -> Dict:
    """ckpt['train_modules'] → RECIPE param pytree (recipe_vl.py:302-303
    registers knowl_rep_model + prompt_transformer; the KRM sub-state-dict
    embeds a full HF RobertaModel tree)."""
    from ..core import bert as bert_mod

    krm = tm["knowl_rep_model"]
    pt = tm["prompt_transformer"]
    enc = bert_mod.convert_hf_bert(krm, cfg.encoder, prefix="base_model.")
    # RoBERTa position ids are pad-offset: valid tokens sit at 2,3,4,…
    # (create_position_ids_from_input_ids, padding_idx=1). This build's
    # encoder indexes positions from 0 over right-padded rows, so the
    # faithful table is the HF one shifted by the 2-slot offset.
    enc["pos_embed"] = enc["pos_embed"][2:]

    def dense(sd, prefix):
        return {"w": _arr(sd, prefix + ".weight").T,
                "b": _arr(sd, prefix + ".bias")}

    return {
        "encoder": enc,
        "pooler": dense(krm, "base_model.pooler.dense"),
        "knowl_mlp1": dense(krm, "knowl_trans_mlp1"),
        "knowl_mlp2": dense(krm, "knowl_trans_mlp2.0"),
        "query_mlp1": dense(krm, "query_trans_mlp1"),
        "query_mlp2": dense(krm, "query_trans_mlp2.0"),
        "prot_tokens": _arr(krm, "prot_tokens"),
        "prompt_l1": dense(pt, "l1.0"),
        "prompt_l2": dense(pt, "l2"),
    }


def load_reference_editor_ckpt(editor, path: str) -> None:
    """torch-load a reference 'Best' checkpoint into ``editor``
    (LiveEdit / MENDvl instances; base.py:257-268 load_ckpt role)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    tm = obj["train_modules"]
    name = type(editor).__name__
    if "LiveEdit" in name:
        editor.params = convert_liveedit_train_modules(tm)
    elif "MEND" in name:
        params, norm_state = convert_mend_train_modules(
            tm, editor.targets, editor.shape_of,
            editor.cfg.aux_model.n_hidden)
        editor.params = params
        editor.norm_state = norm_state
    elif "SERAC" in name:
        editor.params = convert_serac_train_modules(tm, editor.cfg)
    elif "RECIPE" in name:
        editor.params = convert_recipe_train_modules(tm, editor.cfg)
        editor.restore_to_original_model()  # prototype rep ← new params
    elif "LTE" in name:
        # LTE's trained state IS the fine-tuned language model
        # (lte_vl.py:191-193 registers {'llm': find_module(...,
        # fine_tune_modules_path)}, 'language_model' in every shipped
        # config) — map it onto the wrapper's decoder params.
        from ..core import convert_hf as C

        dcfg = editor.vllm.cfg.decoder
        if dcfg.arch != "opt":
            raise NotImplementedError(
                "LTE reference-ckpt load: arch %r" % dcfg.arch)
        editor.vllm.params = dict(
            editor.vllm.params,
            decoder=C.convert_opt(tm["llm"], dcfg, "model.decoder."))
    else:
        raise NotImplementedError(name)
