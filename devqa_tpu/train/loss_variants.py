"""DE-VQA's analysis training-loss variants.

Rebuild of the ``config.loss`` family in
``easyeditor/trainer/MultimodalTrainer.py:295-1043``. On top of the base
objective (cedit·l_edit + cloc·(l_loc + l_image_loc) + iedit·l_image_edit)
each variant adds KL-anchoring / contrastive terms built from four extra
probe batches:

- **TC** (``tv_loc_image_train``, vqa.py:329-338): the edit prompt+target
  paired with the RANDOM (m_loc) image — anchors behavior under an
  unrelated image.
- **TO**: the edit query with image=None — anchors the text-only path
  (MultimodalTrainer.py:375-379).
- **IC** (``close_edit``): the retrieved similar question (t2) with the
  edit image (:400-405).
- **TO_IC** ('3IC'): the close question with image=None (:393-398).
- **cl**: a triplet contrastive term over sigmoid-pooled (vision-part,
  text-part) logits: anchor = post-edit inner, positive = post-edit
  image-rephrase, negatives = post-edit TC and IC, margin 0.5 (:640-670).

Variant → term table (:585-738):
  '0' base; '1' TC+TO; '2' TC; '3' TO; '3IC' TO_IC; '4' IC;
  '5' TC+TO+IC; '6' TO+IC; '7' TC+IC; 'cl' CL; 'cl_n' CL+TO.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

#: extra terms per variant. 'to_ic' replaces 'to' for the '3IC' variant.
VARIANT_TERMS: Dict[str, Tuple[str, ...]] = {
    "0": (),
    "1": ("tc", "to"),
    "2": ("tc",),
    "3": ("to",),
    "3IC": ("to_ic",),
    "4": ("ic",),
    "5": ("tc", "to", "ic"),
    "6": ("to", "ic"),
    "7": ("tc", "ic"),
    "cl": ("cl",),
    "cl_n": ("cl", "to"),
}

#: probe batches each term consumes (pre- and post-edit forwards).
TERM_PROBES: Dict[str, Tuple[str, ...]] = {
    "tc": ("tc",),
    "to": ("to",),
    "to_ic": ("to_ic",),
    "ic": ("ic",),
    "cl": ("tc", "ic"),  # plus inner/image-rephrase logits from the base step
}


def required_probes(variant: str) -> Tuple[str, ...]:
    terms = VARIANT_TERMS[variant]
    out = []
    for t in terms:
        for p in TERM_PROBES[t]:
            if p not in out:
                out.append(p)
    return tuple(out)


def kl_anchor(pre_logits, post_logits, kv_valid) -> jnp.ndarray:
    """``kl_loc_loss`` semantics (evaluate_utils.py:474-497): token-level
    KL(pre ‖ post) over the full sequence, averaged over attended
    positions."""
    lp1 = jax.nn.log_softmax(jax.lax.stop_gradient(pre_logits), -1)
    lp2 = jax.nn.log_softmax(post_logits, -1)
    kl = (jnp.exp(lp1) * (lp1 - lp2)).sum(-1)       # [B, L]
    m = kv_valid.astype(jnp.float32)
    return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)


def _pooled_feat(logits, vt_range) -> jnp.ndarray:
    """sigmoid(logits) mean-pooled over the vision block and over the rest,
    concatenated — the reference's (image-part, text-part) feature
    (MultimodalTrainer.py:643-648; it splits at the static image-token
    count, which is exactly the slot layout's vt_range)."""
    lo, hi = vt_range
    s = jax.nn.sigmoid(logits)
    if hi > lo:
        img = s[:, lo:hi].mean(axis=1)
    else:
        # Text-only configs (V=0): a mean over the empty vision block is
        # NaN and silently poisons the contrastive loss — use zeros.
        img = jnp.zeros_like(s[:, 0])
    txt = jnp.concatenate([s[:, :lo], s[:, hi:]], axis=1).mean(axis=1)
    return jnp.concatenate([img, txt], axis=-1)


def contrastive_term(inner_logits, pos_logits, neg_tc_logits, neg_ic_logits,
                     vt_range, margin: float = 0.5) -> jnp.ndarray:
    """Triplet loss over pooled logits features (MultimodalTrainer
    :650-670): pull the image-rephrase toward the edit, push TC/IC away."""
    def cos(a, b):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
        return (a * b).sum(-1)

    anchor = _pooled_feat(inner_logits, vt_range)
    pos = _pooled_feat(pos_logits, vt_range)
    n1 = _pooled_feat(neg_tc_logits, vt_range)
    n2 = _pooled_feat(neg_ic_logits, vt_range)
    sp, s1, s2 = cos(anchor, pos), cos(anchor, n1), cos(anchor, n2)
    return (jax.nn.relu(s1 - sp + margin)
            + jax.nn.relu(s2 - sp + margin)).mean()


def variant_extra_losses(
    variant: str,
    vt_range: Tuple[int, int],
    pre: Dict[str, jnp.ndarray],
    post: Dict[str, jnp.ndarray],
    masks: Dict[str, jnp.ndarray],
    inner_logits=None,
    image_rephrase_logits=None,
) -> Dict[str, jnp.ndarray]:
    """Assemble the variant's extra loss dict.

    ``pre``/``post``: probe name → logits (pre- on the unedited model,
    post- under the edit); ``masks``: probe name → kv_valid.
    Returns {term_name: scalar} — sum them into the total (the reference
    adds them unweighted, :589-738).
    """
    out: Dict[str, jnp.ndarray] = {}
    for term in VARIANT_TERMS[variant]:
        if term == "tc":
            out["l_loc_tv"] = kl_anchor(pre["tc"], post["tc"], masks["tc"])
        elif term in ("to", "to_ic"):
            key = "to" if term == "to" else "to_ic"
            out["l_text_only_loc"] = kl_anchor(pre[key], post[key], masks[key])
        elif term == "ic":
            out["l_ic"] = kl_anchor(pre["ic"], post["ic"], masks["ic"])
        elif term == "cl":
            out["cl_loss"] = contrastive_term(
                inner_logits, image_rephrase_logits, post["tc"], post["ic"],
                vt_range)
    return out
