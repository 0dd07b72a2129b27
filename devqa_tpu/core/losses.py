"""Losses and metrics over full-layout logits.

JAX counterparts of ``BaseVLLMForEdit.label_loss`` (base.py:111-119),
``logit_KL_loss`` (base.py:121-132) and the evaluation's
``accuracy_and_prediction`` (evaluation/vllm_editor_eval.py:143-150).

Unlike the reference — which aligns a "short" label array against the
logit tail via ``logits[:, -label_ids.shape[1]:]`` — all arrays here are
already in the full batched layout: ``label_ids[b, j]`` is the token that
position j predicts and ``label_masks`` marks supervised positions, so the
math is a straight masked gather (see data/xym.py for the equivalence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_loss(logits, label_ids, label_masks, average: bool = True):
    """Masked next-token cross-entropy. logits [B,L,V] f32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, label_ids[..., None], axis=-1)[..., 0]
    m = label_masks.astype(jnp.float32)
    loss = -(picked * m).sum()
    if average:
        loss = loss / jnp.maximum(m.sum(), 1.0)
    return loss


def logit_kl_loss(logits1, logits2, label_masks, average: bool = True):
    """KL(p1 || p2) over supervised positions (locality-preservation loss)."""
    lp1 = jax.nn.log_softmax(logits1.astype(jnp.float32), axis=-1)
    lp2 = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=-1)
    p1 = jnp.exp(lp1)
    kl = (p1 * (lp1 - lp2)).sum(-1)  # [B, L]
    m = label_masks.astype(jnp.float32)
    loss = (kl * m).sum()
    if average:
        loss = loss / jnp.maximum(m.sum(), 1.0)
    return loss


def predict_ids(logits):
    """Argmax token predictions [B, L] (the reference's softmax→argmax —
    same argmax)."""
    return jnp.argmax(logits, axis=-1)


def gathered_label_positions(label_masks, n_pos: int):
    """Per-row indices of the first ``n_pos`` supervised positions.

    ``jnp.argsort`` is stable, so supervised positions come out in
    ascending sequence order; rows with fewer than ``n_pos`` labels are
    padded with unsupervised positions whose returned validity is 0.
    Callers must guarantee no row has MORE than ``n_pos`` supervised
    positions (checked on host against the label-mask row sums — a
    dropped position would silently change the metric).

    Returns (positions [B, n_pos] i32, valid [B, n_pos] i32).
    """
    order = jnp.argsort(1 - label_masks.astype(jnp.int32),
                        axis=-1)[:, :n_pos]
    valid = jnp.take_along_axis(label_masks.astype(jnp.int32), order,
                                axis=-1)
    return order, valid


def gathered_token_accuracy(hidden, label_ids, label_masks, n_pos: int,
                            head_fn=None, pred_fn=None):
    """``token_accuracy`` with the LM head evaluated ONLY at supervised
    positions: gather [B, n_pos, d] hidden rows, then ``head_fn`` →
    argmax. The teacher-forced metric never reads logits at unsupervised
    positions, so projecting all L positions onto the vocabulary is pure
    waste — at the headline geometry (96-token rows, ≤32 supervised) the
    full head is the single most expensive op after the layer matmuls
    (26.5ms of a 433ms chunk, scripts/profile_headline.py) and 2/3 of it
    drops out here. Same accuracy, bit-for-bit.

    Returns (acc [B], pred [B, n_pos], valid [B, n_pos]) — ``pred`` is in
    GATHERED layout: ``pred[b][valid[b] == 1]`` equals
    ``full_pred[b][label_masks[b] == 1]`` of the classic path, which is
    the only slice any consumer reads (eval/harness result assembly,
    locality_agreement).
    """
    pos, valid = gathered_label_positions(label_masks, n_pos)
    h = jnp.take_along_axis(hidden, pos[..., None], axis=1)
    # pred_fn (e.g. decoder.decoder_pred_ids) maps gathered hidden rows
    # straight to argmax ids without materializing [B, n_pos, V] f32
    # logits — bit-identical to predict_ids(head_fn(h)).
    pred = pred_fn(h) if pred_fn is not None else predict_ids(head_fn(h))
    lab = jnp.take_along_axis(label_ids, pos, axis=-1)
    m = valid.astype(jnp.float32)
    acc = ((pred == lab).astype(jnp.float32) * m).sum(-1) \
        / jnp.maximum(m.sum(-1), 1.0)
    return acc, pred, valid


def token_accuracy(logits, label_ids, label_masks):
    """Per-row masked argmax accuracy — ``accuracy_and_prediction``.

    Returns (acc [B], pred_ids [B, L]).
    """
    pred = predict_ids(logits)
    m = label_masks.astype(jnp.float32)
    correct = (pred == label_ids).astype(jnp.float32) * m
    acc = correct.sum(-1) / jnp.maximum(m.sum(-1), 1.0)
    return acc, pred


def agreement_accuracy(pred_ids, ref_ids, label_masks):
    """Locality drift metric: post-edit argmax vs pre-edit argmax agreement
    (vllm_editor_eval.py:167-174). Returns acc [B]."""
    m = label_masks.astype(jnp.float32)
    same = (pred_ids == ref_ids).astype(jnp.float32) * m
    return same.sum(-1) / jnp.maximum(m.sum(-1), 1.0)
