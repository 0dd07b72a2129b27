"""Editor abstraction.

Mirrors the reference's ``VLLMBaseEditor`` public surface
(``editor/vllm_editors/base.py:20-63``: ``name_of_editor_and_model``,
``restore_to_original_model``, ``edit_one_piece``, ``edit_batch``,
``if_can_batch_edit``) but replaces its integration mechanism — monkey-
patched ``get_llm_outpt`` + forward hooks — with two explicit hooks the
evaluation harness calls:

- :meth:`build_query_batch` — lets prompt-space editors (IKE/LTE/RECIPE)
  transform queries before encoding;
- :meth:`query_logits` — computes logits for a QueryBatch under the
  current edit state (intervention editors override this; parameter-space
  editors simply keep an edited params pytree).

Edit state must be **functionally reset-able**: ``restore_to_original_model``
returns the editor to the pre-edit state without reloading the backbone
(the harness calls it between splits, vllm_editor_eval.py:98,122).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import token_accuracy
from ..core.wrapper import JaxVLLM, QueryBatch

# request = {'image': path|None, 'prompt': str, 'target_new': str}
EditRequest = Dict

# One fused metrics program for the composed query_metrics fallback
# (eager per-op dispatch is pathological on remote-compile runtimes).
_metrics_jit = jax.jit(token_accuracy)


def instance_jit(**jit_kwargs):
    """Mark a method for INSTANCE-held jit binding (performed by
    ``VLLMEditor.__init__``): the PjitFunction and its executable cache
    then live on the editor instance and are released with it.
    ``@jax.jit`` on a method with a static ``self`` pins the editor — and
    through ``self.vllm`` the multi-GB backbone params — in the
    class-level cache long after deletion (same rule as
    core/wrapper.py's instance-held jits). ``static_argnums`` are
    relative to the BOUND call, i.e. ``self`` excluded."""
    def mark(fn):
        fn._instance_jit_kwargs = jit_kwargs
        return fn

    return mark


class VLLMEditor(ABC):
    def __init__(self, vllm: JaxVLLM):
        self.vllm = vllm
        self._bind_instance_jits()

    def _bind_instance_jits(self):
        import jax

        seen = set()
        for klass in type(self).__mro__:
            for name, fn in vars(klass).items():
                if name in seen:
                    continue
                seen.add(name)  # most-derived definition wins
                kw = getattr(fn, "_instance_jit_kwargs", None)
                if kw is not None:
                    setattr(self, name, jax.jit(fn.__get__(self), **kw))

    @abstractmethod
    def name_of_editor_and_model(self) -> Tuple[str, str]:
        ...

    @abstractmethod
    def restore_to_original_model(self) -> None:
        ...

    @abstractmethod
    def edit_one_piece(self, request: EditRequest) -> None:
        ...

    def edit_batch(self, requests: List[EditRequest],
                   pad_width: Optional[int] = None) -> None:
        """Apply a batch of edits.

        ``pad_width`` is an optional shape-stability HINT: an editor MAY
        pad its device batch to this width — masking the padding out of
        its state update — so a ragged tail chunk reuses the already
        compiled program (the fused harness passes its ``edit_chunk``).
        Padding is only exact when the state update can mask padded rows
        without changing results (LiveEdit's independent ring appends
        can; FT/MEND-style batch-mean objectives cannot), so the default
        and most editors ignore the hint.
        """
        if not self.if_can_batch_edit():
            raise NotImplementedError(
                "%s does not support batch editing" % type(self).__name__)
        for r in requests:
            self.edit_one_piece(r)

    def if_can_batch_edit(self) -> bool:
        return False

    # ---------------- harness integration ----------------

    def build_query_batch(self, prompts, image_paths, targets) -> QueryBatch:
        """Encode evaluation queries. Prompt-space editors override to
        prepend demonstrations / prefixes before encoding."""
        return self.vllm.encode_queries(prompts, image_paths, targets)

    def query_logits(self, qb: QueryBatch) -> jnp.ndarray:
        """Logits under the current edit state. Default: the (possibly
        parameter-edited) backbone with no runtime intervention."""
        return self.vllm.logits(qb.embeds, qb.kv_valid)

    def query_metrics(self, qb: QueryBatch):
        """(acc [B], pred_ids [B, L]) under the current edit state —
        metric-identical to ``token_accuracy(self.query_logits(qb), ...)``.

        Editors whose query path goes through ``vllm.logits`` (this
        default) get the wrapper's fused forward+metrics program (the
        [B, L, vocab] logits never round-trip HBM between dispatches);
        editors with their own jitted forwards may override with a fused
        program of their own (LiveEdit does) — or inherit this composed
        fallback, which stays correct at the cost of one extra dispatch.
        """
        if type(self).query_logits is VLLMEditor.query_logits:
            return self.vllm.logits_metrics(qb.embeds, qb.kv_valid,
                                            qb.label_ids, qb.label_masks)
        return _metrics_jit(self.query_logits(qb), qb.label_ids,
                            qb.label_masks)

    def query_metrics_packed(self, pq):
        """(acc [B], pred_ids, valid_or_None) from a :class:`PackedQuery`
        — the ONE-program probe path (wrapper.encode_queries_packed);
        ``valid`` is the gathered-layout validity mask when the wrapper
        took its gathered-head program (wrapper.packed_logits_metrics),
        else None with full-layout preds. Returns None when this editor's
        query semantics can't ride it: editors that override
        ``build_query_batch`` (prompt-space demos) or ``query_logits``
        (custom forwards) need their own packed program (LiveEdit has
        one) or the classic QueryBatch path.
        """
        if (type(self).build_query_batch is VLLMEditor.build_query_batch
                and type(self).query_logits is VLLMEditor.query_logits):
            return self.vllm.packed_logits_metrics(pq)
        return None
