"""Generic editor-training loop.

Rebuild of ``VLLMBaseEditorWithTraining``'s training template
(``editor/vllm_editors/base.py:67-268``): seeded init, background-
prefetched batches, per-batch ``train_step``, EMA-smoothed loss with
save-on-new-best checkpointing (base.py:207-220, checkpoint always named
"Best" :253), scalar logging, and resume.

Checkpoints are orbax pytrees of {editor params, opt state, counters}
instead of a single ``torch.save`` blob.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Protocol, Tuple, runtime_checkable

import numpy as np

from ..data.prefetch import ParallelDataset
from ..data.schema import BaseVLLMEditData


@runtime_checkable
class TrainableEditor(Protocol):
    """Implemented by trainable editors (LiveEdit, MEND, SERAC, …)."""

    def name_of_editor_and_model(self) -> Tuple[str, str]: ...

    def organize_batch_data(self, cases: List) -> object:
        """Host-side batch organization (tokenize/encode/sample) — runs in
        the prefetch thread (the reference's 2nd-GPU data-proc replica,
        liveedit.py:251-352, becomes host prep + on-device prefix reps)."""

    def train_step(self, batch) -> Tuple[float, Dict[str, float]]:
        """One optimization step; owns its optimizer state."""

    def train_init_editor(self, seed: int) -> None:
        """(Re)initialize trainable params + optimizer state."""

    def get_train_state(self) -> Dict: ...

    def set_train_state(self, state: Dict) -> None: ...

    def val_step(self, batch) -> Tuple[float, Dict[str, float]]:
        """Loss on a batch WITHOUT changing trainable state. Editors get
        this for free from functional updates: snapshot the state pytree
        (reference sharing — no copy), run ``train_step``, restore."""


def default_val_step(editor: TrainableEditor, batch):
    import jax

    # tree_map-identity rebuilds the CONTAINERS: some editors reassign
    # dict entries in place (MEND's Welford norm_state), and restoring a
    # reference to the same mutated dict would be a no-op — validation
    # batches would permanently pollute the training statistics.
    state = jax.tree_util.tree_map(lambda x: x, editor.get_train_state())
    # Also pin any host RNG streams the step consumes (get_train_state
    # captures device pytrees only): validation must not perturb the
    # seeded training trajectory.
    rngs = {n: getattr(editor, n).bit_generator.state
            for n in ("_rng_data", "_rng_train")
            if isinstance(getattr(editor, n, None), np.random.Generator)}
    try:
        return editor.train_step(batch)
    finally:
        editor.set_train_state(state)
        for n, s in rngs.items():
            getattr(editor, n).bit_generator.state = s


class EarlyStopper:
    """Patience-gated best tracking (``easyeditor/trainer/utils.py:192-217``
    EarlyStopper): keys containing 'acc' are higher-better, everything
    else lower-better; stops after ``patience`` steps without a best."""

    def __init__(self, patience: int, key: str = "loss"):
        self.key = key
        self.patience = patience
        self.higher_better = "acc" in key
        self.best_value = -float("inf") if self.higher_better else float("inf")
        self.best_iter = 0
        self.current_iter = 0

    def update(self, idx: int, stats: Dict[str, float]) -> bool:
        assert self.key in stats, (self.key, sorted(stats))
        v = stats[self.key]
        new_best = v > self.best_value if self.higher_better \
            else v < self.best_value
        if new_best:
            self.best_value, self.best_iter = v, idx
        self.current_iter = idx
        return new_best

    def should_stop(self) -> bool:
        return self.current_iter - self.best_iter >= self.patience


class ScalarLogger:
    """JSONL scalar logs + optional TensorBoard (matching the reference's
    SummaryWriter usage, base.py:175,227-235)."""

    def __init__(self, logdir: str, tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "ts": round(time.time(), 3),
               **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class EditorTrainer:
    def __init__(
        self,
        editor: TrainableEditor,
        train_data: BaseVLLMEditData,
        batch_size: int,
        records_dir: str = "records",
        train_name: Optional[str] = None,
        load_ckpt_path: Optional[str] = None,
        log_per_i: int = 10,
        ema_alpha: float = 0.1,
        random_seed: Optional[int] = None,
        data_buffer_size: int = 8,
        val_data: Optional[BaseVLLMEditData] = None,
        val_interval: int = 100,
        val_steps: Optional[int] = None,
        early_stop_patience: Optional[int] = None,
        early_stop_key: str = "loss",
        save_ckpt_per_i: int = 200,
    ):
        """``val_data`` switches best-checkpoint selection from EMA train
        loss (the LiveEdit-stack rule, base.py:207-220) to validation-
        metric early stopping (the EasyEdit BaseTrainer rule,
        BaseTrainer.py:148-193): every ``val_interval`` steps run up to
        ``val_steps`` validation batches; a new best ``early_stop_key``
        saves "Best"; no best for ``early_stop_patience`` steps stops
        training.

        ``save_ckpt_per_i`` throttles EMA-best checkpointing: a new best
        marks a save as *pending*, and the save runs at most once per
        ``save_ckpt_per_i`` steps (pending bests flush at train end, so a
        "Best" checkpoint always exists). Early in training the EMA loss
        improves on nearly every step, and each save round-trips the full
        editor+optimizer state device->host; unthrottled that dominated
        wall-clock at 2.7b scale on a remote-tunnel TPU. The reference has
        the same every-new-best save (base.py:217-220) and an unused
        ``save_ckpt_per_i`` knob (base.py:145, :214-215 commented out) —
        here the knob actually governs the save cadence."""
        self.editor = editor
        self.batch_size = batch_size
        if random_seed is None:
            random_seed = int(time.time() * 10000) % 99999999
        self.seed = random_seed
        np.random.seed(random_seed)

        cases = list(train_data.data)
        self.data_generator = ParallelDataset(
            len(cases),
            lambda ids: editor.organize_batch_data([cases[i] for i in ids]),
            batch_size, shuffle=True, buffer_size=data_buffer_size,
            seed=random_seed)

        train_name = train_name or time.strftime("%Y.%m.%d-%H.%M.%S")
        ed_name, model_name = editor.name_of_editor_and_model()
        self.records_dir = os.path.join(records_dir, ed_name, model_name, train_name)
        self.ckpt_dir = os.path.join(self.records_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.logger = ScalarLogger(os.path.join(self.records_dir, "logs"))
        self.log_per_i = log_per_i
        self.ema_alpha = ema_alpha
        # Snapshot the editor config into the run dir (the reference
        # writes records/<...>/config.yaml at train_init, base.py:161-175)
        ecfg = getattr(editor, "cfg", None)
        if ecfg is not None and hasattr(ecfg, "to_dict"):
            import yaml

            with open(os.path.join(self.records_dir, "config.yaml"), "w") as f:
                yaml.safe_dump(ecfg.to_dict(), f, sort_keys=False)

        self.val_cases = list(val_data.data) if val_data is not None else None
        # Right-size the vision-token cache to the full train+val image
        # set (epochs revisit every image; an undersized LRU thrashes and
        # re-encodes through the ViT on every batch).
        vllm = getattr(editor, "vllm", None)
        if vllm is not None and hasattr(vllm, "ensure_image_cache_capacity"):
            from ..data.schema import unique_image_paths

            n_imgs = len(unique_image_paths(cases)
                         | unique_image_paths(self.val_cases or []))
            vllm.ensure_image_cache_capacity(n_imgs)
        self.val_interval = val_interval
        self.val_steps = val_steps
        # With val data but no patience, the stopper still tracks the
        # best-val checkpoint (it just never fires the stop).
        self.stopper = (EarlyStopper(early_stop_patience
                                     if early_stop_patience is not None
                                     else (1 << 62), early_stop_key)
                        if val_data is not None else None)
        self.save_ckpt_per_i = save_ckpt_per_i
        self._last_save_i: Optional[int] = None
        self._pending_best = False
        self._best_snapshot = None
        self._best_meta: Optional[Dict] = None
        self._val_batch_cache: Dict[int, object] = {}
        self._resume_best_ema: Optional[float] = None

        if load_ckpt_path:
            self.load_ckpt(load_ckpt_path)
        else:
            editor.train_init_editor(random_seed)
            self.train_i, self.train_epoch, self.ema_loss = 1, 1, None

    def validate(self, steps: Optional[int] = None) -> Dict[str, float]:
        """Mean loss/logs over up to ``steps`` validation batches
        (BaseTrainer.validate role) — trainable state unchanged."""
        vs = getattr(self.editor, "val_step", None) or \
            (lambda b: default_val_step(self.editor, b))
        # Full batches only — a ragged tail would compile a second
        # train-step program shape (30-90s on remote-compile runtimes);
        # fewer cases than batch_size cycle to fill one batch.
        cases = self.val_cases
        if len(cases) < self.batch_size:
            cases = (cases * self.batch_size)[:self.batch_size]
        n_full = len(cases) // self.batch_size
        sums: Dict[str, float] = {}
        n = 0
        for bi in range(n_full):
            if steps is not None and n >= steps:
                break
            # Organize each val batch ONCE and reuse it: the val set is
            # fixed, and organize_batch_data draws from the editor's host
            # RNG streams — repeated calls would advance the seeded
            # training trajectory on every validation (and race the
            # prefetch producer thread on the same non-thread-safe
            # Generators).
            batch = self._val_batch_cache.get(bi)
            if batch is None:
                lo = bi * self.batch_size
                batch = self.editor.organize_batch_data(
                    cases[lo:lo + self.batch_size])
                self._val_batch_cache[bi] = batch
            loss, logs = vs(batch)
            sums["loss"] = sums.get("loss", 0.0) + float(loss)
            for k, v in logs.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def train(self, total_epochs: int, max_steps: Optional[int] = None):
        # A resumed run must NOT reset the best bookkeeping: the restored
        # 'Best' checkpoint's EMA is the bar, or the first post-resume
        # step on a plateaued loss re-marks a "best" and later overwrites
        # the true Best with a worse state.
        best_ema = (self._resume_best_ema
                    if self._resume_best_ema is not None else float("inf"))
        start_epoch = self.train_epoch
        for self.train_epoch in range(start_epoch, total_epochs + 1):
            # Per-epoch augmentation refresh (the torch DataLoader
            # re-processes every image each epoch): reseed the augmenting
            # provider and drop the now-stale vision cache.
            vllm = getattr(self.editor, "vllm", None)
            prov = getattr(vllm, "image_provider", None)
            if prov is not None and hasattr(prov, "reseed"):
                prov.reseed(self.train_epoch)
                vllm.clear_image_cache()
            for batch, samp_n in self.data_generator:
                loss, logs = self.editor.train_step(batch)
                self.ema_loss = (loss if self.ema_loss is None else
                                 self.ema_alpha * loss
                                 + (1 - self.ema_alpha) * self.ema_loss)
                logs = dict(logs)
                logs["Loss"] = loss
                logs["EMA Loss"] = self.ema_loss
                logs["Epoch"] = self.train_epoch
                if self.train_i % self.log_per_i == 0:
                    self.logger.log(self.train_i, logs)
                if self.val_cases is not None \
                        and self.train_i % self.val_interval == 0:
                    val_info = self.validate(self.val_steps)
                    self.logger.log(self.train_i,
                                    {"val_" + k: v
                                     for k, v in val_info.items()})
                    if self.stopper is not None:
                        if self.stopper.update(self.train_i, val_info):
                            self.save_ckpt()
                        if self.stopper.should_stop():
                            return
                elif self.val_cases is None:
                    if self.ema_loss < best_ema:
                        best_ema = self.ema_loss
                        self._mark_ema_best()
                    if self._pending_best and (
                            self._last_save_i is None
                            or self.train_i - self._last_save_i
                            >= self.save_ckpt_per_i):
                        self.save_ckpt()
                self.train_i += 1
                if max_steps is not None and self.train_i > max_steps:
                    self._final_val_save()
                    return
        self._final_val_save()

    def _final_val_save(self):
        """Runs shorter than val_interval would otherwise end with no
        validation and no 'Best' checkpoint at all; a throttled pending
        EMA-best flushes here so 'Best' always exists after train()."""
        if self._pending_best:
            self.save_ckpt()
        if self.stopper is not None and self.stopper.best_iter == 0:
            val_info = self.validate(self.val_steps)
            self.logger.log(self.train_i,
                            {"val_" + k: v for k, v in val_info.items()})
            if self.stopper.update(self.train_i, val_info):
                self.save_ckpt()

    # ------------------------------------------------------------------

    def _mark_ema_best(self):
        """Snapshot the state at the moment the EMA best happens, so the
        throttled save writes the *best* state, not whatever the trainer
        holds at flush time (loss may have diverged in between — the
        reference saves at each new best, base.py:217-220, and 'Best'
        must mean best). JAX arrays are immutable, so holding the pytree
        is a zero-copy device snapshot; tree_map-identity rebuilds the
        containers because some editors reassign dict entries in place
        (MEND's Welford norm_state).

        Editors whose train state IS the backbone (LTE's full decoder +
        Adam state) set ``snapshot_best_state = False``: holding a stale
        generation would double their multi-GB state in HBM, so their
        throttled flush saves the flush-time state instead (documented
        approximation)."""
        import jax

        if not getattr(self.editor, "snapshot_best_state", True):
            self._best_snapshot, self._best_meta = None, None
            self._pending_best = True
            return
        self._best_snapshot = jax.tree_util.tree_map(
            lambda x: x, self.editor.get_train_state())
        self._best_meta = {"i": self.train_i, "epoch": self.train_epoch,
                           "ema_loss": float(self.ema_loss or 0.0),
                           "seed": self.seed}
        self._pending_best = True

    def save_ckpt(self, name: str = "Best"):
        import orbax.checkpoint as ocp

        if self._pending_best and self._best_snapshot is not None:
            state = {"editor": self._best_snapshot,
                     "meta": dict(self._best_meta)}
        else:
            state = {
                "editor": self.editor.get_train_state(),
                "meta": {"i": self.train_i, "epoch": self.train_epoch,
                         "ema_loss": float(self.ema_loss or 0.0),
                         "seed": self.seed},
            }
        path = os.path.join(os.path.abspath(self.ckpt_dir), name)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        # Sidecar (NOT inside the orbax tree — older checkpoints must
        # keep restoring): resume bookkeeping the meta tree can't carry.
        try:
            side = {"best_ema": float(state["meta"]["ema_loss"])}
            if self.stopper is not None:
                side["stopper_best"] = float(self.stopper.best_value)
                side["stopper_key"] = self.stopper.key
            with open(path + ".resume.json", "w") as f:
                json.dump(side, f)
        except Exception:
            pass
        self._last_save_i = self.train_i
        self._pending_best = False
        self._best_snapshot = None  # release the held device arrays
        self._best_meta = None

    def load_ckpt(self, path: str):
        state = _restore_typed(self.editor, path)
        seed = int(state["meta"]["seed"])
        # _restore_typed already ran one full train_init (typed skeleton);
        # a second init here would allocate ANOTHER complete optimizer
        # state next to the restored one (transient 2x opt-state HBM at
        # 2.7b). Only the host RNG streams need the saved seed.
        reseed = getattr(self.editor, "reseed_host", None)
        if reseed is not None:
            reseed(seed)
        else:
            self.editor.train_init_editor(seed)
        self.editor.set_train_state(state["editor"])
        self.train_i = int(state["meta"]["i"])
        self.train_epoch = int(state["meta"]["epoch"])
        self.ema_loss = float(state["meta"]["ema_loss"])
        # Resume bookkeeping: the restored Best's EMA is the bar to beat.
        self._resume_best_ema = self.ema_loss
        try:
            with open(path + ".resume.json") as f:
                side = json.load(f)
            self._resume_best_ema = float(side.get("best_ema",
                                                   self.ema_loss))
            if self.stopper is not None and "stopper_best" in side \
                    and side.get("stopper_key") == self.stopper.key:
                self.stopper.best_value = float(side["stopper_best"])
        except FileNotFoundError:
            pass
        # The state just restored IS on disk — treat it as the last save
        # so the first post-resume EMA best doesn't immediately re-write
        # it (a full device->host round trip).
        self._last_save_i = self.train_i


def _restore_typed(editor: TrainableEditor, path: str):
    """Orbax restore against the editor's live train state as the ``item``
    target. A structure-free restore loses pytree node TYPES — optax
    NamedTuple states (ScaleByAdamState etc.) come back as plain dicts and
    the first resumed ``train_step`` dies on ``state.mu``. train_init
    builds the typed skeleton (cheap: editor params only), and orbax
    unflattens the stored leaves into that exact treedef."""
    import orbax.checkpoint as ocp

    editor.train_init_editor(0)
    target = {"editor": editor.get_train_state(),
              "meta": {"i": 0, "epoch": 0, "ema_loss": 0.0, "seed": 0}}
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                            item=target)


def load_editor_ckpt(editor: TrainableEditor, path: str):
    """Standalone checkpoint load for evaluation (test_vllm_edit.py -ckpt).

    Accepts either this framework's orbax directories or the reference's
    torch 'Best' blobs (a regular FILE → routed through
    editors.convert_reference)."""
    if os.path.isfile(path):
        from ..editors.convert_reference import load_reference_editor_ckpt

        load_reference_editor_ckpt(editor, path)
        return {"source": "reference-torch"}
    import orbax.checkpoint as ocp

    if hasattr(editor, "train_init_editor"):
        state = _restore_typed(editor, path)
    else:
        state = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    editor.set_train_state(state["editor"])
    return state["meta"]
