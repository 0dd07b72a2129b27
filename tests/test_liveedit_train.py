"""LiveEdit meta-training: loss decreases, checkpoints round-trip, and a
trained editor actually improves edit reliability."""
import os

import numpy as np
import pytest

from helpers import make_tiny_vllm, write_records

from devqa_tpu.data.schema import EVQA
from devqa_tpu.editors.liveedit import LiveEditConfig, LiveEditTrainable
from devqa_tpu.retrieval.store import hash_encoder
from devqa_tpu.train.loop import EditorTrainer, load_editor_ckpt
from test_liveedit import tiny_liveedit_cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("le_train"))
    vllm = make_tiny_vllm()
    path, _ = write_records(tmp, 8)
    data = EVQA(path, tmp + "/imgs", encoder=hash_encoder(16))
    cfg = tiny_liveedit_cfg(vllm).replace(
        train_cfg=LiveEditConfig.TrainConfig(lr=3e-3))
    editor = LiveEditTrainable(vllm, cfg, seed=0)
    return tmp, vllm, data, editor


class TestLiveEditTraining:
    def test_train_step_runs_and_loss_finite(self, setup):
        tmp, vllm, data, editor = setup
        batch = editor.organize_batch_data(data.data[:4])
        loss, logs = editor.train_step(batch)
        assert np.isfinite(loss)
        for k in ("rel_loss", "gen_loss", "loc_loss", "soft_routing_loss"):
            assert k in logs and np.isfinite(logs[k])

    def test_faithful_mid_layer_rerun_mode(self, setup):
        """The A/B flag re-runs the edit layer during training (the
        reference's forward_from_mid_layer quirk): the step runs, is
        finite, and differs numerically from the consistent resume."""
        tmp, vllm, data, editor = setup
        batch = editor.organize_batch_data(data.data[:4])
        cfg_f = editor.cfg.replace(faithful_mid_layer_rerun=True)
        ed_f = LiveEditTrainable(vllm, cfg_f, seed=0)
        ed_d = LiveEditTrainable(vllm, editor.cfg.replace(
            faithful_mid_layer_rerun=False), seed=0)
        lf, _ = ed_f.train_step(batch)
        ld, _ = ed_d.train_step(batch)
        assert np.isfinite(lf) and np.isfinite(ld)
        assert abs(lf - ld) > 1e-9, (lf, ld)

    def test_loss_decreases(self, setup):
        tmp, vllm, data, editor = setup
        editor.train_init_editor(0)
        batch = editor.organize_batch_data(data.data[:4])
        losses = [editor.train_step(batch)[0] for _ in range(15)]
        assert losses[-1] < losses[0], losses

    def test_trainer_loop_and_ckpt(self, setup):
        tmp, vllm, data, editor = setup
        trainer = EditorTrainer(editor, data, batch_size=4,
                                records_dir=os.path.join(tmp, "records"),
                                train_name="t1", random_seed=7,
                                data_buffer_size=2)
        trainer.train(total_epochs=2)
        ckpt = os.path.join(trainer.ckpt_dir, "Best")
        assert os.path.exists(ckpt)
        # round-trip into a fresh editor
        editor2 = LiveEditTrainable(vllm, editor.cfg, seed=99)
        before = np.asarray(editor2.params["moegen_c"]["phi"])
        meta = load_editor_ckpt(editor2, ckpt)
        after = np.asarray(editor2.params["moegen_c"]["phi"])
        assert not np.allclose(before, after)
        assert meta["i"] >= 1

    def test_resume_training_from_ckpt(self, setup):
        """Resume = load_ckpt then MORE train steps: the restored optax
        state must keep its NamedTuple types (a structure-free orbax
        restore yields plain dicts and the first resumed step dies on
        state.mu — reproduced at 2.7b scale on TPU)."""
        tmp, vllm, data, editor = setup
        rec = os.path.join(tmp, "rec_resume")
        t1 = EditorTrainer(editor, data, batch_size=4, records_dir=rec,
                           train_name="r1", random_seed=7,
                           data_buffer_size=2)
        t1.train(total_epochs=1)
        best = os.path.join(t1.ckpt_dir, "Best")
        assert os.path.exists(best)
        t2 = EditorTrainer(editor, data, batch_size=4, records_dir=rec,
                           train_name="r2", random_seed=7,
                           data_buffer_size=2, load_ckpt_path=best)
        resumed_at = t2.train_i
        assert resumed_at >= 2
        t2.train(total_epochs=t2.train_epoch + 1)  # must actually step
        assert t2.train_i > resumed_at

    def test_ckpt_save_throttle(self, setup):
        """EMA-best saves are throttled to one per save_ckpt_per_i steps
        (each save round-trips full editor+opt state device->host, which
        dominated wall-clock unthrottled), and a pending best flushes at
        train end so 'Best' always exists."""
        tmp, vllm, data, editor = setup
        trainer = EditorTrainer(editor, data, batch_size=4,
                                records_dir=os.path.join(tmp, "rec_sci"),
                                train_name="sci", random_seed=7,
                                data_buffer_size=2, save_ckpt_per_i=1000)
        saves = []
        orig = trainer.save_ckpt
        trainer.save_ckpt = lambda *a, **k: (saves.append(trainer.train_i),
                                             orig(*a, **k))
        trainer.train(total_epochs=4)  # 8 steps: EMA improves most steps
        # one initial save + at most one end-flush; never one per step
        assert 1 <= len(saves) <= 2, saves
        assert os.path.exists(os.path.join(trainer.ckpt_dir, "Best"))

    def test_resume_keeps_best_bar(self, setup):
        """A resumed run must not reset best_ema to inf: the first
        post-resume step on a plateaued loss would otherwise mark a
        'best' and later overwrite the true Best with a worse state."""
        tmp, vllm, data, editor = setup
        rec = os.path.join(tmp, "rec_bar")
        t1 = EditorTrainer(editor, data, batch_size=4, records_dir=rec,
                           train_name="b1", random_seed=7,
                           data_buffer_size=2)
        t1.train(total_epochs=1)
        best = os.path.join(t1.ckpt_dir, "Best")
        assert os.path.exists(best + ".resume.json")  # sidecar written
        t2 = EditorTrainer(editor, data, batch_size=4, records_dir=rec,
                           train_name="b2", random_seed=7,
                           data_buffer_size=2, load_ckpt_path=best)
        assert t2._resume_best_ema is not None
        # the restored Best's EMA is the bar — a plateaued EMA equal to it
        # must NOT re-mark a pending best on the first step
        t2.ema_loss = t2._resume_best_ema
        marked = []
        t2._mark_ema_best = lambda: marked.append(True)
        bar = t2._resume_best_ema
        # one pass over the EMA-best branch logic: emulate train()'s check
        best_ema = t2._resume_best_ema
        if t2.ema_loss < best_ema:
            t2._mark_ema_best()
        assert not marked and bar == t2.ema_loss

    def test_best_ckpt_holds_best_moment_state(self, setup):
        """A throttled 'Best' save must write the state snapshotted at the
        EMA-best moment, NOT the (possibly diverged) state at flush time —
        the reference saves at each new best (base.py:217-220), so 'Best'
        means best."""
        tmp, vllm, data, editor = setup
        trainer = EditorTrainer(editor, data, batch_size=4,
                                records_dir=os.path.join(tmp, "rec_snap"),
                                train_name="snap", random_seed=7,
                                data_buffer_size=2, save_ckpt_per_i=1000)
        trainer.ema_loss = 1.0
        trainer._mark_ema_best()
        best_phi = np.asarray(editor.params["moegen_c"]["phi"]).copy()
        # training moves on past the best before the throttled flush
        batch = editor.organize_batch_data(data.data[:4])
        editor.train_step(batch)
        assert not np.allclose(
            np.asarray(editor.params["moegen_c"]["phi"]), best_phi)
        trainer.save_ckpt()
        editor2 = LiveEditTrainable(vllm, editor.cfg, seed=99)
        load_editor_ckpt(editor2, os.path.join(trainer.ckpt_dir, "Best"))
        assert np.allclose(
            np.asarray(editor2.params["moegen_c"]["phi"]), best_phi)

    def test_training_improves_reliability(self, setup):
        """After enough steps on a tiny model, an edited fact should be
        reproduced better than by the untrained editor."""
        tmp, vllm, data, editor = setup
        from devqa_tpu.core.losses import token_accuracy

        req = data.data[0].requests[0]
        qb = vllm.encode_queries([req["prompt"]], [req["image"]],
                                 [req["target_new"]])

        def rel_acc():
            editor.restore_to_original_model()
            editor.edit_one_piece(req)
            logits = editor.query_logits(qb)
            acc, _ = token_accuracy(logits, qb.label_ids, qb.label_masks)
            editor.restore_to_original_model()
            return float(acc[0])

        editor.train_init_editor(0)
        base = rel_acc()
        batch = editor.organize_batch_data(data.data[:4])
        loss0 = editor.train_step(batch)[0]
        for _ in range(60):
            loss = editor.train_step(batch)[0]
        trained = rel_acc()
        assert loss < loss0
        assert trained >= base


class TestValidationEarlyStop:
    def test_val_best_and_early_stop(self, setup, tmp_path):
        """BaseTrainer.py:148-193 semantics: periodic validation, best-val
        'Best' checkpoint, patience-gated stop; val_step leaves the
        trainable state untouched."""
        tmp, vllm, data, editor = setup
        from devqa_tpu.train.loop import EarlyStopper, default_val_step

        editor.train_init_editor(0)
        batch = editor.organize_batch_data(data.data[:4])
        s0 = editor.get_train_state()
        loss_v, _ = default_val_step(editor, batch)
        s1 = editor.get_train_state()
        import jax

        assert all(np.allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32))
                   for a, b in zip(jax.tree.leaves(s0["params"]),
                                   jax.tree.leaves(s1["params"])))

        trainer = EditorTrainer(
            editor, data, batch_size=4, records_dir=str(tmp_path),
            train_name="valrun", random_seed=0,
            val_data=data, val_interval=2, val_steps=1,
            early_stop_patience=2)
        trainer.train(total_epochs=50, max_steps=40)
        # Either exit is legitimate: patience-gated stop on a val plateau,
        # or max_steps when validation (now on CACHED deterministic
        # batches) keeps improving at tiny scale. train_i is incremented
        # before the max_steps check, hence <= 41.
        assert trainer.stopper.should_stop() or trainer.train_i <= 41
        ckpt = os.path.join(str(tmp_path), "liveedit", "tiny-opt",
                            "valrun", "checkpoints", "Best")
        assert os.path.exists(ckpt)
        logs = open(os.path.join(str(tmp_path), "liveedit", "tiny-opt",
                                 "valrun", "logs", "scalars.jsonl")).read()
        assert "val_loss" in logs

    def test_early_stopper_acc_key(self):
        from devqa_tpu.train.loop import EarlyStopper

        st = EarlyStopper(patience=3, key="rewrite_acc")
        assert st.update(1, {"rewrite_acc": 0.5})
        assert not st.update(2, {"rewrite_acc": 0.4})
        assert st.update(3, {"rewrite_acc": 0.9})
        assert not st.should_stop()
        st.update(4, {"rewrite_acc": 0.1})
        st.update(6, {"rewrite_acc": 0.1})
        assert st.should_stop()
