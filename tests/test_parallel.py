"""Mesh + sharding: sharded forward equals replicated forward; the
multi-chip dryrun executes on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import isolate_in_subprocess, make_tiny_vllm

from devqa_tpu.core import vllm as vllm_mod
from devqa_tpu.parallel.mesh import make_mesh
from devqa_tpu.parallel.sharding import shard_params, vllm_param_specs
from jax.sharding import PartitionSpec as P


class TestShardingRules:
    def test_specs(self):
        vllm = make_tiny_vllm()
        specs = vllm_param_specs(vllm.params)
        layers = specs["decoder"]["layers"]
        assert layers["fc1"]["w"] == P(None, None, "tp")
        assert layers["fc2"]["w"] == P(None, "tp", None)
        assert layers["q"]["w"] == P(None, None, "tp")
        assert layers["o"]["w"] == P(None, "tp", None)
        assert specs["decoder"]["embed_tokens"] == P("tp", None)
        # vision tower replicated
        assert specs["vit"]["patch_embed"]["w"] == P()

    def test_sharded_forward_matches_replicated(self):
        if isolate_in_subprocess(
                "tests/test_parallel.py::TestShardingRules::"
                "test_sharded_forward_matches_replicated"):
            return
        vllm = make_tiny_vllm()
        cfg = vllm.cfg
        ids = (jnp.arange(8)[None, :].repeat(4, 0) * 3) % cfg.decoder.vocab_size
        mask = jnp.ones((4, 8), jnp.int32)
        img = jnp.zeros((4, cfg.n_img_tokens, cfg.decoder.d_model))
        has = jnp.zeros((4,), jnp.int32)
        embeds, kv = vllm_mod.assemble_embeds(vllm.params, cfg, ids, mask, img, has)
        ref = vllm_mod.vllm_logits(vllm.params, cfg, embeds, kv)

        mesh = make_mesh(dp=4, tp=2)
        with mesh:
            sparams = shard_params(vllm.params, mesh)
            out = jax.jit(lambda p, e, k: vllm_mod.vllm_logits(p, cfg, e, k))(
                sparams, embeds, kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestDryrun:
    def test_dryrun_multichip(self):
        """Run the driver entry in a FRESH subprocess, exactly like the
        driver does. (Also sidesteps a sporadic XLA-CPU segfault when
        compiling late into a long-lived test process — an upstream bug
        observed only after ~170 in-process compiles.)"""
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g._respawn_dryrun(8)


class TestDistributedEval:
    def test_fused_eval_sharded_matches_unsharded(self, tmp_path):
        """Full fused sequential-edit evaluation with query rows sharded
        over dp and params over tp reproduces the unsharded results —
        the SURVEY §5 'data-parallel eval sharding over ICI' path."""
        if isolate_in_subprocess(
                "tests/test_parallel.py::TestDistributedEval::"
                "test_fused_eval_sharded_matches_unsharded"):
            return
        import copy
        import json
        import os

        from helpers import make_tiny_vllm, write_records

        from devqa_tpu.core.wrapper import JaxVLLM
        from devqa_tpu.data.schema import EVQA
        from devqa_tpu.editors.liveedit import LiveEdit
        from devqa_tpu.eval.harness import FusedEditorEvaluation
        from devqa_tpu.retrieval.store import hash_encoder
        from test_liveedit import tiny_liveedit_cfg

        path, _ = write_records(str(tmp_path), 4)
        data = EVQA(path, str(tmp_path), encoder=hash_encoder(8))

        def run(tag, mesh):
            vllm = make_tiny_vllm()
            if mesh is not None:
                vllm = JaxVLLM(vllm.cfg, shard_params(vllm.params, mesh),
                               vllm.tokenizer, vllm.image_provider,
                               bucket_multiple=8, mesh=mesh)
            ed = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=0)
            fe = FusedEditorEvaluation(
                ed, data, tag, str(tmp_path / "res"), max_rows=16,
                pad_rows=True)
            ctx = mesh if mesh is not None else _nullcontext()
            with ctx:
                fe.evaluate_sequential_edit(edit_n=2)
            mr = os.path.join(str(tmp_path / "res"), "liveedit", "tiny-opt",
                              tag, "sequential_edit_2", "mean_results.json")
            return json.load(open(mr))

        base = run("plain", None)
        mesh = make_mesh(dp=4, tp=2)
        sharded = run("mesh", mesh)

        def close(a, b, path=""):
            if path.endswith("edit_time"):  # wall clock, not a metric
                return
            if isinstance(a, dict):
                assert set(a) == set(b), (path, a.keys(), b.keys())
                for k in a:
                    close(a[k], b[k], path + "/" + str(k))
            elif isinstance(a, float):
                assert abs(a - b) < 1e-3, (path, a, b)
            else:
                assert a == b, (path, a, b)

        close(base["total_mean"], sharded["total_mean"])


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class TestMultisliceMesh:
    def test_sharded_forward_matches_replicated_on_dcn_mesh(self):
        """DCN-aware 3-axis mesh (SURVEY §5 multi-slice initialization):
        2 fake slices x (dp=2, tp=2) over the 8 virtual CPU devices;
        params tp-sharded, batch rows sharded over dcn x dp — results
        equal the unsharded forward."""
        if isolate_in_subprocess(
                "tests/test_parallel.py::TestMultisliceMesh::"
                "test_sharded_forward_matches_replicated_on_dcn_mesh"):
            return
        from devqa_tpu.parallel.mesh import make_multislice_mesh
        from devqa_tpu.parallel.sharding import shard_batch

        vllm = make_tiny_vllm()
        cfg = vllm.cfg
        ids = (jnp.arange(8)[None, :].repeat(4, 0) * 3) % cfg.decoder.vocab_size
        mask = jnp.ones((4, 8), jnp.int32)
        img = jnp.zeros((4, cfg.n_img_tokens, cfg.decoder.d_model))
        has = jnp.zeros((4,), jnp.int32)
        embeds, kv = vllm_mod.assemble_embeds(vllm.params, cfg, ids, mask,
                                              img, has)
        ref = vllm_mod.vllm_logits(vllm.params, cfg, embeds, kv)

        devs = jax.devices()[:8]
        mesh = make_multislice_mesh(
            tp=2, devices=devs,
            slice_index_of=lambda d: devs.index(d) // 4)  # 2 fake slices
        assert mesh.axis_names == ("dcn", "dp", "tp")
        assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
        with mesh:
            sparams = shard_params(vllm.params, mesh)
            sharded_in = shard_batch({"e": embeds, "kv": kv}, mesh)
            out = jax.jit(lambda p, e, k: vllm_mod.vllm_logits(p, cfg, e, k))(
                sparams, sharded_in["e"], sharded_in["kv"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_single_slice_degenerates(self):
        """CPU devices expose no slice_index → one dcn group; the mesh
        shape is (1, dp, tp) and sharding rules still apply."""
        from devqa_tpu.parallel.mesh import make_multislice_mesh

        mesh = make_multislice_mesh(tp=2, devices=jax.devices()[:8])
        assert dict(mesh.shape) == {"dcn": 1, "dp": 4, "tp": 2}


class TestInitDistributed:
    """Multi-host bring-up (parallel/distributed.py) — the replacement for
    the reference's init_distributed_mode (dist_utils.py:56-81)."""

    def test_single_host_is_noop(self, monkeypatch):
        from devqa_tpu.parallel import distributed as D

        for k in ("DEVQA_COORDINATOR_ADDRESS", "DEVQA_DISTRIBUTED",
                  "COORDINATOR_ADDRESS", "SLURM_JOB_ID",
                  "OMPI_COMM_WORLD_SIZE", "DEVQA_NUM_PROCESSES",
                  "DEVQA_PROCESS_ID"):
            monkeypatch.delenv(k, raising=False)
        assert not D.is_distributed_env()
        assert D.init_distributed() is False
        assert not D._initialized

    def test_env_detection(self, monkeypatch):
        from devqa_tpu.parallel import distributed as D

        monkeypatch.setenv("DEVQA_DISTRIBUTED", "1")
        assert D.is_distributed_env()
        monkeypatch.delenv("DEVQA_DISTRIBUTED")
        monkeypatch.setenv("SLURM_JOB_ID", "123")
        assert D.is_distributed_env()

    def test_explicit_coordinates_initialize_for_real(self):
        """A real jax.distributed.initialize with num_processes=1 against
        a localhost coordinator — the exact code path a multi-host launch
        takes, runnable in one process. Isolated in a subprocess so the
        distributed client never leaks into other tests."""
        if isolate_in_subprocess(
                "tests/test_parallel.py::TestInitDistributed::"
                "test_explicit_coordinates_initialize_for_real"):
            return
        from devqa_tpu.parallel import distributed as D

        # Ephemeral port: a fixed one collides with TIME_WAIT leftovers
        # of earlier runs and made this flaky in full-suite runs.
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        ok = D.init_distributed(coordinator_address="localhost:%d" % port,
                                num_processes=1, process_id=0)
        assert ok is True
        assert D._initialized
        assert D.init_distributed() is True  # idempotent
        import jax

        assert jax.process_count() == 1
        assert len(jax.devices()) >= 1
        D.shutdown_distributed()
        assert not D._initialized
