"""Serving stack: worker HTTP endpoints + controller dispatch."""
import json
import socket
import urllib.request

import pytest

from helpers import make_tiny_vllm

from devqa_tpu.editors.liveedit import LiveEdit
from devqa_tpu.serve import Controller, ModelWorker
from test_liveedit import tiny_liveedit_cfg


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def post(url, body):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def served():
    vllm = make_tiny_vllm()
    editor = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=3)
    worker = ModelWorker(vllm, editor, name="w0")
    wport = free_port()
    worker.serve(port=wport, background=True)
    ctl = Controller()
    cport = free_port()
    ctl.serve(port=cport, background=True)
    post("http://127.0.0.1:%d/register_worker" % cport,
         {"name": "w0", "url": "http://127.0.0.1:%d" % wport})
    yield wport, cport, worker, ctl
    worker.shutdown()
    ctl.shutdown()


class TestServe:
    def test_status_and_generate(self, served):
        wport, cport, worker, ctl = served
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/status" % wport, timeout=60) as r:
            st = json.loads(r.read())
        assert st["model"] == "tiny-opt" and st["edits"] == 0
        out = post("http://127.0.0.1:%d/generate" % wport,
                   {"prompt": "what is in the image The answer is:",
                    "image": "imgZ.jpg", "max_new_tokens": 3})
        assert "text" in out

    def test_edit_via_controller(self, served):
        wport, cport, worker, ctl = served
        lst = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:%d/list_workers" % cport, timeout=60).read())
        assert lst["workers"] == ["w0"]
        r = post("http://127.0.0.1:%d/edit" % cport,
                 {"prompt": "what animal is this The answer is:",
                  "image": "imgZ.jpg", "target_new": "a lynx"})
        assert r.get("ok")
        st = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:%d/status" % wport, timeout=60).read())
        assert st["edits"] == 1
        r = post("http://127.0.0.1:%d/restore" % cport, {})
        assert r.get("ok")
        st = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:%d/status" % wport, timeout=60).read())
        assert st["edits"] == 0


class TestControllerFleet:
    def test_heartbeat_keeps_worker_alive(self):
        """The controller expires workers heartbeat_expiry after their
        last registration; register_with must keep re-registering or a
        healthy worker drops out of dispatch permanently."""
        import time

        vllm = make_tiny_vllm()
        ctl = Controller(heartbeat_expiry=1.0)
        cport = free_port()
        ctl.serve(port=cport, background=True)
        w = ModelWorker(vllm, name="hb")
        try:
            w.register_with("http://127.0.0.1:%d" % cport,
                            "http://127.0.0.1:1", heartbeat_interval=0.2)
            time.sleep(1.6)  # > expiry: only heartbeats keep it alive
            assert "hb" in ctl.alive_workers()
        finally:
            w.shutdown()
            ctl.shutdown()

    def test_edit_broadcasts_to_all_workers(self):
        """Edits are model state: an edit through the controller must
        reach EVERY worker, or round-robin generates alternate between
        edited and unedited replicas."""
        vllm = make_tiny_vllm()
        workers, ports = [], []
        ctl = Controller()
        cport = free_port()
        ctl.serve(port=cport, background=True)
        try:
            for i in range(2):
                ed = LiveEdit(vllm, tiny_liveedit_cfg(vllm), seed=i)
                w = ModelWorker(vllm, ed, name="bw%d" % i)
                p = free_port()
                w.serve(port=p, background=True)
                post("http://127.0.0.1:%d/register_worker" % cport,
                     {"name": "bw%d" % i, "url": "http://127.0.0.1:%d" % p})
                workers.append(w)
                ports.append(p)
            r = post("http://127.0.0.1:%d/edit" % cport,
                     {"prompt": "what animal is this The answer is:",
                      "image": "imgB.jpg", "target_new": "a stoat"})
            assert r.get("ok") and set(r["workers"]) == {"bw0", "bw1"}
            for p in ports:
                st = json.loads(urllib.request.urlopen(
                    "http://127.0.0.1:%d/status" % p, timeout=60).read())
                assert st["edits"] == 1
        finally:
            for w in workers:
                w.shutdown()
            ctl.shutdown()


class TestStreaming:
    def test_stream_deltas_join_to_generate(self):
        """Streamed deltas concatenate to exactly the non-streaming
        output (cached decode underneath)."""
        vllm = make_tiny_vllm()
        from devqa_tpu.serve import ModelWorker

        w = ModelWorker(vllm)
        full = w.generate("what is in the image The answer is:",
                          "imgS.jpg", max_new_tokens=4)
        deltas = list(w.generate_stream(
            "what is in the image The answer is:", "imgS.jpg",
            max_new_tokens=4))
        assert "".join(deltas) == full

    def test_http_chunked_endpoint(self, served):
        wport, cport, worker, ctl = served
        req = urllib.request.Request(
            "http://127.0.0.1:%d/generate_stream" % wport,
            data=json.dumps({"prompt": "what is this The answer is:",
                             "image": "imgZ.jpg",
                             "max_new_tokens": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            text = r.read().decode()
        assert isinstance(text, str)


class TestWebServer:
    def test_page_models_and_chat(self, served):
        from devqa_tpu.serve.web import WebServer

        wport, cport, worker, ctl = served
        web = WebServer("http://127.0.0.1:%d" % cport, max_new_tokens=2)
        wbport = free_port()
        web.serve(port=wbport, background=True)
        try:
            page = urllib.request.urlopen(
                "http://127.0.0.1:%d/" % wbport, timeout=60).read()
            assert b"devqa_tpu chat" in page
            models = json.loads(urllib.request.urlopen(
                "http://127.0.0.1:%d/models" % wbport, timeout=60).read())
            assert models["workers"] == ["w0"]
            out = post("http://127.0.0.1:%d/chat" % wbport,
                       {"prompt": "what is this", "template": "v0",
                        "image": "imgZ.jpg"})
            assert "text" in out
        finally:
            web.shutdown()


class TestConversationTemplates:
    def test_vicuna0_single_sep(self):
        from devqa_tpu.serve.templates import CONV_VISION_VICUNA0

        p = CONV_VISION_VICUNA0.wrap("what is this")
        assert p.startswith("Give the following image:")
        assert "###Human: what is this###Assistant:" in p

    def test_owl2_two_sep(self):
        from devqa_tpu.serve.templates import CONV_MPLUG_OWL2

        p = CONV_MPLUG_OWL2.wrap("hello")
        assert "USER: hello ASSISTANT:" in p
        p2 = CONV_MPLUG_OWL2.get_prompt([
            ("USER", "q1"), ("ASSISTANT", "a1"), ("USER", "q2"),
            ("ASSISTANT", None)])
        assert "ASSISTANT: a1</s>USER: q2 ASSISTANT:" in p2

    def test_registry(self):
        from devqa_tpu.serve.templates import CONV_TEMPLATES

        assert CONV_TEMPLATES["none"] is None
        assert CONV_TEMPLATES["minigpt4"] is CONV_TEMPLATES["v0"]


class TestBatchingEngine:
    def test_concurrent_matches_sequential(self):
        """Three requests decoded concurrently through shared slots give
        exactly the per-request cached-worker outputs."""
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        w = ModelWorker(vllm)
        prompts = [("what is near the tree", "imgA.jpg"),
                   ("who wrote the book The answer is:", None),
                   ("what color is the sky", "imgB.jpg")]
        want = [w.generate(p, img, max_new_tokens=5) for p, img in prompts]
        eng = BatchingEngine(vllm, n_slots=2, max_len=96).start()
        try:
            reqs = [eng.submit(p, img, max_new_tokens=5)
                    for p, img in prompts]
            for r in reqs:
                assert r.done.wait(300)
            got = [r.text for r in reqs]
        finally:
            eng.shutdown()
        assert got == want, (got, want)

    def test_generate_blocking_api(self):
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        eng = BatchingEngine(vllm, n_slots=2, max_len=96).start()
        try:
            out = eng.generate("what is this", "imgC.jpg", max_new_tokens=3)
        finally:
            eng.shutdown()
        assert isinstance(out, str)

    def test_worker_with_batching_engine(self):
        vllm = make_tiny_vllm()
        w = ModelWorker(vllm, batching=True, n_slots=2, max_len=96)
        try:
            base = ModelWorker(vllm).generate("what is near the tree",
                                              "imgA.jpg", max_new_tokens=4)
            got = w.generate("what is near the tree", "imgA.jpg",
                             max_new_tokens=4)
            assert got == base
        finally:
            w.shutdown()

    def test_multi_step_dispatch_token_identical(self):
        """steps_per_dispatch=4 (lax.scan of 4 decode steps per device
        call) produces exactly the K=1 token streams — overrun tokens
        past EOS/budget are discarded host-side."""
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        prompts = [("what is near the tree", "imgA.jpg"),
                   ("who wrote the book The answer is:", None),
                   ("what color is the sky", "imgB.jpg")]
        w = ModelWorker(vllm)
        want = [w.generate(p, img, max_new_tokens=6) for p, img in prompts]
        eng = BatchingEngine(vllm, n_slots=2, max_len=96,
                             steps_per_dispatch=4).start()
        try:
            reqs = [eng.submit(p, img, max_new_tokens=6)
                    for p, img in prompts]
            for r in reqs:
                assert r.done.wait(300)
            got = [r.text for r in reqs]
        finally:
            eng.shutdown()
        assert got == want, (got, want)


class TestAdmissionFailure:
    def test_bad_request_fails_its_wave_not_the_engine(self):
        """A raising image load must fail THAT request with a cause and
        keep the admission thread alive — before the fix it killed the
        daemon silently and every later submit hung to its timeout."""
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        inner = vllm.image_provider

        def flaky(path):
            if path and "BOOM" in path:
                raise FileNotFoundError(path)
            return inner(path)

        vllm.image_provider = flaky
        eng = BatchingEngine(vllm, n_slots=2, max_len=96).start()
        try:
            ok1 = eng.submit("what is near the tree", "imgA.jpg",
                             max_new_tokens=3)
            assert ok1.done.wait(300) and ok1.error is None

            bad = eng.submit("what is this", "BOOM.jpg", max_new_tokens=3)
            assert bad.done.wait(300)
            assert bad.error and "FileNotFoundError" in bad.error
            assert bad.text == ""

            # engine still admits and serves after the failed wave
            ok2 = eng.submit("what color is the sky", "imgB.jpg",
                             max_new_tokens=3)
            assert ok2.done.wait(300) and ok2.error is None
            import pytest as _pytest
            with _pytest.raises(RuntimeError, match="FileNotFoundError"):
                eng.generate("q", "BOOM.jpg", max_new_tokens=2)
        finally:
            eng.shutdown()


class TestPrefixCache:
    PROMPTS = [("what is near the tree", "imgA.jpg"),
               ("who wrote the book The answer is:", None),
               ("describe the scene", "imgB.jpg")]

    #: submitted AFTER the two unique images are cached — every one a hit
    REPEATS = [("what color is the tree", "imgA.jpg"),
               ("is there a cat", "imgB.jpg"),
               ("what is in the corner", "imgA.jpg")]

    def _run(self, prefix_cache_images):
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        eng = BatchingEngine(vllm, n_slots=2, max_len=96,
                             prefix_cache_images=prefix_cache_images
                             ).start()
        texts = []
        try:
            # phase 1: one request per unique image (+ a text-only row),
            # drained before phase 2 so the repeats deterministically hit
            reqs = [eng.submit(p, img, max_new_tokens=5)
                    for p, img in self.PROMPTS]
            for r in reqs:
                assert r.done.wait(300)
                assert r.error is None, r.error
            texts += [r.text for r in reqs]
            reqs = [eng.submit(p, img, max_new_tokens=5)
                    for p, img in self.REPEATS]
            for r in reqs:
                assert r.done.wait(300)
                assert r.error is None, r.error
            texts += [r.text for r in reqs]
        finally:
            eng.shutdown()
        return texts, eng

    def test_cached_matches_uncached(self):
        """Vision-prefix KV reuse is exact: repeated-image prompts (the
        MME two-questions-per-image pattern) generate the same token
        streams with the cache on and off, and every post-warm repeat
        actually takes the continue path."""
        want, eng0 = self._run(prefix_cache_images=0)
        assert eng0.prefix_hits == 0 and len(eng0._prefix_lru) == 0
        got, eng = self._run(prefix_cache_images=16)
        assert got == want, (got, want)
        assert eng.prefix_hits >= len(self.REPEATS)
        assert set(eng._prefix_lru) == {"imgA.jpg", "imgB.jpg"}

    def test_lru_eviction(self):
        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        eng = BatchingEngine(vllm, n_slots=2, max_len=96,
                             prefix_cache_images=1).start()
        try:
            for img in ("imgA.jpg", "imgB.jpg", "imgC.jpg"):
                r = eng.submit("what is this", img, max_new_tokens=3)
                assert r.done.wait(300) and r.error is None
        finally:
            eng.shutdown()
        assert len(eng._prefix_lru) == 1  # capacity bound held

    def test_same_wave_eviction_keeps_slot_contents_exact(self):
        """Capacity-1 cache with TWO new cacheable images arriving in
        ONE admission wave: the second store evicts the first within the
        same wave, which used to queue DUPLICATE indices into one
        batched scatter (unspecified winner — the surviving image could
        end up holding the evicted image's k/v prefix). The survivor's
        post-warm HIT must generate exactly the uncached stream."""
        from devqa_tpu.serve.engine import BatchingEngine

        def run(cap):
            vllm = make_tiny_vllm()
            eng = BatchingEngine(vllm, n_slots=2, max_len=96,
                                 prefix_cache_images=cap).start()
            try:
                # one wave, two new images (n_slots=2 admits both)
                reqs = [eng.submit("what is this", img, max_new_tokens=4)
                        for img in ("imgA.jpg", "imgB.jpg")]
                for r in reqs:
                    assert r.done.wait(300) and r.error is None
                # whichever image survived the ring, query BOTH again —
                # the survivor rides the continue path
                reqs = [eng.submit("and what color is it", img,
                                   max_new_tokens=4)
                        for img in ("imgA.jpg", "imgB.jpg")]
                for r in reqs:
                    assert r.done.wait(300) and r.error is None
                return [r.text for r in reqs], eng
            finally:
                eng.shutdown()

        want, _ = run(cap=0)
        got, eng = run(cap=1)
        assert got == want, (got, want)
        assert len(eng._prefix_lru) == 1

    def test_default_auto_gates_on_prefix_size(self):
        """The DEFAULT follows the measured crossover (engine.py): the
        continue path's extra per-wave dispatches (pre-slot id fetch,
        LRU stacks, a second compiled prefill program per width) LOSE at
        small vision prefixes (BLIP-2's 32 tokens: 272 vs ~300 tok/s
        warm on v5e through the tunnel) and win when the prefix
        dominates prefill (LLaVA's 576 of ~600 tokens). Explicit values
        always override the gate."""
        import dataclasses

        from devqa_tpu.serve.engine import BatchingEngine

        vllm = make_tiny_vllm()
        small = BatchingEngine(vllm, n_slots=2, max_len=96)
        assert small._prefix_cap == 0  # tiny prefix: auto-off
        forced = BatchingEngine(vllm, n_slots=2, max_len=96,
                                prefix_cache_images=4)
        assert forced._prefix_cap == 4  # explicit beats the gate
        vllm.cfg = dataclasses.replace(vllm.cfg, n_img_tokens=576)
        big = BatchingEngine(vllm, n_slots=2, max_len=96)
        assert big._prefix_cap == 16  # llava-scale prefix: auto-on


class TestTensorParallelServing:
    def test_tp_sharded_engine_matches_unsharded(self):
        """Production serving shape for the 7B backbones: params
        Megatron-sharded over tp, the engine's KV cache sharded on its
        HEADS axis to match the column-parallel k/v projections — the
        decode/prefill/scatter programs compile as SPMD with XLA
        collectives, and token streams are identical to the
        single-device engine. (Reference counterpart: model_worker.py
        serves one request per GPU with no model sharding at all.)"""
        from devqa_tpu.core.wrapper import JaxVLLM
        from devqa_tpu.parallel.mesh import make_mesh
        from devqa_tpu.parallel.sharding import shard_params
        from devqa_tpu.serve.engine import BatchingEngine

        prompts = [("what is near the tree", "imgA.jpg"),
                   ("who wrote the book The answer is:", None),
                   ("what color is the sky", "imgB.jpg")]
        vllm = make_tiny_vllm()
        eng = BatchingEngine(vllm, n_slots=2, max_len=96).start()
        try:
            reqs = [eng.submit(p, img, max_new_tokens=5)
                    for p, img in prompts]
            for r in reqs:
                assert r.done.wait(300)
            want = [r.text for r in reqs]
        finally:
            eng.shutdown()

        mesh = make_mesh(dp=4, tp=2)
        v2 = make_tiny_vllm()
        sv = JaxVLLM(v2.cfg, shard_params(v2.params, mesh), v2.tokenizer,
                     v2.image_provider, bucket_multiple=8, mesh=mesh)
        eng2 = BatchingEngine(sv, n_slots=2, max_len=96,
                              steps_per_dispatch=2).start()
        try:
            spec = eng2._cache["k"].sharding.spec
            assert "tp" in str(spec), spec  # heads axis really sharded
            reqs = [eng2.submit(p, img, max_new_tokens=5)
                    for p, img in prompts]
            for r in reqs:
                assert r.done.wait(300)
            got = [r.text for r in reqs]
        finally:
            eng2.shutdown()
        assert got == want, (got, want)
