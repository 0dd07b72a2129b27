"""bench.py helper units: MFU accounting (shared between the main fused
phase and the llava phase) and the tunnel-await degradation gate."""
import importlib.util
import os


def load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeVLLM:
    def __init__(self, dec_tokens, images, unique=None):
        self.counters = {"decoder_tokens": dec_tokens,
                         "images_encoded": images}
        if unique is not None:
            self.counters["images_unique"] = unique


class TestMfuAccounting:
    def test_counter_delta_plus_probe_tokens(self):
        b = load_bench()
        vllm = FakeVLLM(dec_tokens=1000, images=3)
        c0 = dict(vllm.counters)
        vllm.counters["decoder_tokens"] += 500   # counted forwards
        vllm.counters["images_encoded"] += 7
        dec_tokens, n_imgs, mfu = b.mfu_accounting(
            vllm, c0, probe_tokens=250, dt=2.0,
            dec_ftok=4.0, vis_fimg=10.0, peak=1e3)
        assert dec_tokens == 750 and n_imgs == 7
        # f_dec=3000, f_vis=70 over dt*peak=2000
        assert mfu["mfu_decoder"] == 1.5
        assert mfu["mfu_vision"] == 0.035
        assert mfu["mfu_total"] == 1.535
        assert mfu["mfu_decoder"] + mfu["mfu_vision"] == mfu["mfu_total"]

    def test_zero_probe_tokens_for_counted_editors(self):
        """Base-query_logits editors: everything lands in the counter,
        probe_tokens stays 0 — the sum must not change."""
        b = load_bench()
        vllm = FakeVLLM(dec_tokens=0, images=0)
        c0 = dict(vllm.counters)
        vllm.counters["decoder_tokens"] += 750
        dec_tokens, _, _ = b.mfu_accounting(
            vllm, c0, probe_tokens=0, dt=1.0,
            dec_ftok=1.0, vis_fimg=1.0, peak=1.0)
        assert dec_tokens == 750

    def test_vision_padding_cannot_inflate_mfu(self):
        """Vision FLOPs count UNIQUE encodes; the padded device rows only
        show up as vision_pad_frac."""
        b = load_bench()
        vllm = FakeVLLM(dec_tokens=0, images=0, unique=0)
        c0 = dict(vllm.counters)
        vllm.counters["images_encoded"] += 16   # 2 padded batches of 8
        vllm.counters["images_unique"] += 10    # only 10 real misses
        _, n_imgs, mfu = b.mfu_accounting(
            vllm, c0, probe_tokens=0, dt=1.0,
            dec_ftok=1.0, vis_fimg=100.0, peak=1e3)
        assert n_imgs == 10
        assert mfu["mfu_vision"] == 1.0          # 10*100 / 1e3
        assert mfu["vision_pad_frac"] == 0.375   # 6/16 padded


class TestAwaitTpu:
    def test_cpu_short_circuit(self, monkeypatch):
        b = load_bench()
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert b._await_tpu(deadline_s=0) is True
