"""Attention: XLA reference correctness + flash/XLA agreement (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devqa_tpu.ops.attention import _flash_fwd, multihead_attention, xla_attention


def naive_attention(q, k, v, lengths=None, causal=False):
    """Straightforward float64-free numpy softmax attention for checking."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float32), np.asarray(k, np.float32))
    s /= d ** 0.5
    mask = np.ones((b, 1, lq, lk), bool)
    if lengths is not None:
        mask &= (np.arange(lk)[None, None, None, :] < np.asarray(lengths)[:, None, None, None])
    if causal:
        mask &= np.arange(lk)[None, None, None, :] <= np.arange(lq)[None, None, :, None]
    s = np.where(mask, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float32))


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    shape = (2, 4, 64, 32)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return q, k, v


class TestXLAAttention:
    def test_full(self, qkv):
        q, k, v = qkv
        out = xla_attention(q, k, v)
        np.testing.assert_allclose(out, naive_attention(q, k, v), rtol=1e-4, atol=1e-5)

    def test_causal(self, qkv):
        q, k, v = qkv
        out = xla_attention(q, k, v, causal=True)
        np.testing.assert_allclose(
            out, naive_attention(q, k, v, causal=True), rtol=1e-4, atol=1e-5
        )

    def test_lengths(self, qkv):
        q, k, v = qkv
        lengths = jnp.array([40, 64])
        kv = (np.arange(q.shape[2])[None,:] < np.asarray(lengths)[:,None]).astype(np.int32)
        out = xla_attention(q, k, v, kv_valid=jnp.asarray(kv), causal=True)
        np.testing.assert_allclose(
            out, naive_attention(q, k, v, lengths=lengths, causal=True),
            rtol=1e-4, atol=1e-5,
        )


class TestFlashKernel:
    """Run the Pallas kernel in interpret mode on CPU and compare to XLA."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_xla(self, qkv, causal):
        q, k, v = qkv
        lengths = jnp.array([50, 64], jnp.int32)
        with jax.disable_jit():  # interpret path for pallas on CPU
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                kv = jnp.asarray((np.arange(q.shape[2])[None,:] < np.asarray(lengths)[:,None]).astype(np.int32))
                out = _flash_fwd(q, k, v, kv, causal, block_q=32, block_k=32)
        ref = xla_attention(q, k, v, kv_valid=kv, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_causal_cross_length(self, qkv):
        """Prefix-cached decoding shape: Lq < Lk. The kernel must apply
        the (kv_len - q_len) diagonal offset like xla_attention does."""
        q, k, v = qkv
        q = q[:, :, :8, :]  # 8 new query rows against 64 cached keys
        lengths = jnp.array([50, 64], jnp.int32)
        kv = jnp.asarray((np.arange(k.shape[2])[None, :]
                          < np.asarray(lengths)[:, None]).astype(np.int32))
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd(q, k, v, kv, True, block_q=8, block_k=32)
        ref = xla_attention(q, k, v, kv_valid=kv, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("causal", [False, True])
    def test_no_mask_variant_matches_xla(self, qkv, causal):
        """kv_valid=None compiles the mask-free kernel specialization
        (no mask operand, no validity logic) — vision towers and
        full-valid benchmark shapes take this path."""
        q, k, v = qkv
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd(q, k, v, None, causal, block_q=32, block_k=32)
        ref = xla_attention(q, k, v, kv_valid=None, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_no_mask_ragged_tail(self, qkv):
        """A kv length no block size divides still masks OOB tail keys in
        the no-mask variant (the in-range bound is independent of
        kv_valid)."""
        q, k, v = qkv
        q, k, v = q[:, :, :48, :], k[:, :, :48, :], v[:, :, :48, :]
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd(q, k, v, None, True, block_q=32, block_k=32)
        ref = xla_attention(q, k, v, kv_valid=None, causal=True)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_odd_lengths_pad_and_match(self, qkv, causal, with_mask):
        """Non-8-multiple lengths (the 257-token CLS+patch vision shape)
        are zero-padded inside the kernel entry with true lengths
        threaded through — outputs match XLA exactly on the real rows."""
        q, k, v = qkv
        q, k, v = q[:, :, :57, :], k[:, :, :57, :], v[:, :, :57, :]
        kv = None
        if with_mask:
            lengths = jnp.array([50, 57], jnp.int32)
            kv = jnp.asarray((np.arange(57)[None, :]
                              < np.asarray(lengths)[:, None]).astype(np.int32))
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd(q, k, v, kv, causal, block_q=32, block_k=32)
        ref = xla_attention(q, k, v, kv_valid=kv, causal=causal)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_odd_lengths_grads_match(self, qkv, monkeypatch):
        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv
        q, k, v = q[:, :, :57, :], k[:, :, :57, :], v[:, :, :57, :]
        w = jnp.asarray(np.random.default_rng(11).normal(
            size=(2, 4, 57, 32)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(w * multihead_attention(q, k, v, None,
                                                   causal=True))

        def loss_xla(q, k, v):
            return jnp.sum(w * xla_attention(q, k, v, causal=True))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_fully_masked_rows_finite(self, qkv):
        q, k, v = qkv
        lengths = jnp.array([1, 1], jnp.int32)
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            kv = jnp.asarray((np.arange(q.shape[2])[None,:] < np.asarray(lengths)[:,None]).astype(np.int32))
            out = _flash_fwd(q, k, v, kv, True, block_q=32, block_k=32)
        assert np.isfinite(np.asarray(out)).all()

    def test_fully_masked_rows_are_exact_zeros(self, qkv):
        """The kernel's CONTRACT for rows with no attendable key is an
        all-zero output (the finalize ``dead`` check) — intentionally
        diverging from xla_attention's uniform-softmax guard. The
        pipeline never reads such rows (their K/V stay masked in every
        layer), but the zeros contract is what the no-p-select update
        relies on: weaken the dead check and these rows return the
        exp(0)=1 garbage average instead."""
        q, k, v = qkv
        kvn = np.ones((2, 64), np.int32)
        kvn[0, :] = 0          # row 0: every key masked
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd(q, k, v, jnp.asarray(kvn), False,
                             block_q=32, block_k=32)
        o = np.asarray(out, np.float32)
        np.testing.assert_array_equal(o[0], np.zeros_like(o[0]))
        assert np.abs(o[1]).max() > 0  # the live row is untouched


class TestShardedFlash:
    """Multi-device flash: shard_map over the (dp, tp) mesh, kernel in
    interpret mode on the virtual 8-CPU-device mesh. Both tests run in
    subprocess isolation — multi-device programs in a long-lived process
    correlate with sporadic XLA-CPU compile segfaults much later in the
    session (see helpers.isolate_in_subprocess)."""

    def test_mesh_path_matches_xla(self, qkv, monkeypatch):
        from helpers import isolate_in_subprocess

        if isolate_in_subprocess(
                "tests/test_attention.py::TestShardedFlash::"
                "test_mesh_path_matches_xla"):
            return
        from devqa_tpu.parallel.mesh import make_mesh

        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv  # b=2 (dp=2), h=4 (tp=4)
        lengths = jnp.array([50, 64], jnp.int32)
        kv = jnp.asarray((np.arange(k.shape[2])[None, :]
                          < np.asarray(lengths)[:, None]).astype(np.int32))
        mesh = make_mesh(dp=2, tp=4)
        ref = xla_attention(q, k, v, kv_valid=kv, causal=True)
        with mesh:
            out = jax.jit(
                lambda q, k, v, m: multihead_attention(q, k, v, m, causal=True)
            )(q, k, v, kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_mesh_indivisible_falls_back(self, qkv, monkeypatch):
        """Batch/head counts that don't divide the mesh use XLA attention
        (still correct, no crash)."""
        from helpers import isolate_in_subprocess

        if isolate_in_subprocess(
                "tests/test_attention.py::TestShardedFlash::"
                "test_mesh_indivisible_falls_back"):
            return
        from devqa_tpu.parallel.mesh import make_mesh

        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv
        q, k, v = q[:1, :3], k[:1, :3], v[:1, :3]  # h=3 doesn't divide tp=4
        mesh = make_mesh(dp=2, tp=4)
        ref = xla_attention(q, k, v, causal=True)
        with mesh:
            out = multihead_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


class TestGradPath:
    def test_backward_runs(self, qkv):
        q, k, v = qkv

        def loss(q, k, v):
            return jnp.sum(multihead_attention(q, k, v, causal=True) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()


class TestFlashBackward:
    """Pallas backward kernels (interpret mode) vs XLA-attention autodiff."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_xla(self, qkv, causal, monkeypatch):
        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv
        lengths = jnp.array([50, 64], jnp.int32)
        kv = jnp.asarray((np.arange(k.shape[2])[None, :]
                          < np.asarray(lengths)[:, None]).astype(np.int32))
        # weighted loss so gradients differ across positions
        w = jnp.asarray(np.random.default_rng(7).normal(
            size=(2, 4, 64, 32)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(w * multihead_attention(q, k, v, kv,
                                                   causal=causal))

        def loss_xla(q, k, v):
            return jnp.sum(w * xla_attention(q, k, v, kv_valid=kv,
                                             causal=causal))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    @pytest.mark.parametrize("causal", [False, True])
    def test_no_mask_grads_match_xla(self, qkv, causal, monkeypatch):
        """kv_valid=None end to end: mask-free Pallas fwd saves lse and
        the mask-free bwd kernels produce XLA-matching grads."""
        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv
        w = jnp.asarray(np.random.default_rng(9).normal(
            size=(2, 4, 64, 32)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(w * multihead_attention(q, k, v, None,
                                                   causal=causal))

        def loss_xla(q, k, v):
            return jnp.sum(w * xla_attention(q, k, v, kv_valid=None,
                                             causal=causal))

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_masked_keys_get_zero_grad(self, qkv, monkeypatch):
        monkeypatch.setenv("DEVQA_FLASH_INTERPRET", "1")
        q, k, v = qkv
        lengths = jnp.array([10, 20], jnp.int32)
        kv = jnp.asarray((np.arange(k.shape[2])[None, :]
                          < np.asarray(lengths)[:, None]).astype(np.int32))

        def loss(k, v):
            return jnp.sum(multihead_attention(q, k, v, kv, causal=True))

        dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
        m = np.asarray(kv)
        assert np.allclose(np.asarray(dk)[0, :, m[0] == 0], 0.0)
        assert np.allclose(np.asarray(dv)[1, :, m[1] == 0], 0.0)


class TestRaggedBlocks:
    """Ragged q/k tails (length not a multiple of the block size): the
    dkv grid accumulates across q-blocks, so unmasked tail garbage would
    corrupt real keys' gradients; forward acc dots touch OOB v rows.
    Exercised with small explicit block sizes so 64-length inputs span
    multiple blocks with a ragged tail."""

    def _qkv(self, lq, lk, seed=3):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(2, 2, lq, 32)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, 2, lk, 32)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, 2, lk, 32)), jnp.float32)
        kv = jnp.asarray((np.arange(lk)[None, :]
                          < np.asarray([lk - 3, lk])[:, None]).astype(np.int32))
        return q, k, v, kv

    @pytest.mark.parametrize("causal", [False, True])
    def test_ragged_forward_matches_xla(self, causal, monkeypatch):
        from devqa_tpu.ops.attention import _flash_fwd, xla_attention

        lq = lk = 56  # blocks of 32 -> ragged 24-tail in q AND k
        q, k, v, kv = self._qkv(lq, lk)
        out = _flash_fwd(q, k, v, kv, causal, block_q=32, block_k=32,
                         interpret=True)
        ref = xla_attention(q, k, v, kv_valid=kv, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("causal", [False, True])
    def test_ragged_backward_matches_xla(self, causal):
        from devqa_tpu.ops.attention import (_flash_bwd, _flash_fwd,
                                             xla_attention)

        lq = lk = 56
        q, k, v, kv = self._qkv(lq, lk)
        out, lse = _flash_fwd(q, k, v, kv, causal, block_q=32, block_k=32,
                              interpret=True, return_lse=True)  # lse [b,h,lq]
        w = jnp.asarray(np.random.default_rng(9).normal(
            size=(2, 2, lq, 32)), jnp.float32)
        dq, dk, dv = _flash_bwd(q, k, v, kv, causal, out, lse, w,
                                block_q=32, block_k=32, interpret=True)

        def loss_xla(q, k, v):
            return jnp.sum(w * xla_attention(q, k, v, kv_valid=kv,
                                             causal=causal))

        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip((dq, dk, dv), gx, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=name)

    def test_short_q_routes_to_xla(self, monkeypatch):
        """lq=1 (KV-cached decode) must not take the flash path — its
        (1,1,d) q block would violate TPU sublane tiling."""
        from devqa_tpu.ops import attention as A

        q = jnp.ones((1, 2, 1, 32), jnp.float32)
        k = jnp.ones((1, 2, 600, 32), jnp.float32)
        assert not A._flash_worthwhile(q, k)
        # full-block lengths still qualify by kv threshold
        q2 = jnp.ones((1, 2, 128, 32), jnp.float32)
        assert A._flash_worthwhile(q2, k)
