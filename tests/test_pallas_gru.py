"""Parity tests for the fused Pallas GRU kernels (interpret mode on CPU).

The fused kernels must reproduce the masked lax.scan semantics
(``ops/rnn.py``) within bf16 tolerance for both directions, ragged
lengths, and the full bi-directional stack.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medaka_tpu.models.gru import GRUModel
from medaka_tpu.ops.pallas_gru import (
    _pick_time_block, bigru_stack_fused, gru_pallas)
from medaka_tpu.ops.rnn import bigru_stack, gru_layer_params, gru_scan


def _project(x, p, dtype=jnp.bfloat16):
    xp = (jnp.einsum("bti,hi->bth", x.astype(dtype),
                     p["w_ih"].astype(dtype)) + p["b_ih"].astype(dtype))
    return jnp.swapaxes(xp, 0, 1)


class TestSingleDirection:
    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_masked_scan(self, reverse):
        params = gru_layer_params(jax.random.PRNGKey(0), 10, 32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((8, 64, 10)).astype(np.float32))
        lengths = jnp.asarray(
            np.array([64, 64, 50, 3, 64, 17, 64, 40], np.int32))
        ref = gru_scan(
            params, x, reverse=reverse, compute_dtype=jnp.bfloat16,
            lengths=lengths)
        got = gru_pallas(
            _project(x, params), params["w_hh"], params["b_hh"],
            lengths=lengths, reverse=reverse, time_block=16,
            interpret=True)
        got = jnp.swapaxes(got, 0, 1)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2)


class TestFusedStack:
    def test_matches_scan_stack(self):
        model = GRUModel(gru_size=32)
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((8, 64, 10)).astype(np.float32))
        lengths = jnp.asarray(
            np.array([64, 64, 50, 3, 64, 17, 64, 40], np.int32))
        ref = bigru_stack(
            params["gru"], x, compute_dtype=jnp.bfloat16, lengths=lengths)
        got = bigru_stack_fused(
            params["gru"], x, lengths=lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)

    def test_model_apply_fused_flag(self):
        """apply(fused=True, interpret via CPU) matches fused stack; the
        auto default stays on the scan path on CPU."""
        model = GRUModel(gru_size=16)
        params = model.init_params(jax.random.PRNGKey(1))
        x = jnp.asarray(
            np.random.default_rng(1).random((2, 32, 10)).astype(np.float32))
        auto = model.apply(params, x, compute_dtype=jnp.bfloat16)
        scan = model.apply(
            params, x, compute_dtype=jnp.bfloat16, fused=False)
        np.testing.assert_array_equal(
            np.asarray(auto), np.asarray(scan))


def test_pick_time_block():
    assert _pick_time_block(10000, 128, 256) >= 1
    assert 10000 % _pick_time_block(10000, 128, 256) == 0
    assert _pick_time_block(7, 128, 256) in (1, 7)
    # huge block would blow the budget
    assert _pick_time_block(10000, 128, 256) * 128 * 768 * 2 <= (4 << 20)


class TestFusedLSTM:
    def test_matches_scan_stack(self):
        from medaka_tpu.ops.pallas_gru import bilstm_stack_fused
        from medaka_tpu.ops.rnn import bilstm_stack, lstm_layer_params
        layers = []
        key = jax.random.PRNGKey(4)
        for i in range(2):
            in_size = 16 if i == 0 else 32
            key, kf, kb = jax.random.split(key, 3)
            layers.append({
                "fwd": lstm_layer_params(kf, in_size, 16),
                "bwd": lstm_layer_params(kb, in_size, 16)})
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((4, 48, 16)).astype(np.float32))
        lengths = jnp.asarray(np.array([48, 30, 7, 48], np.int32))
        ref = bilstm_stack(
            layers, x, compute_dtype=jnp.bfloat16, lengths=lengths)
        got = bilstm_stack_fused(
            layers, x, lengths=lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)


class TestFullFused:
    def test_matches_scan(self):
        from medaka_tpu.ops.pallas_gru import bigru_stack_fullfused
        model_layers = []
        key = jax.random.PRNGKey(6)
        for i in range(2):
            in_size = 10 if i == 0 else 32
            key, kf, kb = jax.random.split(key, 3)
            model_layers.append({
                "fwd": gru_layer_params(kf, in_size, 16),
                "bwd": gru_layer_params(kb, in_size, 16)})
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((4, 32, 10)).astype(np.float32))
        lengths = jnp.asarray(np.array([32, 20, 5, 32], np.int32))
        ref = bigru_stack(
            model_layers, x, compute_dtype=jnp.bfloat16,
            lengths=lengths)
        got = bigru_stack_fullfused(
            model_layers, x, lengths=lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)

    def test_staggered_schedule_bitwise_matches_sequential(self):
        """The software-pipelined schedule reorders ops, not math.

        Measured slower on hardware (negative result, PARITY.md) but
        kept as an ablation point; its outputs must stay bitwise equal
        to the default schedule.
        """
        from medaka_tpu.ops.pallas_gru import bigru_pallas_fullfused
        rng = np.random.default_rng(3)
        T, B, IN, H = 24, 8, 16, 16
        x = jnp.asarray(
            rng.standard_normal((T, B, IN)) * 0.3, jnp.bfloat16)
        w_ih = jnp.asarray(
            rng.standard_normal((2, 3 * H, IN)) * 0.2, jnp.float32)
        b_ih = jnp.asarray(
            rng.standard_normal((2, 3 * H)) * 0.1, jnp.float32)
        w_hh = jnp.asarray(
            rng.standard_normal((2, 3 * H, H)) * 0.2, jnp.float32)
        b_hh = jnp.asarray(
            rng.standard_normal((2, 3 * H)) * 0.1, jnp.float32)
        lengths = jnp.asarray(rng.integers(5, T + 1, B), jnp.int32)
        seq = bigru_pallas_fullfused(
            x, w_ih, b_ih, w_hh, b_hh, lengths=lengths,
            time_block=4, interpret=True)
        stag = bigru_pallas_fullfused(
            x, w_ih, b_ih, w_hh, b_hh, lengths=lengths,
            time_block=4, interpret=True, schedule="staggered")
        for a, b in zip(seq, stag):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32))

    def test_int8_recurrent_matches_scan(self):
        """int8 recurrent weights stay close to the f32 reference.

        The quantisation error budget (h to 1/127, per-column weight
        scales) is validated against the unquantised scan; consensus-QV
        level validation runs on hardware in tests/perf/tpu_bench.py.
        """
        from medaka_tpu.ops.pallas_gru import bigru_stack_fullfused
        model_layers = []
        key = jax.random.PRNGKey(8)
        for i in range(2):
            in_size = 10 if i == 0 else 32
            key, kf, kb = jax.random.split(key, 3)
            model_layers.append({
                "fwd": gru_layer_params(kf, in_size, 16),
                "bwd": gru_layer_params(kb, in_size, 16)})
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.random((4, 32, 10)).astype(np.float32))
        lengths = jnp.asarray(np.array([32, 20, 5, 32], np.int32))
        ref = bigru_stack(
            model_layers, x, compute_dtype=None, lengths=lengths)
        got = bigru_stack_fullfused(
            model_layers, x, lengths=lengths, interpret=True,
            recurrent_quant="int8")
        err = np.abs(np.asarray(got, np.float32)
                     - np.asarray(ref, np.float32))
        assert err.max() < 8e-2, err.max()
        assert err.mean() < 1e-2, err.mean()


class TestSplitHeadPath:
    """The flagship split path (layer-split kernels + fused head).

    Must match the scan stack + einsum head: exactly-ish for bf16
    (quant="none"), within the validated int8 budget otherwise.
    Hardware throughput/parity numbers live in tests/perf/kernel_lab.py.
    """

    def _setup(self, hidden=16):
        model = GRUModel(gru_size=hidden)
        params = model.init_params(jax.random.PRNGKey(11))
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((4, 32, 10)).astype(np.float32))
        lengths = jnp.asarray(np.array([32, 20, 5, 32], np.int32))
        return model, params, x, lengths

    def _ref_probs(self, model, params, x, lengths):
        return np.asarray(model.apply(
            params, x, lengths=lengths, fused=False), np.float32)

    @pytest.mark.parametrize("layout", ["rows", "transposed"])
    @pytest.mark.parametrize("quant,atol", [(False, 5e-3), (True, 2e-2)])
    def test_matches_scan_probs(self, quant, atol, layout):
        from medaka_tpu.ops.pallas_gru import bigru_head_fullfused
        model, params, x, lengths = self._setup()
        ref = self._ref_probs(model, params, x, lengths)
        logits = bigru_head_fullfused(
            params["gru"], params["linear"], x, lengths=lengths,
            quant=quant, interpret=True, layout=layout)
        got = np.asarray(jax.nn.softmax(logits, axis=-1), np.float32)
        mask = (np.arange(32)[None, :]
                < np.asarray(lengths)[:, None])
        assert np.abs(got - ref)[mask].max() < atol

    def test_layouts_agree(self):
        """Row-major and transposed split paths share quantisation
        scheme and scales; logits agree to f32 accumulation-order
        noise (matmul operand order differs, compounded through the
        recurrence — measured 1.8e-3 max at T=32)."""
        from medaka_tpu.ops.pallas_gru import bigru_head_fullfused
        model, params, x, lengths = self._setup()
        a = bigru_head_fullfused(
            params["gru"], params["linear"], x, lengths=lengths,
            quant=True, interpret=True, layout="rows")
        b = bigru_head_fullfused(
            params["gru"], params["linear"], x, lengths=lengths,
            quant=True, interpret=True, layout="transposed")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3)

    def test_rejects_non_two_layer_stacks(self):
        from medaka_tpu.ops.pallas_gru import bigru_head_fullfused
        model, params, x, lengths = self._setup()
        with pytest.raises(ValueError, match="2-layer"):
            bigru_head_fullfused(
                params["gru"][:1], params["linear"], x, interpret=True)

    def test_apply_routes_around_split_path_on_cpu(self):
        """On CPU the auto fused default stays off; explicit legacy
        quant modes must still hit the fullfused stack, not the split
        path (which asserts 2 layers)."""
        model, params, x, lengths = self._setup()
        ref = self._ref_probs(model, params, x, lengths)
        got = np.asarray(model.apply(
            params, x, lengths=lengths, compute_dtype=jnp.bfloat16),
            np.float32)
        mask = (np.arange(32)[None, :]
                < np.asarray(lengths)[:, None])
        assert np.abs(got - ref)[mask].max() < 5e-2


class TestTrainableKernel:
    """The custom-VJP kernel pair must match XLA autodiff gradients."""

    def _setup(self):
        model = GRUModel(gru_size=8)
        params = model.init_params(jax.random.PRNGKey(1))
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((3, 16, 10)).astype(np.float32))
        lengths = jnp.asarray(np.array([16, 9, 16], np.int32))
        return params, x, lengths

    def test_forward_matches_scan(self):
        from medaka_tpu.ops.pallas_gru import bigru_stack_trainable
        params, x, lengths = self._setup()
        ref = bigru_stack(
            params["gru"], x, compute_dtype=jnp.bfloat16, lengths=lengths)
        got = bigru_stack_trainable(
            params["gru"], x, lengths=lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)

    def test_gradients_match_scan_autodiff(self):
        from medaka_tpu.ops.pallas_gru import bigru_stack_trainable
        params, x, lengths = self._setup()

        def loss_kernel(layers):
            out = bigru_stack_trainable(
                layers, x, lengths=lengths, interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_scan(layers):
            out = bigru_stack(
                layers, x, compute_dtype=jnp.bfloat16, lengths=lengths)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_kernel = jax.grad(loss_kernel)(params["gru"])
        g_scan = jax.grad(loss_scan)(params["gru"])
        leaves_k = jax.tree_util.tree_leaves(g_kernel)
        leaves_s = jax.tree_util.tree_leaves(g_scan)
        assert len(leaves_k) == len(leaves_s)
        for gk, gs in zip(leaves_k, leaves_s):
            gk = np.asarray(gk, np.float32)
            gs = np.asarray(gs, np.float32)
            scale = max(np.abs(gs).max(), 1e-3)
            assert np.abs(gk - gs).max() / scale < 0.05, (
                "grad mismatch: {}".format(np.abs(gk - gs).max() / scale))

    def test_model_apply_training_path(self):
        # training=True must route through a differentiable path and
        # produce logits matching the scan within bf16 tolerance.
        model = GRUModel(gru_size=8)
        params, x, lengths = self._setup()

        def loss(p):
            logits = model.apply(
                p, x, normalise=False, compute_dtype=jnp.bfloat16,
                lengths=lengths, fused=False, training=True)
            return jnp.sum(logits ** 2)

        g = jax.grad(loss)(params)
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree_util.tree_leaves(g))

    def test_unidirectional_gradients(self):
        from medaka_tpu.ops.pallas_gru import bigru_stack_trainable
        from medaka_tpu.ops.rnn import gru_layer_params, gru_scan
        _, x, lengths = self._setup()
        uni = [{"fwd": gru_layer_params(jax.random.PRNGKey(7), 10, 8)},
               {"fwd": gru_layer_params(jax.random.PRNGKey(8), 8, 8)}]

        def loss_kernel(ls):
            out = bigru_stack_trainable(
                ls, x, lengths=lengths, bidirectional=False,
                interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_scan(ls):
            out = x
            for layer in ls:
                out = gru_scan(
                    layer["fwd"], out, compute_dtype=jnp.bfloat16,
                    lengths=lengths)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gk = jax.grad(loss_kernel)(uni)
        gs = jax.grad(loss_scan)(uni)
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(gs)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 0.05



class TestTrainableLSTM:
    """LSTM custom-VJP kernel pair vs XLA autodiff of the masked scan."""

    def _setup(self):
        from medaka_tpu.ops.rnn import lstm_layer_params
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((3, 16, 12)).astype(np.float32))
        lengths = jnp.asarray(np.array([16, 9, 16], np.int32))
        key = jax.random.PRNGKey(3)
        layers = []
        for i in range(2):
            insz = 12 if i == 0 else 16
            key, kf, kb = jax.random.split(key, 3)
            layers.append({"fwd": lstm_layer_params(kf, insz, 8),
                           "bwd": lstm_layer_params(kb, insz, 8)})
        return layers, x, lengths

    @staticmethod
    def _max_rel_diff(tree_a, tree_b):
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-3)
            worst = max(worst, np.abs(a - b).max() / scale)
        return worst

    def test_bidirectional_gradients(self):
        from medaka_tpu.ops.pallas_gru import bilstm_stack_trainable
        from medaka_tpu.ops.rnn import bilstm_stack
        layers, x, lengths = self._setup()

        def loss_kernel(ls):
            out = bilstm_stack_trainable(
                ls, x, lengths=lengths, interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_scan(ls):
            out = bilstm_stack(
                ls, x, compute_dtype=jnp.bfloat16, lengths=lengths)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        diff = self._max_rel_diff(
            jax.grad(loss_kernel)(layers), jax.grad(loss_scan)(layers))
        assert diff < 0.05, diff

    def test_unidirectional_interleave_gradients(self):
        from medaka_tpu.ops.pallas_gru import bilstm_stack_trainable
        from medaka_tpu.ops.rnn import lstm_layer_params, lstm_scan
        layers, x, lengths = self._setup()
        uni = [{"fwd": layers[0]["fwd"]},
               {"fwd": lstm_layer_params(jax.random.PRNGKey(9), 8, 8)}]

        def loss_kernel(ls):
            out = bilstm_stack_trainable(
                ls, x, lengths=lengths, bidirectional=False,
                interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_scan(ls):
            out = x
            for i, layer in enumerate(ls):
                out = lstm_scan(
                    layer["fwd"], out, reverse=(i % 2 == 0),
                    compute_dtype=jnp.bfloat16, lengths=lengths)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        diff = self._max_rel_diff(
            jax.grad(loss_kernel)(uni), jax.grad(loss_scan)(uni))
        assert diff < 0.05, diff


def test_apply_interpret_dispatch_matches_scan():
    """GRUModel.apply(fused=True, interpret=True) must route through
    the flagship split-path kernels (bypassing the batch/width perf
    heuristics) and agree with the f32 scan — the driver's multichip
    dryrun validates the production kernel path on CPU this way."""
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(num_features=10, num_classes=5, gru_size=32)
    params = model.init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).random((3, 40, 10)).astype(np.float32)
    lengths = jnp.asarray([40, 17, 40], jnp.int32)
    ref = np.asarray(model.apply(params, x, lengths=lengths))
    got = np.asarray(model.apply(
        params, x, lengths=lengths, compute_dtype=jnp.bfloat16,
        fused=True, interpret=True))
    np.testing.assert_allclose(got, ref, atol=0.02)
