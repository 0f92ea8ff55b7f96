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
