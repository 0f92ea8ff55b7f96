"""Recurrent kernels (GRU/LSTM) with torch-compatible semantics.

The gate maths follows ``torch.nn.GRU``/``torch.nn.LSTM`` exactly so that
weights exported from reference medaka checkpoints (``weights.pt``) produce
bitwise-comparable logits (reference model: ``medaka/architectures/gru.py``).

TPU mapping: the input projection for all timesteps is one large matmul
(MXU-friendly); the sequential part is a `lax.scan` whose per-step work is a
(B, H) x (H, 3H) matmul — weights stay resident in VMEM across steps under
XLA. Layouts are time-major inside the scan.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def gru_layer_params(rng, input_size: int, hidden_size: int,
                     dtype=jnp.float32) -> Dict:
    """Initialise one direction of a GRU layer (torch uniform init)."""
    k = 1.0 / np.sqrt(hidden_size)
    keys = jax.random.split(rng, 4)
    shape_ih = (3 * hidden_size, input_size)
    shape_hh = (3 * hidden_size, hidden_size)
    return {
        "w_ih": jax.random.uniform(keys[0], shape_ih, dtype, -k, k),
        "w_hh": jax.random.uniform(keys[1], shape_hh, dtype, -k, k),
        "b_ih": jax.random.uniform(keys[2], (3 * hidden_size,), dtype, -k, k),
        "b_hh": jax.random.uniform(keys[3], (3 * hidden_size,), dtype, -k, k),
    }


def gru_scan(params: Dict, x: jnp.ndarray, reverse: bool = False,
             compute_dtype=None, lengths=None) -> jnp.ndarray:
    """Run a single-direction GRU over a batch.

    :param params: dict with w_ih (3H, in), w_hh (3H, H), b_ih, b_hh;
        gate order (r, z, n) as in torch.
    :param x: (batch, time, features) input.
    :param reverse: process time steps in reverse (output re-reversed).
    :param compute_dtype: run the recurrence in this dtype (e.g. bfloat16
        for the TPU fast path). When None, float32 math uses HIGHEST matmul
        precision for checkpoint-parity with CPU/CUDA references.
    :param lengths: optional (batch,) int array of valid sequence lengths.
        The hidden state is frozen at padded steps, so outputs on the
        valid prefix are bitwise-identical to an unpadded run — this is
        what lets inference batch ragged chunks into one static
        (B, T, F) shape on TPU instead of the reference's dynamic-shape
        remainder pass (``medaka/prediction.py:196-215``).

    :returns: (batch, time, hidden) outputs.
    """
    w_ih = params["w_ih"]
    w_hh = params["w_hh"]
    b_ih = params["b_ih"]
    b_hh = params["b_hh"]
    # TPU f32 matmuls default to fast low-precision passes; request exact
    # f32 when no explicit lower compute dtype was chosen.
    precision = None if compute_dtype is not None else \
        jax.lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_ih, w_hh = w_ih.astype(compute_dtype), w_hh.astype(compute_dtype)
        b_ih, b_hh = b_ih.astype(compute_dtype), b_hh.astype(compute_dtype)
    hidden = w_hh.shape[1]
    batch = x.shape[0]

    # input projection for every timestep at once: (B, T, 3H), time-major
    x_proj = (
        jnp.einsum("bti,hi->bth", x, w_ih,
                   preferred_element_type=x.dtype, precision=precision)
        + b_ih)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 3H)

    w_hh_t = w_hh.T  # (H, 3H)
    h0 = jnp.zeros((batch, hidden), dtype=x.dtype)

    def cell(h, xp):
        hp = jnp.dot(
            h, w_hh_t, preferred_element_type=h.dtype,
            precision=precision) + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new

    if lengths is None:
        def step(h, xp):
            h_new = cell(h, xp)
            return h_new, h_new

        _, ys = jax.lax.scan(step, h0, x_proj, reverse=reverse)
    else:
        t_idx = jnp.arange(x.shape[1], dtype=jnp.int32)
        valid = (t_idx[:, None] < lengths[None, :]).astype(x.dtype)
        valid = valid[:, :, None]  # (T, B, 1)

        def step(h, inp):
            xp, m = inp
            h_new = cell(h, xp)
            h_new = m * h_new + (1.0 - m) * h
            return h_new, h_new

        _, ys = jax.lax.scan(step, h0, (x_proj, valid), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def bigru_stack(layers, x: jnp.ndarray, bidirectional: bool = True,
                compute_dtype=None, lengths=None) -> jnp.ndarray:
    """Apply a stack of (bi)GRU layers.

    :param layers: list of per-layer param dicts; each has key 'fwd' and,
        when bidirectional, 'bwd'.
    :param x: (batch, time, features).
    :param lengths: optional (batch,) valid lengths; see :func:`gru_scan`.

    :returns: (batch, time, hidden * n_dirs) features of the last layer.
    """
    out = x
    for layer in layers:
        fwd = gru_scan(
            layer["fwd"], out, reverse=False, compute_dtype=compute_dtype,
            lengths=lengths)
        if bidirectional:
            bwd = gru_scan(
                layer["bwd"], out, reverse=True, compute_dtype=compute_dtype,
                lengths=lengths)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


def lstm_layer_params(rng, input_size: int, hidden_size: int,
                      dtype=jnp.float32) -> Dict:
    """Initialise one direction of an LSTM layer (torch uniform init)."""
    k = 1.0 / np.sqrt(hidden_size)
    keys = jax.random.split(rng, 4)
    return {
        "w_ih": jax.random.uniform(
            keys[0], (4 * hidden_size, input_size), dtype, -k, k),
        "w_hh": jax.random.uniform(
            keys[1], (4 * hidden_size, hidden_size), dtype, -k, k),
        "b_ih": jax.random.uniform(keys[2], (4 * hidden_size,), dtype, -k, k),
        "b_hh": jax.random.uniform(keys[3], (4 * hidden_size,), dtype, -k, k),
    }


def lstm_scan(params: Dict, x: jnp.ndarray, reverse: bool = False,
              compute_dtype=None, lengths=None) -> jnp.ndarray:
    """Single-direction LSTM; torch gate order (i, f, g, o).

    :param x: (batch, time, features).
    :param lengths: optional (batch,) valid lengths; carry frozen at
        padded steps (see :func:`gru_scan`).
    :returns: (batch, time, hidden).
    """
    w_ih, w_hh = params["w_ih"], params["w_hh"]
    b_ih, b_hh = params["b_ih"], params["b_hh"]
    # exact f32 matmuls when no lower compute dtype was chosen (same
    # rationale as gru_scan: TPU f32 defaults to fast low-precision
    # passes, breaking logit parity with reference checkpoints)
    precision = None if compute_dtype is not None else \
        jax.lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_ih, w_hh = w_ih.astype(compute_dtype), w_hh.astype(compute_dtype)
        b_ih, b_hh = b_ih.astype(compute_dtype), b_hh.astype(compute_dtype)
    hidden = w_hh.shape[1]
    batch = x.shape[0]
    x_proj = (
        jnp.einsum("bti,hi->bth", x, w_ih,
                   preferred_element_type=x.dtype,
                   precision=precision) + b_ih)
    x_proj = jnp.swapaxes(x_proj, 0, 1)
    w_hh_t = w_hh.T
    carry0 = (jnp.zeros((batch, hidden), x.dtype),
              jnp.zeros((batch, hidden), x.dtype))

    def cell(carry, xp):
        h, c = carry
        gates = xp + jnp.dot(
            h, w_hh_t, preferred_element_type=h.dtype,
            precision=precision) + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    if lengths is None:
        def step(carry, xp):
            h_new, c_new = cell(carry, xp)
            return (h_new, c_new), h_new

        _, ys = jax.lax.scan(step, carry0, x_proj, reverse=reverse)
    else:
        t_idx = jnp.arange(x.shape[1], dtype=jnp.int32)
        valid = (t_idx[:, None] < lengths[None, :]).astype(x.dtype)
        valid = valid[:, :, None]

        def step(carry, inp):
            xp, m = inp
            h, c = carry
            h_new, c_new = cell(carry, xp)
            h_new = m * h_new + (1.0 - m) * h
            c_new = m * c_new + (1.0 - m) * c
            return (h_new, c_new), h_new

        _, ys = jax.lax.scan(step, carry0, (x_proj, valid), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm_stack(layers, x: jnp.ndarray, bidirectional: bool = True,
                 compute_dtype=None, lengths=None) -> jnp.ndarray:
    """Apply a stack of (bi)LSTM layers; see :func:`bigru_stack`."""
    out = x
    for layer in layers:
        fwd = lstm_scan(
            layer["fwd"], out, reverse=False, compute_dtype=compute_dtype,
            lengths=lengths)
        if bidirectional:
            bwd = lstm_scan(
                layer["bwd"], out, reverse=True,
                compute_dtype=compute_dtype, lengths=lengths)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out
