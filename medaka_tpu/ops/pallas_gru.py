"""Fused Pallas GRU kernel for TPU.

The ``lax.scan`` GRU (``ops/rnn.py``) is correct but launches 10k tiny
per-step HLO ops; on TPU this is ~99% loop overhead and minutes of XLA
compile time at the default inference geometry. This kernel is the
speed-of-light path (SURVEY §7 "hard parts"):

- the input projection for all timesteps is one large MXU matmul done
  outside the kernel (time-major ``(T, B, 3H)``);
- the kernel walks the grid over time blocks; the hidden state lives in
  a VMEM scratch accumulator across grid steps, the recurrent weights
  stay VMEM-resident, and each step is a single (B, H) x (H, 3H) MXU
  matmul plus fused VPU gate math;
- the backward direction reuses the same kernel with reversed block
  index maps (no data movement to reverse the sequence);
- ragged chunks keep exact masked-scan semantics: hidden state freezes
  at steps beyond a row's ``length``.

Numerics: gate matmuls run in bf16 with f32 accumulation; the hidden
state is carried in f32. Gate order (r, z, n) matches torch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_time_block(T: int, B: int, H: int, budget_bytes: int = 4 << 20,
                     dtype_bytes: int = 2, gates: int = 3) -> int:
    """Largest divisor of T whose (BT, B, gates*H) block fits."""
    best = 1
    for bt in range(1, T + 1):
        if T % bt:
            continue
        if bt * B * gates * H * dtype_bytes > budget_bytes:
            break
        best = bt
    return best


# Scoped-VMEM ceiling requested for the fullfused kernels.  The
# compiler's default scoped limit is 16 MB, which forces time_block=1
# at the production geometry (B=512) — one grid step, two input DMAs
# and a degenerate (B, IN) projection matmul per time step.  v5e cores
# have 128 MB of VMEM; raising the limit lets the chooser below pick
# time blocks that amortise grid overhead and batch the projections.
_FULLFUSED_VMEM_LIMIT = 100 << 20


def _gru_kernel(x_proj_ref, w_hh_t_ref, b_hh_ref, lengths_ref, out_ref,
                h_scratch, *, time_block: int, reverse: bool):
    """One time-block of the recurrence. Grid walks blocks sequentially."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    w_hh_t = w_hh_t_ref[...]
    b_hh = b_hh_ref[...]
    lengths = lengths_ref[...]  # (B, 1) int32

    # global time index of local step t within this block
    if reverse:
        block_start = (n_blocks - 1 - i) * time_block
    else:
        block_start = i * time_block

    def step(t_iter, h):
        t_local = (time_block - 1 - t_iter) if reverse else t_iter
        t_global = block_start + t_local
        xp = x_proj_ref[t_local].astype(jnp.float32)  # (B, 3H)
        hp = jnp.dot(
            h.astype(w_hh_t.dtype), w_hh_t,
            preferred_element_type=jnp.float32) + b_hh
        xr = xp[:, :hidden]
        xz = xp[:, hidden:2 * hidden]
        xn = xp[:, 2 * hidden:]
        hr = hp[:, :hidden]
        hz = hp[:, hidden:2 * hidden]
        hn = hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        valid = (lengths > t_global)  # (B, 1)
        h_new = jnp.where(valid, h_new, h)
        out_ref[t_local] = h_new.astype(out_ref.dtype)
        return h_new

    h = jax.lax.fori_loop(0, time_block, step, h_scratch[...])
    h_scratch[...] = h


@functools.partial(
    jax.jit, static_argnames=("reverse", "time_block", "interpret"))
def gru_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
               lengths: Optional[jnp.ndarray] = None, reverse: bool = False,
               time_block: Optional[int] = None,
               interpret: bool = False) -> jnp.ndarray:
    """Run one GRU direction over pre-projected inputs.

    :param x_proj: (T, B, 3H) time-major input projections
        (``x @ w_ih.T + b_ih``), any float dtype (bf16 recommended).
    :param w_hh: (3H, H) recurrent weights (torch layout).
    :param b_hh: (3H,) recurrent bias.
    :param lengths: optional (B,) valid lengths (masked-scan semantics).
    :param reverse: process time back-to-front (output in natural order).
    :param time_block: steps per grid iteration (auto if None).

    :returns: (T, B, H) hidden-state outputs, dtype of ``x_proj``.
    """
    T, B, threeH = x_proj.shape
    H = threeH // 3
    if time_block is None:
        time_block = _pick_time_block(T, B, H)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = w_hh.T.astype(jnp.bfloat16)  # (H, 3H)
    b_hh_row = b_hh.astype(jnp.float32).reshape(1, threeH)

    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)  # noqa: E731
    else:
        idx = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _gru_kernel, time_block=time_block, reverse=reverse)
    flops = 2 * T * B * (H * threeH) + 10 * T * B * threeH
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, threeH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (time_block, B, H), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_proj.size * 2 + T * B * H * 2,
            transcendentals=3 * T * B * H),
        interpret=interpret,
    )(x_proj, w_hh_t, b_hh_row, lengths2d)


def _bigru_kernel(xp_f_ref, xp_b_ref, w_hh_t_ref, b_hh_ref, lengths_ref,
                  out_f_ref, out_b_ref, h_scratch, *, time_block: int):
    """Both directions in one kernel.

    The two recurrences have independent dependency chains, so their
    per-step matmuls are issued as one batched (2, B, H) x (2, H, 3H)
    contraction — the MXU overlaps their latencies, which is the win over
    running two single-direction kernels (small-matmul latency, not
    FLOPs, bounds this workload).
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    w_f = w_hh_t_ref[0]               # (H, 3H) bf16
    w_b = w_hh_t_ref[1]
    b_f = b_hh_ref[0]                 # (1, 3H) f32
    b_b = b_hh_ref[1]
    lengths = lengths_ref[...]        # (B, 1) int32

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def cell(h, xp, w, b):
        hp = jnp.dot(
            h.astype(w.dtype), w,
            preferred_element_type=jnp.float32) + b
        xr = xp[:, :hidden]
        xz = xp[:, hidden:2 * hidden]
        xn = xp[:, 2 * hidden:]
        hr = hp[:, :hidden]
        hz = hp[:, hidden:2 * hidden]
        hn = hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    def step(t, carry):
        # two independent recurrence chains; the per-step matmuls are
        # independent ops so the MXU pipelines them, which is the win
        # over two single-direction kernel passes
        h_f, h_b = carry
        t_b = time_block - 1 - t
        nh_f = cell(h_f, xp_f_ref[t].astype(jnp.float32), w_f, b_f)
        nh_b = cell(h_b, xp_b_ref[t_b].astype(jnp.float32), w_b, b_b)
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        out_f_ref[t] = h_f.astype(out_f_ref.dtype)
        out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
        return (h_f, h_b)

    h_f, h_b = jax.lax.fori_loop(
        0, time_block, step, (h_scratch[0], h_scratch[1]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b


@functools.partial(
    jax.jit, static_argnames=("time_block", "interpret"))
def bigru_pallas(x_proj_f: jnp.ndarray, x_proj_b: jnp.ndarray,
                 w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 time_block: Optional[int] = None,
                 interpret: bool = False):
    """Fused forward+backward GRU directions over one layer.

    :param x_proj_f/x_proj_b: (T, B, 3H) per-direction input projections.
    :param w_hh: (2, 3H, H) stacked recurrent weights (fwd, bwd).
    :param b_hh: (2, 3H) stacked recurrent biases.
    :returns: ((T, B, H) fwd outputs, (T, B, H) bwd outputs).
    """
    T, B, threeH = x_proj_f.shape
    H = threeH // 3
    if time_block is None:
        time_block = _pick_time_block(T, B, H, budget_bytes=2 << 20)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2).astype(jnp.bfloat16)  # (2, H, 3H)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, threeH)

    fwd_idx = lambda i: (i, 0, 0)                    # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)     # noqa: E731

    kernel = functools.partial(_bigru_kernel, time_block=time_block)
    flops = 2 * 2 * T * B * (H * threeH) + 20 * T * B * threeH
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, threeH), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, threeH), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x_proj_f.dtype),
            jax.ShapeDtypeStruct((T, B, H), x_proj_f.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((2, B, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_proj_f.size * 4 + T * B * H * 4,
            transcendentals=6 * T * B * H),
        interpret=interpret,
    )(x_proj_f, x_proj_b, w_hh_t, b_hh_row, lengths2d)


def bigru_stack_fused(layers, x: jnp.ndarray, bidirectional: bool = True,
                      lengths: Optional[jnp.ndarray] = None,
                      compute_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused-kernel counterpart of ``ops.rnn.bigru_stack``.

    :param x: (B, T, F) batch-major input (converted to time-major once).
    :returns: (B, T, H * n_dirs) last-layer features.
    """
    cd = compute_dtype or jnp.bfloat16
    out = jnp.swapaxes(x, 0, 1).astype(cd)  # (T, B, F)
    for layer in layers:
        if bidirectional:
            projs = []
            for key in ("fwd", "bwd"):
                p = layer[key]
                projs.append(
                    jnp.einsum(
                        "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                        # f32 accumulation (module numerics contract)
                        preferred_element_type=jnp.float32
                    ).astype(cd)
                    + p["b_ih"].astype(cd))
            w_hh = jnp.stack(
                [layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])
            b_hh = jnp.stack(
                [layer["fwd"]["b_hh"], layer["bwd"]["b_hh"]])
            fwd_out, bwd_out = bigru_pallas(
                projs[0], projs[1], w_hh, b_hh, lengths=lengths,
                interpret=interpret)
            out = jnp.concatenate([fwd_out, bwd_out], -1)
        else:
            p = layer["fwd"]
            x_proj = (
                jnp.einsum(
                    "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                    preferred_element_type=jnp.float32).astype(cd)
                + p["b_ih"].astype(cd))
            out = gru_pallas(
                x_proj, p["w_hh"], p["b_hh"], lengths=lengths,
                reverse=False, interpret=interpret)
    return jnp.swapaxes(out, 0, 1)  # (B, T, H * n_dirs)


# ---------------------------------------------------------------------------
# Fused bi-LSTM (read-level models)
# ---------------------------------------------------------------------------


def _bilstm_kernel(xp_f_ref, xp_b_ref, w_hh_t_ref, b_hh_ref, lengths_ref,
                   out_f_ref, out_b_ref, hc_scratch, *, time_block: int):
    """Both LSTM directions in one kernel (torch gate order i,f,g,o)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        hc_scratch[...] = jnp.zeros_like(hc_scratch)

    hidden = hc_scratch.shape[-1]
    w_f = w_hh_t_ref[0]   # (H, 4H) bf16
    w_b = w_hh_t_ref[1]
    b_f = b_hh_ref[0]     # (1, 4H) f32
    b_b = b_hh_ref[1]
    lengths = lengths_ref[...]

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def cell(h, c, xp, w, b):
        gates = jnp.dot(
            h.astype(w.dtype), w,
            preferred_element_type=jnp.float32) + b + xp
        gi = jax.nn.sigmoid(gates[:, :hidden])
        gf = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        return h_new, c_new

    def step(t, carry):
        h_f, c_f, h_b, c_b = carry
        t_b = time_block - 1 - t
        nh_f, nc_f = cell(
            h_f, c_f, xp_f_ref[t].astype(jnp.float32), w_f, b_f)
        nh_b, nc_b = cell(
            h_b, c_b, xp_b_ref[t_b].astype(jnp.float32), w_b, b_b)
        vf = lengths > fwd_start + t
        vb = lengths > bwd_start + t_b
        h_f = jnp.where(vf, nh_f, h_f)
        c_f = jnp.where(vf, nc_f, c_f)
        h_b = jnp.where(vb, nh_b, h_b)
        c_b = jnp.where(vb, nc_b, c_b)
        out_f_ref[t] = h_f.astype(out_f_ref.dtype)
        out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
        return (h_f, c_f, h_b, c_b)

    h_f, c_f, h_b, c_b = jax.lax.fori_loop(
        0, time_block, step,
        (hc_scratch[0], hc_scratch[1], hc_scratch[2], hc_scratch[3]))
    hc_scratch[0] = h_f
    hc_scratch[1] = c_f
    hc_scratch[2] = h_b
    hc_scratch[3] = c_b


@functools.partial(
    jax.jit, static_argnames=("time_block", "interpret"))
def bilstm_pallas(x_proj_f: jnp.ndarray, x_proj_b: jnp.ndarray,
                  w_hh: jnp.ndarray, b_hh: jnp.ndarray,
                  lengths: Optional[jnp.ndarray] = None,
                  time_block: Optional[int] = None,
                  interpret: bool = False):
    """Fused forward+backward LSTM directions over one layer.

    :param x_proj_f/x_proj_b: (T, B, 4H) per-direction projections.
    :param w_hh: (2, 4H, H) stacked recurrent weights (fwd, bwd).
    :param b_hh: (2, 4H) stacked recurrent biases.
    :returns: ((T, B, H) fwd outputs, (T, B, H) bwd outputs).
    """
    T, B, fourH = x_proj_f.shape
    H = fourH // 4
    if time_block is None:
        time_block = _pick_time_block(
            T, B, H, budget_bytes=2 << 20, gates=4)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2).astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, fourH)

    fwd_idx = lambda i: (i, 0, 0)                  # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)   # noqa: E731

    kernel = functools.partial(_bilstm_kernel, time_block=time_block)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, fourH), fwd_idx,
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, fourH), bwd_idx,
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x_proj_f.dtype),
            jax.ShapeDtypeStruct((T, B, H), x_proj_f.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((4, B, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * T * B * (H * fourH) + 24 * T * B * fourH,
            bytes_accessed=x_proj_f.size * 4 + T * B * H * 4,
            transcendentals=8 * T * B * H),
        interpret=interpret,
    )(x_proj_f, x_proj_b, w_hh_t, b_hh_row, lengths2d)


def bilstm_stack_fused(layers, x: jnp.ndarray,
                       lengths: Optional[jnp.ndarray] = None,
                       compute_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused-kernel counterpart of ``ops.rnn.bilstm_stack`` (bi only)."""
    cd = compute_dtype or jnp.bfloat16
    out = jnp.swapaxes(x, 0, 1).astype(cd)  # (T, B, F)
    for layer in layers:
        projs = []
        for key in ("fwd", "bwd"):
            p = layer[key]
            projs.append(
                jnp.einsum(
                    "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                    preferred_element_type=jnp.float32).astype(cd)
                + p["b_ih"].astype(cd))
        w_hh = jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])
        b_hh = jnp.stack([layer["fwd"]["b_hh"], layer["bwd"]["b_hh"]])
        fwd_out, bwd_out = bilstm_pallas(
            projs[0], projs[1], w_hh, b_hh, lengths=lengths,
            interpret=interpret)
        out = jnp.concatenate([fwd_out, bwd_out], -1)
    return jnp.swapaxes(out, 0, 1)


# ---------------------------------------------------------------------------
# Fully-fused bi-GRU: input projection computed inside the kernel
# ---------------------------------------------------------------------------


def _bigru_fullfused_kernel(
        x_f_ref, x_b_ref, w_ih_t_ref, b_ih_ref, w_hh_t_ref, b_hh_ref,
        lengths_ref, out_f_ref, out_b_ref, h_scratch, xp_f_scratch,
        xp_b_scratch, *, time_block: int, gates_bf16: bool = False):
    """Both directions with in-kernel input projections.

    Eliminates the (T, B, 3H) HBM intermediates the two-stage variant
    materialises (the largest allocation at big batch): the projections
    for a time block are computed as one block-batched MXU matmul into
    VMEM scratch at block start.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    B = h_scratch.shape[-2]
    w_ih_f = w_ih_t_ref[0]   # (IN, 3H) bf16
    w_ih_b = w_ih_t_ref[1]
    b_ih_f = b_ih_ref[0]     # (1, 3H)
    b_ih_b = b_ih_ref[1]
    w_f = w_hh_t_ref[0]      # (H, 3H) bf16
    w_b = w_hh_t_ref[1]
    b_f = b_hh_ref[0]
    b_b = b_hh_ref[1]
    lengths = lengths_ref[...]

    # block-batched input projections into scratch
    xf = x_f_ref[...].reshape(time_block * B, x_f_ref.shape[-1])
    xb = x_b_ref[...].reshape(time_block * B, x_b_ref.shape[-1])
    xp_f_scratch[...] = (
        jnp.dot(xf, w_ih_f, preferred_element_type=jnp.float32)
        + b_ih_f).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)
    xp_b_scratch[...] = (
        jnp.dot(xb, w_ih_b, preferred_element_type=jnp.float32)
        + b_ih_b).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    gd = jnp.bfloat16 if gates_bf16 else jnp.float32
    one = jnp.asarray(1.0, gd)
    if gates_bf16:
        # Mosaic's logistic/tanh lowerings broadcast f32 scalar
        # constants into bf16 vectors (verifier error); spell the
        # nonlinearities out with explicitly-typed constants instead.
        def _sig(v):
            # exp(-|v|) <= 1 never overflows; reconstruct by sign
            e = jnp.exp(-jnp.abs(v))
            pos = one / (one + e)
            return jnp.where(v >= 0, pos, one - pos)

        def _tanh(v):
            # sign-symmetric form: e = exp(-2|v|) <= 1, so large
            # negative v saturates to -1 instead of inf -> NaN
            e = jnp.exp(jnp.asarray(-2.0, gd) * jnp.abs(v))
            mag = (one - e) / (one + e)
            return jnp.where(v >= 0, mag, -mag)
    else:
        _sig, _tanh = jax.nn.sigmoid, jnp.tanh

    def cell(h, xp, w, b):
        hp = (jnp.dot(
            h.astype(w.dtype), w,
            preferred_element_type=jnp.float32) + b).astype(gd)
        r = _sig(xp[:, :hidden] + hp[:, :hidden])
        z = _sig(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        n = _tanh(
            xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        return ((one - z) * n + z * h.astype(gd)).astype(jnp.float32)

    def step(t, carry):
        h_f, h_b = carry
        t_b = time_block - 1 - t
        nh_f = cell(h_f, xp_f_scratch[t].astype(gd), w_f, b_f)
        nh_b = cell(h_b, xp_b_scratch[t_b].astype(gd), w_b, b_b)
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        out_f_ref[t] = h_f.astype(out_f_ref.dtype)
        out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
        return (h_f, h_b)

    h_f, h_b = jax.lax.fori_loop(
        0, time_block, step, (h_scratch[0], h_scratch[1]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b


def _bigru_fullfused_kernel_staggered(
        x_f_ref, x_b_ref, w_ih_t_ref, b_ih_ref, w_hh_t_ref, b_hh_ref,
        lengths_ref, out_f_ref, out_b_ref, h_scratch, hp_scratch,
        xp_f_scratch, xp_b_scratch, *, time_block: int):
    """Fullfused kernel with software-pipelined direction chains.

    Same math as ``_bigru_fullfused_kernel``, different instruction
    order: the backward chain runs half a step behind the forward one,
    so every serial (B, H) x (H, 3H) recurrence matmul on the MXU is
    immediately followed by the *other* direction's (independent) VPU
    gate block — the units overlap instead of idling in turn.  The
    pending backward pre-activation rides the loop carry and persists
    across grid blocks in ``hp_scratch``.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    hidden = h_scratch.shape[-1]
    B = h_scratch.shape[-2]
    w_ih_f = w_ih_t_ref[0]   # (IN, 3H) bf16
    w_ih_b = w_ih_t_ref[1]
    b_ih_f = b_ih_ref[0]     # (1, 3H)
    b_ih_b = b_ih_ref[1]
    w_f = w_hh_t_ref[0]      # (H, 3H) bf16
    w_b = w_hh_t_ref[1]
    b_f = b_hh_ref[0]
    b_b = b_hh_ref[1]

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        # pending pre-activation of h_b = 0: 0 @ w_b + b_b
        hp_scratch[...] = jnp.broadcast_to(
            b_b, hp_scratch.shape).astype(jnp.float32)

    xf = x_f_ref[...].reshape(time_block * B, x_f_ref.shape[-1])
    xb = x_b_ref[...].reshape(time_block * B, x_b_ref.shape[-1])
    xp_f_scratch[...] = (
        jnp.dot(xf, w_ih_f, preferred_element_type=jnp.float32)
        + b_ih_f).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)
    xp_b_scratch[...] = (
        jnp.dot(xb, w_ih_b, preferred_element_type=jnp.float32)
        + b_ih_b).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)

    lengths = lengths_ref[...]
    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def gates(h, xp, hp):
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        return (1.0 - z) * n + z * h

    def step(t, carry):
        h_f, h_b, hp_b = carry
        t_b = time_block - 1 - t
        # MXU: fwd matmul, while the VPU runs the bwd gate block on
        # the pre-activation carried from the previous half-step.
        hp_f = jnp.dot(h_f.astype(w_f.dtype), w_f,
                       preferred_element_type=jnp.float32) + b_f
        nh_b = gates(h_b, xp_b_scratch[t_b].astype(jnp.float32), hp_b)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
        # MXU: bwd matmul (feeds the NEXT step), while the VPU runs
        # the fwd gate block.
        hp_b = jnp.dot(h_b.astype(w_b.dtype), w_b,
                       preferred_element_type=jnp.float32) + b_b
        nh_f = gates(h_f, xp_f_scratch[t].astype(jnp.float32), hp_f)
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        out_f_ref[t] = h_f.astype(out_f_ref.dtype)
        return (h_f, h_b, hp_b)

    h_f, h_b, hp_b = jax.lax.fori_loop(
        0, time_block, step,
        (h_scratch[0], h_scratch[1], hp_scratch[...]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b
    hp_scratch[...] = hp_b


@functools.partial(
    jax.jit, static_argnames=(
        "time_block", "interpret", "gates_bf16", "schedule"))
def bigru_pallas_fullfused(
        x: jnp.ndarray, w_ih: jnp.ndarray, b_ih: jnp.ndarray,
        w_hh: jnp.ndarray, b_hh: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        time_block: Optional[int] = None, interpret: bool = False,
        gates_bf16: bool = False, schedule: str = "sequential"):
    """One bi-GRU layer with in-kernel input projection.

    :param x: (T, B, IN) time-major layer input (bf16 recommended).
    :param w_ih: (2, 3H, IN) stacked input weights (fwd, bwd).
    :param b_ih: (2, 3H) input biases.
    :param w_hh: (2, 3H, H); :param b_hh: (2, 3H).
    :returns: ((T, B, H) fwd, (T, B, H) bwd) outputs.
    """
    T, B, IN = x.shape
    H = w_hh.shape[-1]
    if time_block is None:
        # Measured (PARITY.md round-2 ablations): time_block=1 beats
        # 10/20 at B=512 (31.5 vs 29-30M cols/s) — the per-step block
        # DMAs pipeline better than block-batched projections, so the
        # small default budget (which forces tb=1 at production batch)
        # is kept deliberately; larger blocks remain available via an
        # explicit time_block (the raised VMEM limit covers them).
        time_block = _pick_time_block(
            T, B, H, budget_bytes=1 << 20, gates=3)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_ih_t = jnp.swapaxes(w_ih, 1, 2).astype(jnp.bfloat16)  # (2, IN, 3H)
    b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * H)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2).astype(jnp.bfloat16)  # (2, H, 3H)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * H)

    fwd_idx = lambda i: (i, 0, 0)                   # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)    # noqa: E731

    scratch_shapes = [
        pltpu.VMEM((2, B, H), jnp.float32),
        pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
        pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
    ]
    if schedule == "staggered":
        kernel = functools.partial(
            _bigru_fullfused_kernel_staggered, time_block=time_block)
        # pending bwd pre-activation persists across grid blocks
        scratch_shapes.insert(1, pltpu.VMEM((B, 3 * H), jnp.float32))
    else:
        kernel = functools.partial(
            _bigru_fullfused_kernel, time_block=time_block,
            gates_bf16=gates_bf16)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, IN), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, IN), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, w_ih_t, b_ih_row, w_hh_t, b_hh_row, lengths2d)


def _bigru_fullfused_int8_kernel(
        x_f_ref, x_b_ref, w_ih_t_ref, b_ih_ref, w_hh_q_ref, hh_scale_ref,
        b_hh_ref, lengths_ref, out_f_ref, out_b_ref, h_scratch,
        xp_f_scratch, xp_b_scratch, *, time_block: int):
    """Fullfused bi-GRU with int8 recurrent weights.

    The per-step bottleneck is the (B, H) @ (H, 3H) recurrent matmul;
    int8 x int8 -> int32 doubles the MXU rate over bf16. The hidden
    state is mathematically bounded to [-1, 1] (h is a convex blend of
    tanh outputs starting from 0), so a fixed *127 quantisation of h
    composes with per-output-column weight scales:

        h @ W ~= (round(127 h) @ round(W / s_col)) * (s_col / 127)

    where s_col = max_abs(W[:, col]) / 127 is folded into hh_scale.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    B = h_scratch.shape[-2]
    w_ih_f = w_ih_t_ref[0]
    w_ih_b = w_ih_t_ref[1]
    b_ih_f = b_ih_ref[0]
    b_ih_b = b_ih_ref[1]
    wq_f = w_hh_q_ref[0]        # (H, 3H) int8
    wq_b = w_hh_q_ref[1]
    sc_f = hh_scale_ref[0]      # (1, 3H) f32 = s_col / 127
    sc_b = hh_scale_ref[1]
    b_f = b_hh_ref[0]
    b_b = b_hh_ref[1]
    lengths = lengths_ref[...]

    xf = x_f_ref[...].reshape(time_block * B, x_f_ref.shape[-1])
    xb = x_b_ref[...].reshape(time_block * B, x_b_ref.shape[-1])
    xp_f_scratch[...] = (
        jnp.dot(xf, w_ih_f, preferred_element_type=jnp.float32)
        + b_ih_f).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)
    xp_b_scratch[...] = (
        jnp.dot(xb, w_ih_b, preferred_element_type=jnp.float32)
        + b_ih_b).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def cell(h, xp, wq, sc, b):
        hq = jnp.round(h * 127.0).astype(jnp.int8)
        hp = jnp.dot(
            hq, wq, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * sc + b
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        n = jnp.tanh(
            xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        return (1.0 - z) * n + z * h

    def step(t, carry):
        h_f, h_b = carry
        t_b = time_block - 1 - t
        nh_f = cell(
            h_f, xp_f_scratch[t].astype(jnp.float32), wq_f, sc_f, b_f)
        nh_b = cell(
            h_b, xp_b_scratch[t_b].astype(jnp.float32), wq_b, sc_b, b_b)
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        out_f_ref[t] = h_f.astype(out_f_ref.dtype)
        out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
        return (h_f, h_b)

    h_f, h_b = jax.lax.fori_loop(
        0, time_block, step, (h_scratch[0], h_scratch[1]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b


@functools.partial(
    jax.jit, static_argnames=("time_block", "interpret"))
def bigru_pallas_fullfused_int8(
        x: jnp.ndarray, w_ih: jnp.ndarray, b_ih: jnp.ndarray,
        w_hh: jnp.ndarray, b_hh: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        time_block: Optional[int] = None, interpret: bool = False):
    """:func:`bigru_pallas_fullfused` with int8 recurrent weights."""
    T, B, IN = x.shape
    H = w_hh.shape[-1]
    if time_block is None:
        # Measured (PARITY.md round-2 ablations): time_block=1 beats
        # 10/20 at B=512 (31.5 vs 29-30M cols/s) — the per-step block
        # DMAs pipeline better than block-batched projections, so the
        # small default budget (which forces tb=1 at production batch)
        # is kept deliberately; larger blocks remain available via an
        # explicit time_block (the raised VMEM limit covers them).
        time_block = _pick_time_block(
            T, B, H, budget_bytes=1 << 20, gates=3)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_ih_t = jnp.swapaxes(w_ih, 1, 2).astype(jnp.bfloat16)
    b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * H)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2).astype(jnp.float32)  # (2, H, 3H)
    col_scale = jnp.max(jnp.abs(w_hh_t), axis=1, keepdims=True) / 127.0
    col_scale = jnp.maximum(col_scale, 1e-12)
    w_hh_q = jnp.round(w_hh_t / col_scale).astype(jnp.int8)
    hh_scale = (col_scale / 127.0).astype(jnp.float32)  # (2, 1, 3H)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * H)

    fwd_idx = lambda i: (i, 0, 0)                   # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)    # noqa: E731

    kernel = functools.partial(
        _bigru_fullfused_int8_kernel, time_block=time_block)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, IN), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, IN), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, w_ih_t, b_ih_row, w_hh_q, hh_scale, b_hh_row, lengths2d)


def bigru_stack_fullfused(layers, x: jnp.ndarray,
                          lengths: Optional[jnp.ndarray] = None,
                          compute_dtype=jnp.bfloat16,
                          interpret: bool = False,
                          recurrent_quant: Optional[str] = None
                          ) -> jnp.ndarray:
    """Bi-GRU stack with in-kernel input projections (lowest HBM).

    Unlike :func:`bigru_stack_fused`, no (T, B, 3H) projection
    intermediates are materialised in HBM — the peak-footprint limiter
    at large batch. ``recurrent_quant='int8'`` switches the per-step
    recurrent matmul to int8 weights/activations (2x MXU rate).
    """
    cd = compute_dtype or jnp.bfloat16
    out = jnp.swapaxes(x, 0, 1).astype(cd)  # (T, B, F)
    if recurrent_quant == "int8":
        layer_fn = bigru_pallas_fullfused_int8
    elif recurrent_quant == "bf16_gates":
        layer_fn = functools.partial(
            bigru_pallas_fullfused, gates_bf16=True)
    elif recurrent_quant == "staggered":
        # scheduling variant, not a quantisation: software-pipelined
        # direction chains (see _bigru_fullfused_kernel_staggered)
        layer_fn = functools.partial(
            bigru_pallas_fullfused, schedule="staggered")
    else:
        layer_fn = bigru_pallas_fullfused
    for layer in layers:
        w_ih = jnp.stack([layer["fwd"]["w_ih"], layer["bwd"]["w_ih"]])
        b_ih = jnp.stack([layer["fwd"]["b_ih"], layer["bwd"]["b_ih"]])
        w_hh = jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])
        b_hh = jnp.stack([layer["fwd"]["b_hh"], layer["bwd"]["b_hh"]])
        fwd_out, bwd_out = layer_fn(
            out, w_ih, b_ih, w_hh, b_hh, lengths=lengths,
            interpret=interpret)
        out = jnp.concatenate([fwd_out, bwd_out], -1)
    return jnp.swapaxes(out, 0, 1)


# ---------------------------------------------------------------------------
# Split-path 2-layer bi-GRU + linear head: the flagship inference path
# ---------------------------------------------------------------------------
#
# The fullfused stack above still pays three avoidable HBM costs at the
# production geometry (B=512..1024, T=10k, H=256):
#   - the (T, B, 2H) inter-layer concatenate (an extra copy of both
#     direction outputs);
#   - re-reading that concat for the external head einsum;
#   - bf16 inter-layer activations where int8 suffices (h is bounded
#     to [-1, 1], so a fixed *127 quantisation composes with
#     per-column weight scales — the argument validated for the int8
#     recurrence, test_pallas_gru.py::test_int8_recurrent_matches_scan).
# The split path keeps layer-1's direction outputs separate (no
# concat), feeds them to a layer-2 kernel that also fuses the linear
# head (emitting (T, B, C) logit partials instead of (T, B, H) hidden
# states), and uses int8 for the inter-layer activations, the layer-2
# input projections (~50% of all FLOPs; v5e int8 MXU peak is 2x bf16)
# and both recurrences.  Measured on v5e (tests/perf/kernel_lab.py):
# 31.9M cols/s (fullfused stack + einsum) -> 39.5M (split, bf16
# recurrence) -> 40.1M (int8 recurrence) at B=512; 45.0M at B=1024.
# End-to-end probability error vs the f32 scan: max 5.3e-4 (quant),
# 9e-5 (bf16 — identical to the fullfused stack's own bf16 error).


def _bigru_l1_split_kernel(
        x_f_ref, x_b_ref, w_ih_t_ref, b_ih_ref, w_hh_t_ref, hh_scale_ref,
        b_hh_ref, lengths_ref, out_f_ref, out_b_ref, h_scratch,
        xp_f_scratch, xp_b_scratch, *, time_block: int, quant: bool):
    """Layer-1 fullfused bi-GRU emitting separate direction outputs.

    With ``quant`` the outputs are int8 (round(127*h)) and the
    recurrent matmul runs int8 x int8 -> int32 with per-column weight
    scales folded into ``hh_scale``.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    B = h_scratch.shape[-2]
    lengths = lengths_ref[...]

    xf = x_f_ref[...].reshape(time_block * B, x_f_ref.shape[-1])
    xb = x_b_ref[...].reshape(time_block * B, x_b_ref.shape[-1])
    xp_f_scratch[...] = (
        jnp.dot(xf, w_ih_t_ref[0], preferred_element_type=jnp.float32)
        + b_ih_ref[0]).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)
    xp_b_scratch[...] = (
        jnp.dot(xb, w_ih_t_ref[1], preferred_element_type=jnp.float32)
        + b_ih_ref[1]).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def cell(h, xp, w, sc, b):
        if quant:
            hq = jnp.round(h * 127.0).astype(jnp.int8)
            hp = jnp.dot(hq, w, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * sc + b
        else:
            hp = jnp.dot(h.astype(w.dtype), w,
                         preferred_element_type=jnp.float32) + b
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        return (1.0 - z) * n + z * h

    def emit(h):
        if quant:
            return jnp.round(h * 127.0).astype(jnp.int8)
        return h.astype(out_f_ref.dtype)

    def step(t, carry):
        h_f, h_b = carry
        t_b = time_block - 1 - t
        nh_f = cell(h_f, xp_f_scratch[t].astype(jnp.float32),
                    w_hh_t_ref[0], hh_scale_ref[0], b_hh_ref[0])
        nh_b = cell(h_b, xp_b_scratch[t_b].astype(jnp.float32),
                    w_hh_t_ref[1], hh_scale_ref[1], b_hh_ref[1])
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        out_f_ref[t] = emit(h_f)
        out_b_ref[t_b] = emit(h_b)
        return (h_f, h_b)

    h_f, h_b = jax.lax.fori_loop(
        0, time_block, step, (h_scratch[0], h_scratch[1]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b


def _bigru_l2head_kernel(
        pf_f_ref, pb_f_ref, pf_b_ref, pb_b_ref, w_ih_t_ref, ih_scale_ref,
        b_ih_ref, w_hh_t_ref, hh_scale_ref, b_hh_ref, w_head_ref,
        lengths_ref, lg_f_ref, lg_b_ref, h_scratch, xp_f_scratch,
        xp_b_scratch, *, time_block: int, quant: bool):
    """Layer-2 bi-GRU over split inputs, with the linear head fused.

    ``w_ih_t_ref`` rows are [fwd<-prev_f, fwd<-prev_b, bwd<-prev_f,
    bwd<-prev_b]; the two input projections per direction replace the
    concat the stacked path would materialise.  Each step writes
    per-direction logit partials (time_block, B, C) — the (T, B, H)
    hidden states never leave VMEM.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-1]
    B = h_scratch.shape[-2]
    lengths = lengths_ref[...]

    def proj(a_ref, b_ref, wi_a, wi_b, sc_a, sc_b, bias):
        a = a_ref[...].reshape(time_block * B, hidden)
        bb = b_ref[...].reshape(time_block * B, hidden)
        if quant:
            pa = jnp.dot(a, wi_a, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * sc_a
            pb = jnp.dot(bb, wi_b, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * sc_b
        else:
            pa = jnp.dot(a, wi_a, preferred_element_type=jnp.float32)
            pb = jnp.dot(bb, wi_b, preferred_element_type=jnp.float32)
        return (pa + pb + bias).reshape(
            time_block, B, 3 * hidden).astype(jnp.bfloat16)

    xp_f_scratch[...] = proj(
        pf_f_ref, pb_f_ref, w_ih_t_ref[0], w_ih_t_ref[1],
        ih_scale_ref[0], ih_scale_ref[1], b_ih_ref[0])
    xp_b_scratch[...] = proj(
        pf_b_ref, pb_b_ref, w_ih_t_ref[2], w_ih_t_ref[3],
        ih_scale_ref[2], ih_scale_ref[3], b_ih_ref[1])

    fwd_start = i * time_block
    bwd_start = (n_blocks - 1 - i) * time_block

    def cell(h, xp, w, sc, b):
        if quant:
            hq = jnp.round(h * 127.0).astype(jnp.int8)
            hp = jnp.dot(hq, w, preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * sc + b
        else:
            hp = jnp.dot(h.astype(w.dtype), w,
                         preferred_element_type=jnp.float32) + b
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        n = jnp.tanh(xp[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        return (1.0 - z) * n + z * h

    def step(t, carry):
        h_f, h_b = carry
        t_b = time_block - 1 - t
        nh_f = cell(h_f, xp_f_scratch[t].astype(jnp.float32),
                    w_hh_t_ref[0], hh_scale_ref[0], b_hh_ref[0])
        nh_b = cell(h_b, xp_b_scratch[t_b].astype(jnp.float32),
                    w_hh_t_ref[1], hh_scale_ref[1], b_hh_ref[1])
        h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
        h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
        lg_f_ref[t] = jnp.dot(
            h_f.astype(jnp.bfloat16), w_head_ref[0],
            preferred_element_type=jnp.float32)
        lg_b_ref[t_b] = jnp.dot(
            h_b.astype(jnp.bfloat16), w_head_ref[1],
            preferred_element_type=jnp.float32)
        return (h_f, h_b)

    h_f, h_b = jax.lax.fori_loop(
        0, time_block, step, (h_scratch[0], h_scratch[1]))
    h_scratch[0] = h_f
    h_scratch[1] = h_b


@functools.partial(
    jax.jit, static_argnames=("time_block", "quant", "interpret"))
def bigru_l1_split(x, w_ih, b_ih, w_hh, b_hh,
                   lengths: Optional[jnp.ndarray] = None,
                   time_block: int = 1, quant: bool = True,
                   interpret: bool = False):
    """Layer-1 of the split path: ((T,B,H) fwd, (T,B,H) bwd) outputs.

    Outputs are int8 when ``quant`` (fixed *127 scale), else x.dtype.
    """
    T, B, IN = x.shape
    H = w_hh.shape[-1]
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_ih_t = jnp.swapaxes(w_ih, 1, 2).astype(jnp.bfloat16)
    b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * H)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2)
    if quant:
        w_hh_t, hh_scale = _quantize_cols(w_hh_t)
    else:
        hh_scale = jnp.ones((2, 1, 3 * H), jnp.float32)
        w_hh_t = w_hh_t.astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * H)
    fwd_idx = lambda i: (i, 0, 0)                   # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)    # noqa: E731
    out_dtype = jnp.int8 if quant else x.dtype
    kernel = functools.partial(
        _bigru_l1_split_kernel, time_block=time_block, quant=quant)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, IN), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, IN), bwd_idx, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), out_dtype),
            jax.ShapeDtypeStruct((T, B, H), out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, w_ih_t, b_ih_row, w_hh_t, hh_scale, b_hh_row, lengths2d)


def _quantize_cols(w):
    """Per-output-column int8 quantisation of stacked (..., K, N) weights.

    Returns (int8 weights, f32 scales shaped (..., 1, N)) where the
    scale already folds the activations' fixed 1/127: the int32 matmul
    result times scale reproduces ``h @ w`` for h quantised as
    round(127*h).
    """
    w = w.astype(jnp.float32)
    col = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    col = jnp.maximum(col, 1e-12)
    w_q = jnp.round(w / col).astype(jnp.int8)
    return w_q, (col / 127.0).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("time_block", "quant", "interpret"))
def bigru_l2head(prev_f, prev_b, w_ih, b_ih, w_hh, b_hh, w_head,
                 lengths: Optional[jnp.ndarray] = None,
                 time_block: int = 1, quant: bool = True,
                 interpret: bool = False):
    """Layer-2 + head of the split path: per-direction logit partials.

    :param prev_f/prev_b: (T, B, H) layer-1 direction outputs (int8
        when ``quant``).
    :param w_ih: (2, 3H, 2H) torch-layout layer-2 input weights
        (columns [:H] act on prev_f, [H:] on prev_b).
    :param w_head: (C, 2H) linear head weights.
    :returns: ((T, B, C) fwd, (T, B, C) bwd) float32 logit partials;
        the caller adds them plus the head bias.
    """
    T, B, H = prev_f.shape
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    # split + transpose: rows [fwd<-f, fwd<-b, bwd<-f, bwd<-b]
    w_split = jnp.stack([
        w_ih[0, :, :H].T, w_ih[0, :, H:].T,
        w_ih[1, :, :H].T, w_ih[1, :, H:].T])  # (4, H, 3H)
    if quant:
        w_in, ih_scale = _quantize_cols(w_split)
    else:
        w_in = w_split.astype(jnp.bfloat16)
        ih_scale = jnp.ones((4, 1, 3 * H), jnp.float32)
    b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * H)
    w_hh_t = jnp.swapaxes(w_hh, 1, 2)
    if quant:
        w_hh_t, hh_scale = _quantize_cols(w_hh_t)
    else:
        hh_scale = jnp.ones((2, 1, 3 * H), jnp.float32)
        w_hh_t = w_hh_t.astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * H)
    w_head_split = jnp.stack(
        [w_head[:, :H].T, w_head[:, H:].T]).astype(jnp.bfloat16)
    C = w_head.shape[0]
    fwd_idx = lambda i: (i, 0, 0)                   # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)    # noqa: E731
    kernel = functools.partial(
        _bigru_l2head_kernel, time_block=time_block, quant=quant)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), bwd_idx, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(
                (time_block, B, C), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, C), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, C), jnp.float32),
            jax.ShapeDtypeStruct((T, B, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
            pltpu.VMEM((time_block, B, 3 * H), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(prev_f, prev_b, prev_f, prev_b, w_in, ih_scale, b_ih_row,
      w_hh_t, hh_scale, b_hh_row, w_head_split, lengths2d)


# --- transposed ((feature, batch)-lane) variants -------------------------
#
# The (T, B, C) f32 logit partials above pad C=5 out to the 128-lane
# tile (25.6x HBM expansion — the measured OOM wall at B>=1536 and
# ~10 GB of pure padding traffic at B=1024).  Putting *batch* in the
# lane dimension makes the logit partials (T, C, B) — C pads 5->8
# sublanes only (1.6x) — and the (T, H, B) int8 inter-layer buffers
# tile exactly.  The whole recurrence runs transposed: (3H, H) @ (H, B)
# matmuls, gate math as sublane row slices, lengths broadcast over
# lanes.  Measured on v5e (tests/perf/kernel_lab.py v6): 40.4M cols/s
# at B=512 (parity with the row-major path), then past the old wall:
# 46.0M at B=1024, 49.8M at B=2048, 50.8M at B=2560 — then 52.7M
# with the round-4 merged projection issue and 56.5M with bf16
# tanh-form gates (~91% of the bf16 speed of light; ~46% of the
# int8-adjusted ~123M roofline these mostly-int8 kernels are honestly
# measured against — budget in docs/kernels.md).
# Numerics are the same int8/bf16 scheme, so the
# measured probability error matches the row-major path (5e-4 / 1e-4).


def _quantize_rows(w):
    """Per-output-row int8 quantisation of stacked (..., N, K) weights.

    Transposed-layout counterpart of :func:`_quantize_cols`: output
    channels live on rows here, so scales are (..., N, 1) and broadcast
    over the batch lanes.
    """
    w = w.astype(jnp.float32)
    row = jnp.max(jnp.abs(w), axis=-1, keepdims=True) / 127.0
    row = jnp.maximum(row, 1e-12)
    w_q = jnp.round(w / row).astype(jnp.int8)
    return w_q, (row / 127.0).astype(jnp.float32)


def _gru_cell_t(h, xp, w, sc, b, hidden, quant):
    """One transposed GRU cell step: all operands (rows, batch-lanes).

    On the quantised (production) path the gate transcendentals run in
    bf16 — VPU lanes pack 2× and the gate math is ~half the per-step
    residual (measured 52.2 → 56.5M cols/s at B=2560). sigmoid is
    expressed through tanh because Mosaic's bf16 ``logistic`` lowering
    fails verification (f32 broadcast into a bf16 vector); tanh lowers
    clean. The h carry and the gate *blend* stay f32 so bf16
    quantisation error cannot compound across 10k serial steps
    (measured end-to-end max probability error vs the f32 scan at
    B=256/T=10000 ragged: 6.8e-4 max / 7.6e-5 mean, vs 5.3e-4 for the
    f32-gate int8 path; the real-workflow consensus sequence is
    byte-identical to the f32-gate kernels').
    """
    if quant:
        hq = jnp.round(h * 127.0).astype(jnp.int8)
        hp = jnp.dot(w, hq, preferred_element_type=jnp.int32
                     ).astype(jnp.float32) * sc + b
        half = jnp.bfloat16(0.5)
        rz_in = (xp[:2 * hidden] + hp[:2 * hidden]).astype(jnp.bfloat16)
        rz = half * (jnp.bfloat16(1.0) + jnp.tanh(rz_in * half))
        r = rz[:hidden].astype(jnp.float32)
        z = rz[hidden:].astype(jnp.float32)
        n = jnp.tanh(
            (xp[2 * hidden:] + r * hp[2 * hidden:]
             ).astype(jnp.bfloat16)).astype(jnp.float32)
        return (1.0 - z) * n + z * h
    hp = jnp.dot(w, h.astype(w.dtype),
                 preferred_element_type=jnp.float32) + b
    r = jax.nn.sigmoid(xp[:hidden] + hp[:hidden])
    z = jax.nn.sigmoid(xp[hidden:2 * hidden] + hp[hidden:2 * hidden])
    n = jnp.tanh(xp[2 * hidden:] + r * hp[2 * hidden:])
    return (1.0 - z) * n + z * h


def _bigru_l1_split_t_kernel(
        x_f_ref, x_b_ref, w_ih_ref, b_ih_ref, w_hh_ref, hh_scale_ref,
        b_hh_ref, lengths_ref, out_f_ref, out_b_ref, h_scratch, *,
        quant: bool):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-2]
    lengths = lengths_ref[...]          # (1, B)

    def emit(h, ref):
        if quant:
            ref[0] = jnp.round(h * 127.0).astype(jnp.int8)
        else:
            ref[0] = h.astype(ref.dtype)

    def xproj(x_ref, k):
        return (jnp.dot(w_ih_ref[k], x_ref[0],
                        preferred_element_type=jnp.float32)
                + b_ih_ref[k])

    h_f = _gru_cell_t(h_scratch[0], xproj(x_f_ref, 0), w_hh_ref[0],
                      hh_scale_ref[0], b_hh_ref[0], hidden, quant)
    h_b = _gru_cell_t(h_scratch[1], xproj(x_b_ref, 1), w_hh_ref[1],
                      hh_scale_ref[1], b_hh_ref[1], hidden, quant)
    h_f = jnp.where(lengths > i, h_f, h_scratch[0])
    h_b = jnp.where(lengths > n_blocks - 1 - i, h_b, h_scratch[1])
    emit(h_f, out_f_ref)
    emit(h_b, out_b_ref)
    h_scratch[0] = h_f
    h_scratch[1] = h_b


@functools.partial(jax.jit, static_argnames=("quant", "interpret"))
def bigru_l1_split_t(xt, w_ih, b_ih, w_hh, b_hh,
                     lengths: Optional[jnp.ndarray] = None,
                     quant: bool = True, interpret: bool = False):
    """Transposed layer-1: xt (T, IN, B) -> ((T,H,B) fwd, (T,H,B) bwd)."""
    T, IN, B = xt.shape
    H = w_hh.shape[-1]
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(1, B)
    w_ih_m = w_ih.astype(jnp.bfloat16)                 # (2, 3H, IN)
    b_ih_col = b_ih.astype(jnp.float32).reshape(2, 3 * H, 1)
    if quant:
        w_hh_m, hh_scale = _quantize_rows(w_hh)        # (2, 3H, H)
    else:
        hh_scale = jnp.ones((2, 3 * H, 1), jnp.float32)
        w_hh_m = w_hh.astype(jnp.bfloat16)
    b_hh_col = b_hh.astype(jnp.float32).reshape(2, 3 * H, 1)
    fwd_idx = lambda i: (i, 0, 0)                      # noqa: E731
    bwd_idx = lambda i: (T - 1 - i, 0, 0)              # noqa: E731
    out_dtype = jnp.int8 if quant else xt.dtype
    kernel = functools.partial(_bigru_l1_split_t_kernel, quant=quant)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, IN, B), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IN, B), bwd_idx, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec((1, H, B), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, B), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, H, B), out_dtype),
            jax.ShapeDtypeStruct((T, H, B), out_dtype),
        ),
        scratch_shapes=[pltpu.VMEM((2, H, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(xt, xt, w_ih_m, b_ih_col, w_hh_m, hh_scale, b_hh_col, lengths2d)


def _bigru_l2head_t_kernel(
        pf_f_ref, pb_f_ref, pf_b_ref, pb_b_ref, w_in_ref, in_scale_ref,
        b_ih_ref, w_hh_ref, hh_scale_ref, b_hh_ref, w_head_ref,
        lengths_ref, lg_f_ref, lg_b_ref, h_scratch, *, quant: bool):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    hidden = h_scratch.shape[-2]
    lengths = lengths_ref[...]

    def proj(a_ref, b_ref, w, sc, bias):
        # merged (3H, 2H) @ ([a; b], B): one weight-stationary MXU
        # issue instead of two (3H, H) issues — measured +1.7 us/step
        # at B=2560 (per-issue weight-reload/pipeline-drain overhead;
        # kernel lab v6_mproj, round 4).  The VMEM concat costs less
        # than the saved issue.
        op = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)
        if quant:
            p = jnp.dot(w, op, preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * sc
        else:
            p = jnp.dot(w, op.astype(w.dtype),
                        preferred_element_type=jnp.float32)
        return p + bias

    xp_f = proj(pf_f_ref, pb_f_ref, w_in_ref[0], in_scale_ref[0],
                b_ih_ref[0])
    xp_b = proj(pf_b_ref, pb_b_ref, w_in_ref[1], in_scale_ref[1],
                b_ih_ref[1])
    h_f = _gru_cell_t(h_scratch[0], xp_f, w_hh_ref[0], hh_scale_ref[0],
                      b_hh_ref[0], hidden, quant)
    h_b = _gru_cell_t(h_scratch[1], xp_b, w_hh_ref[1], hh_scale_ref[1],
                      b_hh_ref[1], hidden, quant)
    h_f = jnp.where(lengths > i, h_f, h_scratch[0])
    h_b = jnp.where(lengths > n_blocks - 1 - i, h_b, h_scratch[1])
    lg_f_ref[0] = jnp.dot(
        w_head_ref[0], h_f.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    lg_b_ref[0] = jnp.dot(
        w_head_ref[1], h_b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    h_scratch[0] = h_f
    h_scratch[1] = h_b


@functools.partial(jax.jit, static_argnames=("quant", "interpret"))
def bigru_l2head_t(prev_f, prev_b, w_ih, b_ih, w_hh, b_hh, w_head,
                   lengths: Optional[jnp.ndarray] = None,
                   quant: bool = True, interpret: bool = False):
    """Transposed layer-2 + head: (T,H,B) inputs -> (T,C,B) partials."""
    T, H, B = prev_f.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(1, B)
    # (2, 3H, 2H): per direction one merged input-projection matrix
    # (columns [:H] act on prev_f, [H:] on prev_b) — consumed as a
    # single MXU issue per step (see proj() in the kernel)
    if quant:
        w_in, in_scale = _quantize_rows(w_ih)
        w_hh_m, hh_scale = _quantize_rows(w_hh)
    else:
        w_in = w_ih.astype(jnp.bfloat16)
        in_scale = jnp.ones((2, 3 * H, 1), jnp.float32)
        w_hh_m = w_hh.astype(jnp.bfloat16)
        hh_scale = jnp.ones((2, 3 * H, 1), jnp.float32)
    b_ih_col = b_ih.astype(jnp.float32).reshape(2, 3 * H, 1)
    b_hh_col = b_hh.astype(jnp.float32).reshape(2, 3 * H, 1)
    w_head_split = jnp.stack(
        [w_head[:, :H], w_head[:, H:]]).astype(jnp.bfloat16)  # (2, C, H)
    C = w_head.shape[0]
    fwd_idx = lambda i: (i, 0, 0)                      # noqa: E731
    bwd_idx = lambda i: (T - 1 - i, 0, 0)              # noqa: E731
    kernel = functools.partial(_bigru_l2head_t_kernel, quant=quant)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, H, B), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, B), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, B), bwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, B), bwd_idx, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec((1, C, B), fwd_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, B), bwd_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, C, B), jnp.float32),
            jax.ShapeDtypeStruct((T, C, B), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, H, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        interpret=interpret,
    )(prev_f, prev_b, prev_f, prev_b, w_in, in_scale, b_ih_col,
      w_hh_m, hh_scale, b_hh_col, w_head_split, lengths2d)


def bigru_head_fullfused(layers, head, x: jnp.ndarray,
                         lengths: Optional[jnp.ndarray] = None,
                         quant: bool = True,
                         interpret: bool = False,
                         layout: Optional[str] = None) -> jnp.ndarray:
    """2-layer bi-GRU + linear head via the split kernels.

    :param layers: two {fwd, bwd} GRU layer param dicts.
    :param head: {"w": (C, 2H), "b": (C,)} linear head params.
    :param x: (B, T, F) batch-major input.
    :param quant: int8 inter-layer activations, input projections and
        recurrences (production default; see section comment for the
        measured error budget). False = bf16 throughout.
    :param layout: "transposed" (batch on lanes; best at B >= ~192 —
        measured crossover: row-major wins 22.3 vs 21.2M at B=128,
        transposed wins 36.2 vs 32.5M at B=256, v5e round 4),
        "rows" (batch on sublanes), or None to pick by batch size.
    :returns: (B, T, C) float32 logits.
    """
    if len(layers) != 2:
        raise ValueError(
            "split path is specialised to 2-layer stacks; got {}".format(
                len(layers)))
    if layout is None:
        layout = "transposed" if x.shape[0] >= 192 else "rows"
    l1, l2 = layers
    w_ih1 = jnp.stack([l1["fwd"]["w_ih"], l1["bwd"]["w_ih"]])
    b_ih1 = jnp.stack([l1["fwd"]["b_ih"], l1["bwd"]["b_ih"]])
    w_hh1 = jnp.stack([l1["fwd"]["w_hh"], l1["bwd"]["w_hh"]])
    b_hh1 = jnp.stack([l1["fwd"]["b_hh"], l1["bwd"]["b_hh"]])
    w_ih2 = jnp.stack([l2["fwd"]["w_ih"], l2["bwd"]["w_ih"]])
    b_ih2 = jnp.stack([l2["fwd"]["b_ih"], l2["bwd"]["b_ih"]])
    w_hh2 = jnp.stack([l2["fwd"]["w_hh"], l2["bwd"]["w_hh"]])
    b_hh2 = jnp.stack([l2["fwd"]["b_hh"], l2["bwd"]["b_hh"]])
    if layout == "transposed":
        xt = jnp.transpose(x, (1, 2, 0)).astype(jnp.bfloat16)
        out_f, out_b = bigru_l1_split_t(
            xt, w_ih1, b_ih1, w_hh1, b_hh1, lengths=lengths,
            quant=quant, interpret=interpret)
        lg_f, lg_b = bigru_l2head_t(
            out_f, out_b, w_ih2, b_ih2, w_hh2, b_hh2, head["w"],
            lengths=lengths, quant=quant, interpret=interpret)
        logits = lg_f + lg_b + head["b"].astype(
            jnp.float32).reshape(1, -1, 1)
        return jnp.transpose(logits, (2, 0, 1))
    xt = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)
    out_f, out_b = bigru_l1_split(
        xt, w_ih1, b_ih1, w_hh1, b_hh1,
        lengths=lengths, quant=quant, interpret=interpret)
    lg_f, lg_b = bigru_l2head(
        out_f, out_b, w_ih2, b_ih2, w_hh2, b_hh2,
        head["w"], lengths=lengths, quant=quant, interpret=interpret)
    logits = lg_f + lg_b + head["b"].astype(jnp.float32)
    return jnp.swapaxes(logits, 0, 1)


# ---------------------------------------------------------------------------
# Backward kernel + custom VJP: training at kernel speed
# ---------------------------------------------------------------------------


def _gru_bwd_kernel(xp_ref, hprev_ref, dhout_ref, w_hh_t_ref, b_hh_ref,
                    lengths_ref, dxp_ref, dw_ref, db_ref, dh_scratch,
                    *, time_block: int, reverse: bool):
    """Backward through one GRU direction (recompute-gates formulation).

    Grid walks time blocks in the direction opposite to the forward
    pass; the through-time gradient ``dh`` lives in VMEM scratch and
    dW_hh/db_hh accumulate in constant-index output blocks.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    hidden = dh_scratch.shape[-1]
    w_hh_t = w_hh_t_ref[...]      # (H, 3H) bf16
    b_hh = b_hh_ref[...]          # (1, 3H) f32
    lengths = lengths_ref[...]

    # time indices: for a forward-direction GRU the backward pass walks
    # t descending; for a reverse-direction GRU it walks t ascending
    if reverse:
        block_start = i * time_block
    else:
        block_start = (n_blocks - 1 - i) * time_block

    def step(t_iter, dh):
        # local step order inside the block follows the same direction
        t_local = t_iter if reverse else (time_block - 1 - t_iter)
        t_global = block_start + t_local
        xp = xp_ref[t_local].astype(jnp.float32)
        h_prev = hprev_ref[t_local].astype(jnp.float32)
        dh = dh + dhout_ref[t_local].astype(jnp.float32)

        # recompute the gates
        hp = jnp.dot(
            h_prev.astype(w_hh_t.dtype), w_hh_t,
            preferred_element_type=jnp.float32) + b_hh
        r = jax.nn.sigmoid(xp[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(
            xp[:, hidden:2 * hidden] + hp[:, hidden:2 * hidden])
        hn = hp[:, 2 * hidden:]
        n = jnp.tanh(xp[:, 2 * hidden:] + r * hn)

        valid = (lengths > t_global).astype(jnp.float32)
        dh_eff = dh * valid

        dn = dh_eff * (1.0 - z)
        dz = dh_eff * (h_prev - n)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)
        # grads at hp and xp (gate order r, z, n)
        dhp = jnp.concatenate(
            [dr_pre, dz_pre, dn_pre * r], axis=-1)  # (B, 3H)
        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dxp_ref[t_local] = dxp.astype(dxp_ref.dtype)

        dw_ref[...] += jnp.dot(
            dhp.astype(jnp.bfloat16).T,
            h_prev.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(dhp, axis=0, keepdims=True)

        dh_prev = (dh_eff * z + jnp.dot(
            dhp.astype(w_hh_t.dtype), w_hh_t.T,
            preferred_element_type=jnp.float32))
        # frozen steps pass the gradient straight through
        return dh_prev + dh * (1.0 - valid)

    dh = jax.lax.fori_loop(0, time_block, step, dh_scratch[...])
    dh_scratch[...] = dh


@functools.partial(
    jax.jit, static_argnames=("reverse", "time_block", "interpret"))
def gru_bwd_pallas(x_proj, h_out, dh_out, w_hh, b_hh, lengths=None,
                   reverse: bool = False,
                   time_block: Optional[int] = None,
                   interpret: bool = False):
    """Backward pass of one GRU direction.

    :param x_proj: (T, B, 3H) forward input projections.
    :param h_out: (T, B, H) forward outputs.
    :param dh_out: (T, B, H) upstream gradients at the outputs.
    :returns: (dxp (T, B, 3H) f32, dW_hh (3H, H) f32, db_hh (3H,) f32).
    """
    T, B, threeH = x_proj.shape
    H = threeH // 3
    if time_block is None:
        time_block = _pick_time_block(T, B, H, budget_bytes=1 << 20)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = w_hh.T.astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(1, threeH)
    # h_{t-1} per step: zero at the recurrence start
    if reverse:
        h_prev = jnp.concatenate(
            [h_out[1:], jnp.zeros_like(h_out[:1])], axis=0)
    else:
        h_prev = jnp.concatenate(
            [jnp.zeros_like(h_out[:1]), h_out[:-1]], axis=0)

    # grid walks blocks opposite to the forward direction
    if reverse:
        idx = lambda i: (i, 0, 0)                    # noqa: E731
    else:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)     # noqa: E731
    const2 = lambda i: (0, 0)                        # noqa: E731

    kernel = functools.partial(
        _gru_bwd_kernel, time_block=time_block, reverse=reverse)
    dxp, dw, db = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, threeH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, threeH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((threeH, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, threeH), jnp.float32),
            jax.ShapeDtypeStruct((threeH, H), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, h_prev, dh_out, w_hh_t, b_hh_row, lengths2d)
    return dxp, dw, db.reshape(threeH)


def _gru_dir_fwd_impl(x_proj, w_hh, b_hh, lengths, reverse, interpret):
    out = gru_pallas(
        x_proj.astype(jnp.bfloat16), w_hh, b_hh, lengths=lengths,
        reverse=reverse, interpret=interpret)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_dir_trainable(x_proj, w_hh, b_hh, lengths, reverse=False,
                      interpret=False):
    """Differentiable fused GRU direction (kernel fwd + kernel bwd).

    :param x_proj: (T, B, 3H) input projections (time-major).
    :returns: (T, B, H) outputs (bf16).
    """
    return _gru_dir_fwd_impl(
        x_proj, w_hh, b_hh, lengths, reverse, interpret)


def _gru_dir_fwd(x_proj, w_hh, b_hh, lengths, reverse, interpret):
    out = _gru_dir_fwd_impl(
        x_proj, w_hh, b_hh, lengths, reverse, interpret)
    return out, (x_proj, out, w_hh, b_hh, lengths)


def _gru_dir_bwd(reverse, interpret, residuals, g):
    x_proj, h_out, w_hh, b_hh, lengths = residuals
    dxp, dw, db = gru_bwd_pallas(
        x_proj.astype(jnp.bfloat16), h_out, g.astype(jnp.float32),
        w_hh, b_hh, lengths=lengths, reverse=reverse,
        interpret=interpret)
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0) \
        if jnp.issubdtype(lengths.dtype, jnp.integer) else \
        jnp.zeros_like(lengths)
    return (dxp.astype(x_proj.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dlengths)


gru_dir_trainable.defvjp(_gru_dir_fwd, _gru_dir_bwd)


def bigru_stack_trainable(layers, x, lengths=None,
                          compute_dtype=jnp.bfloat16,
                          bidirectional: bool = True,
                          interpret: bool = False):
    """Differentiable fused GRU stack (for the training step).

    Input projections stay in XLA (one large MXU matmul per direction,
    free autodiff for w_ih/b_ih); the recurrences run as fused
    forward/backward kernel pairs via :func:`gru_dir_trainable`.
    (A fullfused-forward variant with in-kernel projections measured
    *slower* for training — 13.5 vs 12.5 ms/step at B=128 — because
    the per-step in-kernel projections lose to one big XLA matmul at
    training batch sizes.)
    """
    cd = compute_dtype or jnp.bfloat16
    B, T, _F = x.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    out = jnp.swapaxes(x, 0, 1).astype(cd)
    for layer in layers:
        dirs = []
        for key, reverse in (
                ("fwd", False), ("bwd", True)) if bidirectional \
                else (("fwd", False),):
            p = layer[key]
            x_proj = (
                jnp.einsum(
                    "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                    preferred_element_type=jnp.float32)
                + p["b_ih"]).astype(cd)
            dirs.append(gru_dir_trainable(
                x_proj, p["w_hh"], p["b_hh"], lengths, reverse,
                interpret))
        out = dirs[0] if len(dirs) == 1 else jnp.concatenate(dirs, -1)
    return jnp.swapaxes(out, 0, 1)


# ---------------------------------------------------------------------------
# Trainable LSTM: single-direction forward (with cell-state output) and
# backward kernels joined by a custom VJP. Mirrors the GRU pair above.
# ---------------------------------------------------------------------------


def _lstm_kernel(xp_ref, w_hh_t_ref, b_hh_ref, lengths_ref, out_ref,
                 c_out_ref, hc_scratch, *, time_block: int, reverse: bool):
    """One time-block of a single LSTM direction (gate order i,f,g,o).

    Unlike :func:`_bilstm_kernel` this also writes the cell-state
    sequence so the backward kernel can recompute gates.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        hc_scratch[...] = jnp.zeros_like(hc_scratch)

    hidden = hc_scratch.shape[-1]
    w_hh_t = w_hh_t_ref[...]      # (H, 4H) bf16
    b_hh = b_hh_ref[...]          # (1, 4H) f32
    lengths = lengths_ref[...]

    if reverse:
        block_start = (n_blocks - 1 - i) * time_block
    else:
        block_start = i * time_block

    def step(t_iter, carry):
        h, c = carry
        t_local = (time_block - 1 - t_iter) if reverse else t_iter
        t_global = block_start + t_local
        xp = xp_ref[t_local].astype(jnp.float32)
        gates = jnp.dot(
            h.astype(w_hh_t.dtype), w_hh_t,
            preferred_element_type=jnp.float32) + b_hh + xp
        gi = jax.nn.sigmoid(gates[:, :hidden])
        gf = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        valid = (lengths > t_global)
        h_new = jnp.where(valid, h_new, h)
        c_new = jnp.where(valid, c_new, c)
        out_ref[t_local] = h_new.astype(out_ref.dtype)
        c_out_ref[t_local] = c_new
        return (h_new, c_new)

    h, c = jax.lax.fori_loop(
        0, time_block, step, (hc_scratch[0], hc_scratch[1]))
    hc_scratch[0] = h
    hc_scratch[1] = c


@functools.partial(
    jax.jit, static_argnames=("reverse", "time_block", "interpret"))
def lstm_pallas(x_proj, w_hh, b_hh, lengths=None, reverse: bool = False,
                time_block: Optional[int] = None,
                interpret: bool = False):
    """One LSTM direction over pre-projected inputs, returning (h, c).

    :param x_proj: (T, B, 4H) time-major projections ``x @ w_ih.T + b_ih``.
    :param w_hh: (4H, H) recurrent weights (torch layout).
    :returns: ((T, B, H) hidden outputs in x_proj dtype,
        (T, B, H) float32 cell states).
    """
    T, B, fourH = x_proj.shape
    H = fourH // 4
    if time_block is None:
        time_block = _pick_time_block(
            T, B, H, budget_bytes=2 << 20, gates=4)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = w_hh.T.astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(1, fourH)

    if reverse:
        idx = lambda i: (n_blocks - 1 - i, 0, 0)  # noqa: E731
    else:
        idx = lambda i: (i, 0, 0)  # noqa: E731

    kernel = functools.partial(
        _lstm_kernel, time_block=time_block, reverse=reverse)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, fourH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, B, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * (H * fourH) + 12 * T * B * fourH,
            bytes_accessed=x_proj.size * 2 + T * B * H * 6,
            transcendentals=4 * T * B * H),
        interpret=interpret,
    )(x_proj, w_hh_t, b_hh_row, lengths2d)


def _lstm_bwd_kernel(xp_ref, hprev_ref, cprev_ref, dhout_ref, w_hh_t_ref,
                     b_hh_ref, lengths_ref, dxp_ref, dw_ref, db_ref,
                     dhc_scratch, *, time_block: int, reverse: bool):
    """Backward through one LSTM direction (recompute-gates formulation).

    dh and dc through-time gradients live in VMEM scratch; masked steps
    pass both straight through (the forward froze h and c there).
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dhc_scratch[...] = jnp.zeros_like(dhc_scratch)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    hidden = dhc_scratch.shape[-1]
    w_hh_t = w_hh_t_ref[...]      # (H, 4H) bf16
    b_hh = b_hh_ref[...]
    lengths = lengths_ref[...]

    if reverse:
        block_start = i * time_block
    else:
        block_start = (n_blocks - 1 - i) * time_block

    def step(t_iter, carry):
        dh, dc = carry
        t_local = t_iter if reverse else (time_block - 1 - t_iter)
        t_global = block_start + t_local
        xp = xp_ref[t_local].astype(jnp.float32)
        h_prev = hprev_ref[t_local].astype(jnp.float32)
        c_prev = cprev_ref[t_local]
        dh = dh + dhout_ref[t_local].astype(jnp.float32)

        gates = jnp.dot(
            h_prev.astype(w_hh_t.dtype), w_hh_t,
            preferred_element_type=jnp.float32) + b_hh + xp
        gi = jax.nn.sigmoid(gates[:, :hidden])
        gf = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        gg = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        go = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_t = gf * c_prev + gi * gg
        th = jnp.tanh(c_t)

        valid = (lengths > t_global).astype(jnp.float32)
        do_pre = (dh * th) * go * (1.0 - go)
        dc_tot = dc + dh * go * (1.0 - th * th)
        di_pre = (dc_tot * gg) * gi * (1.0 - gi)
        df_pre = (dc_tot * c_prev) * gf * (1.0 - gf)
        dg_pre = (dc_tot * gi) * (1.0 - gg * gg)
        dgates = jnp.concatenate(
            [di_pre, df_pre, dg_pre, do_pre], axis=-1) * valid
        dxp_ref[t_local] = dgates.astype(dxp_ref.dtype)

        dw_ref[...] += jnp.dot(
            dgates.astype(jnp.bfloat16).T,
            h_prev.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        db_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)

        dh_prev = jnp.dot(
            dgates.astype(w_hh_t.dtype), w_hh_t.T,
            preferred_element_type=jnp.float32) + dh * (1.0 - valid)
        dc_prev = dc_tot * gf * valid + dc * (1.0 - valid)
        return (dh_prev, dc_prev)

    dh, dc = jax.lax.fori_loop(
        0, time_block, step, (dhc_scratch[0], dhc_scratch[1]))
    dhc_scratch[0] = dh
    dhc_scratch[1] = dc


@functools.partial(
    jax.jit, static_argnames=("reverse", "time_block", "interpret"))
def lstm_bwd_pallas(x_proj, h_out, c_out, dh_out, w_hh, b_hh,
                    lengths=None, reverse: bool = False,
                    time_block: Optional[int] = None,
                    interpret: bool = False):
    """Backward pass of one LSTM direction.

    :param c_out: (T, B, H) float32 cell states from :func:`lstm_pallas`.
    :returns: (dxp (T, B, 4H) f32, dW_hh (4H, H) f32, db_hh (4H,) f32).
    """
    T, B, fourH = x_proj.shape
    H = fourH // 4
    if time_block is None:
        time_block = _pick_time_block(
            T, B, H, budget_bytes=1 << 20, gates=4)
    if T % time_block:
        raise ValueError(
            "T={} not divisible by time_block={}".format(T, time_block))
    n_blocks = T // time_block
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    w_hh_t = w_hh.T.astype(jnp.bfloat16)
    b_hh_row = b_hh.astype(jnp.float32).reshape(1, fourH)
    if reverse:
        h_prev = jnp.concatenate(
            [h_out[1:], jnp.zeros_like(h_out[:1])], axis=0)
        c_prev = jnp.concatenate(
            [c_out[1:], jnp.zeros_like(c_out[:1])], axis=0)
        idx = lambda i: (i, 0, 0)                    # noqa: E731
    else:
        h_prev = jnp.concatenate(
            [jnp.zeros_like(h_out[:1]), h_out[:-1]], axis=0)
        c_prev = jnp.concatenate(
            [jnp.zeros_like(c_out[:1]), c_out[:-1]], axis=0)
        idx = lambda i: (n_blocks - 1 - i, 0, 0)     # noqa: E731
    const2 = lambda i: (0, 0)                        # noqa: E731

    kernel = functools.partial(
        _lstm_bwd_kernel, time_block=time_block, reverse=reverse)
    dxp, dw, db = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (time_block, B, fourH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (time_block, B, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (time_block, B, fourH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((fourH, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), const2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, fourH), jnp.float32),
            jax.ShapeDtypeStruct((fourH, H), jnp.float32),
            jax.ShapeDtypeStruct((1, fourH), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, B, H), jnp.float32)],
        interpret=interpret,
    )(x_proj, h_prev, c_prev, dh_out, w_hh_t, b_hh_row, lengths2d)
    return dxp, dw, db.reshape(fourH)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_dir_trainable(x_proj, w_hh, b_hh, lengths, reverse=False,
                       interpret=False):
    """Differentiable fused LSTM direction (kernel fwd + kernel bwd).

    :param x_proj: (T, B, 4H) input projections (time-major).
    :returns: (T, B, H) hidden outputs (bf16).
    """
    h, _c = lstm_pallas(
        x_proj.astype(jnp.bfloat16), w_hh, b_hh, lengths=lengths,
        reverse=reverse, interpret=interpret)
    return h


def _lstm_dir_fwd(x_proj, w_hh, b_hh, lengths, reverse, interpret):
    h, c = lstm_pallas(
        x_proj.astype(jnp.bfloat16), w_hh, b_hh, lengths=lengths,
        reverse=reverse, interpret=interpret)
    return h, (x_proj, h, c, w_hh, b_hh, lengths)


def _lstm_dir_bwd(reverse, interpret, residuals, g):
    x_proj, h_out, c_out, w_hh, b_hh, lengths = residuals
    dxp, dw, db = lstm_bwd_pallas(
        x_proj.astype(jnp.bfloat16), h_out, c_out,
        g.astype(jnp.float32), w_hh, b_hh, lengths=lengths,
        reverse=reverse, interpret=interpret)
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0) \
        if jnp.issubdtype(lengths.dtype, jnp.integer) else \
        jnp.zeros_like(lengths)
    return (dxp.astype(x_proj.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dlengths)


lstm_dir_trainable.defvjp(_lstm_dir_fwd, _lstm_dir_bwd)


def bilstm_stack_trainable(layers, x, lengths=None,
                           compute_dtype=jnp.bfloat16,
                           bidirectional: bool = True,
                           interpret: bool = False):
    """Differentiable fused LSTM stack (for the training step).

    Bidirectional stacks concatenate fwd/bwd per layer; unidirectional
    stacks follow the ReversibleLSTM interleave (reverse on even
    layers) used by ``LatentSpaceLSTM`` (reference
    ``medaka/architectures/latent_space_lstm.py``).
    """
    cd = compute_dtype or jnp.bfloat16
    B, T, _F = x.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    out = jnp.swapaxes(x, 0, 1).astype(cd)
    for li, layer in enumerate(layers):
        if bidirectional:
            dirs = []
            for key, reverse in (("fwd", False), ("bwd", True)):
                p = layer[key]
                x_proj = (
                    jnp.einsum(
                        "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                        preferred_element_type=jnp.float32)
                    + p["b_ih"]).astype(cd)
                dirs.append(lstm_dir_trainable(
                    x_proj, p["w_hh"], p["b_hh"], lengths, reverse,
                    interpret))
            out = jnp.concatenate(dirs, -1)
        else:
            p = layer["fwd"]
            x_proj = (
                jnp.einsum(
                    "tbi,hi->tbh", out, p["w_ih"].astype(cd),
                    preferred_element_type=jnp.float32)
                + p["b_ih"]).astype(cd)
            out = lstm_dir_trainable(
                x_proj, p["w_hh"], p["b_hh"], lengths, li % 2 == 0,
                interpret)
    return jnp.swapaxes(out, 0, 1)
