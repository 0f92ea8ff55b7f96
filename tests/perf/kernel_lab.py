"""Kernel experiment lab: full-forward variants for the bi-GRU consensus
model at the production inference geometry (B=512, T=10000, H=256, 2
layers, 5 classes).

Round-2 left the single-chip rate at ~31.5M cols/s (~51% of the 62M
cols/s bf16 speed of light); round 3 shipped the transposed split
path (50.8M); round 4's budget-term attacks (v6_*) shipped the merged
projection issue and bf16 tanh-form gates (56.5M — per-step budget in
docs/kernels.md, fit via tests/perf/step_budget.py).  Variants, oldest
first:

- v0          : production path (bigru_stack_fullfused + head einsum).
- v0_tb{N}u   : v0 with time_block=N and the inner loop unrolled
                (amortises the per-grid-step DMA/loop floor).
- v2          : two-kernel pipeline -- layer-1 fullfused keeps separate
                fwd/bwd outputs (no inter-layer concat: -10.4 GB), the
                layer-2 kernel takes split inputs and fuses the linear
                head, writing per-direction logit partials (T, B, 5)
                instead of (T, B, 256) hidden states (-5.2 GB writes,
                -5.2 GB head re-read).
- v3          : v2 with int8 inter-layer activations (layer-1 emits
                int8; h is bounded to [-1, 1] so a fixed *127 quant
                composes with per-column weight scales -- the same
                argument as the validated int8 recurrence) and int8
                layer-2 input projections: the projections are 50% of
                all FLOPs and v5e int8 peak is 2x bf16.

Run: python tests/perf/kernel_lab.py [variant ...]
Prints one line per variant: cols/s + us/step.  A numeric parity check
against the scan path runs first at a tiny geometry for every variant.
"""
import functools
import os
import sys
import time

import numpy as np

B = int(os.environ.get("LAB_B", 512))
T = int(os.environ.get("LAB_T", 10000))
H, IN, C = 256, 10, 5


# ---------------------------------------------------------------------------
# experimental kernels
# ---------------------------------------------------------------------------


def _build():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from medaka_tpu.ops.pallas_gru import (
        _FULLFUSED_VMEM_LIMIT, bigru_pallas_fullfused)

    ns = {}

    # --- layer-1 kernel: fullfused, separate outputs, optional int8 out ---

    def _l1_kernel(x_f_ref, x_b_ref, w_ih_t_ref, b_ih_ref, w_hh_t_ref,
                   hh_scale_ref, b_hh_ref, lengths_ref, out_f_ref,
                   out_b_ref, h_scratch, xp_f_scratch, xp_b_scratch, *,
                   time_block, unroll, quant_out, quant_hh):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            h_scratch[...] = jnp.zeros_like(h_scratch)

        hidden = h_scratch.shape[-1]
        Bl = h_scratch.shape[-2]
        w_ih_f = w_ih_t_ref[0]
        w_ih_b = w_ih_t_ref[1]
        b_ih_f = b_ih_ref[0]
        b_ih_b = b_ih_ref[1]
        w_f = w_hh_t_ref[0]
        w_b = w_hh_t_ref[1]
        sc_f = hh_scale_ref[0]
        sc_b = hh_scale_ref[1]
        b_f = b_hh_ref[0]
        b_b = b_hh_ref[1]
        lengths = lengths_ref[...]

        xf = x_f_ref[...].reshape(time_block * Bl, x_f_ref.shape[-1])
        xb = x_b_ref[...].reshape(time_block * Bl, x_b_ref.shape[-1])
        xp_f_scratch[...] = (
            jnp.dot(xf, w_ih_f, preferred_element_type=jnp.float32)
            + b_ih_f).reshape(
                time_block, Bl, 3 * hidden).astype(jnp.bfloat16)
        xp_b_scratch[...] = (
            jnp.dot(xb, w_ih_b, preferred_element_type=jnp.float32)
            + b_ih_b).reshape(
                time_block, Bl, 3 * hidden).astype(jnp.bfloat16)

        fwd_start = i * time_block
        bwd_start = (n_blocks - 1 - i) * time_block

        def cell(h, xp, w, sc, b):
            if quant_hh:
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
            if quant_out:
                return jnp.round(h * 127.0).astype(jnp.int8)
            return h.astype(out_f_ref.dtype)

        def step(t, carry):
            h_f, h_b = carry
            t_b = time_block - 1 - t
            nh_f = cell(
                h_f, xp_f_scratch[t].astype(jnp.float32), w_f, sc_f, b_f)
            nh_b = cell(
                h_b, xp_b_scratch[t_b].astype(jnp.float32), w_b, sc_b,
                b_b)
            h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
            h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
            out_f_ref[t] = emit(h_f)
            out_b_ref[t_b] = emit(h_b)
            return (h_f, h_b)

        h_f, h_b = jax.lax.fori_loop(
            0, time_block, step, (h_scratch[0], h_scratch[1]),
            unroll=unroll)
        h_scratch[0] = h_f
        h_scratch[1] = h_b

    @functools.partial(
        jax.jit,
        static_argnames=("time_block", "unroll", "quant_out", "quant_hh"))
    def l1_fused(x, w_ih, b_ih, w_hh, b_hh, lengths, time_block=1,
                 unroll=False, quant_out=False, quant_hh=False):
        Tl, Bl, INl = x.shape
        Hl = w_hh.shape[-1]
        n_blocks = Tl // time_block
        lengths2d = lengths.astype(jnp.int32).reshape(Bl, 1)
        w_ih_t = jnp.swapaxes(w_ih, 1, 2).astype(jnp.bfloat16)
        b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * Hl)
        w_hh_t = jnp.swapaxes(w_hh, 1, 2)
        if quant_hh:
            col = jnp.max(jnp.abs(w_hh_t.astype(jnp.float32)),
                          axis=1, keepdims=True) / 127.0
            col = jnp.maximum(col, 1e-12)
            hh_scale = (col / 127.0).astype(jnp.float32)
            w_hh_t = jnp.round(
                w_hh_t.astype(jnp.float32) / col).astype(jnp.int8)
        else:
            hh_scale = jnp.ones((2, 1, 3 * Hl), jnp.float32)
            w_hh_t = w_hh_t.astype(jnp.bfloat16)
        b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * Hl)
        fwd_idx = lambda i: (i, 0, 0)                  # noqa: E731
        bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)   # noqa: E731
        out_dtype = jnp.int8 if quant_out else x.dtype
        kernel = functools.partial(
            _l1_kernel, time_block=time_block, unroll=unroll,
            quant_out=quant_out, quant_hh=quant_hh)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((time_block, Bl, INl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, INl), bwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((time_block, Bl, Hl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, Hl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Tl, Bl, Hl), out_dtype),
                jax.ShapeDtypeStruct((Tl, Bl, Hl), out_dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, Bl, Hl), jnp.float32),
                pltpu.VMEM((time_block, Bl, 3 * Hl), jnp.bfloat16),
                pltpu.VMEM((time_block, Bl, 3 * Hl), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        )(x, x, w_ih_t, b_ih_row, w_hh_t, hh_scale, b_hh_row, lengths2d)

    ns["l1_fused"] = l1_fused

    # --- layer-2 + head kernel: split inputs, logit-partial outputs ---

    def _l2head_kernel(
            pf_f_ref, pb_f_ref, pf_b_ref, pb_b_ref, w_ih_t_ref,
            ih_scale_ref, b_ih_ref, w_hh_t_ref, hh_scale_ref, b_hh_ref,
            w_head_ref, lengths_ref, lg_f_ref, lg_b_ref, h_scratch,
            xp_f_scratch, xp_b_scratch, *, time_block, unroll, quant_in,
            quant_hh):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            h_scratch[...] = jnp.zeros_like(h_scratch)

        hidden = h_scratch.shape[-1]
        Bl = h_scratch.shape[-2]
        # w_ih_t rows: [fwd<-prev_f, fwd<-prev_b, bwd<-prev_f, bwd<-prev_b]
        lengths = lengths_ref[...]

        def proj(a_ref, b_ref, wi_a, wi_b, sc_a, sc_b, bias):
            a = a_ref[...].reshape(time_block * Bl, hidden)
            bb = b_ref[...].reshape(time_block * Bl, hidden)
            if quant_in:
                pa = jnp.dot(a, wi_a, preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * sc_a
                pb = jnp.dot(bb, wi_b, preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * sc_b
            else:
                pa = jnp.dot(a, wi_a, preferred_element_type=jnp.float32)
                pb = jnp.dot(bb, wi_b, preferred_element_type=jnp.float32)
            return (pa + pb + bias).reshape(
                time_block, Bl, 3 * hidden).astype(jnp.bfloat16)

        xp_f_scratch[...] = proj(
            pf_f_ref, pb_f_ref, w_ih_t_ref[0], w_ih_t_ref[1],
            ih_scale_ref[0], ih_scale_ref[1], b_ih_ref[0])
        xp_b_scratch[...] = proj(
            pf_b_ref, pb_b_ref, w_ih_t_ref[2], w_ih_t_ref[3],
            ih_scale_ref[2], ih_scale_ref[3], b_ih_ref[1])

        w_f = w_hh_t_ref[0]
        w_b = w_hh_t_ref[1]
        sc_f = hh_scale_ref[0]
        sc_b = hh_scale_ref[1]
        b_f = b_hh_ref[0]
        b_b = b_hh_ref[1]
        wh_f = w_head_ref[0]          # (H, C) f32
        wh_b = w_head_ref[1]

        fwd_start = i * time_block
        bwd_start = (n_blocks - 1 - i) * time_block

        def cell(h, xp, w, sc, b):
            if quant_hh:
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
            nh_f = cell(
                h_f, xp_f_scratch[t].astype(jnp.float32), w_f, sc_f, b_f)
            nh_b = cell(
                h_b, xp_b_scratch[t_b].astype(jnp.float32), w_b, sc_b,
                b_b)
            h_f = jnp.where(lengths > fwd_start + t, nh_f, h_f)
            h_b = jnp.where(lengths > bwd_start + t_b, nh_b, h_b)
            lg_f_ref[t] = jnp.dot(
                h_f.astype(jnp.bfloat16), wh_f,
                preferred_element_type=jnp.float32)
            lg_b_ref[t_b] = jnp.dot(
                h_b.astype(jnp.bfloat16), wh_b,
                preferred_element_type=jnp.float32)
            return (h_f, h_b)

        h_f, h_b = jax.lax.fori_loop(
            0, time_block, step, (h_scratch[0], h_scratch[1]),
            unroll=unroll)
        h_scratch[0] = h_f
        h_scratch[1] = h_b

    @functools.partial(
        jax.jit,
        static_argnames=("time_block", "unroll", "quant_in", "quant_hh"))
    def l2head_fused(prev_f, prev_b, w_ih, b_ih, w_hh, b_hh, w_head,
                     lengths, time_block=1, unroll=False, quant_in=False,
                     quant_hh=False):
        """prev_f/prev_b: (T, B, H) layer-1 direction outputs.

        w_ih: (2, 3H, 2H) torch-layout layer-2 input weights (columns
        [:H] act on prev_f, [H:] on prev_b).  w_head: (C, 2H).
        """
        Tl, Bl, Hl = prev_f.shape
        n_blocks = Tl // time_block
        lengths2d = lengths.astype(jnp.int32).reshape(Bl, 1)
        # split + transpose: rows [fwd<-f, fwd<-b, bwd<-f, bwd<-b]
        w_split = jnp.stack([
            w_ih[0, :, :Hl].T, w_ih[0, :, Hl:].T,
            w_ih[1, :, :Hl].T, w_ih[1, :, Hl:].T])  # (4, H, 3H)
        if quant_in:
            # inputs are int8 = round(127*h); per-column weight scales
            col = jnp.max(jnp.abs(w_split), axis=1, keepdims=True)
            col = jnp.maximum(col, 1e-12)
            w_q = jnp.round(w_split / col * 127.0).astype(jnp.int8)
            ih_scale = (col / 127.0 / 127.0).astype(jnp.float32)
            w_in = w_q
        else:
            w_in = w_split.astype(jnp.bfloat16)
            ih_scale = jnp.ones((4, 1, 3 * Hl), jnp.float32)
        b_ih_row = b_ih.astype(jnp.float32).reshape(2, 1, 3 * Hl)
        w_hh_t = jnp.swapaxes(w_hh, 1, 2)
        if quant_hh:
            colh = jnp.max(jnp.abs(w_hh_t.astype(jnp.float32)),
                           axis=1, keepdims=True) / 127.0
            colh = jnp.maximum(colh, 1e-12)
            hh_scale = (colh / 127.0).astype(jnp.float32)
            w_hh_t = jnp.round(
                w_hh_t.astype(jnp.float32) / colh).astype(jnp.int8)
        else:
            hh_scale = jnp.ones((2, 1, 3 * Hl), jnp.float32)
            w_hh_t = w_hh_t.astype(jnp.bfloat16)
        b_hh_row = b_hh.astype(jnp.float32).reshape(2, 1, 3 * Hl)
        w_head_split = jnp.stack(
            [w_head[:, :Hl].T, w_head[:, Hl:].T]).astype(jnp.bfloat16)
        Cl = w_head.shape[0]

        fwd_idx = lambda i: (i, 0, 0)                  # noqa: E731
        bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)   # noqa: E731
        kernel = functools.partial(
            _l2head_kernel, time_block=time_block, unroll=unroll,
            quant_in=quant_in, quant_hh=quant_hh)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((time_block, Bl, Hl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, Hl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, Hl), bwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, Hl), bwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((time_block, Bl, Cl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((time_block, Bl, Cl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Tl, Bl, Cl), jnp.float32),
                jax.ShapeDtypeStruct((Tl, Bl, Cl), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, Bl, Hl), jnp.float32),
                pltpu.VMEM((time_block, Bl, 3 * Hl), jnp.bfloat16),
                pltpu.VMEM((time_block, Bl, 3 * Hl), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        )(prev_f, prev_b, prev_f, prev_b, w_in, ih_scale, b_ih_row,
          w_hh_t, hh_scale, b_hh_row, w_head_split, lengths2d)

    ns["l2head_fused"] = l2head_fused

    # --- transposed layout: (feature, batch) lanes ----------------------
    # Promoted to production in round 3: see
    # medaka_tpu.ops.pallas_gru.bigru_l1_split_t / bigru_l2head_t for
    # the kernels and the layout rationale.  The lab drives the
    # production functions directly so measurements and shipped code
    # cannot drift apart.
    from medaka_tpu.ops.pallas_gru import bigru_l1_split_t, bigru_l2head_t

    ns["l1t_fused"] = bigru_l1_split_t
    ns["l2ht_fused"] = bigru_l2head_t
    ns["bigru_pallas_fullfused"] = bigru_pallas_fullfused

    # --- transposed experiments (round 4): budget-term attacks ----------
    # Lab-local copies of the production transposed kernels, each tweak
    # isolating one term of the per-step budget
    # (tests/perf/step_budget.py):
    #   tb=2  : two timesteps per grid step — halves the per-grid-step
    #           loop/DMA-issue floor (the row-major tb4/tb8 negatives
    #           block-batched the projections; this keeps per-step math
    #           identical and only widens the DMA blocks).
    #   mproj : layer-2 input projections as one (3H, 2H) @ (2H, B)
    #           matmul per direction instead of two (3H, H) @ (H, B) —
    #           halves MXU issue count for 50% of all FLOPs (costs one
    #           VMEM concat per direction per step).
    #   rz    : r and z sigmoids in one (2H, B) VPU call.
    from medaka_tpu.ops.pallas_gru import _quantize_rows

    def cell_t(h, xp, w, sc, b, hidden, rz_fused, gates_bf16=False):
        hq = jnp.round(h * 127.0).astype(jnp.int8)
        hp = jnp.dot(w, hq, preferred_element_type=jnp.int32
                     ).astype(jnp.float32) * sc + b
        if gates_bf16:
            # transcendentals on bf16 (packed VPU lanes); the h carry
            # and the gate *blend* stay f32 so quantisation error does
            # not compound over 10k serial steps.  sigmoid is expressed
            # through tanh — Mosaic's bf16 `logistic` lowering fails
            # verification (f32 broadcast into a bf16 vector), tanh
            # lowers fine.
            half = jnp.bfloat16(0.5)
            rz_in = (xp[:2 * hidden] + hp[:2 * hidden]
                     ).astype(jnp.bfloat16)
            rz = half * (jnp.bfloat16(1.0) + jnp.tanh(rz_in * half))
            r = rz[:hidden].astype(jnp.float32)
            z = rz[hidden:].astype(jnp.float32)
            n = jnp.tanh(
                (xp[2 * hidden:] + r * hp[2 * hidden:]
                 ).astype(jnp.bfloat16)).astype(jnp.float32)
            return (1.0 - z) * n + z * h
        if rz_fused:
            rz = jax.nn.sigmoid(xp[:2 * hidden] + hp[:2 * hidden])
            r = rz[:hidden]
            z = rz[hidden:]
        else:
            r = jax.nn.sigmoid(xp[:hidden] + hp[:hidden])
            z = jax.nn.sigmoid(
                xp[hidden:2 * hidden] + hp[hidden:2 * hidden])
        n = jnp.tanh(xp[2 * hidden:] + r * hp[2 * hidden:])
        return (1.0 - z) * n + z * h

    def _l1t_x_kernel(x_f_ref, x_b_ref, w_ih_ref, b_ih_ref, w_hh_ref,
                      hh_scale_ref, b_hh_ref, lengths_ref, out_f_ref,
                      out_b_ref, h_scratch, *, tb, rz_fused,
                      gates_bf16):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            h_scratch[...] = jnp.zeros_like(h_scratch)

        hidden = h_scratch.shape[-2]
        lengths = lengths_ref[...]          # (1, B)
        total = n_blocks * tb
        h_f = h_scratch[0]
        h_b = h_scratch[1]
        for s in range(tb):
            sb = tb - 1 - s
            xp_f = (jnp.dot(w_ih_ref[0], x_f_ref[s],
                            preferred_element_type=jnp.float32)
                    + b_ih_ref[0])
            xp_b = (jnp.dot(w_ih_ref[1], x_b_ref[sb],
                            preferred_element_type=jnp.float32)
                    + b_ih_ref[1])
            nh_f = cell_t(h_f, xp_f, w_hh_ref[0], hh_scale_ref[0],
                          b_hh_ref[0], hidden, rz_fused, gates_bf16)
            nh_b = cell_t(h_b, xp_b, w_hh_ref[1], hh_scale_ref[1],
                          b_hh_ref[1], hidden, rz_fused, gates_bf16)
            h_f = jnp.where(lengths > i * tb + s, nh_f, h_f)
            h_b = jnp.where(lengths > total - 1 - (i * tb + s),
                            nh_b, h_b)
            out_f_ref[s] = jnp.round(h_f * 127.0).astype(jnp.int8)
            out_b_ref[sb] = jnp.round(h_b * 127.0).astype(jnp.int8)
        h_scratch[0] = h_f
        h_scratch[1] = h_b

    @functools.partial(jax.jit, static_argnames=("tb", "rz_fused",
                                                 "gates_bf16"))
    def l1t_x(xt, w_ih, b_ih, w_hh, b_hh, lengths, tb=1,
              rz_fused=False, gates_bf16=False):
        Tl, INl, Bl = xt.shape
        Hl = w_hh.shape[-1]
        n_blocks = Tl // tb
        lengths2d = lengths.astype(jnp.int32).reshape(1, Bl)
        w_ih_m = w_ih.astype(jnp.bfloat16)
        b_ih_col = b_ih.astype(jnp.float32).reshape(2, 3 * Hl, 1)
        w_hh_m, hh_scale = _quantize_rows(w_hh)
        b_hh_col = b_hh.astype(jnp.float32).reshape(2, 3 * Hl, 1)
        fwd_idx = lambda i: (i, 0, 0)                      # noqa: E731
        bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)       # noqa: E731
        kernel = functools.partial(
            _l1t_x_kernel, tb=tb, rz_fused=rz_fused,
            gates_bf16=gates_bf16)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((tb, INl, Bl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, INl, Bl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=(
                pl.BlockSpec((tb, Hl, Bl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Hl, Bl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Tl, Hl, Bl), jnp.int8),
                jax.ShapeDtypeStruct((Tl, Hl, Bl), jnp.int8),
            ),
            scratch_shapes=[pltpu.VMEM((2, Hl, Bl), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        )(xt, xt, w_ih_m, b_ih_col, w_hh_m, hh_scale, b_hh_col,
          lengths2d)

    ns["l1t_x"] = l1t_x

    # Rejected without benching: merging the recurrence INTO the mproj
    # matmul (one (3H, 3H) @ ([pf; pb; h_q], B) issue) is blocked by
    # the torch-GRU algebra — n = tanh(xp_n + r * hp_n) needs hp_n
    # separate from xp_n, so only the r/z rows could merge and the
    # n rows would split back into two extra issues (net +1 per
    # direction vs mproj).  mproj is the issue-count floor for L2.
    def _l2ht_x_kernel(
            pf_f_ref, pb_f_ref, pf_b_ref, pb_b_ref, w_in_ref,
            in_scale_ref, b_ih_ref, w_hh_ref, hh_scale_ref, b_hh_ref,
            w_head_ref, lengths_ref, lg_f_ref, lg_b_ref, h_scratch, *,
            tb, mproj, rz_fused, gates_bf16):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            h_scratch[...] = jnp.zeros_like(h_scratch)

        hidden = h_scratch.shape[-2]
        lengths = lengths_ref[...]
        total = n_blocks * tb
        h_f = h_scratch[0]
        h_b = h_scratch[1]
        for s in range(tb):
            sb = tb - 1 - s
            if mproj:
                # merged (3H, 2H) @ (2H, B): one issue per direction
                a = jnp.concatenate([pf_f_ref[s], pb_f_ref[s]], axis=0)
                xp_f = (jnp.dot(w_in_ref[0], a,
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
                        * in_scale_ref[0] + b_ih_ref[0])
                bb = jnp.concatenate(
                    [pf_b_ref[sb], pb_b_ref[sb]], axis=0)
                xp_b = (jnp.dot(w_in_ref[1], bb,
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32)
                        * in_scale_ref[1] + b_ih_ref[1])
            else:
                xp_f = (jnp.dot(w_in_ref[0], pf_f_ref[s],
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * in_scale_ref[0]
                        + jnp.dot(w_in_ref[1], pb_f_ref[s],
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
                        * in_scale_ref[1] + b_ih_ref[0])
                xp_b = (jnp.dot(w_in_ref[2], pf_b_ref[sb],
                                preferred_element_type=jnp.int32
                                ).astype(jnp.float32) * in_scale_ref[2]
                        + jnp.dot(w_in_ref[3], pb_b_ref[sb],
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
                        * in_scale_ref[3] + b_ih_ref[1])
            nh_f = cell_t(h_f, xp_f, w_hh_ref[0], hh_scale_ref[0],
                          b_hh_ref[0], hidden, rz_fused, gates_bf16)
            nh_b = cell_t(h_b, xp_b, w_hh_ref[1], hh_scale_ref[1],
                          b_hh_ref[1], hidden, rz_fused, gates_bf16)
            h_f = jnp.where(lengths > i * tb + s, nh_f, h_f)
            h_b = jnp.where(lengths > total - 1 - (i * tb + s),
                            nh_b, h_b)
            lg_f_ref[s] = jnp.dot(
                w_head_ref[0], h_f.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            lg_b_ref[sb] = jnp.dot(
                w_head_ref[1], h_b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        h_scratch[0] = h_f
        h_scratch[1] = h_b

    @functools.partial(jax.jit, static_argnames=("tb", "mproj",
                                                 "rz_fused",
                                                 "gates_bf16"))
    def l2ht_x(prev_f, prev_b, w_ih, b_ih, w_hh, b_hh, w_head, lengths,
               tb=1, mproj=False, rz_fused=False, gates_bf16=False):
        Tl, Hl, Bl = prev_f.shape
        n_blocks = Tl // tb
        lengths2d = lengths.astype(jnp.int32).reshape(1, Bl)
        if mproj:
            # one (3H, 2H) weight per direction, one scale row over 2H
            w_in, in_scale = _quantize_rows(w_ih)         # (2, 3H, 2H)
        else:
            w_split = jnp.stack([
                w_ih[0, :, :Hl], w_ih[0, :, Hl:],
                w_ih[1, :, :Hl], w_ih[1, :, Hl:]])
            w_in, in_scale = _quantize_rows(w_split)      # (4, 3H, H)
        w_hh_m, hh_scale = _quantize_rows(w_hh)
        b_ih_col = b_ih.astype(jnp.float32).reshape(2, 3 * Hl, 1)
        b_hh_col = b_hh.astype(jnp.float32).reshape(2, 3 * Hl, 1)
        w_head_split = jnp.stack(
            [w_head[:, :Hl], w_head[:, Hl:]]).astype(jnp.bfloat16)
        Cl = w_head.shape[0]
        fwd_idx = lambda i: (i, 0, 0)                      # noqa: E731
        bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)       # noqa: E731
        kernel = functools.partial(
            _l2ht_x_kernel, tb=tb, mproj=mproj, rz_fused=rz_fused,
            gates_bf16=gates_bf16)
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((tb, Hl, Bl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Hl, Bl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Hl, Bl), bwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Hl, Bl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(
                pl.BlockSpec((tb, Cl, Bl), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, Cl, Bl), bwd_idx,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Tl, Cl, Bl), jnp.float32),
                jax.ShapeDtypeStruct((Tl, Cl, Bl), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((2, Hl, Bl), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_FULLFUSED_VMEM_LIMIT),
        )(prev_f, prev_b, prev_f, prev_b, w_in, in_scale, b_ih_col,
          w_hh_m, hh_scale, b_hh_col, w_head_split, lengths2d)

    ns["l2ht_x"] = l2ht_x
    return ns


# ---------------------------------------------------------------------------
# forward variants
# ---------------------------------------------------------------------------


def make_variant(name, params):
    import jax
    import jax.numpy as jnp

    from medaka_tpu.ops.pallas_gru import bigru_stack_fullfused

    ns = _build()
    l1 = params["gru"][0]
    l2 = params["gru"][1]
    head = params["linear"]

    def stack(kw_l1=None, kw_l2=None, quant=False, quant_hh=False):
        kw_l1 = kw_l1 or {}
        kw_l2 = kw_l2 or {}

        def fwd(params, x, lengths):
            xt = jnp.swapaxes(x, 0, 1).astype(jnp.bfloat16)
            w_ih1 = jnp.stack([l1["fwd"]["w_ih"], l1["bwd"]["w_ih"]])
            b_ih1 = jnp.stack([l1["fwd"]["b_ih"], l1["bwd"]["b_ih"]])
            w_hh1 = jnp.stack([l1["fwd"]["w_hh"], l1["bwd"]["w_hh"]])
            b_hh1 = jnp.stack([l1["fwd"]["b_hh"], l1["bwd"]["b_hh"]])
            out_f, out_b = ns["l1_fused"](
                xt, w_ih1, b_ih1, w_hh1, b_hh1, lengths,
                quant_out=quant, quant_hh=quant_hh, **kw_l1)
            w_ih2 = jnp.stack([l2["fwd"]["w_ih"], l2["bwd"]["w_ih"]])
            b_ih2 = jnp.stack([l2["fwd"]["b_ih"], l2["bwd"]["b_ih"]])
            w_hh2 = jnp.stack([l2["fwd"]["w_hh"], l2["bwd"]["w_hh"]])
            b_hh2 = jnp.stack([l2["fwd"]["b_hh"], l2["bwd"]["b_hh"]])
            lg_f, lg_b = ns["l2head_fused"](
                out_f, out_b, w_ih2, b_ih2, w_hh2, b_hh2,
                head["w"], lengths, quant_in=quant, quant_hh=quant_hh,
                **kw_l2)
            logits = lg_f + lg_b + head["b"].astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.swapaxes(probs, 0, 1)

        return fwd

    def v0(time_block=None, unroll=False, recurrent_quant=None):
        def fwd(params, x, lengths):
            feats = bigru_stack_fullfused(
                params["gru"], x, lengths=lengths,
                compute_dtype=jnp.bfloat16,
                recurrent_quant=recurrent_quant)
            logits = (jnp.einsum(
                "bth,ch->btc", feats.astype(jnp.float32),
                head["w"].astype(jnp.float32),
                preferred_element_type=jnp.float32)
                + head["b"].astype(jnp.float32))
            return jax.nn.softmax(logits, axis=-1)
        return fwd

    def stack_tx(tb=1, mproj=False, rz_fused=False, gates_bf16=False):
        def fwd(params, x, lengths):
            xt = jnp.transpose(x, (1, 2, 0)).astype(jnp.bfloat16)
            w_ih1 = jnp.stack([l1["fwd"]["w_ih"], l1["bwd"]["w_ih"]])
            b_ih1 = jnp.stack([l1["fwd"]["b_ih"], l1["bwd"]["b_ih"]])
            w_hh1 = jnp.stack([l1["fwd"]["w_hh"], l1["bwd"]["w_hh"]])
            b_hh1 = jnp.stack([l1["fwd"]["b_hh"], l1["bwd"]["b_hh"]])
            out_f, out_b = ns["l1t_x"](
                xt, w_ih1, b_ih1, w_hh1, b_hh1, lengths, tb=tb,
                rz_fused=rz_fused, gates_bf16=gates_bf16)
            w_ih2 = jnp.stack([l2["fwd"]["w_ih"], l2["bwd"]["w_ih"]])
            b_ih2 = jnp.stack([l2["fwd"]["b_ih"], l2["bwd"]["b_ih"]])
            w_hh2 = jnp.stack([l2["fwd"]["w_hh"], l2["bwd"]["w_hh"]])
            b_hh2 = jnp.stack([l2["fwd"]["b_hh"], l2["bwd"]["b_hh"]])
            lg_f, lg_b = ns["l2ht_x"](
                out_f, out_b, w_ih2, b_ih2, w_hh2, b_hh2, head["w"],
                lengths, tb=tb, mproj=mproj, rz_fused=rz_fused,
                gates_bf16=gates_bf16)
            logits = lg_f + lg_b + head["b"].astype(
                jnp.float32).reshape(1, -1, 1)
            probs = jax.nn.softmax(logits, axis=1)   # (T, C, B)
            return jnp.transpose(probs, (2, 0, 1))   # (B, T, C)
        return fwd

    def stack_t(quant=True):
        def fwd(params, x, lengths):
            xt = jnp.transpose(x, (1, 2, 0)).astype(jnp.bfloat16)
            w_ih1 = jnp.stack([l1["fwd"]["w_ih"], l1["bwd"]["w_ih"]])
            b_ih1 = jnp.stack([l1["fwd"]["b_ih"], l1["bwd"]["b_ih"]])
            w_hh1 = jnp.stack([l1["fwd"]["w_hh"], l1["bwd"]["w_hh"]])
            b_hh1 = jnp.stack([l1["fwd"]["b_hh"], l1["bwd"]["b_hh"]])
            out_f, out_b = ns["l1t_fused"](
                xt, w_ih1, b_ih1, w_hh1, b_hh1, lengths, quant=quant)
            w_ih2 = jnp.stack([l2["fwd"]["w_ih"], l2["bwd"]["w_ih"]])
            b_ih2 = jnp.stack([l2["fwd"]["b_ih"], l2["bwd"]["b_ih"]])
            w_hh2 = jnp.stack([l2["fwd"]["w_hh"], l2["bwd"]["w_hh"]])
            b_hh2 = jnp.stack([l2["fwd"]["b_hh"], l2["bwd"]["b_hh"]])
            lg_f, lg_b = ns["l2ht_fused"](
                out_f, out_b, w_ih2, b_ih2, w_hh2, b_hh2, head["w"],
                lengths, quant=quant)
            logits = lg_f + lg_b + head["b"].astype(
                jnp.float32).reshape(1, -1, 1)
            probs = jax.nn.softmax(logits, axis=1)   # (T, C, B)
            return jnp.transpose(probs, (2, 0, 1))   # (B, T, C)
        return fwd

    variants = {
        "v0": lambda: v0(),
        "v6": lambda: stack_t(quant=True),
        "v6bf": lambda: stack_t(quant=False),
        "v0_int8": lambda: v0(recurrent_quant="int8"),
        "v2": lambda: stack(),
        "v2_tb4u": lambda: stack(
            kw_l1=dict(time_block=4, unroll=True),
            kw_l2=dict(time_block=4, unroll=True)),
        "v2_tb8u": lambda: stack(
            kw_l1=dict(time_block=8, unroll=True),
            kw_l2=dict(time_block=8, unroll=True)),
        "v3": lambda: stack(quant=True),
        "v3_tb4u": lambda: stack(
            kw_l1=dict(time_block=4, unroll=True),
            kw_l2=dict(time_block=4, unroll=True), quant=True),
        "v3_tb8u": lambda: stack(
            kw_l1=dict(time_block=8, unroll=True),
            kw_l2=dict(time_block=8, unroll=True), quant=True),
        # int8 recurrence on top of v2/v3
        "v2h": lambda: stack(quant_hh=True),
        "v4": lambda: stack(quant=True, quant_hh=True),
        # round-4 budget-term attacks on the transposed path
        "v6_x": lambda: stack_tx(),              # lab copy of v6 (control)
        "v6_tb2": lambda: stack_tx(tb=2),
        "v6_tb4": lambda: stack_tx(tb=4),
        "v6_mproj": lambda: stack_tx(mproj=True),
        "v6_rz": lambda: stack_tx(rz_fused=True),
        "v6_all": lambda: stack_tx(tb=2, mproj=True, rz_fused=True),
        "v6_mrz": lambda: stack_tx(mproj=True, rz_fused=True),
        "v6_gbf": lambda: stack_tx(mproj=True, gates_bf16=True),
        "v6_mgbf": lambda: stack_tx(mproj=True, rz_fused=True,
                                    gates_bf16=True),
    }
    return variants[name]()


def check_parity(name, atol):
    """Tiny-geometry numeric check against the scan stack."""
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(num_features=IN, num_classes=C, gru_size=H)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((32, 64, IN), dtype=np.float32))
    lengths = jnp.asarray(
        rng.integers(32, 65, size=(32,)).astype(np.int32))
    want = model.apply(params, x, normalise=True, fused=False,
                       lengths=lengths)
    fwd = make_variant(name, params)
    got = fwd(params, x, lengths)
    # only positions inside lengths are meaningful
    mask = np.arange(64)[None, :] < np.asarray(lengths)[:, None]
    diff = np.abs(np.asarray(got) - np.asarray(want))[mask]
    print("  parity[{}]: max|dp|={:.4g} (atol {})".format(
        name, diff.max(), atol), flush=True)
    return float(diff.max()) <= atol


def bench(name):
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(num_features=IN, num_classes=C, gru_size=H)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, T, IN), dtype=np.float32))
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    fwd = make_variant(name, params)
    run = jax.jit(lambda p, x, l: fwd(p, x, l).sum())
    t0 = time.perf_counter()
    float(run(params, x, lengths))
    compile_s = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        float(run(params, x, lengths))
    dt = (time.perf_counter() - t0) / n
    print("{:10s}: {:6.1f}M cols/s  {:5.2f} us/col  "
          "(wall {:.3f}s, compile {:.0f}s)".format(
              name, B * T / dt / 1e6, dt / T * 1e6, dt, compile_s),
          flush=True)


def main():
    names = sys.argv[1:] or ["v0", "v2", "v3"]
    for name in names:
        atol = 5e-3 if name.startswith(("v0", "v2")) and name != "v2h" \
            else 0.02
        if not check_parity(name, atol):
            print("  PARITY FAIL -- skipping bench for " + name,
                  flush=True)
            continue
        bench(name)


if __name__ == "__main__":
    main()
