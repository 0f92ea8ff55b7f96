"""Per-step latency ablation for the fullfused bi-GRU kernel.

Isolates where the per-step time goes by replacing parts of the GRU
cell with cheaper stand-ins, at the production geometry
(B=512, T=10000, H=256, one layer, both directions):

- full:        the real cell (matmul + 3 gates + blend).
- matmul_only: h' = first H cols of (h @ w_hh + b) + xp slice -- the
               serial MXU chain with no VPU gate work.
- gates_only:  gates computed from xp and a CONSTANT hp (the h @ w_hh
               matmul removed; the serial chain is h -> blend only).
- nocell:      h' = xp slice + h -- floor: loop + scratch reads +
               output writes, no MXU in the chain, trivial VPU.

The difference full - matmul_only bounds the VPU gate cost; full -
gates_only bounds the MXU matmul cost; nocell is the loop overhead
floor.  Timing fetches a scalar checksum (block_until_ready lies on
the tunnelled platform).
"""
import functools
import sys
import time

import numpy as np

B, T, H, IN = 512, 10000, 256, 256
# 4, not the production 32: this harness feeds PRE-projected
# (T, B, 3H) inputs (the production kernel projects in-kernel from
# (T, B, IN)), so its double-buffered input windows are 3x larger and
# anything above time_block=2 overflows the 16M scoped vmem limit.
TIME_BLOCK = 2


def make_kernel(mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_f_ref, x_b_ref, w_hh_t_ref, b_hh_ref, out_f_ref,
               out_b_ref, h_scratch, *, time_block):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            h_scratch[...] = jnp.zeros_like(h_scratch)

        w_f = w_hh_t_ref[0]
        w_b = w_hh_t_ref[1]
        b_f = b_hh_ref[0]
        b_b = b_hh_ref[1]

        def cell(h, xp, w, b):
            if mode == "nocell":
                return xp[:, :H] + h
            if mode == "gates_only":
                hp = b + 0.25  # stand-in for the matmul result
            else:
                hp = jnp.dot(h.astype(w.dtype), w,
                             preferred_element_type=jnp.float32) + b
            if mode == "matmul_only":
                return hp[:, :H] + xp[:, :H]
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H:2 * H] + hp[:, H:2 * H])
            n = jnp.tanh(xp[:, 2 * H:] + r * hp[:, 2 * H:])
            return (1.0 - z) * n + z * h

        def gates(h, xp, hp):
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H:2 * H] + hp[:, H:2 * H])
            n = jnp.tanh(xp[:, 2 * H:] + r * hp[:, 2 * H:])
            return (1.0 - z) * n + z * h

        def step(t, carry):
            h_f, h_b = carry
            t_b = time_block - 1 - t
            if mode == "full_il":
                # both MXU matmuls issued before any VPU gate work, so
                # the second matmul can overlap the first gate block
                xp_f = x_f_ref[t].astype(jnp.float32)
                xp_b = x_b_ref[t_b].astype(jnp.float32)
                hp_f = jnp.dot(h_f.astype(w_f.dtype), w_f,
                               preferred_element_type=jnp.float32) + b_f
                hp_b = jnp.dot(h_b.astype(w_b.dtype), w_b,
                               preferred_element_type=jnp.float32) + b_b
                h_f = gates(h_f, xp_f, hp_f)
                h_b = gates(h_b, xp_b, hp_b)
            else:
                h_f = cell(h_f, x_f_ref[t].astype(jnp.float32), w_f, b_f)
                h_b = cell(h_b, x_b_ref[t_b].astype(jnp.float32), w_b, b_b)
            out_f_ref[t] = h_f.astype(out_f_ref.dtype)
            out_b_ref[t_b] = h_b.astype(out_b_ref.dtype)
            return (h_f, h_b)

        h_f, h_b = jax.lax.fori_loop(
            0, time_block, step, (h_scratch[0], h_scratch[1]))
        h_scratch[0] = h_f
        h_scratch[1] = h_b

    n_blocks = T // TIME_BLOCK
    fwd_idx = lambda i: (i, 0, 0)                   # noqa: E731
    bwd_idx = lambda i: (n_blocks - 1 - i, 0, 0)    # noqa: E731

    @jax.jit
    def run(xp, w_hh_t, b_hh):
        out = pl.pallas_call(
            functools.partial(kernel, time_block=TIME_BLOCK),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((TIME_BLOCK, B, 3 * H), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TIME_BLOCK, B, 3 * H), bwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TIME_BLOCK, B, H), fwd_idx,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TIME_BLOCK, B, H), bwd_idx,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
                jax.ShapeDtypeStruct((T, B, H), jnp.bfloat16),
            ),
            scratch_shapes=[pltpu.VMEM((2, B, H), jnp.float32)],
        )(xp, xp, w_hh_t, b_hh)
        return (out[0].sum() + out[1].sum()).astype(jnp.float32)

    return run


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        rng.standard_normal((T, B, 3 * H)).astype(np.float32) * 0.1,
        dtype=jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((2, H, 3 * H)).astype(np.float32) * 0.05,
        dtype=jnp.bfloat16)
    b = jnp.asarray(np.zeros((2, 1, 3 * H), np.float32))

    modes = sys.argv[1:] or [
        "nocell", "gates_only", "matmul_only", "full", "full_il"]
    for mode in modes:
        run = make_kernel(mode)
        t0 = time.perf_counter()
        float(run(xp, w, b))
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            float(run(xp, w, b))
        dt = (time.perf_counter() - t0) / n
        print("{:12s}: {:.2f} us/step  (walltime {:.3f}s, "
              "compile {:.0f}s)".format(mode, dt / T * 1e6, dt,
                                        compile_s), flush=True)


if __name__ == "__main__":
    main()
