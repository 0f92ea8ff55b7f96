"""Per-step latency budget for the production transposed GRU kernels.

VERDICT r3 item 2: publish a B=2560 per-step decomposition that sums
to the measured rate, with an int8-adjusted speed of light.

Method: the production forward (bigru_head_fullfused, transposed
split path, int8) is timed at several batch sizes. Per-step time is
linear in B — t(B) = floor + slope*B — so the B-intercept is the
per-grid-step serial floor (loop + DMA issue + MXU issue latency) and
the B-scaled part splits into the analytic int8-MXU ideal and the
residual (VPU gate math + B-scaled DMA). A pure-matmul lax.scan chain
at the same shapes gives an independent XLA reference for the MXU
term.

Run (chip must be otherwise idle):
    python tests/perf/step_budget.py [B ...]
"""
import os
import sys
import time

import numpy as np

H, IN, C = 256, 10, 5
T = int(os.environ.get("BUDGET_T", 10000))

# FLOPs per column (one batch row, one time step), split by dtype.
# L1: in-proj 2*IN*3H (bf16) + rec 2*H*3H (int8), x2 directions.
# L2: in-proj 2*(2H)*3H (int8; split inputs) + rec 2*H*3H (int8), x2.
# head: 2*2H*C (f32 accumulate on partials, negligible).
FLOP_BF16 = 2 * (2 * IN * 3 * H)
FLOP_INT8 = 2 * (2 * H * 3 * H) * 2 + 2 * (2 * (2 * H) * 3 * H)
BF16_PEAK = 197e12
INT8_PEAK = 394e12


def main():
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    batches = [int(b) for b in sys.argv[1:]] or [512, 1024, 2048, 2560]
    model = GRUModel(num_features=IN, num_classes=C, gru_size=H)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    rows = []
    for B in batches:
        x = jnp.asarray(rng.random((B, T, IN), dtype=np.float32))
        lengths = jnp.full((B,), T, dtype=jnp.int32)
        fwd = jax.jit(lambda p, x, l: model.apply(
            p, x, normalise=True, compute_dtype=jnp.bfloat16,
            lengths=l).sum())
        float(fwd(params, x, lengths))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fwd(params, x, lengths))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        rows.append((B, dt))
        print("B=%-5d  %6.3f s  %6.2f Mcols/s  %7.2f us/step" % (
            B, dt, B * T / dt / 1e6, dt / T * 1e6), flush=True)

    # least-squares fit us/step = floor + slope * B
    bs = np.array([r[0] for r in rows], float)
    us = np.array([r[1] / T * 1e6 for r in rows], float)
    A = np.stack([np.ones_like(bs), bs], 1)
    (floor, slope), *_ = np.linalg.lstsq(A, us, rcond=None)
    print("\nfit: us/step = %.2f + %.5f * B  (r=%.4f)" % (
        floor, slope,
        np.corrcoef(A @ [floor, slope], us)[0, 1]), flush=True)

    B = batches[-1]
    t_step = us[-1]
    mxu_ideal = (FLOP_INT8 / INT8_PEAK + FLOP_BF16 / BF16_PEAK) * B * 1e6
    resid = t_step - floor - mxu_ideal
    sol_int8 = 1e6 / ((FLOP_INT8 / INT8_PEAK + FLOP_BF16 / BF16_PEAK)
                      * 1e6)  # cols/s if only ideal MXU time
    print("budget at B=%d (%.2f us/step):" % (B, t_step))
    print("  serial floor (B-intercept)    %6.2f us  (%4.1f%%)" % (
        floor, 100 * floor / t_step))
    print("  int8+bf16 MXU ideal           %6.2f us  (%4.1f%%)" % (
        mxu_ideal, 100 * mxu_ideal / t_step))
    print("  residual (VPU gates + DMA)    %6.2f us  (%4.1f%%)" % (
        resid, 100 * resid / t_step))
    print("int8-adjusted speed of light: %.1f Mcols/s "
          "(bf16 SoL 62M; measured = %.0f%% of int8-adjusted)" % (
              sol_int8 / 1e6,
              100 * (B * T / (rows[-1][1])) / sol_int8))

    # XLA reference: a scan of the same-shape int8 matmul chain, no
    # gates — how fast can the MXU alone walk the recurrence?
    w = jnp.asarray(
        rng.integers(-127, 127, (4, 3 * H, H)), jnp.int8)
    h0 = jnp.asarray(rng.integers(-127, 127, (4, H, B)), jnp.int8)

    def step(h, _):
        # 4 chains (2 layers x 2 dirs) of (3H, H) @ (H, B) int8
        out = jnp.einsum(
            "kgh,khb->kgb", w, h, preferred_element_type=jnp.int32)
        nh = (out[:, :H, :] >> 8).astype(jnp.int8)  # stand-in for gates
        return nh, ()

    scan_fn = jax.jit(
        lambda h: jax.lax.scan(step, h, None, length=T)[0].sum())
    v = int(scan_fn(h0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(scan_fn(h0))
        ts.append(time.perf_counter() - t0)
    print("XLA scan matmul-chain reference: %.2f us/step "
          "(checksum %d)" % (min(ts) / T * 1e6, v))


if __name__ == "__main__":
    main()
