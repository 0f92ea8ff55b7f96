"""Benchmark: pileup columns/s/chip for bi-GRU consensus inference.

Measures the jitted medaka_tpu forward (bi-GRU 2x256, bf16, fully-fused
Pallas kernels) on the inference geometry (batch 512 x 10000 columns x 10
features — reference ``medaka/medaka.py:266-272``) and compares against a
torch-CPU forward of the identical architecture (the compute the
reference performs per host when no GPU is present).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BATCH = 512  # feasible with the fully-fused kernel (reference default 100)
CHUNK = 10000
FEATS = 10
CLASSES = 5
HIDDEN = 256


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from medaka_tpu.models.gru import GRUModel

    model = GRUModel(
        num_features=FEATS, num_classes=CLASSES, gru_size=HIDDEN)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, CHUNK, FEATS), dtype=np.float32))
    lengths = jnp.full((BATCH,), CHUNK, dtype=jnp.int32)

    # NOTE: on the tunnelled TPU platform block_until_ready() returns
    # before execution finishes; a scalar checksum fetched to host is the
    # only honest fence, and keeps the 20 MB output off the timed path.
    fwd = jax.jit(lambda p, x, l: model.apply(
        p, x, normalise=True, compute_dtype=jnp.bfloat16,
        lengths=l).sum())
    float(fwd(params, x, lengths))  # compile + execute once
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        float(fwd(params, x, lengths))
    dt = (time.perf_counter() - t0) / n_iter
    return BATCH * CHUNK / dt


def bench_torch_cpu_baseline():
    """Reference-equivalent compute: torch bi-GRU 2x256 on CPU."""
    import torch

    torch.set_num_threads(2)  # reference guidance: >2 threads scale poorly
    model = torch.nn.Sequential()
    gru = torch.nn.GRU(
        FEATS, HIDDEN, num_layers=2, bidirectional=True, batch_first=True)
    linear = torch.nn.Linear(2 * HIDDEN, CLASSES)
    b, t = 4, CHUNK  # smaller batch, columns/s is size-invariant here
    x = torch.rand((b, t, FEATS), dtype=torch.float32)
    with torch.inference_mode():
        y, _ = gru(x)
        linear(y)  # warm
        t0 = time.perf_counter()
        y, _ = gru(x)
        torch.softmax(linear(y), -1)
        dt = time.perf_counter() - t0
    return b * t / dt


def _backend_up(timeout_s: int = 180) -> bool:
    """Probe device init in a subprocess (a down tunnel HANGS it)."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # the tunnelled TPU backend occasionally goes UNAVAILABLE (device
    # init then hangs rather than raising); probe out-of-process and
    # wait out short outages before committing this process to it
    for attempt in range(4):
        if _backend_up():
            break
        time.sleep(90 * (attempt + 1))
    value = bench_tpu()
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception:
        baseline = None
    result = {
        "metric": "pileup_columns_per_s_per_chip",
        "value": round(value, 1),
        "unit": "columns/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
