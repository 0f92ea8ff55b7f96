"""Benchmark: pileup columns/s/chip for bi-GRU consensus inference.

Measures the jitted medaka_tpu forward (bi-GRU 2x256, split-path fused
Pallas kernels: layer-split int8 recurrences + fused linear head) on the
inference geometry (batch 1024 x 10000 columns x 10 features — reference
``medaka/medaka.py:266-272``) and compares against a pinned torch-CPU
rate for the identical architecture (the compute the reference performs
per host when no GPU is present; see ``TORCH_BASELINE_COLS_S``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — ALWAYS,
within a hard ~450 s wall cap, even when the tunnelled TPU backend is
down (device init then *hangs* rather than raising).  Design:

- the actual device measurement runs in a **subprocess** with a timeout,
  so a hung backend cannot take down the reporting process;
- a ``signal.alarm`` backstop in the parent guarantees a JSON line even
  if something unforeseen blocks;
- on failure the line carries ``"error"`` plus the last-known-good value
  (``BENCH_LAST_GOOD.json``, updated on every successful run) so the
  record never reads as "no number" — the annotation says it is stale.

There is no persistent-compile-cache warmup path on purpose: the tunnel
compiles server-side and ignores the local jax compilation cache
(verified — cache entries are written locally but a second process still
pays the full remote compile).
"""
import json
import os
import signal
import subprocess
import sys
import time

WALL_CAP_S = 450            # hard total budget (driver capture is ~600 s)
PROBE_TIMEOUT_S = 75
BATCH = 2560  # transposed split-path HBM sweet spot (reference default 100)
CHUNK = 10000
FEATS = 10
CLASSES = 5
HIDDEN = 256
METRIC = "pileup_columns_per_s_per_chip"
_HERE = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD_PATH = os.path.join(_HERE, "BENCH_LAST_GOOD.json")

_T0 = time.monotonic()


def _remaining():
    return WALL_CAP_S - (time.monotonic() - _T0)


def bench_tpu():
    import jax
    import jax.numpy as jnp
    import numpy as np

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


# Reference-equivalent torch-CPU compute rate, PINNED: a single
# un-repeated per-run forward swung 6.9k -> 19.3k cols/s between round
# captures (host contention), making the recorded ratio useless for
# tracking. This constant is the median of 5 forwards at the reference
# geometry (batch 100 x 10000 cols, torch.set_num_threads(2) per the
# reference's own guidance) measured 2026-08-20 on this host class via
# tests/perf/torch_baseline.py (observed spread 7.4k-15.8k within one
# run). Re-run that script and update the constant if the host changes.
TORCH_BASELINE_COLS_S = 13101.1


def _read_last_good():
    try:
        with open(LAST_GOOD_PATH) as fh:
            return json.load(fh)
    except Exception:
        return None


def _emit(value, vs_baseline, error=None, stale_from=None):
    result = {
        "metric": METRIC,
        "value": round(value, 1) if value else 0.0,
        "unit": "columns/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    if error:
        result["error"] = error
    if stale_from:
        result["stale_from"] = stale_from
    print(json.dumps(result), flush=True)


def _emit_fallback(error):
    last = _read_last_good() or {}
    _emit(last.get("value", 0.0), last.get("vs_baseline"),
          error=error, stale_from=last.get("captured_at"))


def _backend_up(timeout_s):
    """Probe device init in a subprocess (a down tunnel HANGS it)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _alarm_handler(signum, frame):
    _emit_fallback("wall-cap backstop fired (parent blocked)")
    os._exit(0)


def main():
    signal.signal(signal.SIGALRM, _alarm_handler)
    signal.alarm(WALL_CAP_S + 20)

    baseline = TORCH_BASELINE_COLS_S

    # one short out-of-process probe; one short retry — no backoff ladder
    up = _backend_up(PROBE_TIMEOUT_S)
    if not up and _remaining() > PROBE_TIMEOUT_S + 60:
        time.sleep(30)
        up = _backend_up(PROBE_TIMEOUT_S)
    if not up:
        _emit_fallback("TPU backend unreachable (device init hung probe)")
        return

    # measure in a subprocess so a mid-run tunnel drop cannot hang us
    child_timeout = max(60, _remaining() - 15)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            timeout=child_timeout, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        _emit_fallback(
            f"measurement subprocess exceeded {child_timeout:.0f}s "
            "(remote compile queue or mid-run outage)")
        return
    value = None
    for line in (r.stdout or "").splitlines():
        try:
            rec = json.loads(line)
            if "child_value" in rec:
                value = rec["child_value"]
        except (ValueError, TypeError):
            continue
    if value is None:
        tail = ((r.stderr or "") + (r.stdout or ""))[-300:]
        _emit_fallback(f"measurement subprocess failed rc={r.returncode}: "
                       + tail.replace("\n", " "))
        return

    vs_baseline = value / baseline if baseline else None
    try:
        with open(LAST_GOOD_PATH, "w") as fh:
            json.dump({"value": round(value, 1),
                       "vs_baseline": round(vs_baseline, 2)
                       if vs_baseline else None,
                       "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                    time.gmtime())}, fh)
    except OSError:
        pass
    _emit(value, vs_baseline)


if __name__ == "__main__":
    if "--child" in sys.argv:
        print(json.dumps({"child_value": bench_tpu()}), flush=True)
    else:
        main()
