"""Measure the torch-CPU reference baseline for bench.py's vs_baseline.

Runs the reference-equivalent compute — a torch bi-GRU 2x256 + linear
head forward at the reference inference geometry (batch 100 x 10000
columns, ``medaka/medaka.py:266-272,581``; ``torch.set_num_threads(2)``
per the reference's own threading guidance, ``README.md:332-336``) —
and reports the MEDIAN columns/s over N repeats.

bench.py deliberately does NOT re-measure this per run: a single
un-repeated forward swung 6.9k -> 19.3k cols/s between round captures,
making the recorded ratio meaningless for tracking (round-3 advisor
finding). Instead the median measured here is pinned as
``bench.TORCH_BASELINE_COLS_S``; re-run this script to refresh it and
update the constant (with the new provenance) if the host class changes.

Usage: python tests/perf/torch_baseline.py [repeats]
"""
import json
import sys
import time


def measure(repeats=5, batch=100, chunk=10000, feats=10, classes=5,
            hidden=256, threads=2):
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(threads)
    gru = torch.nn.GRU(
        feats, hidden, num_layers=2, bidirectional=True, batch_first=True)
    linear = torch.nn.Linear(2 * hidden, classes)
    x = torch.rand((batch, chunk, feats), dtype=torch.float32)
    rates = []
    with torch.inference_mode():
        # warm-up on a short slice (thread pool spin-up, allocator)
        y, _ = gru(x[:, :500])
        torch.softmax(linear(y), -1)
        for _ in range(repeats):
            t0 = time.perf_counter()
            y, _ = gru(x)
            torch.softmax(linear(y), -1)
            rates.append(batch * chunk / (time.perf_counter() - t0))
    rates.sort()
    return {
        "median_cols_per_s": round(rates[len(rates) // 2], 1),
        "all_rates": [round(r, 1) for r in rates],
        "geometry": {"batch": batch, "chunk": chunk, "threads": threads,
                     "hidden": hidden},
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print(json.dumps(measure(repeats=n)), flush=True)
