"""Build a synthetic high-identity long-read BAM for host benchmarks.

Reads are drawn from a random draft at ~96% identity (sub/ins/del mix
like nanopore data) with exact-ish CIGARs built during simulation, so
featurization sees realistic insertion/deletion column structure
without paying for alignment.

Usage: python make_synth_bam.py <out.bam> [ref_mb] [depth]
"""
import sys

import numpy as np

from medaka_tpu.io.bam import BamRecord, write_bam
from medaka_tpu.io.fastx import FastaWriter

BASES = np.frombuffer(b"ACGT", np.uint8)


def simulate_read(ref_arr, start, length, rng):
    """Mutate ref[start:start+length]; returns (seq, cigar string)."""
    piece = ref_arr[start:start + length]
    # per-base event draw: 0 match, 1 sub, 2 ins, 3 del
    ev = rng.choice(4, size=len(piece), p=[0.96, 0.02, 0.01, 0.01])
    out = np.empty(len(piece) + (ev == 2).sum(), dtype=np.uint8)
    cig_ops = []
    o = 0
    run_len = 0
    run_op = "="

    def flush(op, ln):
        if ln:
            cig_ops.append("{}{}".format(ln, op))

    for i, e in enumerate(ev):
        if e == 0 or e == 1:
            b = piece[i]
            if e == 1:
                b = BASES[(np.searchsorted(BASES, b) + rng.integers(1, 4))
                          % 4]
            op = "=" if e == 0 else "X"
            out[o] = b
            o += 1
        elif e == 2:  # insertion then the base itself
            out[o] = BASES[rng.integers(0, 4)]
            o += 1
            if run_op == "I":
                run_len += 1
            else:
                flush(run_op, run_len)
                run_op, run_len = "I", 1
            # the reference base still matches
            out[o] = piece[i]
            o += 1
            flush(run_op, run_len)
            run_op, run_len = "=", 1
            continue
        else:  # deletion
            op = "D"
        if op == run_op:
            run_len += 1
        else:
            flush(run_op, run_len)
            run_op, run_len = op, 1
    flush(run_op, run_len)
    return out[:o].tobytes().decode(), "".join(cig_ops)


def main():
    out_bam = sys.argv[1]
    ref_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    rng = np.random.default_rng(42)
    ref_len = int(ref_mb * 1e6)
    ref_arr = BASES[rng.integers(0, 4, ref_len)]
    with FastaWriter(out_bam + ".ref.fasta") as fw:
        fw.write("synth", ref_arr.tobytes().decode())

    read_len = 20000
    n_reads = int(ref_len * depth / read_len)
    records = []
    for i in range(n_reads):
        start = int(rng.integers(0, ref_len - read_len))
        seq, cigar = simulate_read(ref_arr, start, read_len, rng)
        records.append(BamRecord.build(
            query_name="r{}".format(i), ref_id=0, pos=start, seq=seq,
            qual=[20] * len(seq), cigar=cigar,
            flag=16 if i % 2 else 0, mapq=60))
    write_bam(out_bam, records, [("synth", ref_len)])
    print(out_bam, "reads:", n_reads, "ref:", ref_len)


if __name__ == "__main__":
    main()
