"""Build a synthetic high-identity long-read BAM for host benchmarks.

Reads are drawn from a random draft at ~96% identity (sub/ins/del mix
like nanopore data) with exact CIGARs built during simulation, so
featurization sees realistic insertion/deletion column structure
without paying for alignment.  The simulator lives in
``tests/mock_data.py`` (``create_synth_bam``) and is shared with the
large-scale featurization golden test.

Usage: python make_synth_bam.py <out.bam> [ref_mb] [depth]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mock_data import create_synth_bam  # noqa: E402


def main():
    out_bam = sys.argv[1]
    ref_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    bam, ref = create_synth_bam(out_bam, ref_mb=ref_mb, depth=depth)
    print(bam, ref)


if __name__ == "__main__":
    main()
