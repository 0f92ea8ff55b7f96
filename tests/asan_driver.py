"""Drive every native (C++) component under ASan+UBSan.

The analog of the reference's valgrind memcheck target
(``Makefile:237-248``): all seven .cpp sources are rebuilt with
``-fsanitize=address,undefined -fno-sanitize-recover=all`` and all of
align / edit distance / POA / mapper (incl. supplementary output) /
pileup featurisation / read matrices / BGZF scan+inflate (incl. the
zero-copy span assembly) / in-payload record scanning are exercised
over real workflow data plus edge cases. Any overflow, use-after-free or UB aborts the process; the
pytest wrapper (tests/test_asan.py) runs this in a subprocess with the
sanitizer runtimes preloaded.

Leak detection is off: the process hosts a full Python interpreter and
the library intentionally hands malloc'd buffers across the ctypes
boundary (freed by the caller) — LSan cannot attribute either usefully.
"""
import os
import sys

assert os.environ.get("MEDAKA_TPU_SANITIZE") == "1", \
    "run via tests/test_asan.py"

from medaka_tpu import native  # noqa: E402
from medaka_tpu.common import Region  # noqa: E402
from medaka_tpu.features import CountsFeatureEncoder  # noqa: E402
from medaka_tpu.features import pileup_counts  # noqa: E402

WORKFLOW = "/root/reference/medaka/test/data/workflow"


def main():
    bam = sys.argv[1]

    # --- align.cpp: all modes, empty-ish and mismatched inputs
    for mode in ("nw", "hw", "sw", "shw"):
        aln = native.align("ACGTACGTAC", "TTACGTACGTACTT", mode=mode)
        assert aln.cigar
    native.align("A", "T", mode="nw")
    native.align("ACGT" * 500, "TGCA" * 500, mode="sw", band=16)
    assert native.edit_distance("kitten", "sitting") == 3
    assert native.edit_distance("", "abc") == 3

    # --- poa.cpp: consensus over noisy copies + degenerate inputs
    subreads = ["ACGTACGTACGTAAATTT", "ACGTACGTACGAAATTT",
                "ACGTACCGTACGTAAATT", "AGTACGTACGTAAATTT"]
    cons = native.poa_consensus(subreads)
    assert len(cons) > 10
    native.poa_consensus(["AAAA"])
    native.poa_consensus(["A", "A", "A"])

    # --- mapper.cpp: index + primary/supplementary mapping, tiny reads
    import numpy as np
    rng = np.random.default_rng(5)
    ref = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, 30000)].tobytes().decode()
    with native.Mapper([("c", ref), ("d", ref[:5000])]) as m:
        assert m.map(ref[2000:6000]) is not None
        assert m.map("ACGT") is None  # < k-mer size
        m.map_all(ref[100:2100] + ref[20000:22000])  # chimera
        m.map_all("N" * 500)

    # --- pileup.cpp: real reads, region edges, filters
    region = Region("lambda_5kb", 0, 4970)
    for counts, positions in pileup_counts(region, bam):
        assert len(counts) == len(positions)
    enc = CountsFeatureEncoder(min_mapq=10)
    enc.bam_to_sample(bam, Region("lambda_5kb", 4000, 4970))
    enc2 = CountsFeatureEncoder(read_group="nogroup")
    enc2.bam_to_sample(bam, Region("lambda_5kb", 0, 500))

    # --- read_matrix.cpp: real reads, row reuse, caps, edges
    from medaka_tpu.features import read_alignment_matrix
    for mat, positions in read_alignment_matrix(region, bam):
        assert len(mat) == len(positions)
    read_alignment_matrix(
        Region("lambda_5kb", 4900, 4970), bam, max_reads=5,
        row_per_read=True, include_haplotype=True)

    # --- bgzf.cpp + bam_scan.cpp: scan / pooled inflate / zero-copy
    # span assembly / in-payload record walk over the real BAM
    raw = open(bam, "rb").read()
    payload, coffs, poffs, nxt = native.bgzf_inflate_range(
        raw, 0, len(raw), nthreads=3)
    assert payload.size == int(poffs[-1]) and nxt <= len(raw)
    c2, b2, i2, p2 = native.bgzf_scan_range(raw, 0, len(raw))
    out = np.empty(int(p2[-1]), np.uint8)
    native.bgzf_inflate_into(raw, c2, b2, i2, p2, out, nthreads=2)
    assert out.tobytes() == payload.tobytes()
    from medaka_tpu.io.bam import BamReader
    with BamReader(bam) as br:
        rp = br.region_payload("lambda_5kb", 100, 4800)
        assert rp is not None and rp[0].size > 0

    print("ASAN_DRIVER_OK")


if __name__ == "__main__":
    main()
