"""Tests for the native alignment engine and align helpers.

Mirrors the reference's ``test_align.py`` coverage: cigar trimming,
local-to-SAM conversion, chunked whole-contig alignment reconstruction.
"""
import numpy as np
import pytest

from medaka_tpu import align, native


def rand_seq(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, n)].tobytes().decode()


class TestNative:
    def test_nw_variants(self):
        assert native.align("ACGTACGT", "ACGTACGT").cigar == "8="
        # homopolymer indels have equal-score placements
        assert native.align(
            "ACGTTACGT", "ACGTACGT").cigar in ("4=1I4=", "3=1I5=")
        assert native.align(
            "ACGACGT", "ACGTACGT").cigar in ("3=1D4=", "4=1D3=")
        assert native.align("ACGAACGT", "ACGTACGT").cigar == "3=1X4="

    def test_affine_gap_preference(self):
        # one 2-base gap must beat two 1-base gaps under affine scoring
        a = native.align("AAAATTTT", "AAAACGTTTT")
        assert "2D" in a.cigar

    def test_hw_and_sw(self):
        a = native.align("TTTT", "ACGTTTTACG", mode="hw")
        assert (a.cigar, a.ref_start, a.ref_end) == ("4=", 3, 7)
        a = native.align("GGGACGTGGG", "TTTACGTTTT", mode="sw")
        assert a.cigar == "4="
        assert (a.query_start, a.query_end) == (3, 7)

    def test_shw(self):
        a = native.align("ACGT", "ACGTTTTT", mode="shw")
        assert (a.cigar, a.ref_start, a.ref_end) == ("4=", 0, 4)

    def test_banded_long(self):
        ref = rand_seq(20000, 3)
        q = list(ref)
        q[5000] = "A" if ref[5000] != "A" else "C"
        del q[15000]
        q = "".join(q)
        a = native.align(q, ref, band=64)
        assert a.cigar.count("X") == 1
        assert a.cigar.count("D") == 1

    def test_edit_distance(self):
        assert native.edit_distance("ACGT", "ACGT") == 0
        assert native.edit_distance("ACGT", "AGGT") == 1
        assert native.edit_distance("ACGT", "ACT") == 1
        assert native.edit_distance("ACGT", "TGCA", max_k=1) == -1
        long_a = rand_seq(10000, 1)
        assert native.edit_distance(long_a, long_a) == 0

    def test_poa_consensus(self):
        base = rand_seq(200, 5)
        rng = np.random.default_rng(6)
        reads = []
        for i in range(7):
            read = list(base)
            for _ in range(4):  # sprinkle errors
                p = rng.integers(0, len(read))
                op = rng.integers(0, 3)
                if op == 0:
                    read[p] = "ACGT"[rng.integers(0, 4)]
                elif op == 1 and len(read) > 10:
                    del read[p]
                else:
                    read.insert(p, "ACGT"[rng.integers(0, 4)])
            reads.append("".join(read))
        cons = native.poa_consensus(reads)
        assert native.edit_distance(cons, base) <= 4


class TestCigarHelpers:
    def test_trim_start(self):
        cigar, q_trim, r_off = align.trim_cigar("2I3=1X2=", start=True)
        assert (cigar, q_trim, r_off) == ("3=1X2=", 2, 0)
        cigar, q_trim, r_off = align.trim_cigar("1D1X3=", start=True)
        assert (cigar, q_trim, r_off) == ("3=", 1, 2)

    def test_trim_end(self):
        cigar, q_trim, r_off = align.trim_cigar("3=1X2I", start=False)
        assert (cigar, q_trim, r_off) == ("3=", 3, 0)

    def test_lengths(self):
        assert align.cigar_lengths("3=1X2I4D5S") == (11, 8)

    def test_local_to_sam(self):
        a = native.align("GGGACGTGGG", "TTTACGTTTT", mode="sw")
        rstart, cigar = align.local_to_sam(a, "GGGACGTGGG")
        assert rstart == 3
        assert cigar == "3S4=3S"


class TestChunkedAlign:
    @pytest.mark.parametrize("mode", ["NW", "HW", "HWT"])
    def test_round_trip(self, mode):
        """Chunked alignment reconstructs the query from the cigars."""
        ref = rand_seq(25000, 11)
        q = list(ref)
        q[4000] = "A" if ref[4000] != "A" else "C"
        del q[12000:12003]
        q.insert(18000, "T")
        query = "".join(q)
        recs = list(align.chunked_align(
            query, ref, "chr1", chunk_size=8000, pad=1000, mode=mode))
        assert len(recs) >= 3
        # walk the records: query pieces concatenate (with 1-base overlap)
        # back to the full query, and cigars consume consistent ref spans
        reconstructed = recs[0].query_sequence
        for prev, rec in zip(recs, recs[1:]):
            assert rec.query_sequence[0] == reconstructed[-1]  # 1-match overlap
            reconstructed += rec.query_sequence[1:]
        assert reconstructed == query
        for rec in recs:
            qlen, _ = align.cigar_lengths(rec.cigarstring)
            assert qlen == len(rec.query_sequence)
        # edits detected somewhere across the chunks
        assert sum(int(rec.tags["NM"]) for rec in recs) >= 4
