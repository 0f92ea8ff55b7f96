"""RLE tooling tests (reference ``test_rle.py``/``test_fastrle.py``)."""
import numpy as np
import pytest

from medaka_tpu.io.fastx import FastxRecord, read_fastx
from medaka_tpu.rle import (
    RLEConverter, add_extra_clipping, compress_bam, compress_seq, fastrle)


class TestRLEConverter:
    def test_basic(self):
        c = RLEConverter("AATTCCGGGG")
        assert c.compact_basecall == "ATCG"
        assert list(c.homop_length) == [2, 2, 2, 4]
        assert c.transform_coords(0, 10) == (0, 4)
        assert c.transform_coords(2, 6) == (1, 3)
        assert c.trimmed_compact(2, 6) == "TC"
        assert c.coord_compact_to_full(2) == 4

    def test_single_base_runs(self):
        c = RLEConverter("ACGT")
        assert c.compact_basecall == "ACGT"
        assert list(c.homop_length) == [1, 1, 1, 1]


class TestCompressSeq:
    def test_lengths_in_quality(self):
        rec = compress_seq(FastxRecord("x", "AAATTC"))
        assert rec.sequence == "ATC"
        # lengths 3, 2, 1 -> phred chars chr(33+3), chr(33+2), chr(33+1)
        assert rec.quality == "$#\""

    def test_long_homopolymer_capped(self):
        rec = compress_seq(FastxRecord("x", "A" * 200))
        assert rec.sequence == "A"
        assert rec.quality == chr(33 + 93)


def test_fastrle_stream(tmp_path):
    src = str(tmp_path / "in.fasta")
    with open(src, "w") as fh:
        fh.write(">r1\nAAATTC\n>r2\nGGGG\n")
    out = str(tmp_path / "out.fastq")
    fastrle(src, out)
    recs = list(read_fastx(out))
    assert [r.sequence for r in recs] == ["ATC", "G"]
    assert recs[1].quality == chr(33 + 4)


def test_add_extra_clipping():
    assert add_extra_clipping("5=", 3, 2) == "3S5=2S"
    assert add_extra_clipping("2S5=", 3, 0) == "5S5="
    assert add_extra_clipping("5=1S", 0, 2) == "5=3S"


class TestCompressBam:
    def test_round_trip(self, tmp_path):
        from medaka_tpu.io.bam import BamReader, BamRecord, write_bam
        rng = np.random.default_rng(8)
        # reference with homopolymers
        parts = []
        for _ in range(300):
            base = "ACGT"[rng.integers(0, 4)]
            parts.append(base * int(rng.integers(1, 5)))
        ref = "".join(parts)
        bam_in = str(tmp_path / "in.bam")
        recs = [BamRecord.build(
            query_name="r{}".format(i), ref_id=0, pos=0, seq=ref,
            qual=[20] * len(ref), cigar="{}=".format(len(ref)), flag=0,
            mapq=60) for i in range(2)]
        write_bam(bam_in, recs, [("ref", len(ref))])
        ref_fa = str(tmp_path / "ref.fasta")
        with open(ref_fa, "w") as fh:
            fh.write(">ref\n{}\n".format(ref))
        bam_out = str(tmp_path / "out.bam")
        compress_bam(bam_in, bam_out, ref_fa)
        from medaka_tpu.rle import RLEConverter
        conv = RLEConverter(ref)
        with BamReader(bam_out) as br:
            assert br.lengths[0] == len(conv.compact_basecall)
            out_recs = list(br.fetch("ref", 0, br.lengths[0]))
            assert len(out_recs) == 2
            for rec in out_recs:
                assert rec.query_sequence == conv.compact_basecall
                # a perfect read aligns as all matches in RLE space
                assert rec.cigarstring == "{}=".format(
                    len(conv.compact_basecall))
                # run lengths in the quality field
                assert list(rec.query_qualities) == \
                    list(np.minimum(conv.homop_length, 255))

    def test_fast5_gated(self, tmp_path):
        with pytest.raises(NotImplementedError):
            compress_bam("x.bam", "y.bam", "r.fa",
                         use_fast5_info=("dir", "summary"))
