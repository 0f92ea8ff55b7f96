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

    def test_fast5_tags(self, tmp_path):
        """WL/WK Weibull tags from a mock fast5 land on the output.

        Mirrors the reference mock-fast5 arrangement
        (``test_rle.py`` + ``mock_data.py:133-172``): tables are
        stored in read orientation and flipped back for reverse
        alignments, so the output tags must equal the ref-orientation
        mock values.
        """
        import mock_data
        from medaka_tpu.io.bam import BamReader

        bam_in = str(tmp_path / "in.bam")
        mock_data.create_simple_bam(bam_in)
        ref_fa = str(tmp_path / "ref.fasta")
        with open(ref_fa, "w") as fh:
            fh.write(">{}\n{}\n".format(
                mock_data.REF_NAME, mock_data.REF_SEQ))
        fast5 = mock_data.create_mock_fast5(str(tmp_path / "mock.fast5"))
        summary = mock_data.create_mock_summary(
            str(tmp_path / "summary.txt"), "mock.fast5")

        bam_out = str(tmp_path / "out.bam")
        compress_bam(bam_in, bam_out, ref_fa,
                     use_fast5_info=(str(tmp_path), summary))

        expected = {name: tags for name, _, _, _, _, _, tags
                    in mock_data.CALLS}
        with BamReader(bam_out) as br:
            recs = {r.query_name: r
                    for r in br.fetch(mock_data.REF_NAME, 0, br.lengths[0])}
        assert set(recs) == set(expected)
        for name, rec in recs.items():
            # mock reads are already homopolymer-compact, so the RLE
            # parameters map 1:1 onto the stored sequence
            np.testing.assert_allclose(
                rec.tags["WL"], expected[name]["WL"], rtol=1e-6)
            np.testing.assert_allclose(
                rec.tags["WK"], expected[name]["WK"], rtol=1e-6)

    def test_compress_bam_pins_basecall_000(self, tmp_path):
        """Re-basecalled fast5s: compress_bam reads Basecall_1D_000.

        The reference's ``get_rl_params`` hardcodes ``_000``
        (``rle.py:78-91``); only its rlebam worker takes the latest
        analysis. A decoy ``_001`` group with a different basecall
        must not be consulted by the compress_bam path.
        """
        import h5py
        import mock_data

        from medaka_tpu.io.fast5 import Fast5Index

        fast5 = mock_data.create_mock_fast5(str(tmp_path / "mock.fast5"))
        # add a re-basecall analysis with garbage content
        with h5py.File(fast5, "a") as h5:
            name = mock_data.CALLS[0][0]
            arr = np.fromiter(
                zip((c.encode() for c in "AC"), [9.0, 9.0], [9.0, 9.0]),
                dtype=[("base", "S1"), ("shape", ">f4"),
                       ("scale", ">f4")])
            h5.create_dataset(
                "read_{}/Analyses/Basecall_1D_001/"
                "BaseCalled_template/RunlengthBasecall".format(name),
                data=arr)
        summary = mock_data.create_mock_summary(
            str(tmp_path / "summary.txt"), "mock.fast5")
        idx = Fast5Index(str(tmp_path), summary)
        call, shape, scale = idx.get_rl_params(mock_data.CALLS[0][0])
        assert call != "AC" and len(call) > 2  # the _000 table

    def test_fast5_missing_read_skipped(self, tmp_path):
        """Reads absent from the summary are dropped with a warning."""
        import mock_data

        bam_in = str(tmp_path / "in.bam")
        mock_data.create_simple_bam(bam_in)
        ref_fa = str(tmp_path / "ref.fasta")
        with open(ref_fa, "w") as fh:
            fh.write(">{}\n{}\n".format(
                mock_data.REF_NAME, mock_data.REF_SEQ))
        fast5 = mock_data.create_mock_fast5(str(tmp_path / "mock.fast5"))
        summary = str(tmp_path / "summary.txt")
        with open(summary, "w") as fh:
            fh.write("read_id\tfilename\n")
            fh.write("basecall_1\tmock.fast5\n")

        from medaka_tpu.io.bam import BamReader
        bam_out = str(tmp_path / "out.bam")
        compress_bam(bam_in, bam_out, ref_fa,
                     use_fast5_info=(str(tmp_path), summary))
        with BamReader(bam_out) as br:
            recs = list(br.fetch(mock_data.REF_NAME, 0, br.lengths[0]))
        assert [r.query_name for r in recs] == ["basecall_1"]


class TestFast5Reader:
    def test_latest_analysis_and_layouts(self, tmp_path):
        import h5py

        from medaka_tpu.io import fast5 as f5

        path = str(tmp_path / "multi.fast5")
        arr = np.fromiter(
            zip([b"A", b"C", b"G"], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
            dtype=[("base", "S1"), ("shape", ">f4"), ("scale", ">f4")])
        with h5py.File(path, "w") as h5:
            # two analyses; the higher-numbered one must win
            h5.create_dataset(
                "read_r1/Analyses/Basecall_1D_000/BaseCalled_template/"
                "RunlengthBasecall", data=arr[:1])
            h5.create_dataset(
                "read_r1/Analyses/Basecall_1D_001/BaseCalled_template/"
                "RunlengthBasecall", data=arr)
        call, shape, scale = f5.get_runlength_basecall(path, "r1")
        assert call == "ACG"
        np.testing.assert_allclose(shape, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(scale, [4.0, 5.0, 6.0])

        # single-read layout: Analyses at the file root
        single = str(tmp_path / "single.fast5")
        with h5py.File(single, "w") as h5:
            h5.create_dataset(
                "Analyses/Basecall_1D_000/BaseCalled_template/"
                "RunlengthBasecall", data=arr)
        call, _, _ = f5.get_runlength_basecall(single, "whatever")
        assert call == "ACG"

        with pytest.raises(KeyError):
            f5.get_runlength_basecall(path, "missing_read")


class TestRlebam:
    def test_sam_stream_decorated(self, tmp_path):
        """The rlebam worker appends WL/WK tags to SAM lines.

        Reference behaviour (``rle.py:296-363``): WL carries the
        table's scale column and WK its shape column (the transpose of
        the compress_bam assignment), flipped for reverse reads;
        header lines pass through untouched.
        """
        import io as _io

        import mock_data
        from medaka_tpu import rle as rle_mod

        fast5 = mock_data.create_mock_fast5(str(tmp_path / "mock.fast5"))
        index = str(tmp_path / "index.tsv")
        with open(index, "w") as fh:
            for name, *_ in mock_data.CALLS:
                fh.write("{}\t{}\n".format(name, fast5))

        sam_lines = ["@HD\tVN:1.6\n"]
        for name, seq, quals, cigar, mapq, flag, _tags in mock_data.CALLS:
            sam_lines.append(
                "{}\t{}\tref\t1\t{}\t{}\t*\t0\t0\t{}\t{}\n".format(
                    name, flag, mapq, cigar, seq,
                    "".join(chr(q + 33) for q in quals)))
        out = _io.StringIO()
        rle_mod.rlebam(index, workers=2, input_sam=sam_lines, output=out)
        lines = out.getvalue().splitlines()
        assert lines[0] == "@HD\tVN:1.6"
        for line, (name, _, _, _, _, flag, tags) in zip(
                lines[1:], mock_data.CALLS):
            fields = line.split("\t")
            assert fields[0] == name
            wl = [x for x in fields if x.startswith("WL:B:f,")]
            wk = [x for x in fields if x.startswith("WK:B:f,")]
            assert len(wl) == 1 and len(wk) == 1
            # rlebam's WL <- scale (mock WK), WK <- shape (mock WL);
            # the in-fast5 flip and the is_rev flip cancel out
            wl_vals = [float(x) for x in wl[0][7:].split(",")]
            wk_vals = [float(x) for x in wk[0][7:].split(",")]
            np.testing.assert_allclose(wl_vals, tags["WK"], rtol=1e-6)
            np.testing.assert_allclose(wk_vals, tags["WL"], rtol=1e-6)


def test_fastrle_splits_long_runs(tmp_path):
    """Runs longer than block_size split into multiple blocks
    (reference ``fastrle.c:19``); capping would drop sequence."""
    import io

    fx = tmp_path / "long.fasta"
    fx.write_text(">r\n" + "A" * 200 + "C" + "\n")
    out = io.StringIO()
    fastrle(str(fx), out, block_size=94)
    lines = out.getvalue().splitlines()
    seq, qual = lines[1], lines[3]
    assert seq == "AAAC"
    runs = [ord(c) - 33 for c in qual]
    assert runs == [94, 94, 12, 1]
    assert sum(runs[:3]) == 200
