"""Tests for the self-contained BGZF/BAM/FASTA IO stack."""
import gzip
import os

import numpy as np
import pytest

from medaka_tpu.io.bam import (
    BaiIndex, BamReader, BamRecord, reg2bin, reg2bins, write_bam)
from medaka_tpu.io.bgzf import BGZF_EOF, BgzfReader, BgzfWriter, is_bgzf
from medaka_tpu.io.fastx import (
    FastaReader, FastaWriter, FastqWriter, read_fastx, write_fai)

from mock_data import CALLS, REF_NAME, REF_SEQ, create_simple_bam

REF_DATA = "/root/reference/medaka/test/data"


class TestBgzf:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.bgz")
        payload = os.urandom(300000) + b"tail"
        with BgzfWriter(path) as w:
            w.write(payload[:1000])
            w.write(payload[1000:])
        assert is_bgzf(path)
        with BgzfReader(path) as r:
            assert r.read(len(payload) + 10) == payload
        # gzip interoperability
        assert gzip.open(path, "rb").read() == payload

    def test_virtual_offsets(self, tmp_path):
        path = str(tmp_path / "x.bgz")
        with BgzfWriter(path) as w:
            w.write(b"a" * 100)
            w.flush_block()
            vo = w.tell_virtual()
            w.write(b"b" * 50)
        r = BgzfReader(path)
        r.seek_virtual(vo)
        assert r.read(50) == b"b" * 50
        r.seek_virtual(0)
        assert r.read(3) == b"aaa"

    def test_eof_marker(self, tmp_path):
        path = str(tmp_path / "x.bgz")
        with BgzfWriter(path) as w:
            w.write(b"data")
        raw = open(path, "rb").read()
        assert raw.endswith(BGZF_EOF)

    def test_native_prefetch_parity(self, tmp_path):
        # the multi-threaded native inflate path must deliver the same
        # bytes, with the same virtual-offset semantics, as the serial
        # zlib path it accelerates
        path = str(tmp_path / "x.bgz")
        rng = np.random.default_rng(0)
        payload = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
        vo = None
        with BgzfWriter(path) as w:
            w.write(payload[:400000])
            w.flush_block()
            vo = w.tell_virtual()
            w.write(payload[400000:])

        with BgzfReader(path) as serial:
            serial._hint_end = -1  # keep the on-demand path serial
            want_all = serial.read(len(payload) + 1)
        assert want_all == payload

        with BgzfReader(path) as fast:
            assert fast.read_all_from(0) == payload
            assert fast._cache, "native prefetch was not exercised"
            # window smaller than the file: windows must chain seamlessly
            fast.PREFETCH_WINDOW = 1 << 16
            fast.prefetch(0, len(payload) << 16)
            fast.seek_virtual(0)
            assert fast.read(len(payload) + 1) == payload
            # an index-style jump into the hinted range
            fast.seek_virtual(vo)
            assert fast.read(64) == payload[400000:400064]


    def test_corrupt_isize_rejected_cleanly(self, tmp_path):
        """A member whose ISIZE footer exceeds the BGZF 64 KiB cap (or
        goes negative through the int32 cast) must fail the native scan
        with a clean error, not corrupt memory in the inflate pool."""
        import pytest

        from medaka_tpu import native

        path = str(tmp_path / "x.bgz")
        with BgzfWriter(path) as w:
            w.write(b"a" * 1000)
        raw = bytearray(open(path, "rb").read())
        # first member's ISIZE is the 4 bytes before the second member;
        # locate it via the BC subfield (bsize = BC + 1)
        bsize = int.from_bytes(raw[16:18], "little") + 1
        for evil in (0x80000000, 0x00020000):  # negative via cast; >64KiB
            raw[bsize - 4:bsize] = int(evil).to_bytes(4, "little")
            open(path, "wb").write(bytes(raw))
            with pytest.raises(native.NativeBuildError,
                               match="malformed BGZF"):
                native.bgzf_inflate_range(bytes(raw), 0, len(raw))

    def test_scan_then_inflate_into_matches_range(self, tmp_path):
        """The zero-copy span assembly (scan every span, size one
        buffer, inflate each span into place) must be byte-identical to
        per-span ``bgzf_inflate_range`` + concatenate — the path
        ``BamReader.region_payload`` uses for multi-chunk regions."""
        import numpy as np

        from medaka_tpu import native

        path = str(tmp_path / "x.bgz")
        rng = np.random.default_rng(7)
        payload = rng.integers(0, 256, 300000, dtype=np.uint8).tobytes()
        with BgzfWriter(path) as w:
            for off in range(0, len(payload), 50000):
                w.write(payload[off:off + 50000])
                w.flush_block()
        raw = open(path, "rb").read()
        # two disjoint spans: members [0, mid) and [mid, end)
        coffs_all, _, _, _ = native.bgzf_scan_range(raw, 0, len(raw))
        mid = int(coffs_all[len(coffs_all) // 2])
        spans = [(0, mid), (mid, len(raw))]
        scans, total = [], 0
        for off, lim in spans:
            coffs, bsizes, isizes, poffs = native.bgzf_scan_range(
                raw, off, lim)
            scans.append((coffs, bsizes, isizes, poffs, total))
            total += int(poffs[-1])
        out = np.empty(total, np.uint8)
        for coffs, bsizes, isizes, poffs, base in scans:
            native.bgzf_inflate_into(
                raw, coffs, bsizes, isizes, poffs, out, out_base=base)
        want = np.concatenate([
            native.bgzf_inflate_range(raw, off, lim)[0]
            for off, lim in spans])
        assert np.array_equal(out, want)
        assert out.tobytes() == payload
        # overflow guard: a too-small target must be rejected
        import pytest
        small = np.empty(total - 1, np.uint8)
        coffs, bsizes, isizes, poffs, base = scans[-1]
        with pytest.raises(ValueError, match="overflows"):
            native.bgzf_inflate_into(
                raw, coffs, bsizes, isizes, poffs, small, out_base=base)

    def test_close_drops_block_cache(self, tmp_path):
        path = str(tmp_path / "x.bgz")
        with BgzfWriter(path) as w:
            w.write(b"x" * 100000)
        r = BgzfReader(path)
        assert r.read_all_from(0)
        assert r._cache
        r.close()
        assert not r._cache
        r.seek_virtual(0)
        assert r.read(10) == b""  # EOF, not stale cached bytes


class TestBamRecord:
    def test_build_and_parse(self):
        rec = BamRecord.build(
            query_name="read1", ref_id=0, pos=10, seq="ACGTN",
            qual=[30, 20, 10, 5, 2], cigar="3M1I1M", flag=16, mapq=42,
            tags=dict(XX=7, YY="hello", WL=np.array([1.5, 2.5], np.float32),
                      mv=np.array([1, 0, 1], np.int8)))
        assert rec.query_name == "read1"
        assert rec.pos == 10
        assert rec.mapq == 42
        assert rec.is_reverse
        assert rec.query_sequence == "ACGTN"
        assert list(rec.query_qualities) == [30, 20, 10, 5, 2]
        assert rec.cigarstring == "3M1I1M"
        assert rec.reference_length == 4
        assert rec.reference_end == 14
        assert rec.tags["XX"] == 7
        assert rec.tags["YY"] == "hello"
        np.testing.assert_allclose(rec.tags["WL"], [1.5, 2.5])
        np.testing.assert_array_equal(rec.tags["mv"], [1, 0, 1])

    def test_aligned_pairs(self):
        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="ACATAGATG",
            qual=[1] * 9, cigar="4=1I4=")
        pairs = rec.get_aligned_pairs()
        assert pairs[:6] == [(0, 0), (1, 1), (2, 2), (3, 3), (4, None), (5, 4)]

    def test_missing_qual(self):
        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="ACGT", qual=None,
            cigar="4M")
        assert rec.query_qualities is None


class TestBamFile:
    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "mock.bam")
        create_simple_bam(path)
        with BamReader(path) as reader:
            assert reader.references == [REF_NAME]
            assert reader.lengths == [len(REF_SEQ)]
            records = list(reader)
        assert len(records) == len(CALLS)
        names = {r.query_name for r in records}
        assert names == {c[0] for c in CALLS}
        by_name = {r.query_name: r for r in records}
        assert by_name["basecall_2"].cigarstring == "3=1D4="
        assert by_name["basecall_3"].is_reverse
        assert by_name["basecall_1"].tags["DT"] == "r9"

    def test_fetch_with_index(self, tmp_path):
        path = str(tmp_path / "mock.bam")
        create_simple_bam(path)
        assert os.path.exists(path + ".bai")
        with BamReader(path) as reader:
            recs = list(reader.fetch(REF_NAME, 0, 8))
            assert len(recs) == len(CALLS)
            recs = list(reader.fetch(REF_NAME, 100, 200))
            assert recs == []

    def test_real_reference_bam(self):
        # parse a real (htslib-written) BAM from the reference test data
        path = os.path.join(REF_DATA, "test_annotate.bam")
        with BamReader(path) as reader:
            assert len(reader.references) >= 1
            n = 0
            span_checked = False
            for rec in reader:
                n += 1
                if rec.query_sequence and not rec.is_unmapped:
                    assert rec.query_length == len(rec.query_sequence)
                    span_checked = True
            assert n > 0
            assert span_checked

    def test_real_bam_fetch_matches_scan(self):
        path = os.path.join(REF_DATA, "test_annotate.bam")
        with BamReader(path) as reader:
            ref = reader.references[0]
            first = next(iter(reader))
            start = first.pos + 10
            end = start + 2000
            via_index = [
                r.query_name for r in reader.fetch(ref, start, end)]
            via_scan = [
                r.query_name for r in reader
                if (r.ref_id == reader.get_tid(ref) and not r.is_unmapped and
                    r.pos < end and r.reference_end > start)]
        assert via_index == via_scan
        assert len(via_index) > 0

    def test_our_index_matches_htslib_index(self, tmp_path):
        # re-index a real BAM with our BAI builder; region queries must agree
        src = os.path.join(REF_DATA, "test_annotate.bam")
        path = str(tmp_path / "copy.bam")
        with open(src, "rb") as f, open(path, "wb") as g:
            g.write(f.read())
        BaiIndex.build(path)
        with BamReader(src) as r1, BamReader(path) as r2:
            ref = r1.references[0]
            for start, end in [(0, 1000), (5000, 8000), (0, r1.lengths[0])]:
                a = [x.query_name for x in r1.fetch(ref, start, end)]
                b = [x.query_name for x in r2.fetch(ref, start, end)]
                assert a == b


class TestBinning:
    def test_reg2bin_windows(self):
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585
        assert reg2bin(1 << 14, (1 << 14) + 5) == 4682

    def test_reg2bins_contains_reg2bin(self):
        for beg, end in [(0, 100), (100000, 150000), (1 << 20, (1 << 20) + 5)]:
            assert reg2bin(beg, end) in reg2bins(beg, end)


class TestFastx:
    def test_fasta_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.fasta")
        with FastaWriter(path, width=10) as w:
            w.write("seq1", "ACGT" * 10)
            w.write("seq2", "GGCC", comment="a comment")
        recs = list(read_fastx(path))
        assert [r.name for r in recs] == ["seq1", "seq2"]
        assert recs[0].sequence == "ACGT" * 10
        assert recs[1].comment == "a comment"
        fa = FastaReader(path)
        assert fa.fetch("seq1", 2, 6) == "GTAC"
        assert fa.references == ["seq1", "seq2"]

    def test_fastq_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.fastq")
        with FastqWriter(path) as w:
            w.write("r1", "ACGT", "IIII")
            w.write("r2", "GG", "!!", comment="c")
        recs = list(read_fastx(path))
        assert recs[0].quality == "IIII"
        assert recs[1].comment == "c"

    def test_gzipped_fastq(self):
        path = os.path.join(REF_DATA, "workflow", "reads.fq.gz")
        n = 0
        for rec in read_fastx(path):
            assert len(rec.sequence) == len(rec.quality)
            n += 1
            if n > 50:
                break
        assert n > 50

    def test_real_fasta(self):
        path = os.path.join(REF_DATA, "test_ref.fasta")
        fa = FastaReader(path)
        assert len(fa.references) >= 1
        assert fa.lengths[0] > 0

    def test_write_fai(self, tmp_path):
        path = str(tmp_path / "x.fasta")
        with FastaWriter(path, width=10) as w:
            w.write("seq1", "ACGT" * 10)
        fai = write_fai(path)
        line = open(fai).read().split("\t")
        assert line[0] == "seq1"
        assert int(line[1]) == 40


class TestAuxTagFidelity:
    def test_record_with_tag_preserves_other_tag_types(self):
        """Untouched aux tags keep their exact bytes and type codes."""
        from medaka_tpu.io.bam import BamRecord, record_with_tag, encode_tags
        import numpy as np

        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="ACGT", qual=[20] * 4,
            cigar="4=", flag=0, mapq=60)
        # hand-build aux: an 'A' char tag and a compact 'c' int tag
        aux = b"XAAx" + b"XCc" + bytes([250 & 0xFF])  # c = -6
        rec = BamRecord(rec.raw + aux)
        out = record_with_tag(rec, "ZZ", 7)
        assert out.tags["XA"] == "x" and out.tags["XC"] == -6
        assert out.tags["ZZ"] == 7
        # byte-level: original aux block kept verbatim
        assert aux in out.raw

    def test_record_with_tag_replaces_existing(self):
        from medaka_tpu.io.bam import BamRecord, record_with_tag

        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="ACGT", qual=[20] * 4,
            cigar="4=", flag=0, mapq=60, tags={"DT": "r9", "HP": 1})
        out = record_with_tag(rec, "DT", "r10")
        assert out.tags["DT"] == "r10" and out.tags["HP"] == 1
        assert list(out.tags).count("DT") == 1

    def test_encode_large_ints_and_unsigned_arrays(self):
        from medaka_tpu.io.bam import BamError, BamRecord, encode_tags
        import numpy as np
        import pytest as _pytest

        # uint32-range scalar survives a round trip
        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="A", qual=[1],
            cigar="1=", flag=0, mapq=0, tags={"XL": 3_000_000_000})
        assert rec.tags["XL"] == 3_000_000_000
        # uint32-range B array survives (was silently wrapped)
        rec = BamRecord.build(
            query_name="r", ref_id=0, pos=0, seq="A", qual=[1],
            cigar="1=", flag=0, mapq=0,
            tags={"XB": np.array([4_000_000_000], dtype=np.uint32)})
        assert int(rec.tags["XB"][0]) == 4_000_000_000
        with _pytest.raises(BamError):
            encode_tags({"XH": 1 << 40})


def test_wrapped_fastq_parses(tmp_path):
    """Multi-line FASTQ records (spec-legal) parse like pysam."""
    from medaka_tpu.io.fastx import read_fastx

    p = tmp_path / "wrapped.fastq"
    p.write_text(
        "@r1 some comment\nACGT\nACGT\n+\n!!!!\n@!!!\n"
        "@r2\nTTTT\n+\nIIII\n")
    recs = list(read_fastx(str(p)))
    assert recs[0].name == "r1"
    assert recs[0].sequence == "ACGTACGT"
    assert recs[0].quality == "!!!!@!!!"
    assert recs[1].sequence == "TTTT"


def test_cg_tag_long_cigar_expansion():
    """BAM long-cigar convention: placeholder <l_seq>S<ref_len>N with
    the real cigar in the CG tag (SAM spec 4.2.2) expands
    transparently; the raw-kernel featurizer falls back to numpy."""
    import numpy as np
    import struct
    from medaka_tpu.io.bam import BamRecord, C_EQ, C_N, C_S

    seq = "ACGTACGT"
    real_cigar = np.array(
        [(len(seq) << 4) | C_EQ], dtype=np.uint32)  # 8=
    rec = BamRecord.build(
        query_name="long", ref_id=0, pos=10, seq=seq,
        qual=[20] * len(seq),
        cigar="{}S{}N".format(len(seq), len(seq)), flag=0, mapq=60,
        tags={"CG": real_cigar})
    assert rec.has_long_cigar
    np.testing.assert_array_equal(
        rec.cigar_array, [[C_EQ, len(seq)]])
    assert rec.cigarstring == "8="
    # reference length comes from the placeholder N (by design)
    assert rec.reference_length == len(seq)
