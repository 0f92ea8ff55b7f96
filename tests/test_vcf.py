"""Tests for the VCF toolkit (parity: reference test_vcf.py behaviours)."""
import os

import pytest

from medaka_tpu.vcf import (
    GenotypeData, MetaInfo, Variant, VCFReader, VCFWriter, classify_variant,
    parse_string_to_tags, parse_tags_to_string)

REF_DATA = "/root/reference/medaka/test/data"


class TestTags:
    def test_roundtrip(self):
        tags = {"DP": 10, "AF": 0.5, "DB": True}
        s = parse_tags_to_string(tags)
        back = parse_string_to_tags(s)
        assert back["DP"] == 10
        assert back["AF"] == 0.5
        assert back["DB"] is True


class TestVariant:
    def test_basic(self):
        v = Variant("chr1", 9, "a", alt="C", qual="12.5",
                    genotype_data={"GT": "1/1", "GQ": "12"})
        assert v.ref == "A"
        assert v.alt == ["C"]
        assert v.qual == 12.5
        assert v.gt == (1, 1)
        assert v.phased is False
        assert v.alleles == ("C", "C")

    def test_from_text(self):
        line = ("chr1\t10\t.\tA\tC,G\t12.5\tPASS\tDP=10\tGT:GQ\t1/2:12")
        v = Variant.from_text(line)
        assert v.pos == 9  # 0-based internally
        assert v.alt == ["C", "G"]
        assert v.info["DP"] == 10
        assert v.gt == (1, 2)

    def test_trim_parsimony(self):
        v = Variant("c", 5, "CAC", alt=["CGC"])
        t = v.trim()
        assert (t.pos, t.ref, t.alt) == (6, "A", ["G"])

    def test_normalize_left_align(self):
        #  ref GGGCACACAC, del of AC: GCACACAC -> left aligns to pos 2
        ref = "GGGCACACAC"
        v = Variant("c", 5, "ACAC", alt=["AC"])
        n = v.normalize(reference=ref)
        # matches the reference's trim_end_and_align output exactly
        assert (n.pos, n.ref, n.alt) == (4, "AAC", ["A"])

    def test_normalize_identity(self):
        v = Variant("c", 5, "A", alt=["A"])
        assert v.normalize(reference="AAAAAAA") is v

    def test_split_haplotypes(self):
        v = Variant("c", 5, "A", alt=["C", "G"],
                    genotype_data={"GT": "1|2"})
        parts = v.split_haplotypes()
        assert len(parts) == 2
        assert parts[0][1].alt == ["C"]
        assert parts[1][1].alt == ["G"]
        v0 = Variant("c", 5, "A", alt=["C"], genotype_data={"GT": "0/1"})
        parts = v0.split_haplotypes()
        assert parts[0][1] is None
        assert parts[1][1].alt == ["C"]


class TestClassify:
    @pytest.mark.parametrize("ref,alt,expected", [
        ("A", "C", "snp"),
        ("AT", "CG", "mnp"),
        ("A", "AC", "sni"),
        ("A", "ACGT", "mni"),
        ("AC", "A", "snd"),
        ("ACGT", "A", "mnd"),
    ])
    def test_classes(self, ref, alt, expected):
        v = Variant("c", 0, ref, alt=[alt])
        assert classify_variant(v) == expected


class TestReaderWriter:
    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "out.vcf")
        variants = [
            Variant("chr1", 4, "A", alt="C", qual="10.0",
                    info={"DP": 7},
                    genotype_data={"GT": "1/1", "GQ": "10"}),
            Variant("chr1", 9, "AT", alt="A", qual="5.5",
                    genotype_data={"GT": "0/1", "GQ": "5"}),
            Variant("chr2", 1, "G", alt="T", qual="7.0",
                    genotype_data={"GT": "1/1", "GQ": "7"})]
        meta = [MetaInfo("INFO", "DP", 1, "Integer", "depth")]
        with VCFWriter(path, contigs=["chr1", "chr2"],
                       meta_info=meta) as writer:
            writer.write_variants(variants)
        reader = VCFReader(path)
        back = list(reader.fetch())
        assert len(back) == 3
        assert back[0].pos == 4
        assert back[0].info["DP"] == 7
        assert back[1].ref == "AT"
        assert any("contig=<ID=chr1>" in m for m in reader.meta)

    def test_fetch_region(self, tmp_path):
        path = str(tmp_path / "out.vcf")
        variants = [
            Variant("chr1", p, "A", alt="C",
                    genotype_data={"GT": "1/1"}) for p in range(0, 100, 10)]
        with VCFWriter(path) as writer:
            writer.write_variants(variants)
        reader = VCFReader(path)
        got = list(reader.fetch("chr1", 25, 55))
        assert [v.pos for v in got] == [30, 40, 50]

    def test_interleaved_chrom_blocks_stream(self, tmp_path):
        """Concatenated per-region VCFs (chrom recurs) must parse.

        Order tracking resets when the chromosome changes: chr1:100,
        chr2:50, chr1:50 is fine; chr1:100 then chr1:50 inside one run
        is not.
        """
        ok = tmp_path / "blocks.vcf"
        ok.write_text(
            "##fileformat=VCFv4.1\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "chr1\t100\t.\tA\tC\t.\t.\t.\n"
            "chr2\t50\t.\tA\tC\t.\t.\t.\n"
            "chr1\t50\t.\tA\tC\t.\t.\t.\n")
        got = list(VCFReader(str(ok), cache=False).fetch())
        assert [(v.chrom, v.pos) for v in got] == [
            ("chr1", 99), ("chr2", 49), ("chr1", 49)]
        bad = tmp_path / "bad.vcf"
        bad.write_text(
            "##fileformat=VCFv4.1\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "chr1\t100\t.\tA\tC\t.\t.\t.\n"
            "chr1\t50\t.\tA\tC\t.\t.\t.\n")
        with pytest.raises(IOError, match="position-sorted"):
            list(VCFReader(str(bad), cache=False).fetch())

    def test_multi_filter_roundtrip(self, tmp_path):
        """FILTER lists serialise ';'-separated per the VCF spec."""
        path = str(tmp_path / "filt.vcf")
        v = Variant("chr1", 5, "A", alt="C", filt="q10;q20",
                    genotype_data={"GT": "1/1"})
        assert v.filt == ["q10", "q20"]
        with VCFWriter(path) as writer:
            writer.write_variant(v)
        line = [ln for ln in open(path) if not ln.startswith("#")][0]
        assert line.split("\t")[6] == "q10;q20"
        back = list(VCFReader(path, cache=False).fetch())[0]
        assert back.filt == ["q10", "q20"]

    def test_real_fixture(self):
        reader = VCFReader(os.path.join(REF_DATA, "test1.vcf"))
        variants = list(reader.fetch())
        assert len(variants) > 0
        for v in variants:
            assert v.pos >= 0
            assert v.ref
        hap = VCFReader(os.path.join(REF_DATA, "test_hap1.vcf"))
        assert len(list(hap.fetch())) > 0


class TestHaploid2Diploid:
    REF_DATA = "/root/reference/medaka/test/data"

    def test_golden_merge(self):
        """Exact parity with the reference's test_merged.vcf fixture."""
        import os
        from medaka_tpu.vcf import Haploid2DiploidConverter, VCFReader
        c = Haploid2DiploidConverter(
            os.path.join(self.REF_DATA, "test_hap1.vcf"),
            os.path.join(self.REF_DATA, "test_hap2.vcf"),
            os.path.join(self.REF_DATA, "test_ref.fasta"),
            only_overlapping=True, discard_phase=False,
            detailed_info=True)
        got = list(c.variants())
        want = list(VCFReader(
            os.path.join(self.REF_DATA, "test_merged.vcf"),
            cache=False).fetch())
        assert len(got) == len(want) == 283
        for e, f in zip(want, got):
            for key in ("chrom", "pos", "ref", "alt", "info_string",
                        "gt", "phased"):
                assert getattr(e, key) == getattr(f, key), (e.pos, key)
        assert len(c.meta_info) == 10

    def test_split_then_remerge(self, tmp_path):
        """diploid -> 2x haploid -> diploid keeps genotypes."""
        import os
        import shutil
        from medaka_tpu.vcf import split_variants, VCFReader
        src = os.path.join(self.REF_DATA, "test_merged.vcf")
        work = str(tmp_path / "merged.vcf")
        shutil.copy(src, work)
        h1, h2 = sorted(split_variants(work))
        n1 = len(list(VCFReader(h1, cache=False).fetch()))
        n2 = len(list(VCFReader(h2, cache=False).fetch()))
        assert n1 > 100 and n2 > 100

    def test_split_mnp(self):
        from medaka_tpu.vcf import split_mnp
        v = Variant(
            "c", 10, "ACG", ["TCA"], genotype_data={"GT": "0/1"})
        parts = split_mnp(v)
        assert [p.pos for p in parts] == [10, 11, 12]
        assert [p.ref for p in parts] == ["A", "C", "G"]
        # middle base matches ref: alt == ref handled by GT rewrite
        assert parts[1].genotype_data["GT"] in ("0/0", "0/1")

    def test_homozygous_regions(self, tmp_path, monkeypatch):
        import os
        from medaka_tpu.vcf import VCFWriter, get_homozygous_regions
        path = str(tmp_path / "dip.vcf")
        variants = [
            Variant("c", 100, "A", ["T"], qual=9,
                    genotype_data={"GT": "0/1"}),
            Variant("c", 5200, "G", ["C"], qual=9,
                    genotype_data={"GT": "1/1"}),
            Variant("c", 9000, "G", ["C"], qual=9,
                    genotype_data={"GT": "0/1"})]
        with VCFWriter(path, contigs=["c,length=20000"]) as w:
            w.write_variants(variants, sort=True)
        monkeypatch.chdir(tmp_path)
        homo, hetero = get_homozygous_regions(
            path, "c:0-20000", min_len=2000)
        assert any(r.start == 100 and r.end == 9000 for r in homo)
        assert os.path.exists(str(tmp_path / "homozygous_regions.txt"))


class TestAnnotate:
    def test_golden_annotation(self, tmp_path):
        """Exact DP/DPS/DPSP/SR/SC/AR parity on the reference's real
        test_annotate data (golden values from its test_vcf.py:795-808,
        which exercise read-group filtering, pileup depths and
        parasail-equivalent SW scoring)."""
        import os
        from medaka_tpu.vcf import annotate_vcf_n_reads, VCFReader
        D = "/root/reference/medaka/test/data/"
        out = str(tmp_path / "annotated.vcf")
        annotate_vcf_n_reads(
            D + "test_annotate.vcf", D + "test_annotate_ref.fasta",
            D + "test_annotate.bam", out,
            read_group="nCoV-2019_2", pad=25, dpsp=True)
        want = [
            ("MN908947.3", 29748,
             "AR=0,0;DP=200;DPS=100,100;DPSP=199;"
             "SC=19484,20327,22036,23215;SR=1,2,98,98"),
            ("MN908947.3", 29764,
             "AR=0,0;DP=200;DPS=100,100;DPSP=199;"
             "SC=19970,21140,15773,16751;SR=99,100,0,0"),
            ("MN908947.3", 29788,
             "AR=0,0;DP=199;DPS=99,100;DPSP=197;"
             "SC=26174,28129,19085,20315;SR=96,100,1,0")]
        got = list(VCFReader(out, cache=False).fetch())
        assert len(got) == 6  # MN908947.3 + Duplicate contig
        for i, (chrom, pos, info) in enumerate(want + want):
            assert got[i].pos == pos
            assert got[i].info_string == info, (i, got[i].info_string)

    def test_chunked_annotation_no_duplicates(self, tmp_path):
        """A chunk boundary between variants must not double-write
        records (regression: fixed_size splitting re-anchored the last
        chunk to overlap its neighbour)."""
        from medaka_tpu.vcf import annotate_vcf_n_reads, VCFReader
        D = "/root/reference/medaka/test/data/"
        out = str(tmp_path / "annotated_chunked.vcf")
        # variants sit at pos 29748/29764/29788: a 30-base chunk puts
        # boundaries between them
        annotate_vcf_n_reads(
            D + "test_annotate.vcf", D + "test_annotate_ref.fasta",
            D + "test_annotate.bam", out,
            read_group="nCoV-2019_2", pad=25, dpsp=False, chunk_size=30)
        got = list(VCFReader(out, cache=False).fetch())
        keys = [(v.chrom, v.pos, v.ref, tuple(v.alt)) for v in got]
        assert len(keys) == len(set(keys)) == 6
