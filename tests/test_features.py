"""Golden-value tests for the pileup featurizer.

Expected matrices reproduce the reference's hand-derived expectations for
the shared mock alignment scenario (reference ``test_counts.py``).
"""
import os

import numpy as np
import pytest

from medaka_tpu.common import Region
from medaka_tpu.features import (
    CountsFeatureEncoder, HardRLEFeatureEncoder, SampleGenerator,
    SoftRLEFeatureEncoder, SymHardRLEFeatureEncoder, feature_encoders,
    from_dict, pileup_counts, pileup_counts_norm_indices)
from medaka_tpu.io.bam import BamReader, BamRecord, write_bam

from mock_data import CALLS, REF_NAME, REF_SEQ, create_simple_bam

REF_DATA = "/root/reference/medaka/test/data"

# Expected normalised counts for the mock scenario, channels acgtACGTdD
# (reference test_counts.py:92-103).
EXPECTED_FEATURES = np.array([
    [0.5, 0, 0, 0, 0.5, 0, 0, 0, 0, 0],
    [0, 0.5, 0, 0, 0, 0.5, 0, 0, 0, 0],
    [0.5, 0, 0, 0, 0.5, 0, 0, 0, 0, 0],
    [0, 0.25, 0, 0.25, 0, 0, 0, 0.25, 0, 0.25],
    [0.25, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0.5, 0, 0, 0, 0.5, 0, 0, 0],
    [0.5, 0, 0, 0, 0.5, 0, 0, 0, 0, 0],
    [0, 0, 0, 0.5, 0, 0, 0, 0.5, 0, 0],
    [0, 0, 0.5, 0, 0, 0, 0.5, 0, 0, 0]], dtype=np.float32)

EXPECTED_POSITIONS = [
    (0, 0), (1, 0), (2, 0), (3, 0), (3, 1), (4, 0), (5, 0), (6, 0), (7, 0)]


@pytest.fixture(scope="module")
def mock_bam(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bam") / "mock.bam")
    create_simple_bam(path)
    return path


class TestPileupCounts:
    def test_raw_counts(self, mock_bam):
        [(counts, positions)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, min_mapq=1)
        assert counts.shape == (9, 10)
        assert list(map(tuple, positions)) == EXPECTED_POSITIONS
        # raw counts are 4x the normalised expectation (depth 4)
        np.testing.assert_array_equal(counts, (EXPECTED_FEATURES * 4))

    def test_region_subset(self, mock_bam):
        [(counts, positions)] = pileup_counts(
            Region(REF_NAME, 2, 6), mock_bam)
        assert list(map(tuple, positions)) == [
            (2, 0), (3, 0), (3, 1), (4, 0), (5, 0)]
        np.testing.assert_array_equal(counts, EXPECTED_FEATURES[2:7] * 4)

    def test_mapq_filter(self, mock_bam):
        # basecall_2 has mapq 10, basecall_3 has 16, basecall_4 24, 1 has 40
        [(counts, _)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, min_mapq=11)
        # only 3 reads remain; column 0 has three reads
        assert counts[0].sum() == 3

    def test_tag_filter(self, mock_bam):
        # AA tag: basecall_1 and 2 have AA=1, 3 has AA=2, 4 lacks it
        [(counts, _)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, tag_name="AA", tag_value=1,
            keep_missing=False)
        assert counts[0].sum() == 2
        [(counts, _)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, tag_name="AA", tag_value=1,
            keep_missing=True)
        assert counts[0].sum() == 3

    @pytest.mark.parametrize("filters", [
        dict(),
        dict(min_mapq=11),
        dict(tag_name="AA", tag_value=1, keep_missing=False),
        dict(tag_name="AA", tag_value=1, keep_missing=True),
        dict(read_group="rg1"),
    ])
    def test_payload_path_matches_record_path(self, mock_bam, filters):
        """The fully native payload path (region_payload ->
        bam_scan_filter -> pileup kernel) must reproduce the
        record-object path bit for bit under every filter."""
        from medaka_tpu import features as feat_mod
        from medaka_tpu.io.bam import BamReader

        region = Region(REF_NAME, 0, 8)
        with BamReader(mock_bam) as br:
            res_pay = feat_mod._pileup_counts_payload(
                br, region, 1,
                filters.get("min_mapq", 1), filters.get("tag_name"),
                filters.get("tag_value"), filters.get(
                    "keep_missing", False), filters.get("read_group"))
        assert res_pay is not None, "payload path must be available"
        with BamReader(mock_bam) as br:
            reads = [
                r for r in br.fetch(REF_NAME, 0, 8)
                if feat_mod.filter_read(
                    r, filters.get("min_mapq", 1),
                    filters.get("tag_name"), filters.get("tag_value"),
                    filters.get("keep_missing", False),
                    filters.get("read_group"))]
            res_rec = feat_mod._pileup_counts_native(
                reads, 0, 8, [""], {"": 0}, 1)
        if res_rec is None:  # no native lib: nothing to compare
            pytest.skip("native library unavailable")
        if not reads:
            assert res_pay[0][0].shape[0] == 0
            return
        assert len(res_pay) == len(res_rec)
        for (c1, p1), (c2, p2) in zip(res_pay, res_rec):
            np.testing.assert_array_equal(c1, c2)
            np.testing.assert_array_equal(p1, p2)

    def test_dtype_split(self, mock_bam):
        # DT: r9 for basecalls 1-3, r10 for basecall 4
        [(counts, positions)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, dtype_prefixes=["r9", "r10"])
        assert counts.shape == (9, 20)
        # r10 block only contains basecall_4 (reverse): col 0 base a
        assert counts[0, 10] == 1
        assert counts[0, :10].sum() == 3

    def test_qstrat(self, mock_bam):
        num_qstrat = 4
        [(counts, _)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, num_qstrat=num_qstrat)
        assert counts.shape == (9, 40)
        # col 0 quals: b1 q2, b2 q0, b3 q2, b4 q2
        # qstrat = max(0, min(q, 4) - 1) -> b1/b3/b4 layer 1, b2 layer 0
        col = counts[0].reshape(num_qstrat, 10)
        assert col[1, 4] == 1  # b1 fwd A
        assert col[0, 4] == 1  # b2 fwd A (q0 -> layer 0)
        assert col[1, 0] == 2  # b3, b4 rev a
        # deletion lives in layer 0 regardless
        col3 = counts[3].reshape(num_qstrat, 10)
        assert col3[0, 9] == 1

    def test_weibull(self, mock_bam):
        num_qstrat = 5
        [(counts, _)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, num_qstrat=num_qstrat,
            weibull_summation=True)
        # basecall_1 WK=1e3 -> sharply peaked at ceil(WL): col 0 WL=1.5
        # fraction mass sits in run-length bin 2 (index 1)
        col = counts[0].reshape(num_qstrat, 10)
        assert col[1, 4] >= 9000  # ~1.0 * 10000 from basecall_1
        # basecall_2..4 have WL=WK=1: exponential-ish mass in layer 1
        expected_l1 = int(10000 * (1 - np.exp(-1)))
        assert col[0, 4] == expected_l1  # basecall_2 fwd A

    def test_coverage_gap_splits_chunks(self, tmp_path):
        recs = [
            BamRecord.build("r1", 0, 0, "ACGT", [1] * 4, "4M"),
            BamRecord.build("r2", 0, 20, "ACGT", [1] * 4, "4M")]
        path = str(tmp_path / "gap.bam")
        write_bam(path, recs, [("ref", 100)])
        chunks = pileup_counts(Region("ref", 0, 100), path, min_mapq=0)
        assert len(chunks) == 2
        assert chunks[0][1]["major"][0] == 0
        assert chunks[1][1]["major"][0] == 20

    def test_no_reads(self, mock_bam):
        [(counts, positions)] = pileup_counts(
            Region(REF_NAME, 0, 8), mock_bam, min_mapq=255)
        assert len(counts) == 0

    def test_insertion_at_read_start_dropped(self, tmp_path):
        recs = [BamRecord.build("r1", 0, 2, "TTACGT", [1] * 6, "2I4M")]
        path = str(tmp_path / "leadins.bam")
        write_bam(path, recs, [("ref", 50)])
        [(counts, positions)] = pileup_counts(
            Region("ref", 0, 50), path, min_mapq=0)
        assert positions["minor"].max() == 0
        assert counts.sum() == 4

    def test_insertion_after_deletion(self, tmp_path):
        # 2M 1D 1I 2M: insertion anchors at the deleted position
        recs = [BamRecord.build("r1", 0, 0, "ACGTT", [1] * 5, "2M1D1I2M")]
        path = str(tmp_path / "delins.bam")
        write_bam(path, recs, [("ref", 50)])
        [(counts, positions)] = pileup_counts(
            Region("ref", 0, 50), path, min_mapq=0)
        assert list(map(tuple, positions)) == [
            (0, 0), (1, 0), (2, 0), (2, 1), (3, 0), (4, 0)]
        # column (2, 0) holds a forward deletion
        assert counts[2, 9] == 1
        # column (2, 1) holds the inserted G (forward)
        assert counts[3, 6] == 1


class TestCountsEncoder:
    def test_normalise_total(self, mock_bam):
        encoder = CountsFeatureEncoder(normalise="total")
        [sample] = encoder.bam_to_sample(mock_bam, Region(REF_NAME, 0, 8))
        np.testing.assert_array_equal(sample.features, EXPECTED_FEATURES)
        assert list(map(tuple, sample.positions)) == EXPECTED_POSITIONS
        # minor column depth inherits the major's
        assert sample.depth[4] == 4

    def test_normalise_none(self, mock_bam):
        encoder = CountsFeatureEncoder(normalise=None)
        [sample] = encoder.bam_to_sample(mock_bam, Region(REF_NAME, 0, 8))
        np.testing.assert_array_equal(
            sample.features, EXPECTED_FEATURES * 4)

    def test_normalise_fwd_rev(self, mock_bam):
        encoder = CountsFeatureEncoder(normalise="fwd_rev")
        [sample] = encoder.bam_to_sample(mock_bam, Region(REF_NAME, 0, 8))
        # col 0: two fwd reads say A, two rev reads say a -> both 1.0
        assert sample.features[0, 0] == 1.0
        assert sample.features[0, 4] == 1.0

    def test_sym_indels(self, mock_bam):
        encoder = CountsFeatureEncoder(normalise=None, sym_indels=True)
        [sample] = encoder.bam_to_sample(mock_bam, Region(REF_NAME, 0, 8))
        # minor column (3,1): only basecall_3 (rev) has the insert;
        # one other rev read (basecall_4) spans -> d count 1;
        # two fwd reads span -> D count 2
        row = sample.features[4]
        assert row[0] == 1  # a from basecall_3
        assert row[8] == 1  # implied rev deletion
        assert row[9] == 2  # implied fwd deletions

    def test_feature_length(self):
        encoder = CountsFeatureEncoder(dtypes=["r9", "r10"])
        assert encoder.feature_vector_length == 20

    def test_to_dict_roundtrip(self):
        encoder = CountsFeatureEncoder(normalise=None, min_mapq=7)
        d = encoder.to_dict()
        clone = from_dict(d)
        assert isinstance(clone, CountsFeatureEncoder)
        assert clone.normalise is None
        assert clone.min_mapq == 7

    def test_registry(self):
        for name in ("CountsFeatureEncoder", "HardRLEFeatureEncoder",
                     "SymHardRLEFeatureEncoder", "SoftRLEFeatureEncoder"):
            assert name in feature_encoders

    def test_norm_indices(self):
        inds = pileup_counts_norm_indices(["r1", "r2"], num_qstrat=2)
        assert inds[("r1", False)] == [4, 5, 6, 7, 9, 14, 15, 16, 17, 19]
        assert inds[("r1", True)] == [0, 1, 2, 3, 8, 10, 11, 12, 13, 18]
        assert inds[("r2", False)] == [24, 25, 26, 27, 29, 34, 35, 36, 37, 39]
        assert inds[("r2", True)] == [20, 21, 22, 23, 28, 30, 31, 32, 33, 38]


class TestSampleGenerator:
    def test_chunking(self, tmp_path):
        # a long synthetic pileup: one read covering 5000 bases
        seq = "ACGT" * 1250
        recs = [
            BamRecord.build(
                "r{}".format(i), 0, 0, seq, [20] * 5000, "5000M")
            for i in range(3)]
        path = str(tmp_path / "long.bam")
        write_bam(path, recs, [("ref", 5000)])
        gen = SampleGenerator(
            path, Region("ref", 0, 5000), CountsFeatureEncoder(),
            chunk_len=1000, chunk_overlap=200)
        samples = gen.samples
        assert len(samples) == 6
        assert all(s.size == 1000 for s in samples)
        assert samples[1].first_pos == (800, 0)

    def test_quarantine_small_region(self, mock_bam):
        gen = SampleGenerator(
            mock_bam, Region(REF_NAME, 0, 8), CountsFeatureEncoder(),
            chunk_len=1000, chunk_overlap=200)
        assert gen.samples == []
        assert gen._quarantined[0][0] == Region(REF_NAME, 0, 8)

    def test_no_chunking(self, mock_bam):
        gen = SampleGenerator(
            mock_bam, Region(REF_NAME, 0, 8), CountsFeatureEncoder(),
            enable_chunking=False)
        [sample] = gen.samples
        assert sample.size == 9


class TestRealBamConsistency:
    def test_counts_conserve_events(self):
        path = os.path.join(REF_DATA, "test_annotate.bam")
        with BamReader(path) as reader:
            ref = reader.references[0]
            first = next(iter(reader))
        start = first.pos
        region = Region(ref, start, start + 3000)
        [(counts, positions)] = pileup_counts(region, path)
        n_major = len(np.unique(positions["major"]))
        assert len(counts) >= n_major  # insertions only add columns
        assert counts.sum() > 0
        # majors within region, minors consistent
        assert positions["major"].min() >= start
        assert positions["major"].max() < start + 3000
        mask = positions["minor"] == 0
        majors = positions["major"][mask]
        assert np.all(np.diff(majors) == 1)

    def test_extreme_depth_counts_exact(self, tmp_path):
        """40k-deep pileup: int32 channel counters stay exact.

        Counters are int32 (a channel count is bounded by region
        depth); this pins correctness far beyond any practical ONT
        depth and well past the int16 range.
        """
        from medaka_tpu.io.bam import BamRecord, write_bam
        depth = 40000
        seq = "ACGTACGTACGTACGTACGT"
        recs = [
            BamRecord.build(
                query_name="r{}".format(i), ref_id=0, pos=0, seq=seq,
                qual=[20] * len(seq), cigar="{}=".format(len(seq)),
                flag=0, mapq=60)
            for i in range(depth)]
        path = str(tmp_path / "deep.bam")
        write_bam(path, recs, [("deep", len(seq))])
        [(counts, positions)] = pileup_counts(
            Region("deep", 0, len(seq)), path)
        assert counts.shape == (len(seq), 10)
        # every column holds exactly `depth` forward-strand base counts
        np.testing.assert_array_equal(counts.sum(axis=1),
                                      np.full(len(seq), depth))
        assert counts.max() == depth


class TestSymHardRLEGappedCoverage:
    def test_multi_block_region(self, tmp_path):
        """A coverage gap yields one sample per block (regression:
        single-tuple destructuring crashed on 2+ blocks)."""
        from medaka_tpu.io.bam import BamRecord, write_bam
        from medaka_tpu.features import SymHardRLEFeatureEncoder

        seq = "ACGTACGTACGT"
        recs = [
            BamRecord.build(
                query_name="left", ref_id=0, pos=0, seq=seq,
                qual=[3] * len(seq), cigar="12=", flag=0, mapq=60),
            BamRecord.build(
                query_name="right", ref_id=0, pos=50, seq=seq,
                qual=[3] * len(seq), cigar="12=", flag=0, mapq=60)]
        path = str(tmp_path / "gap.bam")
        write_bam(path, recs, [("ctg", 100)])
        enc = SymHardRLEFeatureEncoder(num_qstrat=4)
        samples = enc.bam_to_sample(path, Region("ctg", 0, 100))
        assert len(samples) == 2
        assert all(s.features is not None for s in samples)


def test_datastore_write_failure_closes_cleanly(tmp_path):
    """A failed background write raises from close() AFTER releasing
    the handle; a second close() is a no-op."""
    from medaka_tpu.datastore import DataStore

    path = str(tmp_path / "boom.hdf")
    ds = DataStore(path, "w")
    fut = ds.write_executor.submit(
        (lambda: (_ for _ in ()).throw(OSError("disk full"))))
    ds._futures.append(fut)
    with pytest.raises(OSError, match="disk full"):
        ds.close()
    assert ds.fh is None and ds.write_executor is None
    ds.close()  # idempotent


class TestLargeScaleGolden:
    """Committed large-scale featurization anchor.

    The repo's analogue of the reference's real-BAM pin (86,294 columns /
    mean depth 18.696468 over a 200 kb read set,
    ``medaka/test/test_counts.py:34-45``, whose LFS data is absent): a
    deterministic 2 Mb x ~17x synthetic BAM whose full counts matrix is
    pinned by checksum. Any featurizer, BAM-reader or BGZF-inflate drift
    fails this test.
    """

    N_COLS = 2363154
    MAJOR_COLS = 1999612
    MEAN_DEPTH = 17.096462
    SHA256 = ("f4b664137f7af7721935dbac57c6f586"
              "de564a4265ddf7a2448460fd09dd040f")

    def test_counts_matrix_checksum(self, tmp_path):
        import hashlib

        from mock_data import create_synth_bam

        bam, _ = create_synth_bam(
            str(tmp_path / "synth2.bam"), ref_mb=2.0, depth=20)
        blocks = pileup_counts(Region("synth", 0, 2000000), bam)
        n_cols = sum(len(p) for _, p in blocks)
        depth_total = 0
        h = hashlib.sha256()
        for counts, positions in blocks:
            h.update(np.ascontiguousarray(counts).tobytes())
            h.update(np.ascontiguousarray(positions).tobytes())
            depth_total += int(counts.sum())
        major = sum(int((p["minor"] == 0).sum()) for _, p in blocks)
        assert n_cols == self.N_COLS
        assert major == self.MAJOR_COLS
        assert round(depth_total / n_cols, 6) == self.MEAN_DEPTH
        assert h.hexdigest() == self.SHA256
