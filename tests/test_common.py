"""Tests for Region/Sample algebra (parity: reference test_sample.py)."""
import numpy as np
import pytest

from medaka_tpu.common import (
    OverlapException, Region, Relationship, Sample, loose_version_sort,
    make_positions, rle, sliding_window)


def make_sample(start, end, minors=None, ref_name="contig1"):
    """Sample spanning [start, end) majors, optional dict major->n_minor."""
    majors, minor_col = [], []
    for m in range(start, end):
        n_min = (minors or {}).get(m, 0)
        for i in range(n_min + 1):
            majors.append(m)
            minor_col.append(i)
    pos = make_positions(majors, minor_col)
    feat = np.arange(len(pos), dtype=np.float32)[:, None] * np.ones(10)
    return Sample(ref_name, feat, None, None, pos, None,
                  depth=np.full(len(pos), 10))


class TestRegion:
    def test_from_string(self):
        assert Region.from_string("X:10-20") == Region("X", 10, 20)
        assert Region.from_string("X") == Region("X", None, None)
        assert Region.from_string("X:-5") == Region("X", 0, 5)
        assert Region.from_string("X:5-") == Region("X", 5, None)
        assert Region.from_string("a:b:5-6") == Region("a:b", 5, 6)

    def test_name(self):
        assert str(Region("X", 1, 9)) == "X:1-9"

    def test_split_fixed(self):
        r = Region("X", 0, 100)
        subs = r.split(40, fixed_size=True)
        assert all(s.size == 40 for s in subs)
        assert subs[-1].end == 100
        # non fixed size: remainder kept
        subs = r.split(40, fixed_size=False)
        assert subs[-1] == Region("X", 80, 100)

    def test_split_overlap(self):
        r = Region("X", 0, 100)
        subs = r.split(50, overlap=10, fixed_size=False)
        assert subs[0] == Region("X", 0, 50)
        assert subs[1] == Region("X", 40, 90)

    def test_split_small(self):
        r = Region("X", 0, 10)
        assert r.split(100) == [r]

    def test_overlaps(self):
        assert Region("X", 0, 10).overlaps(Region("X", 9, 20))
        assert not Region("X", 0, 10).overlaps(Region("X", 10, 20))
        assert not Region("X", 0, 10).overlaps(Region("Y", 0, 10))
        assert Region("X", None, None).overlaps(Region("X", 5, 6))


class TestHelpers:
    def test_rle(self):
        out = rle(np.array([1, 1, 2, 2, 2, 1]))
        assert list(out["length"]) == [2, 3, 1]
        assert list(out["start"]) == [0, 2, 5]
        assert list(out["value"]) == [1, 2, 1]

    def test_sliding_window_remainder(self):
        a = np.arange(10)
        wins = list(sliding_window(a, window=4, step=3))
        assert [w[0] for w in wins] == [0, 3, 6]
        assert list(wins[-1]) == [6, 7, 8, 9]

    def test_loose_version_sort(self):
        assert loose_version_sort(["chr10", "chr2", "chr1"]) == [
            "chr1", "chr2", "chr10"]


class TestSampleBasics:
    def test_pos_properties(self):
        s = make_sample(10, 20, minors={12: 2})
        assert s.first_pos == (10, 0)
        assert s.last_pos == (19, 0)
        assert s.size == 12
        assert s.span == 9
        assert s.name == "contig1:10.0-19.0"

    def test_decode_sample_name(self):
        s = make_sample(10, 20)
        d = Sample.decode_sample_name(s.name)
        assert d["ref_name"] == "contig1"
        assert d["start"] == "10.0"

    def test_slice_and_eq(self):
        s = make_sample(0, 10)
        sub = s.slice(slice(2, 5))
        assert sub.first_pos == (2, 0)
        assert sub.size == 3
        assert s == s
        assert not (s == sub)

    def test_chunks(self):
        s = make_sample(0, 100)
        chunks = list(s.chunks(chunk_len=40, overlap=10))
        assert all(c.size == 40 for c in chunks)
        assert chunks[0].first_pos == (0, 0)
        assert chunks[1].first_pos == (30, 0)
        # remainder window is anchored at the end
        assert chunks[-1].last_pos == (99, 0)

    def test_from_samples(self):
        s = make_sample(0, 10)
        a, b = s.slice(slice(0, 5)), s.slice(slice(5, None))
        joined = Sample.from_samples([a, b])
        assert joined == s
        with pytest.raises(ValueError):
            Sample.from_samples([b, a])

    def test_depth_filter(self):
        s = make_sample(0, 10)
        depth = np.full(10, 20)
        depth[3:5] = 1
        s = s.amend(depth=depth)
        parts = list(s.depth_filter(min_depth=5))
        assert len(parts) == 2
        assert parts[0].size == 3
        assert parts[1].first_pos == (5, 0)


class TestRelativePosition:
    def test_abutted(self):
        a, b = make_sample(0, 5), make_sample(5, 10)
        assert Sample.relative_position(a, b) is Relationship.forward_abutted
        assert Sample.relative_position(b, a) is Relationship.reverse_abutted

    def test_abutted_minor(self):
        s = make_sample(0, 10, minors={4: 2})
        # split inside the minor run of major 4
        a = s.slice(slice(0, 6))   # ends at (4, 1)
        b = s.slice(slice(6, None))  # starts at (4, 2)
        assert Sample.relative_position(a, b) is Relationship.forward_abutted

    def test_overlap(self):
        a, b = make_sample(0, 6), make_sample(4, 10)
        assert Sample.relative_position(a, b) is Relationship.forward_overlap
        assert Sample.relative_position(b, a) is Relationship.reverse_overlap

    def test_gapped(self):
        a, b = make_sample(0, 5), make_sample(7, 10)
        assert Sample.relative_position(a, b) is Relationship.forward_gapped
        assert Sample.relative_position(b, a) is Relationship.reverse_gapped

    def test_contained(self):
        a, b = make_sample(0, 10), make_sample(3, 6)
        assert Sample.relative_position(a, b) is Relationship.s2_within_s1
        assert Sample.relative_position(b, a) is Relationship.s1_within_s2

    def test_different_ref(self):
        a = make_sample(0, 5)
        b = make_sample(0, 5, ref_name="other")
        assert Sample.relative_position(a, b) is \
            Relationship.different_ref_name


class TestOverlapIndices:
    def test_midpoint_split(self):
        s = make_sample(0, 20)
        a, b = s.slice(slice(0, 12)), s.slice(slice(8, None))
        end1, start2, heuristic = Sample.overlap_indices(a, b)
        assert not heuristic
        joined = Sample.from_samples(
            [a.slice(slice(0, end1)), b.slice(slice(start2, None))])
        assert np.array_equal(joined.positions, s.positions)

    def test_abutted_returns_none(self):
        a, b = make_sample(0, 5), make_sample(5, 10)
        assert Sample.overlap_indices(a, b) == (None, None, False)

    def test_mismatched_minors_heuristic(self):
        # overlapping window where the two samples disagree on inserts
        a = make_sample(0, 12, minors={6: 1})
        b = make_sample(4, 16, minors={7: 2})
        end1, start2, heuristic = Sample.overlap_indices(a, b)
        assert heuristic
        joined = Sample.from_samples(
            [a.slice(slice(0, end1)), b.slice(slice(start2, None))])
        majors = joined.positions["major"]
        assert majors[0] == 0 and majors[-1] == 15
        assert np.all(np.diff(majors) >= 0)

    def test_raises_for_gap(self):
        a, b = make_sample(0, 5), make_sample(7, 10)
        with pytest.raises(OverlapException):
            Sample.overlap_indices(a, b)


class TestTrimSamples:
    def test_stream(self):
        s = make_sample(0, 30)
        parts = [s.slice(slice(0, 15)), s.slice(slice(10, 25)),
                 s.slice(slice(20, None))]
        out = list(Sample.trim_samples(iter(parts), quiet=True))
        trimmed = [t[0] for t in out]
        joined = Sample.from_samples(trimmed)
        assert np.array_equal(joined.positions, s.positions)
        assert [t[1] for t in out] == [False, False, True]

    def test_contained_skipped(self):
        s = make_sample(0, 30)
        parts = [s.slice(slice(0, 20)), s.slice(slice(5, 10)),
                 s.slice(slice(15, None))]
        out = list(Sample.trim_samples(iter(parts), quiet=True))
        joined = Sample.from_samples([t[0] for t in out])
        assert np.array_equal(joined.positions, s.positions)

    def test_gap_marks_last_in_contig(self):
        a = make_sample(0, 10)
        b = make_sample(15, 25)
        out = list(Sample.trim_samples(iter([a, b]), quiet=True))
        assert [t[1] for t in out] == [True, True]

    def test_trim_to_region(self):
        s = make_sample(0, 30)
        parts = [s.slice(slice(0, 18)), s.slice(slice(12, None))]
        out = list(Sample.trim_samples_to_region(iter(parts), start=5, end=25))
        joined = Sample.from_samples([t[0] for t in out])
        assert joined.first_pos == (5, 0)
        assert joined.last_pos == (24, 0)

    def test_empty_stream(self):
        assert list(Sample.trim_samples(iter([]))) == []


class TestCountsDerivation:
    def test_majority_vote_probs(self):
        pos = make_positions([0, 1], [0, 0])
        feats = np.zeros((2, 10), dtype=np.float32)
        # col 0: all reads say A (fwd); col 1: half deletion, half T rev
        feats[0, 4] = 1.0
        feats[1, 9] = 0.5
        feats[1, 3] = 0.5
        s = Sample("c", feats, None, None, pos, None)
        probs = s.majority_vote_probs
        # classes: (del, A, C, G, T)
        np.testing.assert_allclose(probs[0], [0, 1, 0, 0, 0])
        np.testing.assert_allclose(probs[1], [0.5, 0, 0, 0, 0.5])


def test_doctests_pass():
    """Run common.py's doctest examples (reference runs
    ``pytest --doctest-modules``, ``Makefile:191-201``)."""
    import doctest

    from medaka_tpu import common as common_mod
    result = doctest.testmod(common_mod)
    assert result.failed == 0
    assert result.attempted >= 5
