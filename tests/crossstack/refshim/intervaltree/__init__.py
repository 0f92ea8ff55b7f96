"""Minimal pure-python stand-in for the `intervaltree` package.

The reference medaka code (under /root/reference) depends on
`intervaltree`, which is not installed in this environment.  This shim
implements the subset of the API that medaka's stitch/variant/labels
paths exercise, with the same semantics (half-open intervals,
end-exclusive).  Queries are brute force — fine at test scale.

This module is test infrastructure for the cross-stack parity harness
only; it is not part of medaka_tpu.
"""


class Interval(tuple):
    """Half-open interval [begin, end) with optional payload."""

    def __new__(cls, begin, end, data=None):
        return super().__new__(cls, (begin, end, data))

    @property
    def begin(self):
        return self[0]

    @property
    def end(self):
        return self[1]

    @property
    def data(self):
        return self[2]

    def overlaps(self, begin, end=None):
        if end is None:
            end = begin + 1
        return self.begin < end and begin < self.end

    def contains_interval(self, other):
        return self.begin <= other.begin and other.end <= self.end

    def __repr__(self):
        return 'Interval({}, {}, {})'.format(self.begin, self.end, self.data)


class IntervalTree:
    """A set of `Interval`s supporting overlap queries and chopping."""

    def __init__(self, intervals=()):
        self._ivs = list(intervals)

    @classmethod
    def from_tuples(cls, tuples):
        return cls(Interval(*t) for t in tuples)

    # --- mutation ---

    def add(self, interval):
        self._ivs.append(interval)

    def addi(self, begin, end, data=None):
        self.add(Interval(begin, end, data))

    def update(self, other):
        for iv in other:
            self.add(iv)

    def remove(self, interval):
        self._ivs.remove(interval)

    def chop(self, begin, end):
        """Delete [begin, end), truncating intervals that stick out."""
        replacement = []
        for iv in self._ivs:
            if not iv.overlaps(begin, end):
                replacement.append(iv)
                continue
            if iv.begin < begin:
                replacement.append(Interval(iv.begin, begin, iv.data))
            if iv.end > end:
                replacement.append(Interval(end, iv.end, iv.data))
        self._ivs = replacement

    def merge_overlaps(self, data_reducer=None, data_initializer=None,
                       strict=True):
        """Fuse overlapping (and, when not strict, adjacent) intervals."""
        merged = []
        for iv in sorted(self._ivs, key=lambda iv: (iv.begin, iv.end)):
            joins = merged and (
                iv.begin < merged[-1].end if strict
                else iv.begin <= merged[-1].end)
            if joins:
                prev = merged.pop()
                data = prev.data
                if data_reducer is not None:
                    data = data_reducer(data, iv.data)
                merged.append(
                    Interval(prev.begin, max(prev.end, iv.end), data))
            else:
                merged.append(iv)
        self._ivs = merged

    # --- queries ---

    def overlap(self, begin, end=None):
        if end is None:
            end = begin + 1
        return {iv for iv in self._ivs if iv.overlaps(begin, end)}

    def overlaps(self, begin, end=None):
        return bool(self.overlap(begin, end))

    def envelop(self, begin, end):
        return {
            iv for iv in self._ivs
            if begin <= iv.begin and iv.end <= end}

    def __getitem__(self, key):
        if isinstance(key, slice):
            return self.overlap(key.start, key.stop)
        return self.overlap(key)

    @property
    def all_intervals(self):
        return list(self._ivs)

    def begin(self):
        return min((iv.begin for iv in self._ivs), default=0)

    def end(self):
        return max((iv.end for iv in self._ivs), default=0)

    def is_empty(self):
        return not self._ivs

    def __iter__(self):
        return iter(sorted(self._ivs, key=lambda iv: (iv.begin, iv.end)))

    def __len__(self):
        return len(self._ivs)

    def __bool__(self):
        return bool(self._ivs)

    def __repr__(self):
        return 'IntervalTree({})'.format(sorted(self._ivs))
