"""Synthetic alignment fixtures shared across tests.

Reproduces the behavioural scenario of the reference's test fixture
(``medaka/test/mock_data.py``): an 8 bp draft ``ACATGATG`` with four
basecalls exercising an exact match, a deletion, an insertion (reverse
strand) and a substitution (reverse strand), plus a truth sequence carrying
one extra insertion. Golden feature/label expectations in the reference's
``test_counts.py`` are derived from this arrangement; matching them is the
parity contract for our featurizer.
"""
import numpy as np

from medaka_tpu.io.bam import BamRecord, write_bam

REF_SEQ = "ACATGATG"
REF_NAME = "ref"

# (name, seq, quals, cigar, mapq, flag, tags)
CALLS = [
    ("basecall_1", "ACATGATG", [2, 1, 4, 5, 1, 1, 2, 1], "8=", 40, 0,
     dict(AA=1, DT="r9",
          WL=np.array([1.5, 0.5, 3.5, 4.5, 0.5, 0.5, 1.5, 0.5], np.float32),
          WK=np.array([1e3] * 8, np.float32),
          mv=np.array(
              [5, 1, 0, 0, 1, 0, 1, 1, 1, 0, 0, 0, 1, 0, 1, 0, 1, 0, 0],
              np.int8))),
    ("basecall_2", "ACAGATG", [0, 1, 4, 1, 1, 1, 2], "3=1D4=", 10, 0,
     dict(AA=1, DT="r9",
          WL=np.array([1.0] * 7, np.float32),
          WK=np.array([1.0] * 7, np.float32),
          mv=np.array(
              [5, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1, 0, 1, 1, 0, 0], np.int8))),
    ("basecall_3", "ACATAGATG", [2, 1, 4, 5, 1, 1, 1, 2, 1], "4=1I4=", 16, 16,
     dict(AA=2, DT="r9",
          WL=np.array([1.0] * 9, np.float32),
          WK=np.array([1.0] * 9, np.float32),
          mv=np.array(
              [5, 1, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 1, 1, 0, 0, 1, 0],
              np.int8))),
    ("basecall_4", "ACACGATG", [2, 1, 4, 1, 1, 1, 2, 1], "3=1X4=", 24, 16,
     dict(DT="r10",
          WL=np.array([1.0] * 8, np.float32),
          WK=np.array([1.0] * 8, np.float32),
          mv=np.array(
              [5, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 0, 0, 1, 0, 1, 1, 0, 0,
               1, 0, 1, 0], np.int8))),
]

TRUTH = (
    "truth", "ACATAGATCTG", [2, 1, 4, 5, 1, 1, 1, 2, 1, 1, 1],
    "4=1I3=2I1=", 60, 0, dict(MD="8"))


def _to_record(entry):
    name, seq, quals, cigar, mapq, flag, tags = entry
    return BamRecord.build(
        query_name=name, ref_id=0, pos=0, seq=seq, qual=quals,
        cigar=cigar, flag=flag, mapq=mapq, tags=tags)


def create_simple_bam(path, calls=None):
    """Write the mock reads as a sorted, indexed BAM; returns the path."""
    entries = CALLS if calls is None else calls
    records = [_to_record(e) for e in entries]
    return write_bam(path, records, [(REF_NAME, len(REF_SEQ))])


def create_truth_bam(path):
    """Write the truth alignment BAM."""
    return write_bam(path, [_to_record(TRUTH)], [(REF_NAME, len(REF_SEQ))])


def create_mock_fast5(path, analysis="Basecall_1D_000"):
    """Write a multi-read fast5 (plain HDF5) with RunlengthBasecall data.

    Mirrors the reference's ``mock_fast5_file`` (``mock_data.py:133-159``):
    each basecall's compact sequence with its WL (shape) / WK (scale)
    values, stored in read orientation (reverse-complemented for
    flag-16 reads).
    """
    import h5py

    from medaka_tpu.common import reverse_complement

    data_path = "read_{}/Analyses/" + analysis + \
        "/BaseCalled_template/RunlengthBasecall"
    with h5py.File(path, "w") as h5:
        for name, seq, _quals, _cigar, _mapq, flag, tags in CALLS:
            bases, shapes, scales = seq, tags["WL"], tags["WK"]
            if flag & 16:
                bases = reverse_complement(bases)
                shapes = shapes[::-1]
                scales = scales[::-1]
            arr = np.fromiter(
                zip((c.encode() for c in bases), shapes, scales),
                dtype=[("base", "S1"), ("shape", ">f4"), ("scale", ">f4")])
            h5.create_dataset(data_path.format(name), data=arr)
    return path


def create_mock_summary(path, fast5_fname):
    """Write a summary TSV linking each mock read to a fast5 file."""
    with open(path, "w") as fh:
        fh.write("read_id\tfilename\n")
        for name, *_ in CALLS:
            fh.write("{}\t{}\n".format(name, fast5_fname))
    return path
