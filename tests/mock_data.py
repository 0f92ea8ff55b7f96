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


# ---------------------------------------------------------------------------
# Deterministic large-scale synthetic BAM (featurization goldens + benches)
# ---------------------------------------------------------------------------

_SYNTH_BASES = np.frombuffer(b"ACGT", np.uint8)


def simulate_synth_read(ref_arr, start, length, rng):
    """Vectorised ~96%-identity long-read simulation.

    Events per reference base: 96% match, 2% substitution, 1% insertion
    (inserted base precedes the kept reference base), 1% deletion.
    Returns ``(seq, cigar)`` with an exact =/X/I/D cigar.
    """
    piece = ref_arr[start:start + length]
    ev = rng.choice(4, size=len(piece), p=[0.96, 0.02, 0.01, 0.01])
    is_ins = ev == 2
    # bases emitted per event: ins -> 2 (insert + ref), del -> 0, else 1
    n_out = np.where(is_ins, 2, np.where(ev == 3, 0, 1))
    slot = np.concatenate(([0], np.cumsum(n_out)[:-1]))
    out = np.empty(int(n_out.sum()), np.uint8)
    keeps = ev != 3
    out[slot[keeps] + is_ins[keeps]] = piece[keeps]
    subs = np.flatnonzero(ev == 1)
    if subs.size:
        out[slot[subs]] = _SYNTH_BASES[
            (np.searchsorted(_SYNTH_BASES, piece[subs])
             + rng.integers(1, 4, subs.size)) % 4]
    ins = np.flatnonzero(is_ins)
    if ins.size:
        out[slot[ins]] = _SYNTH_BASES[rng.integers(0, 4, ins.size)]

    # cigar op stream: 0 '=', 1 'X', 2 'D', 3 'I' (ins expands to I,=)
    n_ops = np.where(is_ins, 2, 1)
    opslot = np.concatenate(([0], np.cumsum(n_ops)[:-1]))
    opstream = np.empty(int(n_ops.sum()), np.int8)
    opstream[opslot] = np.where(
        is_ins, 3, np.where(ev == 1, 1, np.where(ev == 3, 2, 0)))
    opstream[opslot[is_ins] + 1] = 0
    run_starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(opstream)) + 1))
    run_lens = np.diff(np.concatenate((run_starts, [opstream.size])))
    sym = "=XDI"
    cigar = "".join(
        "{}{}".format(ln, sym[opstream[s]])
        for ln, s in zip(run_lens, run_starts))
    return out.tobytes().decode(), cigar


def create_synth_bam(path, ref_mb=2.0, depth=30, seed=42, read_len=20000):
    """Write a deterministic synthetic long-read BAM + draft fasta.

    The repo's large-scale featurization anchor (analogue of the
    reference's 86,294-column / 200 kb real-BAM pin in
    ``medaka/test/test_counts.py:34-45``, whose LFS data is not
    available here). Returns ``(bam_path, ref_fasta_path)``.
    """
    from medaka_tpu.io.fastx import FastaWriter

    rng = np.random.default_rng(seed)
    ref_len = int(ref_mb * 1e6)
    ref_arr = _SYNTH_BASES[rng.integers(0, 4, ref_len)]
    ref_fasta = path + ".ref.fasta"
    with FastaWriter(ref_fasta) as fw:
        fw.write("synth", ref_arr.tobytes().decode())
    n_reads = int(ref_len * depth / read_len)
    records = []
    for i in range(n_reads):
        start = int(rng.integers(0, ref_len - read_len))
        seq, cigar = simulate_synth_read(ref_arr, start, read_len, rng)
        records.append(BamRecord.build(
            query_name="r{}".format(i), ref_id=0, pos=start, seq=seq,
            qual=np.full(len(seq), 20, np.uint8), cigar=cigar,
            flag=16 if i % 2 else 0, mapq=60))
    write_bam(path, records, [("synth", ref_len)])
    return path, ref_fasta


_HP_BASES_U8 = np.frombuffer(b"ACGT", np.uint8)


def simulate_hpbias_read(ref_arr, start, length, rng):
    """ONT-like read with *systematic* homopolymer-deletion errors.

    Uniform-error simulation makes majority vote near-optimal by
    construction — at 30x coverage independent errors average out and
    the NN has nothing left to add (measured: a model trained on such
    reads lands 0.7Q *below* majority). Real nanopore error is
    dominated by homopolymer truncation, which is correlated across
    reads and exactly the signal the consensus model family exists to
    exploit (the reference's premise). Here: substitutions 1.5% and
    insertions 0.5% uniform; deletions 0.5% at run length 1 rising
    3%/extra repeat, capped at 12%.
    """
    piece = ref_arr[start:start + length]
    edges = np.flatnonzero(np.diff(piece)) + 1
    run_starts = np.concatenate(([0], edges))
    run_lens = np.diff(np.concatenate((run_starts, [len(piece)])))
    runlen = np.repeat(run_lens, run_lens)
    p_del = np.minimum(0.005 + 0.03 * (runlen - 1), 0.12)
    u = rng.random(len(piece))
    ev = np.zeros(len(piece), np.int8)        # 0 match
    ev[u < p_del + 0.020] = 2                 # 2 ins (0.5%)
    ev[u < p_del + 0.015] = 1                 # 1 sub (1.5%)
    ev[u < p_del] = 3                         # 3 del
    is_ins = ev == 2
    n_out = np.where(is_ins, 2, np.where(ev == 3, 0, 1))
    slot = np.concatenate(([0], np.cumsum(n_out)[:-1]))
    out = np.empty(int(n_out.sum()), np.uint8)
    keeps = ev != 3
    out[slot[keeps] + is_ins[keeps]] = piece[keeps]
    subs = np.flatnonzero(ev == 1)
    if subs.size:
        idx = np.searchsorted(_HP_BASES_U8, piece[subs])
        out[slot[subs]] = _HP_BASES_U8[
            (idx + rng.integers(1, 4, subs.size)) % 4]
    ins = np.flatnonzero(is_ins)
    if ins.size:
        out[slot[ins]] = _HP_BASES_U8[rng.integers(0, 4, ins.size)]
    return out.tobytes().decode()


def simulate_dwell_read(ref_arr, start, length, rng, stride=5):
    """ONT-like read whose errors are dwell-correlated, plus its mv tag.

    The basecaller's move table (``mv`` tag: ``[stride, m0, m1, ...]``,
    one flag per signal stride, a 1 starting each emitted base) encodes
    per-base dwell — how long the molecule sat in the pore. Fast
    transits (dwell 1) carry most of the error in real data, which is
    exactly why the reference feeds dwell as a read-level feature
    channel (``medaka_read_matrix.c:169-228``, rl_lstm384_dwells in
    ``options.py:175-182``). Here: per-base dwell ~ 1 + Geometric(0.45)
    capped at 12; substitution probability 10% at dwell 1, 4% at dwell
    2, else 0.6%; deletions 4% at dwell 1 (the base and its dwell
    vanish from the read); insertions 0.4% with dwell 1 (artifact
    bases are fast). A dwell-aware model can discount exactly the
    bases an unaware one must trust.

    :returns: (seq str, mv int8 ndarray) in basecalled orientation.
    """
    piece = ref_arr[start:start + length]
    dwell = np.minimum(1 + rng.geometric(0.45, len(piece)), 12)
    fast = dwell == 1
    mid = dwell == 2
    p_sub = np.where(fast, 0.10, np.where(mid, 0.04, 0.006))
    p_del = np.where(fast, 0.04, 0.0)
    p_ins = 0.004
    u = rng.random(len(piece))
    ev = np.zeros(len(piece), np.int8)          # 0 match
    ev[u < p_sub + p_del + p_ins] = 2           # 2 ins (after base)
    ev[u < p_sub + p_del] = 3                   # 3 del
    ev[u < p_sub] = 1                           # 1 sub
    out_bases = []
    out_dwell = []
    for i in range(len(piece)):
        e = ev[i]
        if e == 3:
            continue
        base = piece[i]
        if e == 1:
            base = _HP_BASES_U8[
                (np.searchsorted(_HP_BASES_U8, base)
                 + rng.integers(1, 4)) % 4]
        out_bases.append(base)
        out_dwell.append(dwell[i])
        if e == 2:
            out_bases.append(_HP_BASES_U8[rng.integers(0, 4)])
            out_dwell.append(1)
    seq = np.asarray(out_bases, np.uint8).tobytes().decode()
    mv = np.zeros(1 + int(np.sum(out_dwell)), np.int8)
    mv[0] = stride
    mv[1 + np.cumsum([0] + out_dwell[:-1])] = 1
    return seq, mv
