"""Run-length encoding tooling.

Functional equivalent of the reference's ``medaka/rle.py`` and the
``fastrle`` C tool (``src/fastrle.c``): homopolymer-compressed
sequences with run lengths carried in phred qualities, plus
re-alignment of reads in RLE space (``compress_bam``).

The fast5 Weibull-parameter path (``WL``/``WK`` tags) is implemented
directly on h5py (`medaka_tpu.io.fast5`) rather than through
``ont_fast5_api``; fast5 files are plain HDF5.
"""
from __future__ import annotations

import concurrent.futures
import os
import sys
from typing import List, Optional

import numpy as np

from medaka_tpu import align as align_mod
from medaka_tpu import common, native
from medaka_tpu.io.bam import BamReader, write_bam
from medaka_tpu.io.fastx import FastxRecord, read_fastx

# printable phred alphabet; max encodable run length 93
_SCORES = "".join(chr(x) for x in range(33, 127))


class RLEConverter:
    """Basecall <-> RLE coordinate conversion (reference
    ``rle.py:18-75``)."""

    def __init__(self, basecall: str):
        """Compress ``basecall`` and build coordinate maps."""
        self.basecall = basecall
        self.rle_conversion = common.rle(basecall)
        self.compact_basecall = "".join(self.rle_conversion["value"])
        self.homop_length = self.rle_conversion["length"]
        self.inverse = np.repeat(
            np.arange(len(self.rle_conversion)),
            self.rle_conversion["length"])

    def transform_coords(self, start: int, end: int):
        """Map an (uncompressed) slice to compact coordinates."""
        return int(self.inverse[start]), int(self.inverse[end - 1]) + 1

    def trimmed_compact(self, start: int, end: int) -> str:
        """Compact sequence of an uncompressed slice."""
        s, e = self.transform_coords(start, end)
        return self.compact_basecall[s:e]

    def coord_compact_to_full(self, coord):
        """Compact index -> uncompressed start coordinate."""
        return self.rle_conversion[coord]["start"]


def compress_seq(record: FastxRecord) -> FastxRecord:
    """RLE-compress one fastx record, lengths as phred qualities.

    Reference: ``rle.py:251-283`` / ``src/fastrle.c`` (run lengths are
    capped at 93, the largest printable phred).
    """
    logger = common.get_named_logger("Compress_basecalls")
    conv = RLEConverter(record.sequence)
    lengths = conv.homop_length.copy()
    over = lengths >= len(_SCORES)
    if over.any():
        logger.warning(
            "Some homopolymers in %s are longer than the longest "
            "supported length", record.name)
        lengths[over] = len(_SCORES) - 1
    quality = "".join(_SCORES[x] for x in lengths)
    return FastxRecord(
        name=record.name, comment=record.comment or "",
        sequence=conv.compact_basecall, quality=quality)


def fastrle(input_fastx: str, output, block_size: int = 94):
    """Stream a fastx file as RLE fastq (the `medaka fastrle` tool).

    :param output: open file handle (or path) for fastq output.
    :param block_size: maximum encodable run length + 1 (<= 94).
    """
    if block_size > 94:
        raise ValueError("block_size must be <= 94.")
    close = False
    if isinstance(output, str):
        output = open(output, "w")
        close = True
    try:
        for record in read_fastx(input_fastx):
            conv = RLEConverter(record.sequence)
            runs = conv.homop_length
            # runs longer than block_size split into several blocks of
            # the same base (reference ``fastrle.c:19``) — capping
            # would silently drop sequence content
            k = (runs - 1) // block_size + 1
            bases = np.repeat(
                np.frombuffer(conv.compact_basecall.encode(), np.uint8),
                k)
            lens = np.full(int(k.sum()), block_size, dtype=np.int64)
            lens[np.cumsum(k) - 1] = runs - (k - 1) * block_size
            output.write("@{}\n{}\n+\n{}\n".format(
                record.name, bases.tobytes().decode(),
                (lens + 33).astype(np.uint8).tobytes().decode()))
    finally:
        if close:
            output.close()


def add_extra_clipping(cigar: str, start_clip: int, end_clip: int) -> str:
    """Extend soft clips at either end of a cigar string."""

    def merge(cigar, clip, at_start):
        if clip == 0:
            return cigar
        ops = list(align_mod.cigar_ops_from_start(cigar))
        if at_start:
            n, op = ops[0]
            if op == "S":
                return "{}S".format(int(n) + clip) + \
                    cigar[len(n) + 1:]
            return "{}S".format(clip) + cigar
        n, op = ops[-1]
        if op == "S":
            return cigar[:-(len(n) + 1)] + \
                "{}S".format(int(n) + clip)
        return cigar + "{}S".format(clip)

    return merge(merge(cigar, start_clip, True), end_clip, False)


def _compress_alignment(rec, ref_rle: RLEConverter, fast5_index=None):
    """Re-align one read in RLE space (reference ``rle.py:94-188``).

    When ``fast5_index`` (a `medaka_tpu.io.fast5.Fast5Index`) is given,
    per-base Weibull parameters are looked up in the read's fast5 file
    and attached as ``WL``/``WK`` float-array tags. Following the
    reference's ``get_rl_params`` (``rle.py:78-91``), ``WL`` carries
    the table's ``shape`` column and ``WK`` its ``scale`` column.
    """
    logger = common.get_named_logger("Compress_bam")
    if rec.flag & (4 | 256 | 2048):
        # also skip supplementary records (the reference only skips
        # unmapped/secondary, ``rle.py:97``, and then re-aligns the
        # hard-clipped partial sequence as if it were a full read —
        # emitting duplicate-name records that its own fast5
        # consistency check would reject)
        logger.info(
            "Alignment of read %s is unmapped/secondary/supplementary."
            " Skip.", rec.query_name)
        return None
    query_rle = RLEConverter(rec.query_sequence)

    # aligned part of the query (exclude soft clips)
    lead = 0
    ops = list(align_mod.cigar_ops_from_start(rec.cigarstring))
    if ops and ops[0][1] == "S":
        lead = int(ops[0][0])
    tail = 0
    if len(ops) > 1 and ops[-1][1] == "S":
        tail = int(ops[-1][0])
    qstart, qend = lead, rec.query_length - tail
    qc_start, qc_end = query_rle.transform_coords(qstart, qend)
    compact_query = query_rle.compact_basecall[qc_start:qc_end]

    rc_start, rc_end = ref_rle.transform_coords(
        rec.pos, rec.reference_end)
    compact_ref = ref_rle.compact_basecall[rc_start:rc_end]

    rstart, cigar = align_mod.sw_align(
        compact_query, compact_ref, match=5, mismatch=4, gap_open=5,
        gap_extend=3)
    cigar = add_extra_clipping(
        cigar, qc_start,
        len(query_rle.compact_basecall) - qc_end)
    rstart += rc_start

    tags = {}
    if fast5_index is not None:
        if rec.query_name not in fast5_index:
            logger.warning(
                "Not found in summary file: %s", rec.query_name)
            return None
        try:
            fast5_call, wl, wk = fast5_index.get_rl_params(rec.query_name)
        except (KeyError, FileNotFoundError) as exc:
            logger.info(
                "RLE table not found for read %s: %s",
                rec.query_name, exc)
            return None
        # fast5 tables are in read orientation; flip for reverse hits
        if rec.flag & 16:
            wl = wl[::-1]
            wk = wk[::-1]
            fast5_call = common.reverse_complement(fast5_call)
        if fast5_call != query_rle.compact_basecall:
            logger.warning(
                "RLE table within fast5 file is inconsistent with "
                "compressed basecall for read %s. %s != %s",
                rec.query_name, fast5_call, query_rle.compact_basecall)
            return None
        tags = {"WL": np.asarray(wl, np.float32),
                "WK": np.asarray(wk, np.float32)}

    quals = np.minimum(query_rle.homop_length, 255).astype(int).tolist()
    return align_mod.initialise_alignment(
        rec.query_name, rec.ref_id, rstart, query_rle.compact_basecall,
        cigar, rec.flag, query_qualities=quals, tags=tags)


def compress_bam(
        bam_input: str, bam_output: str, ref_fname: str,
        regions: Optional[List[common.Region]] = None, threads: int = 1,
        use_fast5_info=None):
    """Re-express a BAM in an RLE coordinate system.

    Reference: ``rle.py:190-248``. Reads and the reference are
    homopolymer compressed; each read is re-aligned (SW) to the
    compressed reference; run lengths are stored as qualities.
    """
    from medaka_tpu.io.fastx import FastaReader

    fast5_index = None
    if use_fast5_info:
        from medaka_tpu.io.fast5 import Fast5Index
        fast5_dir, summary = use_fast5_info
        fast5_index = Fast5Index(fast5_dir, summary)
    regions = common.get_bam_regions(bam_input, regions)
    ref_fasta = FastaReader(ref_fname)
    records = []
    with BamReader(bam_input) as reader:
        references = list(zip(reader.references, reader.lengths))
        # compressed reference lengths for the output header
        ref_rles = {}
        for region in regions:
            if region.ref_name not in ref_rles:
                ref_rles[region.ref_name] = RLEConverter(
                    ref_fasta.fetch(region.ref_name))
            ref_rle = ref_rles[region.ref_name]
            recs = list(reader.fetch(
                region.ref_name, region.start, region.end))
            if threads > 1:
                # the per-read SW re-alignment is the hot loop; the
                # native aligner releases the GIL, so threads scale
                import concurrent.futures
                with concurrent.futures.ThreadPoolExecutor(
                        threads) as ex:
                    outs = list(ex.map(
                        lambda r: _compress_alignment(
                            r, ref_rle, fast5_index=fast5_index),
                        recs))
            else:
                outs = [
                    _compress_alignment(
                        r, ref_rle, fast5_index=fast5_index)
                    for r in recs]
            records.extend(o for o in outs if o is not None)
    compressed_refs = [
        (name,
         len(ref_rles[name].compact_basecall) if name in ref_rles
         else length)
        for name, length in references]
    write_bam(bam_output, records, compressed_refs)
    return bam_output


def _decorate_sam_line(line: str, read_id, is_rev, fname):
    """Append WL/WK tags from a fast5 file to one SAM line.

    Reference worker: ``rle.py:296-337``. Header lines (``read_id`` is
    None) and reads whose run-length table is invalid (adjacent equal
    bases — not a valid RLE sequence) pass through unchanged. Note the
    reference's rlebam tag assignment (``WL`` <- ``scale``,
    ``WK`` <- ``shape``) is the transpose of its ``compress_bam`` path;
    we mirror each path's behaviour for output parity.
    """
    logger = common.get_named_logger("BAMDecor")
    if read_id is None:
        return line
    from medaka_tpu.io import fast5 as fast5_mod
    call, shape, scale = fast5_mod.get_runlength_basecall(fname, read_id)
    if any(a == b for a, b in zip(call[1:], call[:-1])):
        logger.info(
            "Invalid RLE/basecall dataset for %s in file %s.",
            read_id, fname)
        return line
    w_scale, w_shape = scale, shape
    if is_rev:
        w_scale = w_scale[::-1]
        w_shape = w_shape[::-1]
    return "{}\t{}\t{}".format(
        line,
        "WL:B:f," + ",".join(str(float(x)) for x in w_scale),
        "WK:B:f," + ",".join(str(float(x)) for x in w_shape))


def rlebam(read_index: str, workers: int = 4, input_sam=None, output=None):
    """Decorate a SAM stream with WL/WK run-length tags from fast5s.

    The ``medaka tools rlebam`` entry (reference ``rle.py:340-363``):
    reads SAM from stdin, appends Weibull parameter tags looked up via
    a two-column read_id -> fast5-path index, writes SAM to stdout.
    """
    logger = common.get_named_logger("BAMDecor")
    index = common.read_key_value_tsv(read_index)
    logger.info("Found %d reads in index", len(index))
    input_sam = input_sam if input_sam is not None else sys.stdin
    output = output if output is not None else sys.stdout

    def _ingress():
        for line in input_sam:
            if line.startswith("@"):
                yield line.rstrip(), None, None, None
            else:
                read_id, flag, _ = line.split("\t", 2)
                fast5 = index.get(read_id)
                if fast5 is None:
                    # match _decorate_sam_line's tolerance: pass the
                    # line through untouched rather than dying on an
                    # incomplete index
                    logger.warning(
                        "Read %s not in the fast5 index; passing "
                        "through untagged.", read_id)
                    yield line.rstrip(), None, None, None
                    continue
                is_rev = bool(int(flag) & 16)
                yield line.rstrip(), read_id, bool(is_rev), fast5

    with concurrent.futures.ProcessPoolExecutor(
            max_workers=workers) as executor:
        for decorated in executor.map(
                _decorate_sam_line_star, _ingress(), chunksize=10):
            output.write(decorated + "\n")


def _decorate_sam_line_star(args):
    """Tuple-unpacking shim for executor.map."""
    return _decorate_sam_line(*args)
