"""Self-contained genomics IO: BGZF, BAM (+BAI), FASTA/FASTQ.

This subsystem replaces the reference's htslib/pysam dependency
(reference: ``src/medaka_bamiter.c``, pysam usage throughout) with a
pure-spec implementation (SAM format spec v1.6). A native C++ fast path
lives in ``medaka_tpu/native`` and is used automatically when built.
"""

from medaka_tpu.io.bam import (  # noqa: F401
    BamReader, BamRecord, BamWriter, write_bam)
from medaka_tpu.io.bgzf import BgzfReader, BgzfWriter  # noqa: F401
from medaka_tpu.io.fastx import (  # noqa: F401
    FastaReader, FastaWriter, FastqWriter, read_fastx)
