"""Minimal `pysam` stand-in for running reference medaka decode paths.

Only `FastaFile` is functional (backed by medaka_tpu's own FASTA
reader); everything else raises on use.  The reference modules import
pysam at module level but the stitch/vcf decode paths only touch
FastaFile.  Test infrastructure for the cross-stack parity harness.
"""

from medaka_tpu.io.fastx import FastaReader as _FastaReader


class FastaFile:
    """pysam.FastaFile work-alike over medaka_tpu's FASTA reader."""

    def __init__(self, filename):
        self.filename = filename
        self._reader = _FastaReader(filename)

    @property
    def references(self):
        return list(self._reader.references)

    @property
    def lengths(self):
        return [
            self._reader.get_reference_length(r)
            for r in self._reader.references]

    @property
    def nreferences(self):
        return len(self.references)

    def get_reference_length(self, name):
        return self._reader.get_reference_length(name)

    def fetch(self, reference=None, start=None, end=None, region=None):
        if region is not None:
            raise NotImplementedError('region strings not supported')
        return self._reader.fetch(reference, start, end)

    def close(self):
        close = getattr(self._reader, 'close', None)
        if close is not None:
            close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def _unavailable(name):
    class _Unavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError(
                'pysam.{} is not available in the cross-stack parity '
                'shim'.format(name))
    _Unavailable.__name__ = name
    return _Unavailable


AlignmentFile = _unavailable('AlignmentFile')
AlignedSegment = _unavailable('AlignedSegment')
AlignmentHeader = _unavailable('AlignmentHeader')
VariantFile = _unavailable('VariantFile')
FastxFile = _unavailable('FastxFile')
TabixFile = _unavailable('TabixFile')


def index(*args, **kwargs):
    raise NotImplementedError('pysam.index is not available in the shim')


def merge(*args, **kwargs):
    raise NotImplementedError('pysam.merge is not available in the shim')
