"""medaka_tpu: a TPU-native consensus and variant calling framework.

A ground-up reimplementation of the capabilities of `nanoporetech/medaka`
(reference v2.1.0) designed for TPU hardware: JAX/XLA/Pallas compute,
`jax.sharding` device meshes for scale-out, and a self-contained native IO
stack (no htslib dependency).

Subsystem map (reference parity targets cited per module):

- :mod:`medaka_tpu.io`        BAM/BGZF/FASTA/FASTQ codecs (replaces htslib/pysam)
- :mod:`medaka_tpu.common`    Region/Sample algebra (reference ``medaka/common.py``)
- :mod:`medaka_tpu.features`  pileup featurisation (reference ``src/medaka_counts.c``,
  ``medaka/features.py``)
- :mod:`medaka_tpu.labels`    label schemes (reference ``medaka/labels.py``)
- :mod:`medaka_tpu.models`    neural nets in JAX (reference ``medaka/architectures``)
- :mod:`medaka_tpu.ops`       Pallas/XLA kernels for the hot paths
- :mod:`medaka_tpu.parallel`  mesh/sharding utilities (new; reference is single-node)
- :mod:`medaka_tpu.prediction`/``stitch``/``variant``/``training`` workflows
"""

__version__ = "0.1.0"
