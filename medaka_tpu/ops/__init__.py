"""Compute kernels for the hot paths (XLA-level and Pallas implementations).

- :mod:`medaka_tpu.ops.rnn`: GRU/LSTM recurrences (torch-parity math) as
  `lax.scan` kernels with a fused Pallas variant for inference.
"""
