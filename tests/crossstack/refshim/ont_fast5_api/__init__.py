"""Import-time stub for `ont_fast5_api` (unused by decode parity paths)."""
