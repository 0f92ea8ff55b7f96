"""Generic utilities (intervals, pickling shims, profiling helpers)."""
